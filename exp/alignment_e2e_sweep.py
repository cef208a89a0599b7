"""Alignment fit()-path lever sweep (round-3 verdict item 7).

Gives the twin-tower e2e path the same treatment the pretrain e2e got:
prefetch-depth x wire-codec grid over bench.bench_finetune_e2e (median of
3 full loader passes each, the bench estimator policy), plus the staged
device rate for the fraction denominator. One JSON line per cell.

Usage: python exp/alignment_e2e_sweep.py [depths...]   (default 2 4 6)
TPU-serial: run alone; ~2 min per cell warm + one-time compiles.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import bench


def main():
    depths = [int(d) for d in sys.argv[1:]] or [2, 4, 6]
    staged = bench.bench_finetune(windows=3)
    print(json.dumps({"cell": "staged", **{k: round(v, 2) if isinstance(v, float) else v
                                           for k, v in staged.items()}}),
          flush=True)
    for wire in ("fp", "int8"):
        for depth in depths:
            os.environ["K3M_PREFETCH_DEPTH"] = str(depth)
            r = bench.bench_finetune_e2e(wire=wire)
            out = {"cell": f"e2e_{wire}_d{depth}", "depth": depth,
                   "wire": wire,
                   **{k: round(v, 2) if isinstance(v, float) else v
                      for k, v in r.items()},
                   "fraction": round(r["median"] / staged["median"], 3)}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
