"""Measured e2e delta of the wire codec (round-3 verdict item 3).

Runs bench.bench_e2e at each wire mode back-to-back on the same link
(fp = bf16 feat + fp16 labels ~26 MB/batch, int8 = quantized ~13 MB,
exact = fp32 ~52 MB), one JSON line per mode with the bench estimator
policy (median of 3 full loader passes + spread). Also prints the staged
headline for the fraction denominator.

Usage: python exp/e2e_wire_compare.py [modes...]   (default: fp int8)
TPU-serial: run alone.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import bench


def main():
    modes = sys.argv[1:] or ["fp", "int8"]
    staged = bench.bench_jax()
    print(json.dumps({"cell": "staged",
                      "median": round(staged["value"], 2),
                      "spread": {k: (round(v, 2) if isinstance(v, float)
                                     else v)
                                 for k, v in staged["spread"].items()}}),
          flush=True)
    for mode in modes:
        r = bench.bench_e2e(wire=mode)
        out = {"cell": f"e2e_{mode}",
               **{k: (round(v, 2) if isinstance(v, float) else v)
                  for k, v in r.items()},
               "fraction": round(r["median"] / staged["value"], 3)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
