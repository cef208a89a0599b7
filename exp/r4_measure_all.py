"""One-claim round-4 measurement batch.

The shared axon pool hands the chip to one tenant at a time and claims can
queue for many minutes, so every measurement this round runs in ONE
process that claims once and holds the chip:

  1. full bench.py companion set (headline/bit-exact/finetune staged/
     e2e int8/finetune-e2e int8) — the BENCH_r04-shaped JSON line
  2. e2e wire delta: fp vs int8 vs exact back-to-back on the same link
  3. alignment fit() lever sweep: prefetch depth x wire

Writes one labeled JSON line per result to stdout AND appends to
/tmp/r4_measure_all.jsonl so partial progress survives a kill.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import bench

OUT = "/tmp/r4_measure_all.jsonl"


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def rounded(d):
    return {k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in d.items()}


def main():
    t0 = time.time()
    # ---- 1. headline + companions (the bench.py main() composition,
    # called as functions so the process keeps the claim)
    res = bench.bench_jax()
    emit({"phase": "headline", "value": round(res["value"], 2),
          "mfu": round(res["mfu"], 4) if res["mfu"] else None,
          "spread": rounded(res["spread"])})
    be = bench.bench_jax(shared_prefix=False, windows=3)
    emit({"phase": "bit_exact", "value": round(be["value"], 2),
          "spread": rounded(be["spread"])})
    ft = bench.bench_finetune()
    emit({"phase": "finetune_staged", **rounded(ft)})

    # ---- 2. e2e wire delta (fp first so its numbers are comparable with
    # r3's fp-only history, then int8, then exact for the full table)
    e2e = {}
    for mode in ("fp", "int8", "exact"):
        r = bench.bench_e2e(wire=mode)
        e2e[mode] = r
        emit({"phase": f"e2e_{mode}", **rounded(r),
              "fraction": round(r["median"] / res["value"], 3)})

    # ---- 3. alignment fit() sweep: depth x wire
    for wire in ("fp", "int8"):
        for depth in (2, 4, 6):
            os.environ["K3M_PREFETCH_DEPTH"] = str(depth)
            r = bench.bench_finetune_e2e(wire=wire)
            emit({"phase": f"ft_e2e_{wire}_d{depth}", "depth": depth,
                  "wire": wire, **rounded(r),
                  "fraction": round(r["median"] / ft["median"], 3)})
    os.environ.pop("K3M_PREFETCH_DEPTH", None)
    emit({"phase": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
