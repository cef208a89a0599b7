"""One-claim round-5 measurement batch.

Same operating pattern as r4 (the shared axon pool hands the chip to one
tenant at a time; claims queue for minutes; a held chip can stall): ONE
process claims once and runs every on-chip measurement, appending each
result to /tmp/r5_measure_all.jsonl as it lands so a kill loses nothing.

Phases:
  1. headline + bit-exact staged rates (bench_jax, median-of-3)
  2. finetune staged — now with warmup (r5) + synced per-step probe:
     the r2-r4 first-window-stall diagnostic
  3. e2e int8 with in-situ link telemetry + analytic expectations
     (the self-diagnosing artifact of r4-verdict item 1)
  4. e2e with the device-resident epoch cache (r4-verdict item 2):
     target >= 98% of staged regardless of link state
  5. finetune e2e (int8, default depth)
  6. pallas co-attention lever re-measure (win-or-retire input)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import bench

OUT = "/tmp/r5_measure_all.jsonl"


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def rounded(d):
    out = {}
    for k, v in d.items():
        if isinstance(v, float):
            out[k] = round(v, 2)
        elif isinstance(v, dict):
            out[k] = rounded(v)
        else:
            out[k] = v
    return out


def phase(name, fn):
    try:
        t0 = time.time()
        r = fn()
        emit({"phase": name, **rounded(r),
              "phase_s": round(time.time() - t0, 1)})
        return r
    except Exception as e:
        emit({"phase": name, "error": f"{type(e).__name__}: {e}"})
        return None


def pallas_bench():
    os.environ["K3M_BENCH_PALLAS"] = "1"
    try:
        r = bench.bench_jax(windows=2)
    finally:
        os.environ.pop("K3M_BENCH_PALLAS", None)
    return {"value": round(r["value"], 2), "spread": r["spread"]}


def main():
    t0 = time.time()
    import jax
    tc = time.perf_counter()
    dev = jax.devices()[0]
    emit({"phase": "claim", "claim_s": round(time.perf_counter() - tc, 1),
          "device": dev.device_kind})

    headline = phase("headline", lambda: (lambda r: {
        "value": round(r["value"], 2), "mfu": r["mfu"],
        "spread": r["spread"]})(bench.bench_jax()))
    staged = headline["value"] if headline else None

    phase("bit_exact", lambda: (lambda r: {
        "value": round(r["value"], 2), "spread": r["spread"]})(
        bench.bench_jax(shared_prefix=False, windows=3)))

    ft = phase("finetune_staged", bench.bench_finetune)

    e2e = phase("e2e_int8", lambda: bench.bench_e2e(
        wire="int8", staged_rate=staged))
    if e2e and staged:
        emit({"phase": "e2e_int8_fraction",
              "fraction": round(e2e["median"] / staged, 3)})

    cached = phase("e2e_cached", lambda: bench.bench_e2e(
        wire="int8", staged_rate=staged, device_cache=True))
    if cached and staged:
        emit({"phase": "e2e_cached_fraction",
              "fraction": round(cached["median"] / staged, 3)})

    fte = phase("finetune_e2e_int8",
                lambda: bench.bench_finetune_e2e(wire="int8"))
    if fte and ft:
        emit({"phase": "finetune_e2e_fraction",
              "fraction": round(fte["median"] / ft["median"], 3)})

    phase("headline_pallas", pallas_bench)

    emit({"phase": "done", "total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
