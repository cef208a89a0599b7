"""Pallas-vs-XLA attention crossover sweep (win-or-retire evidence).

The full-step comparison (exp/pallas_chip.py, README "Pallas" notes) shows
the fused kernel losing at the reference geometry (Lq/Lk = 50/256/37).
This isolates WHY and finds WHERE it wins: time softmax-attention
forward+backward at fixed B*H (batch 8 x 12 heads, D=64 — the reference's
head geometry, vilbert_k3m.py BertSelfAttention) while sweeping sequence
length. XLA's unfused path materializes the [B,H,L,L] probs tensor in HBM
(fwd + saved-for-bwd); the Pallas kernel keeps it in VMEM and recomputes
in the VJP, so its advantage should scale ~L^2 while its per-cell launch
overhead is constant.

Usage: python exp/attn_crossover.py [--out /tmp/attn_crossover.jsonl]
Emits one JSON line per (L, impl) with ms/iter and the probs-tensor MB
that the XLA path round-trips.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from k3m_tpu.kernels.attention import padded_fused_attention, reference_attention

B, H, D = 8, 12, 64


def make_ops(L, dtype):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, D), dtype)
    k = jax.random.normal(kk, (B, H, L, D), dtype)
    v = jax.random.normal(kv, (B, H, L, D), dtype)
    bias = jnp.zeros((B, 1, 1, L), dtype)
    return q, k, v, bias


def timed(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)          # compile
    # pick an iteration count that keeps each window ~O(100ms)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    est = (time.perf_counter() - t0) / 3
    n = max(iters, int(0.1 / max(est, 1e-5)))
    windows = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        windows.append((time.perf_counter() - t0) / n)
    return sorted(windows)[1] * 1e3     # median ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/attn_crossover.jsonl")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--lengths", default="64,128,256,512,1024,2048,4096")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    @jax.jit
    def xla_step(q, k, v, bias):
        def loss(q, k, v):
            return reference_attention(q, k, v, bias).astype(jnp.float32).sum()
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return l, grads

    @jax.jit
    def pallas_step(q, k, v, bias):
        def loss(q, k, v):
            return padded_fused_attention(
                q, k, v, bias, seed=0, dropout_rate=0.0
            ).astype(jnp.float32).sum()
        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        return l, grads

    results = []
    for L in [int(x) for x in args.lengths.split(",")]:
        ops = make_ops(L, dtype)
        probs_mb = B * H * L * L * dtype.itemsize / 2**20
        row = {"L": L, "B": B, "H": H, "D": D, "dtype": str(dtype),
               "probs_mb": round(probs_mb, 2)}
        try:
            # numerical check at this L before trusting the timing
            ox = np.asarray(xla_step(*ops)[0], np.float64)
            op = np.asarray(pallas_step(*ops)[0], np.float64)
            row["rel_diff"] = float(abs(ox - op) / (abs(ox) + 1e-6))
            row["xla_ms"] = round(timed(xla_step, ops, 10), 3)
            row["pallas_ms"] = round(timed(pallas_step, ops, 10), 3)
            row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        except Exception as e:  # e.g. single-tile kernel exceeds VMEM
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        results.append(row)
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    wins = [r["L"] for r in results if r.get("pallas_speedup", 0) > 1.0]
    print(json.dumps({"crossover_L": min(wins) if wins else None,
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
