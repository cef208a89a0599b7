#!/usr/bin/env python
"""K3M pretrain throughput benchmark.

Measures samples/sec/chip of the full pretraining train step (fwd+bwd+AdamW)
at the reference's measured configuration (run_pretrain.sh:16-46: batch 96,
seq 50/256, 30 pvs, 36 regions, mixed precision) on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline: ratio to the torch reference's per-chip rate. The reference
cannot run here (its tensorpack/LMDB/apex deps are not installed and there is
no GPU), so the baseline comes from BENCH_BASELINE.json if present —
{"reference_samples_per_sec_per_chip": N} — else a torch-CPU proxy of the
reference model is attempted; if neither works, vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("K3M_BENCH_BATCH", 96))
SEQ_T = 50
SEQ_PV = 256
NUM_PV = 30
REGIONS = 36
WARMUP = 3
ITERS = 10


def make_batch(cfg, B):
    from __graft_entry__ import _make_batch
    return _make_batch(cfg, B=B, L=SEQ_T, Lpv=SEQ_PV, R=REGIONS, P=NUM_PV)


def bench_jax() -> float:
    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    cfg = K3MConfig().replace(dtype="bfloat16")
    n_chips = len(jax.devices())
    batch = make_batch(cfg, BATCH * n_chips)
    trainer = PretrainTrainer(
        cfg, learning_rate=1e-4, warmup_steps=10, total_steps=1000,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_model=1))
    for _ in range(WARMUP):
        m = trainer.train_step(batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        m = trainer.train_step(batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    return (BATCH * n_chips * ITERS) / dt / n_chips


def load_baseline() -> float | None:
    path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(path):
        with open(path) as f:
            v = json.load(f).get("reference_samples_per_sec_per_chip")
            if v:
                return float(v)
    return None


def main():
    from k3m_tpu.utils.jax_setup import setup_jax
    setup_jax()
    value = bench_jax()
    baseline = load_baseline()
    out = {
        "metric": "k3m_pretrain_samples_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
