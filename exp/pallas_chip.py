"""Pallas-vs-XLA on the real chip: correctness then step-time.

Usage: python exp/pallas_chip.py [correctness|time_xla|time_pallas]

correctness: deterministic forward of the full pretrain model (reference
geometry, batch 8) with use_pallas on/off, same params -> per-loss rel diff.
time_*: full train step at batch 96, micro_steps=3 (the shipped bench
configuration), 8-step timed window after warmup.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

import jax
import numpy as np

from __graft_entry__ import _make_batch
from k3m_tpu.config import K3MConfig

mode = sys.argv[1] if len(sys.argv) > 1 else "correctness"


def correctness():
    from k3m_tpu.model.pretrain import K3MForPretraining

    cfg = K3MConfig().replace(dtype="bfloat16")
    batch = _make_batch(cfg, B=8, L=50, Lpv=256, R=36, P=30)
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
            "lpm": jax.random.PRNGKey(2)}
    model_x = K3MForPretraining(cfg.replace(use_pallas=False))
    model_p = K3MForPretraining(cfg.replace(use_pallas=True))
    params = model_x.init(rngs, batch, deterministic=True)

    @jax.jit
    def fwd_x(p, b):
        return model_x.apply(p, b, deterministic=True,
                             rngs={"gumbel": jax.random.PRNGKey(1),
                                   "lpm": jax.random.PRNGKey(2)})

    @jax.jit
    def fwd_p(p, b):
        return model_p.apply(p, b, deterministic=True,
                             rngs={"gumbel": jax.random.PRNGKey(1),
                                   "lpm": jax.random.PRNGKey(2)})

    ox = jax.device_get(fwd_x(params, batch))
    op = jax.device_get(fwd_p(params, batch))
    report = {}
    for k in ox:
        a, b = np.asarray(ox[k], np.float64), np.asarray(op[k], np.float64)
        rel = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-6)))
        report[k] = dict(xla=float(np.mean(a)), pallas=float(np.mean(b)),
                         max_rel=rel)
    print(json.dumps(report, indent=1))


def timing(use_pallas: bool):
    from k3m_tpu.train import mesh as mesh_lib
    from k3m_tpu.train.pretrain_loop import PretrainTrainer, device_batch

    B = int(os.environ.get("K3M_BATCH", 96))
    micro = int(os.environ.get("K3M_MICRO", 3))
    cfg = K3MConfig().replace(dtype="bfloat16", remat=(micro <= 1),
                              use_pallas=use_pallas)
    batch = _make_batch(cfg, B=B, L=50, Lpv=256, R=36, P=30)
    trainer = PretrainTrainer(cfg, learning_rate=1e-4, warmup_steps=10,
                              total_steps=1000, sample_batch=batch,
                              micro_steps=micro,
                              mesh=mesh_lib.make_mesh(n_model=1))
    db = mesh_lib.shard_batch(device_batch(batch), trainer.mesh)
    t0 = time.perf_counter()
    for _ in range(3):
        m = trainer.train_step(db)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            m = trainer.train_step(db)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / 8
        rates.append(B / dt)
    print(json.dumps(dict(use_pallas=use_pallas, batch=B, micro=micro,
                          warmup_s=round(compile_s, 1),
                          samples_per_s=sorted(rates)[1],
                          loss=float(jax.device_get(m["loss"])))))


if mode == "correctness":
    correctness()
elif mode == "time_xla":
    timing(False)
elif mode == "time_pallas":
    timing(True)
else:
    raise SystemExit(f"unknown mode {mode}")
