"""Perf probe: step time + HBM memory analysis for train-step variants.

Usage: python exp/perf_probe.py [variant]
Variants: base | nodrop
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from k3m_tpu.utils.jax_setup import setup_jax

setup_jax()

from k3m_tpu.config import K3MConfig
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer, device_batch
from __graft_entry__ import _make_batch

BATCH = int(os.environ.get("K3M_BATCH", 96))
variant = sys.argv[1] if len(sys.argv) > 1 else "base"

cfg = K3MConfig().replace(dtype="bfloat16")
label_sfx = ""
if variant.endswith("_noln"):
    # disable the fused LayerNorm Pallas kernel (XLA LN path)
    cfg = cfg.replace(use_pallas_ln=False)
    variant = variant[:-len("_noln")]
    label_sfx = "_noln"
if variant.endswith("_fqkv"):
    # fuse each attention site's Q/K/V (and each co-attention stream's three
    # projections) into one matmul over concatenated kernels
    cfg = cfg.replace(fused_qkv=True)
    variant = variant[:-len("_fqkv")]
    label_sfx = "_fqkv" + label_sfx
if variant.endswith("_nopack"):
    # disable the packed tri-pass text stack (sequential passes)
    cfg = cfg.replace(packed_passes=False)
    variant = variant[:-len("_nopack")]
    label_sfx = "_nopack" + label_sfx
if variant.endswith("_sp"):
    # shared_prefix: run the cross-free text-layer prefix once per stream
    cfg = cfg.replace(shared_prefix=True)
    variant = variant[:-len("_sp")]
    label_sfx = "_sp" + label_sfx
if variant.endswith("_pattn"):
    # fused Pallas attention: recomputes probs in backward, so the
    # [B,12,256,256] prob tensors are never saved — frees ~2 GB at micro1
    cfg = cfg.replace(use_pallas=True)
    variant = variant[:-len("_pattn")]
    label_sfx = "_pattn" + label_sfx
label = variant + label_sfx
if variant == "nodrop":
    cfg = cfg.replace(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                      v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
if variant == "noremat":
    cfg = cfg.replace(remat=False)
MICRO = 1
UNROLL = False
if variant.startswith("micro"):
    # micro3 / micro2 ... : in-step grad accumulation, remat off
    # micro3u: same but with the scan unrolled (no while-loop carry)
    spec = variant[5:] or "3"
    if spec.endswith("u"):
        UNROLL = True
        spec = spec[:-1]
    remat = spec.endswith("r")   # micro3r: keep per-layer remat ON
    if remat:
        spec = spec[:-1]
    MICRO = int(spec)
    cfg = cfg.replace(remat=remat)

batch = _make_batch(cfg, B=BATCH, L=50, Lpv=256, R=36, P=30)
trainer = PretrainTrainer(cfg, learning_rate=1e-4, warmup_steps=10,
                          total_steps=1000, sample_batch=batch,
                          micro_steps=MICRO, micro_unroll=UNROLL,
                          mesh=mesh_lib.make_mesh(n_model=1))
db = mesh_lib.shard_batch(device_batch(batch), trainer.mesh)

lowered = trainer._train_step.lower(trainer.state, db)
compiled = lowered.compile()
try:
    ma = compiled.memory_analysis()
    print(json.dumps(dict(
        variant=label,
        argument_gb=ma.argument_size_in_bytes / 1e9,
        output_gb=ma.output_size_in_bytes / 1e9,
        temp_gb=ma.temp_size_in_bytes / 1e9,
        alias_gb=ma.alias_size_in_bytes / 1e9,
    )))
except Exception as e:
    print("memory_analysis failed:", e)
try:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(json.dumps(dict(flops_tf=ca.get("flops", 0) / 1e12,
                          bytes_gb=ca.get("bytes accessed", 0) / 1e9)))
except Exception as e:
    print("cost_analysis failed:", e)

# timing
state = trainer.state
for _ in range(2):
    state, m = compiled(state, db)
jax.device_get(m["loss"])   # NOT block_until_ready: over the axon tunnel it
N = 8                        # intermittently returns before remote completion
# the tunneled chip intermittently reports phantom ~10 ms "steps" (the
# execute call returns without running); guard with a physics lower bound
# (flops at an impossible 2 PF/s) and retry
lower_bound = 0.0
try:
    lower_bound = ca.get("flops", 0) / 2e15
except Exception:
    pass
for attempt in range(4):
    t0 = time.perf_counter()
    for _ in range(N):
        state, m = compiled(state, db)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / N
    if dt >= lower_bound:
        break
    print(json.dumps(dict(variant=label, suspect_step_s=dt,
                          loss=float(jax.device_get(m["loss"])))))
    time.sleep(2)
print(json.dumps(dict(variant=label, step_s=dt, samples_per_s=BATCH / dt,
                      loss=float(jax.device_get(m["loss"])))))
