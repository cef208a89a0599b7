"""Capture a jax.profiler device trace of the train step and print the
top-k ops by total device time (parsed from the xplane.pb via TF's
profiler protos).

Usage: python exp/profile_step.py [variant] [topk]
"""
import glob
import json
import os
import sys
from collections import defaultdict

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
topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40

cfg = K3MConfig().replace(dtype="bfloat16")
if variant == "nodrop":
    cfg = cfg.replace(hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                      v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
if variant == "pallas":
    cfg = cfg.replace(use_pallas=True)
MICRO = 1
if variant.startswith("micro"):
    MICRO = int(variant[5:] or 3)
    cfg = cfg.replace(remat=False)
if variant in ("bench", "bench_pallas"):
    # the bench.py headline configuration (micro_steps=4 + shared_prefix),
    # with/without the Pallas kernels — the win-or-retire comparison pair
    MICRO = 4
    cfg = cfg.replace(remat=False, shared_prefix=True,
                      use_pallas=(variant == "bench_pallas"))

batch = _make_batch(cfg, B=BATCH, L=50, Lpv=256, R=36, P=30)
trainer = PretrainTrainer(cfg, learning_rate=1e-4, warmup_steps=10,
                          total_steps=1000, sample_batch=batch,
                          micro_steps=MICRO,
                          mesh=mesh_lib.make_mesh(n_model=1))
db = mesh_lib.shard_batch(device_batch(batch), trainer.mesh)

state = trainer.state
for _ in range(3):
    state, m = trainer._train_step(state, db)
jax.block_until_ready(m["loss"])

trace_dir = "/tmp/k3m_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, m = trainer._train_step(state, db)
    jax.block_until_ready(m["loss"])

# ---- parse xplane ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
assert paths, "no xplane captured"
spaces = []
for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    spaces.append(xs)

op_time = defaultdict(float)
total = 0.0
for xs in spaces:
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # leaf compute ops only (not Async/Modules/Steps)
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                op_time[name] += dur
                total += dur

rows = sorted(op_time.items(), key=lambda kv: -kv[1])[:topk]
print(f"total device op time over 3 steps: {total:.4f}s "
      f"({total/3:.4f}s/step)")
for name, t in rows:
    print(f"{t/3*1000:9.2f} ms/step  {100*t/total:5.1f}%  {name[:140]}")
