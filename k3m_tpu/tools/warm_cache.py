"""Compile-cache warmer: populate every persistent XLA cache this repo uses
in one command, so cold machines pay the compile tax off the critical path.

    python -m k3m_tpu.tools.warm_cache [--tier tests|dryrun|bench] [--all]

Three caches exist (all keyed on exact HLO, so warming must go through the
same code paths that will later compile):

  tests   ~/.cache/k3m_jax_tests — the pytest gate's cache (CPU backend,
          8 virtual devices; tests/conftest.py). Warmed by running the
          compile-dominant test files themselves: that is the only way to
          guarantee cache-key identity with what the gate compiles (jit
          cache keys include every traced constant — lr schedules, step
          counts — so a hand-built "same-ish" trainer misses).
  dryrun  same dir — the driver's `dryrun_multichip` graph
          (__graft_entry__.py) plus the full-geometry (bert-base, batch
          96, 4x2 DPxTP) compile-only lowering gate.
  bench   ~/.cache/k3m_jax — the TPU-side cache used by bench.py and the
          CLIs (utils/jax_setup.setup_jax). Warmed by AOT-lowering the
          four bench step graphs (headline, bit-exact, finetune, e2e-wire)
          on the default backend without running a measurement.

Rationale (round-3 verdict item 4): the fast pytest gate is ~9.5 min warm
but 2-3x that cold on this 1-core host, and the end-of-round bench pays a
~25 min cold compile. A cold run itself can never be beaten on total work
(each unique HLO compiles exactly once either way); what the warmer buys is
*when* that work happens — right after provisioning, in one unattended
command — and that all three caches are covered together.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# The compile-dominant test files, ordered so shared graphs (model forward,
# NANO/MICRO trainer steps) land in the cache before their re-users run.
TEST_TIER = [
    "tests/test_model.py",
    "tests/test_micro_steps.py",
    "tests/test_nonfinite_guard.py",
    "tests/test_no_recompile.py",
    "tests/test_alignment_micro.py",
    "tests/test_wire.py",
    "tests/test_end_to_end.py",
    "tests/test_multidevice.py",
    "tests/test_hlo_collectives.py",
    "tests/test_shared_prefix.py",
    "tests/test_fused_qkv.py",
    "tests/test_packed_passes.py",
]


def _run(cmd, env=None, timeout=7200) -> int:
    t0 = time.time()
    print(f"[warm_cache] $ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    rc = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout).returncode
    print(f"[warm_cache]   rc={rc} dt={time.time() - t0:.0f}s", flush=True)
    return rc


def warm_tests() -> int:
    return _run([sys.executable, "-m", "pytest", "-q",
                 "-p", "no:cacheprovider", *TEST_TIER])


def warm_dryrun() -> int:
    rc = _run([sys.executable, "__graft_entry__.py", "--dryrun", "8"])
    rc |= _run([sys.executable, "__graft_entry__.py", "--dryrun-full", "8"])
    return rc


def warm_bench() -> int:
    """AOT-lower the bench step graphs on the default (TPU) backend.

    Compiling is host-CPU work against the real backend target; nothing
    executes on the chip, but it still holds the TPU client — run it
    sequentially with any other TPU process."""
    code = r"""
import numpy as np
from k3m_tpu.utils.jax_setup import setup_jax
setup_jax()
import bench
import jax
from k3m_tpu.config import K3MConfig
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer, device_batch
from k3m_tpu.train.alignment_loop import AlignmentTrainer, device_item

def lower_pretrain(shared_prefix, wire):
    micro = 4
    cfg = K3MConfig().replace(dtype="bfloat16", remat=False,
                              shared_prefix=shared_prefix)
    b = bench.make_batch(cfg, bench.BATCH)
    tr = PretrainTrainer(cfg, learning_rate=1e-4, warmup_steps=10,
                         total_steps=1000, sample_batch=b, micro_steps=micro,
                         wire=wire, mesh=mesh_lib.make_mesh(n_model=1))
    tr._train_step.lower(tr.state, tr._stage(b)).compile()
    print("lowered pretrain", shared_prefix, wire, flush=True)

def lower_finetune(wire):
    from __graft_entry__ import _make_batch
    cfg = K3MConfig().replace(dtype="bfloat16", loss_type="ce", remat=False)
    B = 32
    i1 = device_item(_make_batch(cfg, B=B, L=50, Lpv=256, R=36, P=30, seed=1))
    i2 = device_item(_make_batch(cfg, B=B, L=50, Lpv=256, R=36, P=30, seed=2))
    b = dict(label=(np.arange(B) % 2).astype(np.int32), item1=i1, item2=i2)
    tr = AlignmentTrainer(cfg, learning_rate=5e-5, warmup_steps=10,
                          total_steps=1000, sample_batch=b, micro_steps=4,
                          wire=wire, mesh=mesh_lib.make_mesh(n_model=1))
    db = tr._shard(b)
    tr._train_step.lower(tr.state, db["label"], db["item1"],
                         db["item2"]).compile()
    print("lowered finetune", wire, flush=True)

lower_pretrain(True, "fp")    # headline
lower_pretrain(False, "fp")   # bit-exact companion
lower_pretrain(True, "int8")  # e2e wire codec
lower_finetune("fp")          # staged finetune
lower_finetune("int8")        # finetune e2e wire codec
print("bench tier warm", flush=True)
"""
    return _run([sys.executable, "-c", code], timeout=7200)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tier", action="append", default=None,
                    choices=["tests", "dryrun", "bench"],
                    help="tier(s) to warm; default: all")
    args = ap.parse_args()
    tiers = args.tier or ["tests", "dryrun", "bench"]
    rc = 0
    t0 = time.time()
    for tier in tiers:
        rc |= {"tests": warm_tests, "dryrun": warm_dryrun,
               "bench": warm_bench}[tier]()
    print(f"[warm_cache] total {time.time() - t0:.0f}s rc={rc}", flush=True)
    sys.exit(rc)


if __name__ == "__main__":
    main()
