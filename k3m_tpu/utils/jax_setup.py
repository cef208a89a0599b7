"""Process-level JAX setup shared by the CLIs: persistent compilation cache
(first compile of the tri-pass graph is expensive; subsequent runs hit the
cache) and sane logging."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None,
              prng_impl: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "K3M_JAX_CACHE", os.path.expanduser("~/.cache/k3m_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # Dropout mask generation with the default threefry PRNG is pure VPU
    # work (profiled at ~5% of the train step, doubled under remat); the
    # counter-based "rbg" generator lowers to the TPU's hardware
    # RngBitGenerator instead. Values differ from threefry but are equally
    # deterministic per seed. Override with K3M_PRNG_IMPL=threefry2x32.
    prng_impl = prng_impl or os.environ.get("K3M_PRNG_IMPL", "rbg")
    jax.config.update("jax_default_prng_impl", prng_impl)


def maybe_init_distributed() -> "tuple[int, int]":
    """Multi-host initialization — the TPU-native replacement for the
    reference's `init_process_group` (NCCL at train_concap_struc.py:161,
    gloo at pretrain.py:59-64). Where torch DDP needs a per-rank process
    group and user-level allreduce, JAX needs only a one-time
    `jax.distributed.initialize`; every collective is compiled into the
    GSPMD program and rides ICI/DCN.

    Configuration (explicit env triple, or auto-detection on TPU pods):
      K3M_COORDINATOR_ADDRESS  host:port of process 0
      K3M_NUM_PROCESSES        world size
      K3M_PROCESS_ID           this process's rank
      K3M_MULTIHOST=1          use jax.distributed auto-detection instead

    Returns (process_index, process_count); (0, 1) when not configured.
    """
    import jax

    coord = os.environ.get("K3M_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["K3M_NUM_PROCESSES"]),
            process_id=int(os.environ["K3M_PROCESS_ID"]))
    elif os.environ.get("K3M_MULTIHOST"):
        jax.distributed.initialize()   # TPU-pod metadata auto-detection
    return jax.process_index(), jax.process_count()
