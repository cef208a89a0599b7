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

    Timeout overrides (seconds; useful when hosts are badly skewed, e.g.
    one host cold-compiles for minutes while another idles at a barrier):
      K3M_DIST_INIT_TIMEOUT        connection setup (jax default 300)
      K3M_DIST_HEARTBEAT_TIMEOUT   missed-heartbeat failure detection (100)
      K3M_DIST_SHUTDOWN_TIMEOUT    shutdown barrier (300)

    Returns (process_index, process_count); (0, 1) when not configured.
    """
    import jax

    timeouts = {}
    for key, env in (("initialization_timeout", "K3M_DIST_INIT_TIMEOUT"),
                     ("heartbeat_timeout_seconds",
                      "K3M_DIST_HEARTBEAT_TIMEOUT"),
                     ("shutdown_timeout_seconds",
                      "K3M_DIST_SHUTDOWN_TIMEOUT")):
        if os.environ.get(env):
            timeouts[key] = int(os.environ[env])
    coord = os.environ.get("K3M_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["K3M_NUM_PROCESSES"]),
            process_id=int(os.environ["K3M_PROCESS_ID"]), **timeouts)
    elif os.environ.get("K3M_MULTIHOST"):
        jax.distributed.initialize(**timeouts)  # TPU-pod auto-detection
    return jax.process_index(), jax.process_count()


def distributed_barrier(name: str, timeout_s: int = 1800) -> bool:
    """Hold every process at a coordination-service barrier (pure KV RPC —
    no device collective, so it is safe to call while processes are at
    wildly different points, e.g. one still compiling).

    Use before the first collective execution when hosts can skew during
    compilation: XLA's CPU Gloo backend gives a communicator rendezvous
    only ~30 s, so if one process dispatches the first sharded step while
    another is still compiling, the whole world dies with
    "Gloo context initialization failed: DEADLINE_EXCEEDED". TPU cliques
    are more forgiving but the same hygiene applies across slow hosts.

    No-op (returns False) when jax.distributed was never initialized.
    """
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        return False
    client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)
    return True
