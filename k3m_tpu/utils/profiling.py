"""Profiling harness: jax.profiler traces + block-until-ready timing.

The reference has no tracing/profiling at all (SURVEY §5). This provides:
  * `profile_trace(dir)` — context manager wrapping jax.profiler.trace;
    view with TensorBoard or xprof.
  * `timed(fn, *args)` — wall-clock timing with proper device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 5,
          **kw) -> Tuple[float, Any]:
    """Returns (seconds_per_call, last_result); syncs via block_until_ready."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
