"""Process-level JAX setup shared by the CLIs: persistent compilation cache
(first compile of the tri-pass graph is expensive; subsequent runs hit the
cache) and sane logging."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "K3M_JAX_CACHE", os.path.expanduser("~/.cache/k3m_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
