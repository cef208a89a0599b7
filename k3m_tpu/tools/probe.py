"""Chip/link health probe: `python -m k3m_tpu.tools.probe [n]`.

Prints ONE JSON line:
  {"device": "...", "claim_s": ..., "matmul_ms": [...], "median_ms": ...}

Why it exists (r4 operational findings): the axon TPU pool is shared —
backend init can queue for many minutes behind another tenant, and a held
chip can stall mid-run. When a bench or training job looks hung, run this
FIRST (sequentially — never alongside another TPU process): a long
`claim_s` means the pool is busy (wait), a failed/stuck probe means the
tunnel is down (retry later), healthy numbers mean the problem is your
job. `claim_s` here counts everything up to the first executed op,
including backend registration and the pool grant.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    # ONE jitted callable reused by the claim probe and the timing loop —
    # a fresh jax.jit(lambda) per iteration would retrace+recompile every
    # time, so the timings would measure host compile, not the chip/link.
    f = jax.jit(lambda a: (a @ a).sum())
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    float(jax.device_get(f(x)))       # first executed op: claim + compile
    claim_s = time.perf_counter() - t0

    times = []
    for _ in range(n):
        t = time.perf_counter()
        float(jax.device_get(f(x)))
        times.append(round((time.perf_counter() - t) * 1000, 2))
    med = sorted(times)[len(times) // 2]
    print(json.dumps({
        "device": jax.devices()[0].device_kind,
        "claim_s": round(claim_s, 1),
        "matmul_ms": times,
        "median_ms": med,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
