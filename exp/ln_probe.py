"""Microbenchmark LayerNorm variants on [32,256,768] bf16 (the shape that
dominates the train-step profile at ~0.56 ms/op, ~20x bandwidth bound)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from k3m_tpu.utils.jax_setup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
import numpy as np

B, L, H = 32, 256, 768
x = jnp.asarray(np.random.randn(B, L, H), jnp.bfloat16)
scale = jnp.ones((H,), jnp.float32)
bias = jnp.zeros((H,), jnp.float32)
EPS = 1e-12

def ln_twopass(x):
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    s = jnp.square(xf - u).mean(-1, keepdims=True)
    y = (xf - u) * jax.lax.rsqrt(s + EPS)
    return (y * scale + bias).astype(jnp.bfloat16)

def ln_fast(x):
    xf = x.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    u2 = jnp.square(xf).mean(-1, keepdims=True)
    s = jnp.maximum(u2 - jnp.square(u), 0.0)
    y = (xf - u) * jax.lax.rsqrt(s + EPS)
    return (y * scale + bias).astype(jnp.bfloat16)

def ln_flax(x):
    import flax.linen as fnn
    mod = fnn.LayerNorm(epsilon=EPS, use_fast_variance=True, dtype=jnp.bfloat16,
                        use_bias=True, use_scale=True)
    p = mod.init(jax.random.PRNGKey(0), x)
    return lambda xx: mod.apply(p, xx)

def bench(name, fn, n=200):
    f = jax.jit(fn)
    y = f(x); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:12s} {dt*1e6:8.1f} us/op")

bench("twopass", ln_twopass)
bench("fast", ln_fast)
bench("flaxln", ln_flax(x))
# also: 10 LNs back-to-back inside one jit (amortizes dispatch)
def ten(x):
    for _ in range(10):
        x = ln_twopass(x)
    return x
def ten_fast(x):
    for _ in range(10):
        x = ln_fast(x)
    return x
bench("twopass_x10", ten, n=50)
bench("fast_x10", ten_fast, n=50)
