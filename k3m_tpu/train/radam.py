"""Rectified Adam (RAdam) as an optax gradient transformation.

Parity target: reference `vilbert_k3m/optimization.py` RAdam:16 /
PlainRAdam:103 (vestigial in the reference — never constructed by the live
drivers — but part of its component inventory). Both reference classes
compute the same update; RAdam only memoizes the per-step rectification
scalars, which we compute inline (cheap, jit-constant-folded).

Reference semantics preserved exactly:
  * second-moment update BEFORE first-moment update (irrelevant to math,
    noted for readers diffing against the torch code)
  * N_sma_max = 2/(1-b2) - 1; N_sma = N_sma_max - 2*t*b2^t/(1-b2^t)
  * t with N_sma >= 5: rectified Adam step
        lr * sqrt((1-b2^t)(N_sma-4)/(N_sma_max-4)*(N_sma-2)/N_sma
                  * N_sma_max/(N_sma_max-2)) / (1-b1^t)
    and denom = sqrt(v_t) + eps  (NO bias correction on v beyond the
    sqrt(1-b2^t) folded into step_size — matches optimization.py:73-83,94)
  * t with N_sma < 5: un-adapted SGD-with-momentum step lr*m_t/(1-b1^t)
    (optimization.py:84-85,96)
  * decoupled weight decay p -= wd * lr * p applied BEFORE the update
    (optimization.py:88-89) — note: raw lr, not step_size
"""

from __future__ import annotations

from typing import NamedTuple, Union

import chex
import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: chex.Array  # int32 step counter (t-1 before increment)
    mu: optax.Updates
    nu: optax.Updates


def radam(learning_rate: Union[float, optax.Schedule] = 1e-3,
          b1: float = 0.9,
          b2: float = 0.999,
          eps: float = 1e-8,
          weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Reference-parity RAdam. Returns updates to ADD to params
    (optax convention: params + updates), i.e. already negated."""

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if weight_decay != 0.0 and params is None:
            raise ValueError("radam with weight_decay needs params")
        t = state.count + 1
        tf = t.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        beta2_t = jnp.power(b2, tf)
        bias1 = 1.0 - jnp.power(b1, tf)
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * tf * beta2_t / (1.0 - beta2_t)
        lr = lr_at(state.count)
        rect = jnp.sqrt(
            (1.0 - beta2_t)
            * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma
            * n_sma_max / (n_sma_max - 2.0))
        step_adapt = lr * rect / bias1       # N_sma >= 5 branch
        step_plain = lr / bias1              # N_sma < 5 branch
        use_adapt = n_sma >= 5.0

        def upd(m, v, p):
            adapt = step_adapt * m / (jnp.sqrt(v) + eps)
            plain = step_plain * m
            out = -jnp.where(use_adapt, adapt, plain)
            if weight_decay != 0.0:
                out = out - weight_decay * lr * p
            return out.astype(m.dtype)

        if params is None:
            new_updates = jax.tree.map(
                lambda m, v: -jnp.where(use_adapt,
                                        step_adapt * m / (jnp.sqrt(v) + eps),
                                        step_plain * m), mu, nu)
        else:
            new_updates = jax.tree.map(upd, mu, nu, params)
        return new_updates, RAdamState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
