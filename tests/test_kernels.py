"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k3m_tpu.kernels.attention import (
    fused_attention, padded_fused_attention, reference_attention,
)
from k3m_tpu.kernels.coattn import padded_fused_biattention


def _mk(B=2, H=3, Lq=16, Lk=24, D=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.array(rng.normal(size=(B, H, Lq, D)), jnp.float32)
    k = jnp.array(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    v = jnp.array(rng.normal(size=(B, H, Lk, D)), jnp.float32)
    mask = np.ones((B, Lk))
    mask[:, Lk - 3:] = 0
    bias = jnp.array(((1 - mask) * -10000.0)[:, None, None, :], jnp.float32)
    return q, k, v, bias


def test_fused_attention_matches_reference():
    q, k, v, bias = _mk()
    out = fused_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    np.testing.assert_allclose(np.array(out), np.array(ref), rtol=1e-5,
                               atol=1e-5)


def test_padded_attention_odd_lengths():
    q, k, v, bias = _mk(Lq=13, Lk=37)
    out = padded_fused_attention(q, k, v, bias, interpret=True)
    ref = reference_attention(q, k, v, bias)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.array(out), np.array(ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_biattention_matches_two_references():
    q1, k1, v1, b1 = _mk(Lq=11, Lk=11, seed=1)
    q2, k2, v2, b2 = _mk(Lq=19, Lk=19, seed=2)
    ctx1, ctx2 = padded_fused_biattention(q1, k1, v1, b1, q2, k2, v2, b2,
                                          interpret=True)
    ref1 = reference_attention(q2, k1, v1, b1)   # stream2 queries stream1
    ref2 = reference_attention(q1, k2, v2, b2)
    np.testing.assert_allclose(np.array(ctx1), np.array(ref1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.array(ctx2), np.array(ref2), rtol=1e-5,
                               atol=1e-5)


def test_model_with_pallas_matches_without():
    """End-to-end: TINY model forward with use_pallas (interpret) must match
    the unfused path."""
    from k3m_tpu.model.pretrain import K3MForPretraining
    from tests.conftest import TINY, make_pretrain_batch

    batch = make_pretrain_batch(TINY)
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
            "lpm": jax.random.PRNGKey(2)}
    m0 = K3MForPretraining(TINY)
    params = m0.init(rngs, batch, deterministic=True)
    out0 = m0.apply(params, batch, deterministic=True)
    m1 = K3MForPretraining(TINY.replace(use_pallas=True))
    out1 = m1.apply(params, batch, deterministic=True)
    np.testing.assert_allclose(np.array(out0["c_final"]),
                               np.array(out1["c_final"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(out0["masked_lm_loss"]),
                               float(out1["masked_lm_loss"]), rtol=1e-4)
