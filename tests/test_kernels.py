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


@pytest.mark.slow
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


def test_fused_attention_grads_match_reference():
    q, k, v, bias = _mk(seed=11)

    def loss_fused(q, k, v):
        return (fused_attention(q, k, v, bias, interpret=True)
                * jnp.arange(q.shape[-1])).sum()

    def loss_ref(q, k, v):
        return (reference_attention(q, k, v, bias)
                * jnp.arange(q.shape[-1])).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fused_biattention_grads_match_reference():
    rng = np.random.default_rng(12)
    B, H, L1, L2, D = 2, 2, 8, 16, 8
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q1, k1, v1 = mk(B, H, L1, D), mk(B, H, L1, D), mk(B, H, L1, D)
    q2, k2, v2 = mk(B, H, L2, D), mk(B, H, L2, D), mk(B, H, L2, D)
    b1 = jnp.zeros((B, 1, 1, L1), jnp.float32)
    b2 = jnp.zeros((B, 1, 1, L2), jnp.float32)

    def loss_fused(args):
        q1, k1, v1, q2, k2, v2 = args
        c1, c2 = padded_fused_biattention(q1, k1, v1, b1, q2, k2, v2, b2,
                                          interpret=True)
        return (c1 * 1.3).sum() + (c2 * 0.7).sum()

    def loss_ref(args):
        q1, k1, v1, q2, k2, v2 = args
        c1 = reference_attention(q2, k1, v1, b1)
        c2 = reference_attention(q1, k2, v2, b2)
        return (c1 * 1.3).sum() + (c2 * 0.7).sum()

    args = (q1, k1, v1, q2, k2, v2)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_model_train_grads_with_pallas():
    """use_pallas must be trainable: grads flow through the custom VJP and
    match the unfused model's grads (deterministic mode)."""
    from k3m_tpu.model.pretrain import K3MForPretraining
    from tests.conftest import TINY, make_pretrain_batch

    batch = {k: jnp.asarray(v) for k, v in make_pretrain_batch(TINY).items()
             if not isinstance(v, list)}
    rngs = {"params": jax.random.key(0), "gumbel": jax.random.key(1),
            "lpm": jax.random.key(2)}

    def grads(cfg):
        model = K3MForPretraining(cfg)
        params = model.init(rngs, batch, deterministic=True)

        def loss(p):
            out = model.apply(p, batch, deterministic=True,
                              rngs={"gumbel": jax.random.key(4),
                                    "lpm": jax.random.key(5)})
            return (out["masked_lm_loss"] + out["masked_lm_loss_pv"]
                    + out["masked_img_loss"] + out["loss_struc"])
        return jax.grad(loss)(params)

    g_plain = grads(TINY.replace(use_pallas=False))
    g_pallas = grads(TINY.replace(use_pallas=True))
    leaves_a, leaves_b = jax.tree.leaves(g_plain), jax.tree.leaves(g_pallas)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


# ------------------------------------------------------------ fused LayerNorm


def _ref_ln(x, scale, bias, res=None, eps=1e-12):
    xf = x.astype(jnp.float32)
    if res is not None:
        xf = xf + res.astype(jnp.float32)
    u = xf.mean(-1, keepdims=True)
    s = jnp.square(xf - u).mean(-1, keepdims=True)
    y = (xf - u) * jax.lax.rsqrt(s + eps)
    return (y * scale + bias).astype(x.dtype)


@pytest.mark.parametrize("shape,with_res", [
    ((4, 37, 768), True),    # image stream (row pad needed: 148 % 256 != 0)
    ((4, 50, 768), False),   # text stream, no residual
    ((2, 256, 1024), True),  # pv-length rows, image width
])
def test_fused_layernorm_matches_reference(shape, with_res):
    from k3m_tpu.kernels.layernorm import fused_layernorm
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 2 + 1
    res = jnp.asarray(rng.standard_normal(shape), jnp.float32) \
        if with_res else None
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    out = fused_layernorm(x, scale, bias, res, interpret=True)
    ref = _ref_ln(x, scale, bias, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_layernorm_grads_match_reference():
    from k3m_tpu.kernels.layernorm import fused_layernorm
    rng = np.random.default_rng(6)
    shape = (3, 33, 768)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    res = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_k(x, res, scale, bias):
        return (fused_layernorm(x, scale, bias, res, interpret=True) * w).sum()

    def loss_r(x, res, scale, bias):
        return (_ref_ln(x, scale, bias, res) * w).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, res, scale, bias)
    # 5e-4: the backward reconstructs xhat = (y - bias)/scale from the
    # saved OUTPUT (zero extra residual memory) — one extra f32 rounding
    # per element, amplified in the row-summed dscale
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_layernorm_out_dtype_cast():
    from k3m_tpu.kernels.layernorm import fused_layernorm
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 768)), jnp.float32)
    scale = jnp.ones((768,), jnp.float32)
    bias = jnp.zeros((768,), jnp.float32)
    out = fused_layernorm(x, scale, bias, out_dtype=jnp.bfloat16,
                          interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref_ln(x, scale, bias).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=1e-2,
                               atol=1e-2)
