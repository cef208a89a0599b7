"""Model component tests: shapes, semantics, loss behaviours."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k3m_tpu.model.layers import LayerNorm, mask_to_bias
from k3m_tpu.model.fusion import gumbel_softmax_hard
from k3m_tpu.model.pretrain import (
    K3MForPretraining, cross_entropy_ignore, masked_image_loss,
)
from tests.conftest import TINY, make_pretrain_batch


def _init_and_apply(cfg, batch, **kw):
    model = K3MForPretraining(cfg)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, batch, deterministic=True))()
    out = jax.jit(lambda p: model.apply(p, batch, deterministic=True))(params)
    return model, params, out


def test_layernorm_matches_tf_style():
    x = jnp.array(np.random.default_rng(0).normal(size=(2, 5, 8)),
                  jnp.float32)
    ln = LayerNorm()
    p = ln.init(jax.random.PRNGKey(0), x)
    y = ln.apply(p, x)
    xn = np.array(x)
    u = xn.mean(-1, keepdims=True)
    s = ((xn - u) ** 2).mean(-1, keepdims=True)
    expected = (xn - u) / np.sqrt(s + 1e-12)
    np.testing.assert_allclose(np.array(y), expected, rtol=1e-5, atol=1e-5)


def test_mask_bias_values():
    m = jnp.array([[1, 1, 0]])
    b = mask_to_bias(m)
    assert b.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(np.array(b[0, 0, 0]), [0, 0, -10000.0])


def test_cross_entropy_ignore_index():
    logits = jnp.array([[[2.0, 0.0], [0.0, 2.0]]])
    labels = jnp.array([[0, -1]])
    loss = cross_entropy_ignore(logits, labels)
    expected = -np.log(np.exp(2) / (np.exp(2) + 1))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    # all-ignored -> 0, not NaN
    assert float(cross_entropy_ignore(logits, jnp.array([[-1, -1]]))) == 0.0


def test_kldiv_image_loss_zero_when_unmasked():
    cfg = TINY
    scores = jnp.array(np.random.default_rng(0).normal(size=(2, 4, cfg.v_target_size)),
                       jnp.float32)
    target = jnp.abs(jnp.array(
        np.random.default_rng(1).normal(size=(2, 4, cfg.v_target_size)),
        jnp.float32))
    label_none = jnp.full((2, 4), -1)
    assert float(masked_image_loss(cfg, scores, label_none, target)) == 0.0
    label_some = label_none.at[0, 1].set(1)
    assert float(masked_image_loss(cfg, scores, label_some, target)) > 0.0


def test_gumbel_hard_is_one_hot_straight_through():
    logits = jnp.array(np.random.default_rng(0).normal(size=(4, 6, 3, 8)),
                       jnp.float32)
    y = gumbel_softmax_hard(logits, jax.random.PRNGKey(0), axis=2)
    np.testing.assert_allclose(np.array(y.sum(axis=2)), 1.0, rtol=1e-5)
    vals = np.array(y)
    assert set(np.round(vals[np.abs(vals) > 1e-6], 5).tolist()) == {1.0}
    # gradient flows (straight-through)
    g = jax.grad(lambda l: gumbel_softmax_hard(
        l, jax.random.PRNGKey(0), axis=2).sum())(logits)
    assert float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("sampling", [0, 1, 2, 3])
def test_fusion_strategies_all_run(sampling):
    cfg = TINY.replace(if_pre_sampling=sampling)
    batch = make_pretrain_batch(cfg)
    _, _, out = _init_and_apply(cfg, batch)
    for k in ("masked_lm_loss", "masked_img_loss", "masked_lm_loss_pv",
              "next_sentence_loss_t_v_pv", "loss_struc"):
        assert np.isfinite(float(out[k])), k


def test_use_image_false_path():
    cfg = TINY.replace(use_image=False)
    batch = make_pretrain_batch(cfg)
    _, _, out = _init_and_apply(cfg, batch)
    assert float(out["masked_img_loss"]) == 0.0
    assert np.isfinite(float(out["masked_lm_loss"]))
    assert out["c_final"].shape == (3, cfg.hidden_size)


def test_visual_targets_1_and_2():
    # drivers patch v_target_size to the feature size when visual_target != 0
    # (ref pretrain.py:1351-1372)
    for vt, vts in ((1, TINY.v_feature_size), (2, TINY.v_feature_size)):
        cfg = TINY.replace(visual_target=vt, num_negative_image=6,
                           v_target_size=vts)
        batch = make_pretrain_batch(cfg)
        batch["image_target"] = np.random.default_rng(0).normal(
            size=(3, 5, vts)).astype(np.float32)
        _, _, out = _init_and_apply(cfg, batch)
        assert np.isfinite(float(out["masked_img_loss"])), vt


def test_fixed_layers_stop_gradient():
    cfg = TINY.replace(fixed_t_layer=2)
    batch = make_pretrain_batch(cfg)
    model = K3MForPretraining(cfg)
    params = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, batch, deterministic=True))()

    def loss(p):
        out = model.apply(p, batch, deterministic=True)
        return out["masked_lm_loss"] + out["masked_lm_loss_pv"]

    g = jax.jit(jax.grad(loss))(params)
    gp = g["params"]["trunk"]["encoder"]
    # layer 0/1 are before every co-attention id and frozen -> zero grads
    l0 = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(
        gp["layer_0"])))
    l3 = float(sum(jnp.abs(x).sum() for x in jax.tree.leaves(
        gp["layer_3"])))
    assert l0 == 0.0
    assert l3 > 0.0


def test_deterministic_forward_reproducible():
    cfg = TINY
    batch = make_pretrain_batch(cfg)
    model, params, out1 = _init_and_apply(cfg, batch)
    out2 = jax.jit(lambda p: model.apply(p, batch, deterministic=True))(params)
    np.testing.assert_allclose(np.array(out1["c_final"]),
                               np.array(out2["c_final"]), rtol=0, atol=0)


def test_roberta_position_offset():
    cfg = TINY.replace(model="roberta")
    batch = make_pretrain_batch(cfg)
    _, _, out = _init_and_apply(cfg, batch)
    assert np.isfinite(float(out["masked_lm_loss"]))


def test_chunked_masked_ce_matches_full(tiny_config):
    import jax
    import jax.numpy as jnp

    from k3m_tpu.model.heads import chunked_masked_ce
    from k3m_tpu.model.pretrain import cross_entropy_ignore

    rng = np.random.default_rng(3)
    B, L, D, V = 4, 37, 16, 53   # L deliberately not a multiple of the chunk
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    labels = jnp.asarray(rng.choice([-1, 1, 5, 20], size=(B, L)), jnp.int32)

    full = cross_entropy_ignore(
        jnp.einsum("bld,vd->blv", x, table) + bias, labels)
    for chunk in (8, 37, 64):
        got = chunked_masked_ce(x, table, bias, labels, chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-6, atol=1e-6)
    # gradients flow through the rematerialized scan
    g = jax.grad(lambda xx: chunked_masked_ce(xx, table, bias, labels, 8))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
