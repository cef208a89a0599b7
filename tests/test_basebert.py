"""Smoke + shape tests for the single-stream baseline
(k3m_tpu/model/basebert.py, reference vilbert_k3m/basebert.py:659-978)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.basebert import (BaseBertForPretraining,
                                    BaseBertForVLTasks, SingleStreamModel)


@pytest.fixture(scope="module")
def cfg():
    # single-stream requires v_hidden_size == hidden_size
    return K3MConfig(
        vocab_size=120, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        v_feature_size=12, v_target_size=9, v_hidden_size=24,
        v_num_attention_heads=4, v_intermediate_size=48,
        bi_hidden_size=16, bi_num_attention_heads=4,
        v_biattention_id=(0,), t_biattention_id=(1,),
        max_position_embeddings=64)


def _inputs(cfg, B=2, Lt=7, Lv=5):
    rng = np.random.default_rng(0)
    return dict(
        input_ids=jnp.asarray(rng.integers(1, cfg.vocab_size, (B, Lt)), jnp.int32),
        image_feat=jnp.asarray(rng.normal(size=(B, Lv, cfg.v_feature_size)),
                               jnp.float32),
        image_loc=jnp.asarray(rng.normal(size=(B, Lv, 5)), jnp.float32),
    )


def test_single_stream_shapes(cfg):
    x = _inputs(cfg)
    model = SingleStreamModel(cfg)
    params = model.init(jax.random.key(0), **x)
    seq, pooled, table = model.apply(params, **x)
    assert seq.shape == (2, 7 + 5, cfg.hidden_size)
    assert pooled.shape == (2, cfg.hidden_size)
    assert table.shape == (cfg.vocab_size, cfg.hidden_size)


def test_pretraining_losses(cfg):
    B, Lt, Lv = 2, 7, 5
    rng = np.random.default_rng(1)
    x = _inputs(cfg, B, Lt, Lv)
    tgt = rng.random((B, Lv - 1, cfg.v_target_size)).astype(np.float32)
    tgt /= tgt.sum(-1, keepdims=True)
    kwargs = dict(
        x,
        image_target=jnp.asarray(tgt),
        masked_lm_labels=jnp.asarray(
            rng.choice([-1, 3, 7], (B, Lt)), jnp.int32),
        image_label=jnp.asarray(rng.choice([-1, 1], (B, Lv - 1)), jnp.int32),
        next_sentence_label=jnp.zeros((B,), jnp.int32),
    )
    model = BaseBertForPretraining(cfg)
    params = model.init(jax.random.key(0), **kwargs)
    lm, img, nsp = jax.jit(
        lambda p, kw: model.apply(p, **kw))(params, kwargs)
    for loss in (lm, img, nsp):
        assert np.isfinite(float(loss))
    assert float(lm) > 0 and float(nsp) > 0

    # grads flow
    def total(p):
        a, b, c = model.apply(p, **kwargs)
        return a + b + c
    g = jax.grad(total)(params)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_vl_tasks_heads(cfg):
    x = _inputs(cfg)
    model = BaseBertForVLTasks(cfg, num_labels=11)
    params = model.init(jax.random.key(0), **x)
    out = model.apply(params, **x)
    (vil_pred, vil_logit, vil_binary, vision_pred, vision_logit,
     ling_pred, ling_logit) = out
    assert vil_pred.shape == (2, 11)
    assert vil_logit.shape == (2, 1)
    assert vil_binary.shape == (2, 2)
    assert vision_pred.shape == (2, 5, cfg.v_target_size)
    assert vision_logit.shape == (2, 5, 1)
    assert ling_pred.shape == (2, 7, cfg.vocab_size)
    assert ling_logit.shape == (2, 7, 1)
