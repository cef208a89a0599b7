"""In-step microbatching for the item-alignment trainer.

Guarantee under test (AlignmentTrainer micro_steps, mirroring
PretrainTrainer's lever): with all stochasticity removed (dropout 0,
fusion strategy 0 so no gumbel draws), grads averaged over M microbatch
slices equal the full-batch grads — all three loss types are per-pair
means, so mean-of-microbatch-means == full-batch mean. Pins loss equality
per step and parameter closeness after steps, plus the probs output
keeping its (B, ...) API shape.
"""

import numpy as np

import jax
import pytest

from tests.conftest import TINY, make_pretrain_batch

pytestmark = pytest.mark.slow  # 5 distinct twin-tower compiles


def _det_cfg(loss_type):
    return TINY.replace(
        loss_type=loss_type, if_pre_sampling=0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)


def _make_pair_batch(cfg, B=8):
    from k3m_tpu.train.alignment_loop import device_item
    i1 = device_item(make_pretrain_batch(cfg, B=B, seed=1))
    i2 = device_item(make_pretrain_batch(cfg, B=B, seed=2))
    label = (np.arange(B) % 2).astype(np.int32)
    return dict(label=label, item1=i1, item2=i2)


def _vec(tree):
    return np.concatenate([np.asarray(x, np.float32).ravel()
                           for x in jax.tree.leaves(tree)])


def _trainer(cfg, batch, **kw):
    from k3m_tpu.train.alignment_loop import AlignmentTrainer
    return AlignmentTrainer(cfg, learning_rate=1e-3, total_steps=10,
                            seed=7, sample_batch=batch, **kw)


def test_micro_equals_full_batch_ce():
    cfg = _det_cfg("ce")
    batch = _make_pair_batch(cfg, B=8)
    t1 = _trainer(cfg, batch, micro_steps=1)
    t2 = _trainer(cfg, batch, micro_steps=2)
    for step in range(2):
        l1, p1 = t1.train_step(batch)
        l2, p2 = t2.train_step(batch)
        np.testing.assert_allclose(
            jax.device_get(l1), jax.device_get(l2), rtol=2e-5,
            err_msg=f"step {step}")
        # probs keep the full-batch API shape and per-pair values
        p1, p2 = jax.device_get(p1), jax.device_get(p2)
        assert p1.shape == p2.shape
        np.testing.assert_allclose(p1, p2, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(_vec(t1.state.params), _vec(t2.state.params),
                               rtol=1e-4, atol=1e-6)


def test_micro_unroll_matches_scan_inner():
    cfg = _det_cfg("inner")
    batch = _make_pair_batch(cfg, B=8)
    ts = _trainer(cfg, batch, micro_steps=4)
    tu = _trainer(cfg, batch, micro_steps=4, micro_unroll=True)
    ls, ps = ts.train_step(batch)
    lu, pu = tu.train_step(batch)
    np.testing.assert_allclose(jax.device_get(ls), jax.device_get(lu),
                               rtol=2e-5)
    np.testing.assert_allclose(jax.device_get(ps), jax.device_get(pu),
                               rtol=2e-4, atol=2e-6)


def test_micro_rejects_indivisible_batch():
    cfg = _det_cfg("cosine")
    batch = _make_pair_batch(cfg, B=8)
    t = _trainer(cfg, batch, micro_steps=3)
    try:
        t.train_step(batch)
    except ValueError as e:
        assert "micro_steps" in str(e)
    else:
        raise AssertionError("expected ValueError for 8 % 3")
