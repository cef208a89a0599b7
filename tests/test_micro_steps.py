"""In-step microbatched gradient accumulation (PretrainTrainer micro_steps).

Semantics: mean of per-microbatch means — the same normalization the
reference's gradient accumulation applies (loss / accum_steps per
microbatch, train_concap_struc.py:561-575). For count-weighted masked-CE
losses that differs from the single-pass global mean only by the masked
count imbalance between microbatches (sub-percent); the alignment CE
(equal count per microbatch) matches exactly.
"""

import numpy as np
import pytest

from tests.conftest import TINY, make_pretrain_batch


def _make_trainer(cfg, batch, micro_steps):
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    from tests.conftest import single_mesh
    # 1-device mesh: micro-slicing semantics are mesh-agnostic, and the
    # default 8-virtual-device compile triples this file's wall-clock
    return PretrainTrainer(
        cfg, learning_rate=1e-3, warmup_steps=0, total_steps=10,
        sample_batch=batch, micro_steps=micro_steps, seed=7,
        mesh=single_mesh())


@pytest.mark.slow
def test_micro_matches_single_on_per_sample_losses():
    cfg = TINY.replace(hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0,
                       v_hidden_dropout_prob=0.0,
                       v_attention_probs_dropout_prob=0.0,
                       if_pre_sampling=0)
    batch = make_pretrain_batch(cfg, B=16)
    t1 = _make_trainer(cfg, batch, micro_steps=1)
    t2 = _make_trainer(cfg, batch, micro_steps=2)
    m1 = {k: float(v) for k, v in t1.train_step(batch).items()}
    m2 = {k: float(v) for k, v in t2.train_step(batch).items()}
    # Count-weighted masked CEs agree to the microbatch count imbalance
    # (reference grad-accum semantics). The alignment CE additionally sees
    # the heads' HARDCODED 0.1 dropout on pooled outputs (ref :1870), whose
    # draws differ between the single and micro rng streams — so all four
    # comparisons are tolerance-based, not exact.
    for k in ("masked_lm_loss", "masked_img_loss", "masked_lm_loss_pv",
              "next_sentence_loss_t_v_pv"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=5e-2), k
    # both steps advanced and produced finite totals
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])


@pytest.mark.slow
def test_micro_steps_trains():
    cfg = TINY
    batch = make_pretrain_batch(cfg, B=16)
    t = _make_trainer(cfg, batch, micro_steps=2)
    losses = [float(t.train_step(batch)["loss"]) for _ in range(6)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_micro_steps_rejects_inbatch_negative_configs():
    cfg = TINY.replace(visual_target=2, num_negative_image=2)
    batch = make_pretrain_batch(cfg, B=16)
    with pytest.raises(ValueError):
        _make_trainer(cfg, batch, micro_steps=2)


def test_micro_steps_batch_divisibility():
    cfg = TINY
    t = _make_trainer(cfg, make_pretrain_batch(cfg, B=16), micro_steps=3)
    with pytest.raises(ValueError):
        t.train_step(make_pretrain_batch(cfg, B=16))


def test_stage_ships_compact_image_tensors(monkeypatch):
    """Under bf16 compute the host->device batch ships image_feat as bf16
    (identical numerics — the model's first op is that cast) and, for
    visual_target=0, image_target as fp16 (KL soft labels in [0,1]; 2^-11
    relative quantization, upcast to fp32 on device at pretrain.py:141).
    K3M_EXACT_TARGETS=1 restores bit-exact fp32 labels."""
    import ml_dtypes

    cfg = TINY.replace(dtype="bfloat16", visual_target=0)
    batch = make_pretrain_batch(cfg, B=16)
    t = _make_trainer(cfg, batch, micro_steps=1)

    monkeypatch.delenv("K3M_EXACT_TARGETS", raising=False)
    staged = t._stage(dict(batch))
    assert staged["image_feat"].dtype == ml_dtypes.bfloat16
    assert staged["image_target"].dtype == np.float16
    np.testing.assert_allclose(np.asarray(staged["image_target"],
                                          np.float32),
                               batch["image_target"], rtol=2e-3, atol=1e-6)
    # the step still runs and produces a finite loss on fp16-staged labels
    m = t.train_step(batch)
    assert np.isfinite(float(m["loss"]))

    monkeypatch.setenv("K3M_EXACT_TARGETS", "1")
    exact = t._stage(dict(batch))
    assert exact["image_target"].dtype == np.float32

    # MSE targets (visual_target=1: raw features, unbounded) never cast
    cfg1 = TINY.replace(dtype="bfloat16", visual_target=1)
    batch1 = make_pretrain_batch(cfg1, B=16)
    monkeypatch.delenv("K3M_EXACT_TARGETS", raising=False)
    t1 = _make_trainer(cfg1, batch1, micro_steps=1)
    staged1 = t1._stage(dict(batch1))
    assert staged1["image_target"].dtype == np.float32
