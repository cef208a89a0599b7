"""Wire codec (train/wire.py): int8/uint8 H2D quantization.

Covers the encode/decode error bounds and that a trainer running with
wire="int8" produces the same first-step loss as fp32 wire within the
quantization noise floor (the codec's whole claim is that its error sits
inside the compute-dtype noise; ref boundary this optimizes:
train_concap_struc.py:472-475 H2D loop)."""

import numpy as np
import pytest

from k3m_tpu.train import wire
from tests.conftest import NANO, make_nano_batch, single_mesh


def test_feat_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7, 64)).astype(np.float32) * 13.0
    q, s = wire.encode_feat(x)
    assert q.dtype == np.int8 and s.shape == (4, 7)
    xhat = q.astype(np.float32) * s[..., None]
    # symmetric int8: |err| <= s/2 = rowmax/254 per element
    assert np.all(np.abs(xhat - x) <= s[..., None] * 0.5 + 1e-7)


def test_probs_roundtrip_error_bound_and_renorm():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    raw = rng.random((5, 6, 33)).astype(np.float32)
    p = raw / raw.sum(-1, keepdims=True)
    q, s = wire.encode_probs(p)
    assert q.dtype == np.uint8
    phat = np.asarray(wire.decode(
        {wire.TGT_Q: jnp.asarray(q), wire.TGT_S: jnp.asarray(s)},
        jnp.float32)["image_target"])
    np.testing.assert_allclose(phat.sum(-1), 1.0, atol=1e-6)
    assert np.abs(phat - p).max() <= s.max()  # ~rowmax/510 + renorm shift


def test_zero_rows_are_safe():
    q, s = wire.encode_feat(np.zeros((2, 3, 8), np.float32))
    assert np.all(q == 0) and np.all(s > 0)
    q, s = wire.encode_probs(np.zeros((2, 3, 8), np.float32))
    assert np.all(q == 0) and np.all(s > 0)


def test_wire_mode_validation():
    assert wire.wire_mode(None) in ("fp", "int8", "exact")
    with pytest.raises(ValueError):
        wire.wire_mode("float8")


def test_pretrain_step_int8_wire_matches_exact():
    """Same seed/batch, wire=exact vs wire=int8: first-step losses agree
    within the quantization noise floor; the decoded step runs end-to-end
    (encode on host in _stage, decode traced into the jitted step)."""
    import jax

    from k3m_tpu.train.pretrain_loop import PretrainTrainer

    batch = make_nano_batch(B=4)
    # make image_target realistic probability rows (visual_target=0 soft
    # labels), the tensor the uint8 path quantizes
    t = batch["image_target"]
    batch["image_target"] = t / t.sum(-1, keepdims=True)

    losses = {}
    for mode in ("exact", "int8"):
        tr = PretrainTrainer(NANO, learning_rate=1e-4, warmup_steps=2,
                             total_steps=10, sample_batch=batch, seed=7,
                             mesh=single_mesh(), wire=mode)
        m = tr.train_step(batch)
        losses[mode] = float(jax.device_get(m["loss"]))
        staged = tr._stage(dict(batch))
        if mode == "int8":
            assert "image_feat_q" in staged and "image_target_q" in staged
            assert "image_feat" not in staged
            # the whole point: ~4x on the two quantized tensors (int8 feat
            # + uint8 target + fp32 per-row scales). NANO's feature dims
            # are tiny so compare the tensors themselves, not the batch
            # (in the real geometry they are ~95% of the wire).
            fp = batch["image_feat"].nbytes + batch["image_target"].nbytes
            q = sum(np.asarray(staged[k]).nbytes for k in
                    ("image_feat_q", "image_feat_s",
                     "image_target_q", "image_target_s"))
            assert q < 0.45 * fp, (q, fp)
    assert np.isfinite(losses["int8"])
    np.testing.assert_allclose(losses["int8"], losses["exact"], rtol=2e-2)


def test_alignment_eval_int8_wire_matches_fp32():
    from k3m_tpu.train.alignment_loop import AlignmentTrainer, device_item

    cfg = NANO.replace(loss_type="ce")
    i1 = device_item(make_nano_batch(B=4, seed=1))
    i2 = device_item(make_nano_batch(B=4, seed=2))
    batch = dict(label=(np.arange(4) % 2).astype(np.int32), item1=i1,
                 item2=i2)
    probs = {}
    for mode in ("exact", "int8"):
        tr = AlignmentTrainer(cfg, learning_rate=5e-5, warmup_steps=2,
                              total_steps=10, sample_batch=batch, seed=7,
                              mesh=single_mesh(), wire=mode)
        _, _, p, loss = tr.eval_step(batch)
        probs[mode] = np.asarray(p)
        assert np.isfinite(float(loss))
    np.testing.assert_allclose(probs["int8"], probs["exact"], atol=5e-3)
