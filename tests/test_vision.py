"""Vision ops tests: anchors, box transforms, NMS, RoI pooling, and a tiny
end-to-end Faster R-CNN forward (random weights, shape/semantics only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k3m_tpu.vision import boxes as box_lib
from k3m_tpu.vision.roi import roi_align, roi_pool


def test_generate_anchors():
    a = box_lib.generate_anchors(2, 3, stride=16, sizes=(32,),
                                 aspect_ratios=(1.0,))
    assert a.shape == (6, 1 * 4)[0:1] + (4,)
    # first anchor centered at (0,0), 32x32
    np.testing.assert_allclose(a[0], [-16, -16, 16, 16])
    # second cell shifted by stride in x
    np.testing.assert_allclose(a[1], [0, -16, 32, 16])


def test_apply_deltas_identity_and_shift():
    boxes = jnp.array([[0.0, 0.0, 10.0, 20.0]])
    deltas = jnp.zeros((1, 4))
    out = box_lib.apply_deltas(deltas, boxes)
    np.testing.assert_allclose(np.array(out), np.array(boxes), atol=1e-5)
    # dx = 0.1 -> center moves by 0.1 * width = 1
    out = box_lib.apply_deltas(jnp.array([[0.1, 0.0, 0.0, 0.0]]), boxes)
    np.testing.assert_allclose(np.array(out[0]), [1, 0, 11, 20], atol=1e-4)


def test_nms_fixed_suppresses_overlaps():
    boxes = jnp.array([
        [0, 0, 10, 10], [1, 1, 11, 11],     # overlapping pair
        [50, 50, 60, 60],                    # separate
    ], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, valid = box_lib.nms_fixed(boxes, scores, 0.5, 3)
    kept = set(np.array(idx)[np.array(valid)].tolist())
    assert kept == {0, 2}
    # higher threshold keeps all three
    idx, valid = box_lib.nms_fixed(boxes, scores, 0.95, 3)
    assert int(np.array(valid).sum()) == 3


def test_batched_nms_keeps_cross_class_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    same, valid_same = box_lib.batched_nms_fixed(
        boxes, scores, jnp.array([0, 0]), 0.5, 2)
    diff, valid_diff = box_lib.batched_nms_fixed(
        boxes, scores, jnp.array([0, 1]), 0.5, 2)
    assert int(np.array(valid_same).sum()) == 1
    assert int(np.array(valid_diff).sum()) == 2


def test_roi_align_constant_map():
    feat = jnp.ones((16, 16, 3)) * 5.0
    boxes = jnp.array([[8.0, 8.0, 64.0, 64.0]])  # image coords, scale 1/8
    out = roi_align(feat, boxes, spatial_scale=1.0 / 8, output_size=7)
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.array(out), 5.0, rtol=1e-5)


def test_roi_align_gradient_varies_with_position():
    # a linear ramp in x should pool to increasing bin means
    x = jnp.arange(16, dtype=jnp.float32)
    feat = jnp.broadcast_to(x[None, :, None], (16, 16, 1))
    boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
    out = np.array(roi_align(feat, boxes, 1.0, output_size=4))[0, 0, :, 0]
    assert np.all(np.diff(out) > 0)


def test_roi_pool_max_semantics():
    feat = jnp.zeros((8, 8, 1)).at[2, 2, 0].set(9.0)
    boxes = jnp.array([[0.0, 0.0, 8.0, 8.0]])
    out = np.array(roi_pool(feat, boxes, 1.0, output_size=2))
    assert out.max() == 9.0


@pytest.mark.slow
def test_frcnn_tiny_forward():
    from k3m_tpu.vision.frcnn import FasterRCNN

    model = FasterRCNN(num_classes=7)
    img = jnp.array(np.random.default_rng(0).normal(size=(64, 64, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, (64.0, 64.0))
    out = model.apply(params, img, (64.0, 64.0))
    assert out["features"].shape == (300, 2048)
    assert out["probs"].shape == (300, 8)
    assert out["boxes"].shape == (300, 7, 4)
    assert np.isfinite(np.array(out["features"])).all()
    np.testing.assert_allclose(np.array(out["probs"]).sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_batched_extractor_matches_single_image_path():
    """BatchedExtractor on an exact-canvas image must reproduce the
    per-image extract_rois result; a padded (smaller) image must still
    produce a well-formed detection dict with boxes inside the raw image."""
    from k3m_tpu.vision.frcnn import (BatchedExtractor, FasterRCNN,
                                      extract_rois)

    rng = np.random.default_rng(1)
    model = FasterRCNN(num_classes=7)
    img_exact = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    img_small = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((64, 64, 3), jnp.float32), (64.0, 64.0))

    single = extract_rois(model, params, img_exact, min_size=64, max_size=64)
    bx = BatchedExtractor(model, params, batch_size=2, bucket=64,
                          min_size=64, max_size=64)
    batched = bx.extract_many([img_exact, img_small, None])
    assert len(batched) == 3 and batched[2] is None

    b0 = batched[0]
    if single is None:
        assert b0 is None
    else:
        assert b0 is not None
        assert b0["num_boxes"] == single["num_boxes"]
        np.testing.assert_allclose(b0["boxes"], single["boxes"],
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(b0["features"], single["features"],
                                   rtol=1e-3, atol=1e-2)
    b1 = batched[1]
    if b1 is not None:
        assert b1["image_h"] == 48 and b1["image_w"] == 64
        assert (b1["boxes"][:, 3] <= 48 + 1e-3).all()
        assert (b1["boxes"][:, 2] <= 64 + 1e-3).all()
