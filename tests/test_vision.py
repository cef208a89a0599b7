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


def test_convert_caffe_weights_round_trip(tmp_path):
    """Synthetic detectron2-checkpoint round trip: build a caffe-style
    state dict shaped exactly like the published R101-C4 VG checkpoint
    (names per detectron2's STATE_DICT layout, conv [out,in,kh,kw]),
    save it as the pkl `load_caffe_pkl` expects, convert onto the real
    param tree, and verify the exact transforms leaf-by-leaf (conv
    transpose 2,3,1,0; dense transpose; FrozenBN folded to scale/bias).
    The real VG pkl cannot be fetched here (zero egress); this pins the
    full name mapping + every numeric transform against shape truth from
    `jax.eval_shape(model.init)` so a real checkpoint drops in unchanged."""
    import pickle

    from k3m_tpu.vision.frcnn import (FasterRCNN, convert_caffe_weights,
                                      load_caffe_pkl)

    model = FasterRCNN()
    img = jax.ShapeDtypeStruct((64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), img,
                            (64.0, 64.0))
    p = shapes["params"]
    rng = np.random.default_rng(7)
    sd = {}

    def conv(src, name, bias=False):
        kh, kw, ci, co = src["kernel"].shape
        sd[f"{name}.weight"] = rng.standard_normal(
            (co, ci, kh, kw)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    def bn(src, name):
        c = src["scale"].shape[0]
        sd[f"{name}.norm.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.norm.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.norm.running_mean"] = rng.standard_normal(
            c).astype(np.float32)
        sd[f"{name}.norm.running_var"] = rng.uniform(
            0.5, 1.5, c).astype(np.float32)

    def dense(src, name):
        ci, co = src["kernel"].shape
        sd[f"{name}.weight"] = rng.standard_normal((co, ci)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(co).astype(np.float32)

    bk = p["backbone"]
    conv(bk["stem_conv1"], "backbone.stem.conv1")
    bn(bk["stem_bn1"], "backbone.stem.conv1")
    for stage, nblocks in {"res2": 3, "res3": 4, "res4": 23}.items():
        for i in range(nblocks):
            blk, base = bk[stage][f"block{i}"], f"backbone.{stage}.{i}"
            for cname in ("conv1", "conv2", "conv3"):
                conv(blk[cname], f"{base}.{cname}")
                bn(blk[f"{cname}_bn"], f"{base}.{cname}")
            if i == 0:
                conv(blk["shortcut"], f"{base}.shortcut")
                bn(blk["shortcut_bn"], f"{base}.shortcut")
    for i in range(3):
        blk, base = p["roi_head"]["res5"][f"block{i}"], f"roi_heads.res5.{i}"
        for cname in ("conv1", "conv2", "conv3"):
            conv(blk[cname], f"{base}.{cname}")
            bn(blk[f"{cname}_bn"], f"{base}.{cname}")
        if i == 0:
            conv(blk["shortcut"], f"{base}.shortcut")
            bn(blk["shortcut_bn"], f"{base}.shortcut")
    conv(p["rpn"]["conv"], "proposal_generator.rpn_head.conv", bias=True)
    conv(p["rpn"]["objectness"],
         "proposal_generator.rpn_head.objectness_logits", bias=True)
    conv(p["rpn"]["anchor_deltas"],
         "proposal_generator.rpn_head.anchor_deltas", bias=True)
    dense(p["box_predictor"]["cls_score"], "roi_heads.box_predictor.cls_score")
    dense(p["box_predictor"]["bbox_pred"], "roi_heads.box_predictor.bbox_pred")

    pkl = str(tmp_path / "model_final.pkl")
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)
    loaded = load_caffe_pkl(pkl)
    assert set(loaded) == set(sd)

    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    tree = convert_caffe_weights(loaded, template)

    # every parameter leaf must have been written (nothing left at zero)
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        assert np.abs(leaf).sum() > 0, path

    out = tree["params"]
    np.testing.assert_array_equal(
        out["backbone"]["stem_conv1"]["kernel"],
        sd["backbone.stem.conv1.weight"].transpose(2, 3, 1, 0))
    g = sd["backbone.res4.22.conv2.norm.weight"]
    b = sd["backbone.res4.22.conv2.norm.bias"]
    mean = sd["backbone.res4.22.conv2.norm.running_mean"]
    var = sd["backbone.res4.22.conv2.norm.running_var"]
    scale = g / np.sqrt(var + 1e-5)
    blk = out["backbone"]["res4"]["block22"]
    np.testing.assert_allclose(blk["conv2_bn"]["scale"], scale, rtol=1e-6)
    np.testing.assert_allclose(blk["conv2_bn"]["bias"], b - mean * scale,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        out["box_predictor"]["cls_score"]["kernel"],
        sd["roi_heads.box_predictor.cls_score.weight"].T)
    np.testing.assert_array_equal(
        out["rpn"]["objectness"]["bias"],
        sd["proposal_generator.rpn_head.objectness_logits.bias"])
