"""Numerical ground truth for the vision ops: slow numpy oracles that
transcribe detectron2/torchvision's published algorithms literally
(loop-per-sample), randomized-compared against the static-shape JAX ops.

Oracle provenance (transcribed, not imported — torchvision is absent here):
  * roi_align  — detectron2 ROIAlign aligned=True forward
                 (csrc/ROIAlign/ROIAlign_cpu.cpp: bilinear_interpolate +
                 the (iy+.5)/ratio sample grid), used by reference
                 data_prepare.py:203-209 via _shared_roi_transform.
  * roi_pool   — torchvision/caffe quantized max RoIPool
                 (csrc/ROIPool/ROIPool_cpu.cpp: round()ed coords, +1
                 inclusive width, floor/ceil bin edges, empty bin -> 0).
  * nms        — torchvision greedy nms; batched via the coordinate-offset
                 trick (fast_rcnn_inference_single_image's batched_nms,
                 reference data_prepare.py:226-232).
  * apply_deltas — detectron2 Box2BoxTransform.apply_deltas (weights +
                 scale_clamp), reference FastRCNNOutputs.predict_boxes.
  * resize_shortest_edge — detectron2 ResizeShortestEdge.get_transform's
                 output-size arithmetic (2_generate_tsv_ali.py:88-92
                 preprocessing).
"""

import numpy as np
import pytest

from k3m_tpu.vision import boxes as box_lib
from k3m_tpu.vision.roi import roi_align, roi_pool

# ----------------------------------------------------------------- oracles


def oracle_bilinear(feat, y, x):
    """detectron2 bilinear_interpolate (ROIAlign_cpu.cpp)."""
    H, W, C = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(C, feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= H - 1:
        y_high = y_low = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_high = x_low = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def oracle_roi_align(feat, boxes, scale, P, ratio):
    """detectron2 ROIAlignV2 (aligned=True) forward."""
    N = boxes.shape[0]
    C = feat.shape[2]
    out = np.zeros((N, P, P, C), np.float32)
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale - 0.5
        roi_w = max(x2 - x1, 1e-6)  # aligned: no max-with-1
        roi_h = max(y2 - y1, 1e-6)
        bin_w, bin_h = roi_w / P, roi_h / P
        for ph in range(P):
            for pw in range(P):
                acc = np.zeros(C, np.float32)
                for iy in range(ratio):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / ratio
                    for ix in range(ratio):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / ratio
                        acc += oracle_bilinear(feat, yy, xx)
                out[n, ph, pw] = acc / (ratio * ratio)
    return out


def oracle_roi_pool(feat, boxes, scale, P):
    """torchvision ROIPool_cpu.cpp (caffe quantized max pool)."""
    H, W, C = feat.shape
    N = boxes.shape[0]
    out = np.zeros((N, P, P, C), np.float32)
    for n in range(N):
        # std::round (half away from zero; coords non-negative -> half-up)
        x1 = int(np.floor(boxes[n, 0] * scale + 0.5))
        y1 = int(np.floor(boxes[n, 1] * scale + 0.5))
        x2 = int(np.floor(boxes[n, 2] * scale + 0.5))
        y2 = int(np.floor(boxes[n, 3] * scale + 0.5))
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        # exact integer floor/ceil of p*extent/P (the real-arithmetic value
        # the C++'s fp32 bin arithmetic approximates; see roi.py roi_pool)
        for ph in range(P):
            hs = min(max(ph * roi_h // P + y1, 0), H)
            he = min(max(-((-(ph + 1) * roi_h) // P) + y1, 0), H)
            for pw in range(P):
                ws = min(max(pw * roi_w // P + x1, 0), W)
                we = min(max(-((-(pw + 1) * roi_w) // P) + x1, 0), W)
                if he <= hs or we <= ws:
                    continue  # empty bin -> 0
                out[n, ph, pw] = feat[hs:he, ws:we].reshape(-1, C).max(0)
    return out


def oracle_nms(boxes, scores, thresh):
    """torchvision greedy nms: returns kept indices, score-descending."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        union = areas[i] + areas - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)


def oracle_apply_deltas(deltas, boxes, weights, scale_clamp):
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, scale_clamp)
    dh = np.minimum(deltas[:, 3] / wh, scale_clamp)
    pcx, pcy = dx * widths + ctr_x, dy * heights + ctr_y
    pw, ph = np.exp(dw) * widths, np.exp(dh) * heights
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def oracle_resize_shape(h, w, size, max_size):
    """detectron2 ResizeShortestEdge.get_transform output size."""
    scale = size * 1.0 / min(h, w)
    if h < w:
        newh, neww = size, scale * w
    else:
        newh, neww = scale * h, size
    if max(newh, neww) > max_size:
        scale = max_size * 1.0 / max(newh, neww)
        newh = newh * scale
        neww = neww * scale
    return int(newh + 0.5), int(neww + 0.5)


# ------------------------------------------------------------------- tests


def random_boxes(rng, n, h, w, min_size=2.0):
    x1 = rng.uniform(0, w - min_size, n)
    y1 = rng.uniform(0, h - min_size, n)
    x2 = np.minimum(x1 + rng.uniform(min_size, w / 2, n), w)
    y2 = np.minimum(y1 + rng.uniform(min_size, h / 2, n), h)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roi_align_matches_detectron2_oracle(seed):
    rng = np.random.default_rng(seed)
    H, W, C, P, ratio = 17, 23, 5, 7, 2
    scale = 1.0 / 16
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    boxes = random_boxes(rng, 12, H / scale, W / scale, min_size=8.0)
    got = np.asarray(roi_align(feat, boxes, scale, output_size=P,
                               sampling_ratio=ratio))
    want = oracle_roi_align(feat, boxes, scale, P, ratio)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roi_pool_matches_caffe_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    H, W, C, P = 31, 43, 4, 14
    scale = 1.0 / 16
    feat = rng.standard_normal((H, W, C)).astype(np.float32)
    boxes = random_boxes(rng, 16, H / scale, W / scale, min_size=4.0)
    # include degenerate tiny + full-image boxes (quantization edge cases)
    boxes[0] = [3.0, 5.0, 3.5, 5.5]
    boxes[1] = [0.0, 0.0, W / scale, H / scale]
    got = np.asarray(roi_pool(feat, boxes, scale, output_size=P))
    want = oracle_roi_pool(feat, boxes, scale, P)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("seed,thresh", [(0, 0.5), (1, 0.7), (2, 0.3)])
def test_nms_fixed_matches_greedy_oracle(seed, thresh):
    rng = np.random.default_rng(200 + seed)
    n = 80
    boxes = random_boxes(rng, n, 200, 200, min_size=10.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    idx, valid = box_lib.nms_fixed(boxes, scores, thresh, max_out=n)
    got = np.asarray(idx)[np.asarray(valid)]
    want = oracle_nms(boxes, scores, thresh)
    np.testing.assert_array_equal(got, want)


def test_batched_nms_respects_classes():
    """Boxes of different classes never suppress each other; same class at
    high overlap does (the offset trick vs a per-class oracle run)."""
    rng = np.random.default_rng(7)
    n = 60
    boxes = random_boxes(rng, n, 100, 100, min_size=20.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    cls = rng.integers(0, 4, n)
    idx, valid = box_lib.batched_nms_fixed(boxes, scores, cls, 0.5, n)
    got = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    want = []
    for c in range(4):
        members = np.where(cls == c)[0]
        kept = oracle_nms(boxes[members], scores[members], 0.5)
        want.extend(members[kept].tolist())
    assert got == sorted(want)


def test_apply_deltas_matches_oracle():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 50, 600, 800, min_size=5.0)
    deltas = rng.standard_normal((50, 4)).astype(np.float32) * 2.0
    for weights in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        got = np.asarray(box_lib.apply_deltas(deltas, boxes, weights=weights))
        want = oracle_apply_deltas(deltas, boxes, weights,
                                   float(np.log(1000.0 / 16)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_resize_shortest_edge_shape_matches_detectron2():
    from k3m_tpu.vision.frcnn import resize_shortest_edge
    rng = np.random.default_rng(5)
    sizes = [(480, 640), (640, 480), (600, 600), (333, 500), (1080, 1920),
             (150, 3000), (601, 1001), (599, 1000)]
    sizes += [tuple(rng.integers(100, 2000, 2)) for _ in range(30)]
    for h, w in sizes:
        img = np.zeros((h, w, 3), np.uint8)
        out = resize_shortest_edge(img, 600, 1000)
        want = oracle_resize_shape(h, w, 600, 1000)
        assert out.shape[:2] == want, (h, w, out.shape[:2], want)


def test_roi_align_boundary_samples_not_zeroed():
    """Sample points exactly at y == -1 or y == H must interpolate (clamped),
    not zero out — detectron2 skips only strictly-outside points."""
    feat = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    # box chosen so with scale 1 and aligned offset, first sample row < 0
    boxes = np.array([[0.0, 0.0, 4.0, 3.0]], np.float32)
    got = np.asarray(roi_align(feat, boxes, 1.0, output_size=3,
                               sampling_ratio=2))
    want = oracle_roi_align(feat, boxes, 1.0, 3, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
