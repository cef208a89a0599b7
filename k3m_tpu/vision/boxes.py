"""Box utilities: anchors, delta transforms, IoU, fixed-shape NMS.

Replaces detectron2's C++/CUDA box ops (nms, box2box_transform) used via
py-bottom-up-attention (reference data_prepare.py:199-232). Everything is
static-shape: NMS is an iterative masked suppression over a fixed number of
output slots (jax.lax.fori_loop), returning indices + a validity mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def generate_anchors(feat_h: int, feat_w: int, stride: int = 16,
                     sizes=(32, 64, 128, 256, 512),
                     aspect_ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """Detectron2 DefaultAnchorGenerator grid anchors, XYXY, [H*W*A, 4]."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    cell = np.asarray(cell, np.float32)                   # [A, 4]
    shift_x = (np.arange(feat_w) * stride).astype(np.float32)
    shift_y = (np.arange(feat_h) * stride).astype(np.float32)
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    anchors = shifts[:, None, :] + cell[None, :, :]
    return anchors.reshape(-1, 4)


def apply_deltas(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 scale_clamp: float = float(np.log(1000.0 / 16))) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas: [..., 4] deltas onto [..., 4] XYXY."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, scale_clamp)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
                      pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
                     axis=-1)


def clip_boxes(boxes: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (no +1; detectron2 convention), a [N,4], b [M,4]."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
              max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes.

    Returns (indices [max_out], valid [max_out]); suppressed/exhausted
    slots are invalid. O(max_out * N) with one IoU matrix.
    """
    n = boxes.shape[0]
    iou = box_iou_xyxy(boxes, boxes)

    def body(i, carry):
        alive, order_scores, idxs, valid = carry
        best = jnp.argmax(jnp.where(alive, order_scores, -jnp.inf))
        # -inf-scored boxes (degenerate / suppressed-anchor candidates) are
        # never valid picks even while "alive"
        best_ok = alive[best] & (order_scores[best] > -jnp.inf)
        idxs = idxs.at[i].set(best)
        valid = valid.at[i].set(best_ok)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & (jnp.arange(n) != best)
        return alive, order_scores, idxs, valid

    init = (jnp.ones(n, bool), scores, jnp.zeros(max_out, jnp.int32),
            jnp.zeros(max_out, bool))
    _, _, idxs, valid = jax.lax.fori_loop(0, max_out, body, init)
    return idxs, valid


def batched_nms_fixed(boxes, scores, class_ids, iou_threshold, max_out):
    """Per-class NMS via the coordinate-offset trick (torchvision batched_nms)."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * max_coord
    return nms_fixed(boxes + offsets, scores, iou_threshold, max_out)
