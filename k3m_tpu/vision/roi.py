"""RoI feature pooling: RoIPool and RoIAlign as pure-JAX gather/bilinear
compositions (replacing detectron2's CUDA ops, used by
py-bottom-up-attention's `_shared_roi_transform`, reference
data_prepare.py:203-209).

Both operate on a single feature map [H, W, C] at a given stride and a set
of boxes [N, 4] in image coordinates, producing [N, out, out, C]. Shapes are
static; vmapped over boxes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """feat [H, W, C]; y/x arbitrary equal shapes -> [..., C]."""
    H, W, C = feat.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1, x1 = y0 + 1, x0 + 1
    wy1 = y - y0
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def get(yy, xx):
        yy = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        return feat[yy, xx]

    # zero out samples outside the map (detectron2 RoIAlign semantics)
    inside = ((y > -1.0) & (y < H) & (x > -1.0) & (x < W))[..., None]
    out = (get(y0, x0) * (wy0 * wx0)[..., None]
           + get(y0, x1) * (wy0 * wx1)[..., None]
           + get(y1, x0) * (wy1 * wx0)[..., None]
           + get(y1, x1) * (wy1 * wx1)[..., None])
    return jnp.where(inside, out, 0.0)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int = 14, sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """RoIAlign(V2 when aligned=True): feat [H,W,C], boxes [N,4] XYXY image
    coords -> [N, output_size, output_size, C]."""
    offset = 0.5 if aligned else 0.0
    b = boxes * spatial_scale - offset
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1, 1.0 if not aligned else 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1.0 if not aligned else 1e-6)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio
    # sample grid: output_size*s points per axis, centered in sub-bins
    grid = (jnp.arange(output_size * s) + 0.5) / s  # in bin units
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]   # [N, os*s]
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]

    def per_roi(yv, xv):
        yy = jnp.broadcast_to(yv[:, None], (output_size * s, output_size * s))
        xx = jnp.broadcast_to(xv[None, :], (output_size * s, output_size * s))
        samples = _bilinear_sample(feat, yy, xx)        # [os*s, os*s, C]
        C = samples.shape[-1]
        samples = samples.reshape(output_size, s, output_size, s, C)
        return samples.mean(axis=(1, 3))

    return jax.vmap(per_roi)(ys, xs)


@functools.partial(jax.jit, static_argnames=("output_size",))
def roi_pool(feat: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
             output_size: int = 14) -> jnp.ndarray:
    """Max RoIPool (caffe semantics): quantized bins, max over each bin.
    Implemented as a dense max over a fixed sample grid per bin (adequate
    for feature extraction; exact caffe quantization differs at bin edges).
    """
    b = boxes * spatial_scale
    x1 = jnp.floor(b[:, 0])
    y1 = jnp.floor(b[:, 1])
    x2 = jnp.ceil(b[:, 2])
    y2 = jnp.ceil(b[:, 3])
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    s = 4  # samples per bin axis
    grid = (jnp.arange(output_size * s) + 0.5) / (output_size * s)
    ys = y1[:, None] + grid[None, :] * roi_h[:, None]
    xs = x1[:, None] + grid[None, :] * roi_w[:, None]

    def per_roi(yv, xv):
        yy = jnp.broadcast_to(yv[:, None], (output_size * s, output_size * s))
        xx = jnp.broadcast_to(xv[None, :], (output_size * s, output_size * s))
        H, W, C = feat.shape
        yi = jnp.clip(jnp.floor(yy), 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(jnp.floor(xx), 0, W - 1).astype(jnp.int32)
        samples = feat[yi, xi]                           # nearest neighbour
        C = samples.shape[-1]
        samples = samples.reshape(output_size, s, output_size, s, C)
        return samples.max(axis=(1, 3))

    return jax.vmap(per_roi)(ys, xs)
