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
import os

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

    # zero out samples outside the map (detectron2 bilinear_interpolate:
    # skips only y < -1 or y > height — the boundaries themselves sample)
    inside = ((y >= -1.0) & (y <= H) & (x >= -1.0) & (x <= W))[..., None]
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


def roi_pool(feat: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
             output_size: int = 14, chunk: "int | None" = None) -> jnp.ndarray:
    """Public entry: resolves the RoI chunk size OUTSIDE the jit boundary
    (K3M_ROI_CHUNK, default 32) and passes it as a static argument, so a
    changed env var retraces instead of being silently baked into cached
    executables (a jitted function must not depend on ambient process
    state)."""
    if chunk is None:
        chunk = int(os.environ.get("K3M_ROI_CHUNK", "32"))
    return _roi_pool(feat, boxes, spatial_scale, output_size=output_size,
                     chunk=chunk)


@functools.partial(jax.jit, static_argnames=("output_size", "chunk"))
def _roi_pool(feat: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int = 14, chunk: int = 32) -> jnp.ndarray:
    """Max RoIPool, EXACT caffe/torchvision quantized semantics (the pooler
    of the reference's caffe-trained C4 head, data_prepare.py:203-209):

      x1q = round(x1*scale); x2q = round(x2*scale)
      w = max(x2q - x1q + 1, 1); bin_w = w / P
      wstart = clamp(floor(pw*bin_w) + x1q, 0, W)
      wend   = clamp(ceil((pw+1)*bin_w) + x1q, 0, W)
      out = max over the integer cells in the bin; empty bin -> 0

    Static shapes: every bin has at most K = ceil(W/P) + 2 cells per axis
    (bin extent <= bin_w + 2 <= W/P + 2), so each bin reads a fixed KxK
    cell window masked to [start, end).

    The quantized coords are integers, so floor(p*h/P) / ceil(p*h/P) are
    computed in EXACT int32 arithmetic ((p*h)//P) — the C++ does them in
    fp32, whose rounding at exact-integer boundaries is
    implementation-defined (and XLA's constant folding disagrees with
    eager on those same boundaries); the integer form is the
    real-arithmetic value both approximate."""
    H, W, C = feat.shape
    P = output_size
    # std::round is half-away-from-zero; jnp.round is half-to-even. Coords
    # are non-negative, so floor(v + 0.5) reproduces the C++ semantics.
    b = jnp.floor(boxes * spatial_scale + 0.5).astype(jnp.int32)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    p = jnp.arange(P, dtype=jnp.int32)
    # [N, P] integer bin bounds in feature coords, clamped to the map
    hstart = jnp.clip((p[None, :] * roi_h[:, None]) // P + y1[:, None], 0, H)
    hend = jnp.clip(-((-(p[None, :] + 1) * roi_h[:, None]) // P)
                    + y1[:, None], 0, H)
    wstart = jnp.clip((p[None, :] * roi_w[:, None]) // P + x1[:, None], 0, W)
    wend = jnp.clip(-((-(p[None, :] + 1) * roi_w[:, None]) // P)
                    + x1[:, None], 0, W)
    Ky = min(-(-H // P) + 2, H)
    Kx = min(-(-W // P) + 2, W)

    def per_roi(hs, he, ws, we):
        # cell index grids [P, K] + validity masks
        ky = jnp.arange(Ky, dtype=jnp.int32)
        kx = jnp.arange(Kx, dtype=jnp.int32)
        yy = hs[:, None] + ky[None, :]                    # [P, Ky]
        xx = ws[:, None] + kx[None, :]                    # [P, Kx]
        ym = yy < he[:, None]
        xm = xx < we[:, None]
        yi = jnp.clip(yy, 0, H - 1)
        xi = jnp.clip(xx, 0, W - 1)
        cells = feat[yi[:, :, None, None], xi[None, None, :, :]]  # [P,Ky,P,Kx,C]
        mask = (ym[:, :, None, None] & xm[None, None, :, :])[..., None]
        neg = jnp.asarray(-jnp.inf, feat.dtype)
        pooled = jnp.where(mask, cells, neg).max(axis=(1, 3))     # [P, P, C]
        # caffe: a bin with no cells pools to 0
        return jnp.where(jnp.isfinite(pooled), pooled, 0.0)

    # Memory bound: the windowed gather is [P*Ky*P*Kx, C] per roi (~24 MB
    # at a 38x50x1024 C4 map) — vmapping all 300 proposals at once makes a
    # ~7 GB/image intermediate the TPU AOT compiler refuses to schedule
    # (observed: f32[7056000,1024] = 4 images x 300 rois x 5880 cells
    # exceeding HBM). lax.map over fixed-size roi chunks caps the live
    # window at chunk x 24 MB with bit-identical per-roi math.
    N = boxes.shape[0]
    if chunk <= 0 or N <= chunk:
        return jax.vmap(per_roi)(hstart, hend, wstart, wend)
    pad = (-N) % chunk
    args = (hstart, hend, wstart, wend)
    if pad:
        args = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in args)
    args = tuple(a.reshape(-1, chunk, P) for a in args)
    out = jax.lax.map(lambda a: jax.vmap(per_roi)(*a), args)
    return out.reshape(-1, P, P, feat.shape[-1])[:N]
