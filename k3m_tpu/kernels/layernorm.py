"""Fused (residual-add +) LayerNorm Pallas kernel.

XLA's lowering of the reference TF-style LayerNorm (fp32 stats over a bf16
tensor, ref vilbert_k3m.py:311-332) materializes the fp32 upcast between the
stat passes: measured ~121-140 us per [32,256,768] application on v5e
against a ~31 us HBM-bandwidth bound, and LN-family fusions are ~19% of the
profiled train step. This kernel reads the bf16 input (and optional
residual) once, keeps every fp32 intermediate in registers, and writes bf16
once: traffic is exactly in+res+out.

Numerics match k3m_tpu.model.layers.LayerNorm: two-pass mean/centered
variance in fp32, eps inside rsqrt.

Memory: the custom VJP saves NOTHING beyond tensors that are live anyway —
residuals are (y, rstd, scale, bias); the backward reconstructs
xhat = (y - bias) / scale in-kernel. Saving the inputs instead (x AND the
residual) measured +474 MB over HBM capacity at the batch-96 bench config,
because XLA's own LN saves only their materialized sum; this formulation
saves one tensor fewer than XLA does.

dscale/dbias are accumulated across the sequential TPU grid in a
VMEM-resident [1, N] block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _ln_fwd_kernel(x_ref, res_ref, scale_ref, bias_ref, out_ref, rstd_ref,
                   *, eps):
    xf = x_ref[...].astype(jnp.float32)
    if res_ref is not None:
        xf = xf + res_ref[...].astype(jnp.float32)
    u = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - u
    s = jnp.mean(c * c, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(s + eps)
    y = c * r * scale_ref[...].astype(jnp.float32) + bias_ref[...]
    out_ref[...] = y.astype(out_ref.dtype)
    rstd_ref[...] = r


def _ln_bwd_kernel(y_ref, rstd_ref, scale_ref, bias_ref, dy_ref,
                   dx_ref, dscale_ref, dbias_ref):
    scale = scale_ref[...].astype(jnp.float32)
    # reconstruct xhat from the (live-anyway) output: y = xhat*scale + bias
    safe = jnp.where(jnp.abs(scale) < 1e-6, 1e-6, scale)
    xhat = (y_ref[...].astype(jnp.float32) - bias_ref[...]) / safe
    dy = dy_ref[...].astype(jnp.float32)
    g = dy * scale
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gxm = jnp.mean(g * xhat, axis=-1, keepdims=True)
    r = rstd_ref[...]
    dx_ref[...] = (r * (g - gm - xhat * gxm)).astype(dx_ref.dtype)
    # dscale/dbias: every grid step maps to the same [1, N] output block,
    # which stays VMEM-resident across the sequential TPU grid — init on
    # the first step, accumulate after.
    ds = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[...] = ds
        dbias_ref[...] = db

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dscale_ref[...] += ds
        dbias_ref[...] += db


def _row_spec(n, dtype_rows=BLOCK_ROWS):
    return pl.BlockSpec((dtype_rows, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(n):
    return pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _fwd_call(x, res, scale, bias, eps, out_dtype, interpret):
    R, N = x.shape
    has_res = res is not None
    specs = [_row_spec(N)] + ([_row_spec(N)] if has_res else []) \
        + [_vec_spec(N), _vec_spec(N)]
    kernel = functools.partial(
        _ln_fwd_kernel if has_res else
        (lambda x_ref, s_ref, b_ref, o_ref, r_ref, *, eps:
         _ln_fwd_kernel(x_ref, None, s_ref, b_ref, o_ref, r_ref, eps=eps)),
        eps=eps)
    args = (x, res, scale, bias) if has_res else (x, scale, bias)
    return pl.pallas_call(
        kernel,
        grid=(R // BLOCK_ROWS,),
        in_specs=specs,
        out_specs=[_row_spec(N), _row_spec(1)],
        out_shape=[jax.ShapeDtypeStruct((R, N), out_dtype),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * R * N, transcendentals=R,
            bytes_accessed=x.size * x.dtype.itemsize * (3 if has_res else 2)),
        interpret=interpret,
    )(*args)


def _bwd_call(y, rstd, scale, bias, dy, x_dtype, interpret):
    R, N = y.shape
    specs = [_row_spec(N), _row_spec(1), _vec_spec(N), _vec_spec(N),
             _row_spec(N)]
    dx, dscale, dbias = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(R // BLOCK_ROWS,),
        in_specs=specs,
        out_specs=[_row_spec(N), _vec_spec(N), _vec_spec(N)],
        out_shape=[jax.ShapeDtypeStruct((R, N), x_dtype),
                   jax.ShapeDtypeStruct((1, N), jnp.float32),
                   jax.ShapeDtypeStruct((1, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * R * N, transcendentals=0,
            bytes_accessed=y.size * y.dtype.itemsize * 3),
        interpret=interpret,
    )(y, rstd, scale, bias, dy)
    return dx, dscale[0], dbias[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_ln(x, res, scale, bias, eps, out_dtype, interpret):
    out, _ = _fwd_call(x, res, scale, bias, eps, out_dtype, interpret)
    return out


def _fused_ln_fwd(x, res, scale, bias, eps, out_dtype, interpret):
    out, rstd = _fwd_call(x, res, scale, bias, eps, out_dtype, interpret)
    # save the OUTPUT (live downstream anyway) + tiny row stats — never the
    # inputs; see module docstring for the HBM accounting. The zero-size
    # markers carry x's dtype / residual presence through the pytree.
    markers = (jnp.zeros((0,), x.dtype),
               jnp.zeros((0,)) if res is not None else None)
    return out, (out, rstd, scale, bias, markers)


def _fused_ln_bwd(eps, out_dtype, interpret, saved, dy):
    out, rstd, scale, bias, (dtype_marker, res_marker) = saved
    dx, dscale, dbias = _bwd_call(
        out, rstd, scale.reshape(1, -1),
        bias.reshape(1, -1).astype(jnp.float32), dy, dtype_marker.dtype,
        interpret)
    dres = dx if res_marker is not None else None
    return dx, dres, dscale.reshape(scale.shape), dbias.reshape(bias.shape)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def _fused_ln_local(x, residual, scale, bias, eps, out_dtype, interpret):
    """Single-device fused LN over whatever rows this device holds."""
    orig_shape = x.shape
    N = orig_shape[-1]
    R = x.size // N
    x2 = x.reshape(R, N)
    res2 = residual.reshape(R, N) if residual is not None else None
    pad = (-R) % BLOCK_ROWS
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if res2 is not None:
            res2 = jnp.pad(res2, ((0, pad), (0, 0)))
    out = _fused_ln(x2, res2, scale, bias, eps, out_dtype, interpret)
    if pad:
        out = out[:R]
    return out.reshape(orig_shape[:-1] + (N,))


def fused_layernorm(x, scale, bias, residual=None, *, eps: float = 1e-12,
                    out_dtype=None, interpret: bool = False):
    """LayerNorm((x + residual)) over the last axis. x/residual [..., N] in
    any float dtype; scale/bias [N] fp32. Returns out_dtype (default
    x.dtype) — the cast happens inside the kernel so e.g. an fp32 embedding
    sum is written back to HBM once, in bf16. Rows are padded to the kernel
    block internally; padded rows never affect real rows or parameter
    gradients (their dy is hard zero via the slice VJP, and reconstruction
    keeps their xhat finite: padded y rows are exactly `bias`).

    Mesh-safe: inside a trainer's `kernel_mesh_scope` on a >1-device mesh
    the kernel is shard_mapped over the batch ('data') axis — each device
    normalizes its local rows; dscale/dbias psums ride the existing grad
    all-reduce (see kernels/sharding.py). Falls back to this single-device
    body when no mesh is active or the batch doesn't divide."""
    from k3m_tpu.kernels import sharding as ksh

    N = x.shape[-1]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    scale2 = scale.reshape(1, N)
    bias2 = bias.reshape(1, N).astype(jnp.float32)

    mesh = ksh.current_kernel_mesh()
    if (mesh is not None and x.ndim >= 2
            and x.shape[0] % ksh.batch_shards(mesh) == 0):
        if residual is not None:
            body = lambda xx, rr, ss, bb: _fused_ln_local(
                xx, rr, ss, bb, eps, out_dtype, interpret)
            fn = ksh.shard_rows(body, mesh, n_args=2,
                                ndims=(x.ndim, x.ndim, 2, 2),
                                out_ndim=x.ndim)
            return fn(x, residual, scale2, bias2)
        body = lambda xx, ss, bb: _fused_ln_local(
            xx, None, ss, bb, eps, out_dtype, interpret)
        fn = ksh.shard_rows(body, mesh, n_args=1, ndims=(x.ndim, 2, 2),
                            out_ndim=x.ndim)
        return fn(x, scale2, bias2)
    return _fused_ln_local(x, residual, scale2, bias2, eps, out_dtype,
                           interpret)
