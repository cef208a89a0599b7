"""Fused multi-head attention Pallas kernel.

Computes softmax(Q K^T / sqrt(d) + bias) V per (batch, head) grid cell with
all operands resident in VMEM — the score matrix never touches HBM. For K3M
geometry (L <= 256, head_dim 64..128) one (Lq, Lk) tile fits comfortably in
VMEM, so no flash-style streaming is needed; the win over unfused XLA is
eliminating the [B, H, Lq, Lk] HBM round-trip (e.g. 96x12x256x256 fp32 =
288 MiB per layer application in the pv pass).

In-kernel attention-prob dropout uses the TPU PRNG (seeded per grid cell)
so the kernel is usable in training too.

Caller contract: Lq/Lk already padded to multiples of 8 (fp32) with the
additive bias carrying -10000 on padded keys; padded query rows are sliced
off by the caller.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                 sm_scale: float, dropout_rate: float):
    q = q_ref[0, 0].astype(jnp.float32)            # [Lq, D]
    k = k_ref[0, 0].astype(jnp.float32)            # [Lk, D]
    v = v_ref[0, 0].astype(jnp.float32)            # [Lk, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale    # [Lq, Lk]
    scores = scores + bias_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_mask(probs.shape, seed_ref, dropout_rate)
        probs = probs * keep / (1.0 - dropout_rate)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _dropout_mask(probs_shape, seed_ref, dropout_rate: float,
                  salt: int = 0):
    """Regenerable in-kernel dropout keep-mask — the SINGLE source of the
    seeding formula; forward and backward kernels (and both co-attention
    directions, via salt) must produce bit-identical masks."""
    pltpu.prng_seed(seed_ref[0] + salt
                    + pl.program_id(0) * pl.num_programs(1)
                    + pl.program_id(1))
    bits = pltpu.prng_random_bits(probs_shape)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= dropout_rate).astype(jnp.float32)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     sm_scale: float, dropout_rate: float):
    """Recompute-probs attention backward for one (batch, head) cell."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    scores = scores + bias_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)          # [Lq, Lk]
    if dropout_rate > 0.0:
        keep = _dropout_mask(probs.shape, seed_ref, dropout_rate)
        scale = keep / (1.0 - dropout_rate)
    else:
        scale = None
    dropped = probs * scale if scale is not None else probs
    # dv = dropped^T @ do
    dv = jax.lax.dot_general(dropped, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dprobs = (do @ v^T) * dropout_scale
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if scale is not None:
        dp = dp * scale
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * sm_scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _specs(B, H, Lq, Lk, D):
    qspec = pl.BlockSpec((1, 1, Lq, D), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, Lk, D), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, Lk), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


def _fused_attention_fwd_call(q, k, v, bias_rows, seed_arr,
                              dropout_rate: float, interpret: bool):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    qspec, kspec, bspec = _specs(B, H, Lq, Lk, D)
    kernel = functools.partial(_attn_kernel, sm_scale=1.0 / math.sqrt(D),
                               dropout_rate=dropout_rate)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[qspec, kspec, kspec, bspec],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Lq * Lk * D * 2,
            bytes_accessed=(q.size + k.size + v.size) * 4 + B * Lq * Lk * 4,
            transcendentals=B * H * Lq * Lk),
        interpret=interpret,
    )(seed_arr, q, k, v, bias_rows)


def _fused_attention_bwd_call(q, k, v, bias_rows, seed_arr, do,
                              dropout_rate: float, interpret: bool):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    qspec, kspec, bspec = _specs(B, H, Lq, Lk, D)
    kernel = functools.partial(_attn_bwd_kernel, sm_scale=1.0 / math.sqrt(D),
                               dropout_rate=dropout_rate)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[qspec, kspec, kspec, bspec, qspec],
            out_specs=[qspec, kspec, kspec],
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * Lq * Lk * D * 2,
            bytes_accessed=(q.size * 3 + k.size * 2 + v.size * 2) * 4,
            transcendentals=B * H * Lq * Lk),
        interpret=interpret,
    )(seed_arr, q, k, v, bias_rows, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_attention(q, k, v, bias_rows, seed_arr, dropout_rate, interpret):
    return _fused_attention_fwd_call(q, k, v, bias_rows, seed_arr,
                                     dropout_rate, interpret)


def _fused_attention_fwd(q, k, v, bias_rows, seed_arr, dropout_rate,
                         interpret):
    out = _fused_attention_fwd_call(q, k, v, bias_rows, seed_arr,
                                    dropout_rate, interpret)
    return out, (q, k, v, bias_rows, seed_arr)


def _fused_attention_bwd(dropout_rate, interpret, res, do):
    q, k, v, bias_rows, seed_arr = res
    dq, dk, dv = _fused_attention_bwd_call(
        q, k, v, bias_rows, seed_arr, do, dropout_rate, interpret)
    import numpy as _np
    dseed = _np.zeros(seed_arr.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias_rows), dseed


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("dropout_rate", "interpret"))
def fused_attention(q, k, v, bias, seed=0, *, dropout_rate: float = 0.0,
                    interpret: bool = False):
    """q [B,H,Lq,D], k/v [B,H,Lk,D], bias broadcastable to [B,1,1,Lk]
    (additive, -10000 masked). Returns [B,H,Lq,D] in q.dtype.

    Differentiable: a custom VJP recomputes probs (and the identical
    PRNG dropout mask) in a second Pallas kernel — flash-style, nothing
    [Lq, Lk]-shaped is ever saved to HBM."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bias_rows = jnp.broadcast_to(bias, (B, 1, 1, Lk)).reshape(B, 1, Lk)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    return _fused_attention(q, k, v, bias_rows, seed_arr, dropout_rate,
                            interpret)


def _pad_len(L: int, m: int = 8) -> int:
    return ((L + m - 1) // m) * m


def padded_fused_attention(q, k, v, bias, seed=0, *, dropout_rate: float = 0.0,
                           interpret: bool = False):
    """fused_attention with automatic seq-length padding to sublane multiples;
    padded key positions get bias -10000, padded query rows are sliced off.

    Mesh-safe: inside a trainer's `kernel_mesh_scope` on a >1-device mesh
    the call is shard_mapped over the batch ('data') axis — and over the
    head ('model') axis too when heads divide, matching the column-parallel
    QKV sharding — so GSPMD never has to all-gather the operands around the
    partitioning-rule-less custom call (kernels/sharding.py). Per-shard
    dropout seeds are decorrelated by folding in the mesh coordinates."""
    from jax.sharding import PartitionSpec as P

    from k3m_tpu.kernels import sharding as ksh

    mesh = ksh.current_kernel_mesh()
    if mesh is not None and q.shape[0] % ksh.batch_shards(mesh) == 0:
        B, H, _, _ = q.shape
        Lk = k.shape[2]
        nm = ksh.model_shards(mesh)
        shard_heads = nm > 1 and H % nm == 0
        hax = "model" if shard_heads else None
        qspec = P("data", hax, None, None)
        bspec = P("data", None, None, None)
        axes = {"data", "model"} if shard_heads else {"data"}

        def body(qq, kk, vv, bb, ss):
            s = ss
            if dropout_rate > 0.0:
                s = s + jax.lax.axis_index("data") * jnp.int32(1000003)
                if shard_heads:
                    s = s + jax.lax.axis_index("model") * jnp.int32(7919)
            return _padded_fused_attention_local(
                qq, kk, vv, bb, s, dropout_rate=dropout_rate,
                interpret=interpret)

        fn = jax.shard_map(body, mesh=mesh,
                           in_specs=(qspec, qspec, qspec, bspec, P()),
                           out_specs=qspec, axis_names=axes, check_vma=False)
        return fn(q, k, v, jnp.broadcast_to(bias, (B, 1, 1, Lk)),
                  jnp.asarray(seed, jnp.int32))
    return _padded_fused_attention_local(q, k, v, bias, seed,
                                         dropout_rate=dropout_rate,
                                         interpret=interpret)


def _padded_fused_attention_local(q, k, v, bias, seed=0, *,
                                  dropout_rate: float = 0.0,
                                  interpret: bool = False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lqp, Lkp = _pad_len(Lq), _pad_len(Lk)
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))
        bias = jnp.pad(jnp.broadcast_to(bias, (B, 1, 1, Lk)),
                       ((0, 0), (0, 0), (0, 0), (0, Lkp - Lk)),
                       constant_values=-10000.0)
    out = fused_attention(q, k, v, bias, seed, dropout_rate=dropout_rate,
                          interpret=interpret)
    return out[:, :, :Lq, :]


def reference_attention(q, k, v, bias):
    """Unfused jnp reference for parity tests."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(q.shape[-1])
    scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)
