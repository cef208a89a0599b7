"""Fused bi-directional co-attention Pallas kernel.

One kernel computes BOTH directions of the ViLBERT BertBiAttention
(reference vilbert_k3m/vilbert_k3m.py:712-838):

    ctx1 = softmax(Q2 K1^T / sqrt(d) + bias1) V1   (stream2 queries stream1)
    ctx2 = softmax(Q1 K2^T / sqrt(d) + bias2) V2   (stream1 queries stream2)

Each (batch, head) grid cell loads all six projections once into VMEM and
emits both contexts; neither score matrix ever reaches HBM, and K/V tiles
are shared between the two directions' issue slots instead of being fetched
twice as in two separate attention calls.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from k3m_tpu.kernels.attention import _dropout_mask


def _biattn_kernel(seed_ref, q1_ref, k1_ref, v1_ref, b1_ref,
                   q2_ref, k2_ref, v2_ref, b2_ref,
                   out1_ref, out2_ref, *, sm_scale: float,
                   dropout1: float, dropout2: float):
    def one_direction(q, k, v, bias, rate, salt):
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _dropout_mask(probs.shape, seed_ref, rate, salt)
            probs = probs * keep / (1.0 - rate)
        return jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    q1 = q1_ref[0, 0].astype(jnp.float32)
    k1 = k1_ref[0, 0].astype(jnp.float32)
    v1 = v1_ref[0, 0].astype(jnp.float32)
    q2 = q2_ref[0, 0].astype(jnp.float32)
    k2 = k2_ref[0, 0].astype(jnp.float32)
    v2 = v2_ref[0, 0].astype(jnp.float32)
    b1 = b1_ref[0].astype(jnp.float32)
    b2 = b2_ref[0].astype(jnp.float32)
    out1_ref[0, 0] = one_direction(q2, k1, v1, b1, dropout1, 0).astype(out1_ref.dtype)
    out2_ref[0, 0] = one_direction(q1, k2, v2, b2, dropout2, 7919).astype(out2_ref.dtype)


def _pad_len(L: int, m: int = 8) -> int:
    return ((L + m - 1) // m) * m


def padded_fused_biattention(q1, k1, v1, bias1, q2, k2, v2, bias2, seed=0, *,
                             dropout1: float = 0.0, dropout2: float = 0.0,
                             interpret: bool = False):
    """Mesh-safe wrapper (see kernels/sharding.py): under an active
    kernel mesh the bi-attention kernel is shard_mapped over 'data' (and
    'model' across heads when they divide) so GSPMD never all-gathers the
    six projections around the custom call."""
    from jax.sharding import PartitionSpec as P

    from k3m_tpu.kernels import sharding as ksh

    mesh = ksh.current_kernel_mesh()
    if mesh is not None and q1.shape[0] % ksh.batch_shards(mesh) == 0:
        B, H, L1, _ = q1.shape
        L2 = q2.shape[2]
        nm = ksh.model_shards(mesh)
        shard_heads = nm > 1 and H % nm == 0
        hax = "model" if shard_heads else None
        qspec = P("data", hax, None, None)
        bspec = P("data", None, None, None)
        axes = {"data", "model"} if shard_heads else {"data"}
        has_drop = dropout1 > 0.0 or dropout2 > 0.0

        def body(qq1, kk1, vv1, bb1, qq2, kk2, vv2, bb2, ss):
            s = ss
            if has_drop:
                s = s + jax.lax.axis_index("data") * jnp.int32(1000003)
                if shard_heads:
                    s = s + jax.lax.axis_index("model") * jnp.int32(104729)
            return _padded_fused_biattention_local(
                qq1, kk1, vv1, bb1, qq2, kk2, vv2, bb2, s,
                dropout1=dropout1, dropout2=dropout2, interpret=interpret)

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(qspec, qspec, qspec, bspec,
                      qspec, qspec, qspec, bspec, P()),
            out_specs=(qspec, qspec), axis_names=axes, check_vma=False)
        return fn(q1, k1, v1, jnp.broadcast_to(bias1, (B, 1, 1, L1)),
                  q2, k2, v2, jnp.broadcast_to(bias2, (B, 1, 1, L2)),
                  jnp.asarray(seed, jnp.int32))
    return _padded_fused_biattention_local(
        q1, k1, v1, bias1, q2, k2, v2, bias2, seed,
        dropout1=dropout1, dropout2=dropout2, interpret=interpret)


def _padded_fused_biattention_local(q1, k1, v1, bias1, q2, k2, v2, bias2,
                                    seed=0, *, dropout1: float = 0.0,
                                    dropout2: float = 0.0,
                                    interpret: bool = False):
    B, H, L1, D = q1.shape
    L2 = q2.shape[2]
    L1p, L2p = _pad_len(L1), _pad_len(L2)

    def pad_stream(q, k, v, bias, L, Lp):
        if Lp == L:
            return q, k, v, jnp.broadcast_to(bias, (B, 1, 1, L))
        padqkv = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        return (jnp.pad(q, padqkv), jnp.pad(k, padqkv), jnp.pad(v, padqkv),
                jnp.pad(jnp.broadcast_to(bias, (B, 1, 1, L)),
                        ((0, 0), (0, 0), (0, 0), (0, Lp - L)),
                        constant_values=-10000.0))

    q1, k1, v1, bias1 = pad_stream(q1, k1, v1, bias1, L1, L1p)
    q2, k2, v2, bias2 = pad_stream(q2, k2, v2, bias2, L2, L2p)
    ctx1, ctx2 = fused_biattention(q1, k1, v1, bias1, q2, k2, v2, bias2, seed,
                                   dropout1=dropout1, dropout2=dropout2,
                                   interpret=interpret)
    return ctx1[:, :, :L2, :], ctx2[:, :, :L1, :]


def _fused_biattention_call(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                            dropout1: float, dropout2: float,
                            interpret: bool):
    B, H, L1, D = q1.shape
    L2 = q2.shape[2]
    kernel = functools.partial(_biattn_kernel, sm_scale=1.0 / math.sqrt(D),
                               dropout1=dropout1, dropout2=dropout2)
    spec = lambda L: pl.BlockSpec((1, 1, L, D), lambda b, h, *_: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
    bspec = lambda L: pl.BlockSpec((1, 1, L), lambda b, h, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H),
            in_specs=[spec(L1), spec(L1), spec(L1), bspec(L1),
                      spec(L2), spec(L2), spec(L2), bspec(L2)],
            out_specs=[spec(L2), spec(L1)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, L2, D), q1.dtype),
                   jax.ShapeDtypeStruct((B, H, L1, D), q1.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (L2 * L1 + L1 * L2) * D * 2,
            bytes_accessed=4 * B * H * D * (3 * L1 + 3 * L2),
            transcendentals=2 * B * H * L1 * L2),
        interpret=interpret,
    )(seed_arr, q1, k1, v1, b1, q2, k2, v2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_biattention(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                       dropout1, dropout2, interpret):
    return _fused_biattention_call(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                                   dropout1, dropout2, interpret)


def _fused_biattention_fwd(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                           dropout1, dropout2, interpret):
    out = _fused_biattention_call(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                                  dropout1, dropout2, interpret)
    return out, (q1, k1, v1, b1, q2, k2, v2, b2, seed_arr)


def _fused_biattention_bwd(dropout1, dropout2, interpret, res, cts):
    """Each direction is one standard attention; reuse the recompute-probs
    attention backward kernel with the forward's per-direction PRNG salt."""
    from k3m_tpu.kernels.attention import _fused_attention_bwd_call

    dctx1, dctx2 = cts
    q1, k1, v1, b1, q2, k2, v2, b2, seed_arr = res
    dq2, dk1, dv1 = _fused_attention_bwd_call(
        q2, k1, v1, b1, seed_arr, dctx1, dropout1, interpret)
    dq1, dk2, dv2 = _fused_attention_bwd_call(
        q1, k2, v2, b2, seed_arr + 7919, dctx2, dropout2, interpret)
    import numpy as _np
    dseed = _np.zeros(seed_arr.shape, jax.dtypes.float0)
    return (dq1, dk1, dv1, jnp.zeros_like(b1),
            dq2, dk2, dv2, jnp.zeros_like(b2), dseed)


_fused_biattention.defvjp(_fused_biattention_fwd, _fused_biattention_bwd)


@functools.partial(jax.jit, static_argnames=("dropout1", "dropout2",
                                             "interpret"))
def fused_biattention(q1, k1, v1, bias1, q2, k2, v2, bias2, seed=0, *,
                      dropout1: float = 0.0, dropout2: float = 0.0,
                      interpret: bool = False):
    """Inputs per stream: [B,H,L?,D]; bias? broadcastable to [B,1,1,L?].
    Returns (ctx1 [B,H,L2,D], ctx2 [B,H,L1,D]). Differentiable via a
    custom VJP (recompute-probs backward, one kernel per direction)."""
    B, H, L1, D = q1.shape
    L2 = q2.shape[2]
    b1 = jnp.broadcast_to(bias1, (B, 1, 1, L1)).reshape(B, 1, L1)
    b2 = jnp.broadcast_to(bias2, (B, 1, 1, L2)).reshape(B, 1, L2)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    return _fused_biattention(q1, k1, v1, b1, q2, k2, v2, b2, seed_arr,
                              dropout1, dropout2, interpret)
