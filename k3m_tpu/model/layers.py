"""Core transformer building blocks (text + visual streams).

Parity targets in the reference (file:line = vilbert_k3m/vilbert_k3m.py):
  BertEmbeddings:335  RobertaEmbeddings:385  BertSelfAttention:411
  BertLayer:535       BertImageSelfAttention:551 (dynamic_attention :572-601)
  BertImageLayer:696  BertImageEmbeddings:2141   BertLayerNorm:311-332

TPU notes: attention is expressed as batched einsums that XLA tiles onto the
MXU; masks are additive (1-m)*-10000 exactly like the reference; LayerNorm is
eps-inside-sqrt (TF style, eps=1e-12). All shapes are static. An optional
Pallas fused-attention path is plumbed via `config.use_pallas`
(k3m_tpu/kernels/attention.py).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig

MASK_NEG = -10000.0


def compute_dtype(config: K3MConfig):
    return jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32


def act_fn(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)  # erf gelu, ref :120-125
    if name == "relu":
        return jax.nn.relu
    if name == "swish":
        return jax.nn.swish
    raise ValueError(f"unknown activation {name}")


def dense_init(std: float):
    return nn.initializers.normal(stddev=std)


class LayerNorm(nn.Module):
    """TF-style LayerNorm, eps inside the sqrt (ref :319-332). fp32 internals.

    Optional `residual` is added (in fp32) before normalizing — post-LN
    sites write `LayerNorm(...)(h, x)` for `LayerNorm(h + x)`. With
    `fused=True` on a TPU backend the whole (add +) normalize runs in the
    single-pass Pallas kernel (kernels/layernorm.py): XLA's lowering
    materializes the fp32 upcast between the stat passes (~4x the HBM
    traffic; LN fusions are ~19% of the profiled train step)."""
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, residual=None):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if self.fused:
            on_tpu = jax.default_backend() == "tpu"
            # K3M_LN_INTERPRET=1 exercises the (mesh-sharded) Pallas path in
            # interpret mode on CPU — used by the multi-device parity tests.
            if on_tpu or os.environ.get("K3M_LN_INTERPRET") == "1":
                from k3m_tpu.kernels.layernorm import fused_layernorm
                return fused_layernorm(x, scale, bias, residual, eps=self.eps,
                                       out_dtype=self.dtype,
                                       interpret=not on_tpu)
        xf = x.astype(jnp.float32)
        if residual is not None:
            xf = xf + residual.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = jnp.square(xf - u).mean(-1, keepdims=True)
        y = (xf - u) * jax.lax.rsqrt(s + self.eps)
        return (y * scale + bias).astype(self.dtype)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, L] {0,1} mask -> [B, 1, 1, L] additive bias (ref :2553-2561)."""
    return ((1.0 - mask.astype(jnp.float32)) * MASK_NEG)[:, None, None, :].astype(dtype)


def dropout(module: nn.Module, x, rate: float, deterministic: bool,
            rng_name: str = "dropout"):
    """HBM-lean stateless dropout.

    `jax.random.bernoulli` materializes a u32 random-bit tensor plus an
    fp32 uniform per element; on the profiled train step the attention-prob
    masks alone ([B, H, 256, 256] u32 generate + copy + compare) cost ~10%
    of device time. Here the mask is uint8 random bits thresholded
    in-register: 1/4 the generator traffic and a 1-byte residual. The keep
    probability is quantized to k/256 (|delta| <= 1/512 of the requested
    rate); the scale uses the exact quantized value, so E[dropout(x)] == x
    exactly, matching torch semantics up to that quantization.
    """
    if deterministic or rate <= 0.0:
        return x
    t = min(max(int(round(rate * 256.0)), 1), 255)
    keep_prob = (256 - t) / 256.0
    bits = jax.random.bits(module.make_rng(rng_name), x.shape, jnp.uint8)
    keep = bits >= jnp.uint8(t)
    return x * keep.astype(x.dtype) * x.dtype.type(1.0 / keep_prob)


def attention_core(q, k, v, bias, *, dropout_rate: float, deterministic: bool,
                   module: Optional[nn.Module] = None,
                   use_pallas: bool = False,
                   sow_probs: bool = False, sow_name: str = "attention_probs"):
    """Scaled dot-product attention over [B, L, H, D] tensors.

    With `sow_probs` (config.visualization), the post-dropout [B, H, Lq, Lk]
    attention probabilities are sown into the "intermediates" collection
    under `sow_name` — the reference's attn_data return
    (vilbert_k3m.py:466-475, post-dropout per :455-459); collect them with
    `model.apply(..., mutable=["intermediates"])` (model/visualize.py).
    Unavailable on the fused Pallas path (probs never materialize) —
    config rejects visualization+use_pallas.

    The head axis stays in position 2 end-to-end: `split_heads` is a pure
    reshape and both einsums carry (b, h) as dot batch dims directly, so no
    physical [B, H, L, D] transpose of Q/K/V/ctx is ever materialized
    (profiled at ~20 ms/step of pure copy at K3M geometry).

    Softmax runs in fp32 for numerical parity regardless of compute dtype.
    With use_pallas, runs the fused VMEM-resident kernel
    (k3m_tpu/kernels/attention.py); on CPU backends it falls back to the
    unfused path (interpret-mode PRNG dropout is unsupported).
    """
    if use_pallas:
        on_cpu = jax.default_backend() == "cpu"
        rate = 0.0 if deterministic else dropout_rate
        if not (on_cpu and rate > 0.0):
            from k3m_tpu.kernels.attention import padded_fused_attention
            seed = 0
            if rate > 0.0 and module is not None:
                seed = jax.random.randint(module.make_rng("dropout"), (),
                                          0, 2**31 - 1)
            bhld = lambda x: x.transpose(0, 2, 1, 3)
            ctx = padded_fused_attention(bhld(q), bhld(k), bhld(v), bias,
                                         seed, dropout_rate=rate,
                                         interpret=on_cpu)
            return bhld(ctx)
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    # Store the [B, H, Lq, Lk] score/prob tensors in the compute dtype:
    # under bf16 this halves the dominant HBM traffic of the long-sequence
    # (pv, Lk=256) attention — profiled at ~25% of the train step — while
    # the softmax itself still runs in fp32 registers inside the fusion
    # (the upcast below fuses into the reduction; no fp32 tensor is ever
    # materialized). In fp32 configs these casts are no-ops, so golden
    # parity vs the reference is unaffected.
    scores = scores.astype(v.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    if not deterministic and dropout_rate > 0.0 and module is not None:
        probs = dropout(module, probs, dropout_rate, deterministic=False)
    if sow_probs and module is not None:
        module.sow("intermediates", sow_name, probs)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(v.dtype)


def split_heads(x, num_heads):
    """[B, L, H*D] -> [B, L, H, D] — reshape only, no transpose."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def pack_rows(xs):
    """Tuple of [B, L_i, H] -> ([sum(B*L_i), H] rows, saved shapes).

    Streams of different sequence length share one row-major matmul: on TPU
    the Dense/FFN projections are MXU-bound by the row count M, and the
    50-token text streams alone (M=1600 at the bench microbatch) run ~3x
    below the rate the same weights reach when their rows ride along with
    the 256-token pv streams (M~19.6k packed). See TriStreamEncoder."""
    shapes = tuple(x.shape for x in xs)
    return jnp.concatenate([x.reshape(-1, x.shape[-1]) for x in xs], 0), shapes


def unpack_rows(rows, shapes):
    """Inverse of pack_rows (feature dim may differ from the packed input)."""
    outs, o = [], 0
    f = rows.shape[-1]
    for s in shapes:
        n = s[0] * s[1]
        outs.append(rows[o:o + n].reshape(s[0], s[1], f))
        o += n
    return tuple(outs)


@jax.tree_util.register_pytree_node_class
class Packed:
    """Row-packed multi-stream activations: `rows` [sum(B*L_i), H] plus the
    static per-stream shapes. Stays packed ACROSS layers (pack/unpack copies
    only at segment boundaries); shapes ride as static pytree aux data so
    nn.remat / jit treat them as structure, not tracers."""

    def __init__(self, rows, shapes):
        self.rows = rows
        self.shapes = tuple(tuple(s) for s in shapes)

    def unpack(self):
        return unpack_rows(self.rows, self.shapes)

    @classmethod
    def pack(cls, xs):
        rows, shapes = pack_rows(tuple(xs))
        return cls(rows, shapes)

    def tree_flatten(self):
        return (self.rows,), self.shapes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


class DenseParams(nn.Module):
    """Declares nn.Dense-compatible {kernel, bias} params WITHOUT running the
    matmul, so several same-input projections can share one fused matmul
    (`fused_dense`) while the param tree — and every checkpoint/converter
    path keyed on it — keeps the reference's per-projection names
    (e.g. `attention/query/kernel`)."""
    features: int
    in_features: int
    kernel_init: "nn.initializers.Initializer"

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


def fused_dense(x, params, dtype):
    """One matmul for N same-input projections.

    `params`: sequence of (kernel [K, F_i], bias [F_i]). Returns the N
    projection outputs. On TPU this turns e.g. the three [M, 768]x[768, 768]
    Q/K/V gemms of a text layer into one [M, 768]x[768, 2304] gemm: the MXU's
    ~K-deep pipeline fill and the kernel launch are paid once instead of
    three times — significant exactly where this model hurts, at small M
    (50-token streams) and K=768. Math per output column is identical to the
    unfused nn.Dense (each output element is the same independent dot)."""
    w = jnp.concatenate([k for k, _ in params], axis=1).astype(dtype)
    b = jnp.concatenate([b for _, b in params], axis=0).astype(dtype)
    y = x.astype(dtype) @ w + b
    splits = []
    off = 0
    for k, _ in params[:-1]:
        off += k.shape[1]
        splits.append(off)
    return jnp.split(y, splits, axis=-1)


def merge_heads(x):
    """[B, L, H, D] -> [B, L, H*D] — reshape only, no transpose."""
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


class BertEmbeddings(nn.Module):
    """Word + position + type embeddings, LN, dropout (ref :335-408).

    The word-embedding table is passed in by the owner (K3MTrunk) so the MLM
    decoder can be weight-tied to it (ref tie_weights :2266-2272).
    `config.model == "roberta"` offsets position ids by padding_idx+1 = 2
    (RobertaEmbeddings, ref :385-408).

    `config.task_specific_tokens` inserts a learned per-task embedding
    right after [CLS] (ref :358-381: a 20-entry table, concatenated between
    tokens 0 and 1 BEFORE LayerNorm; the inserted row gets no position or
    type embedding, exactly like the reference). Output length becomes
    L + task_ids.shape[-1] (one task token in every reference use).
    """
    config: K3MConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids, word_embedding_table, *,
                 deterministic: bool, task_ids=None):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        pos_emb = self.param("position_embeddings", init,
                             (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        type_emb = self.param("token_type_embeddings", init,
                              (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)
        seq_len = input_ids.shape[1]
        pos_ids = jnp.arange(seq_len, dtype=jnp.int32)
        if cfg.model == "roberta" and cfg.fix_reference_bugs:
            # RobertaEmbeddings passes position_ids offset by padding_idx+1=2
            # (ref :394-405), but BertEmbeddings.forward RECOMPUTES
            # position_ids = arange(seq_len) unconditionally (ref :362-367),
            # silently discarding the offset — reference roberta therefore
            # positions exactly like bert. Replicated; the intended offset
            # applies only under fix_reference_bugs.
            pos_ids = pos_ids + 2
        x = (word_embedding_table[input_ids] + pos_emb[pos_ids][None, :, :]
             + type_emb[token_type_ids])
        if cfg.task_specific_tokens:
            # ref :359-360: the 20-entry table exists whenever the flag is
            # on; ref :373-377: insert after [CLS], before LayerNorm
            task_emb = self.param("task_embeddings", init,
                                  (20, cfg.hidden_size), jnp.float32)
            if task_ids is None:
                raise ValueError(
                    "task_specific_tokens=True requires task_ids (the "
                    "reference crashes on task_ids=None too, "
                    "vilbert_k3m.py:374)")
            t = task_emb[task_ids]
            if t.ndim == 2:                      # [B] ids -> one task token
                t = t[:, None, :]
            x = jnp.concatenate([x[:, :1], t, x[:, 1:]], axis=1)
        x = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                      name="LayerNorm")(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = dropout(self, x, cfg.hidden_dropout_prob, deterministic=False)
        return x.astype(dtype)


class ImageEmbeddings(nn.Module):
    """RoI feature + 5-d location projection, LN, dropout (ref :2141-2161)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, image_feat, image_loc, *, deterministic: bool):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        x = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                     name="image_embeddings")(image_feat.astype(dtype))
        loc = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                       name="image_location_embeddings")(image_loc.astype(dtype))
        x = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                      name="LayerNorm")(x, loc)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = dropout(self, x, cfg.hidden_dropout_prob, deterministic=False)
        return x


class SelfAttention(nn.Module):
    """Multi-head self-attention with additive mask (ref BertSelfAttention:411)."""
    config: K3MConfig
    hidden_size: int
    num_heads: int
    attn_dropout: float

    @nn.compact
    def __call__(self, x, bias, *, deterministic: bool,
                 gate_q=None, gate_k=None):
        """`x` may be a single [B, L, H] stream or a `Packed` of streams
        (different L allowed, `bias` then a tuple): the Q/K/V projections
        run once over the packed rows of all streams (one MXU matmul
        instead of one per stream), attention itself per stream. Returns
        the same structure."""
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        multi = isinstance(x, Packed)
        rows = x.rows if multi else x
        biases = tuple(bias) if multi else (bias,)
        if cfg.fused_qkv:
            ps = [DenseParams(self.hidden_size, rows.shape[-1], init,
                              name=n)() for n in ("query", "key", "value")]
            q, k, v = fused_dense(rows, ps, dtype)
        else:
            q = nn.Dense(self.hidden_size, kernel_init=init, dtype=dtype, name="query")(rows)
            k = nn.Dense(self.hidden_size, kernel_init=init, dtype=dtype, name="key")(rows)
            v = nn.Dense(self.hidden_size, kernel_init=init, dtype=dtype, name="value")(rows)
        if not multi:
            qs, ks, vs = (q,), (k,), (v,)
        else:
            assert gate_q is None and gate_k is None, \
                "QK gating is single-stream (image layers)"
            qs, ks, vs = (unpack_rows(t, x.shapes) for t in (q, k, v))
        outs = []
        for qi, ki, vi, bi in zip(qs, ks, vs, biases):
            if gate_q is not None:
                qi = qi * gate_q[:, None, :]
            if gate_k is not None:
                ki = ki * gate_k[:, None, :]
            ctx = attention_core(
                split_heads(qi, self.num_heads), split_heads(ki, self.num_heads),
                split_heads(vi, self.num_heads), bi,
                dropout_rate=self.attn_dropout, deterministic=deterministic,
                module=self, use_pallas=cfg.use_pallas,
                sow_probs=cfg.visualization)
            outs.append(merge_heads(ctx))
        if multi:
            return Packed.pack(outs)
        return outs[0]


def _ffn_tail(mdl, h):
    """gelu + FFN down-projection (see the call site note in TextLayer)."""
    cfg = mdl.config
    return nn.Dense(cfg.hidden_size,
                    kernel_init=dense_init(cfg.initializer_range),
                    dtype=compute_dtype(cfg),
                    name="output")(act_fn(cfg.hidden_act)(h))


class TextLayer(nn.Module):
    """BertLayer: self-attn + output + FFN, post-LN (ref :535-548).

    `deterministic` is positional-friendly so the encoder can wrap the layer
    in nn.remat with static_argnums."""
    config: K3MConfig

    @nn.compact
    def __call__(self, x, bias, deterministic: bool = True):
        """`x`: one [B, L, H] stream or a `Packed` of streams (`bias` then a
        tuple). In Packed form every projection/FFN/LayerNorm runs once over
        the packed rows of all streams, attention per stream, and the result
        stays Packed — no per-layer pack/unpack copies; math per row is
        identical to the single-stream form."""
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        drop = cfg.hidden_dropout_prob
        multi = isinstance(x, Packed)
        x_rows = x.rows if multi else x

        attn = SelfAttention(
            cfg, cfg.hidden_size, cfg.num_attention_heads,
            cfg.attention_probs_dropout_prob,
            name="attention")(x, bias, deterministic=deterministic)
        attn = attn.rows if multi else attn
        attn = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                        name="attention_output")(attn)
        if not deterministic and drop > 0:
            attn = dropout(self, attn, drop, deterministic=False)
        attn = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="attention_LayerNorm")(attn, x_rows)

        h = nn.Dense(cfg.intermediate_size, kernel_init=init, dtype=dtype,
                     name="intermediate")(attn)
        # NOT nn.remat'd: checkpointing the gelu+down-projection to drop the
        # post-activation residual was measured on v5e to RAISE the step's
        # peak HBM (XLA's scheduler keeps both the saved pre-activation and
        # recompute buffers live) with no speed win — the dual-output matmul
        # fusions it targets are already near the chip's effective rate.
        h = _ffn_tail(self, h)
        if not deterministic and drop > 0:
            h = dropout(self, h, drop, deterministic=False)
        out = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                        name="output_LayerNorm")(h, attn)
        if multi:
            return Packed(out, x.shapes)
        return out


class ImageLayer(nn.Module):
    """BertImageLayer with optional dynamic text-conditioned QK gating
    (ref :551-709)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, x, bias, txt_embedding, txt_mask2,
                 deterministic: bool = True):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        drop = cfg.v_hidden_dropout_prob

        gate_q = gate_k = None
        if cfg.dynamic_attention and txt_embedding is not None:
            # mean-pool text by mask, sigmoid gates (ref :592-601)
            pooled = (txt_embedding * txt_mask2).sum(1) / txt_mask2.sum(1)
            gate_q = 1.0 + jax.nn.sigmoid(
                nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                         name="dyLinear_q")(pooled))
            gate_k = 1.0 + jax.nn.sigmoid(
                nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                         name="dyLinear_k")(pooled))

        attn = SelfAttention(cfg, cfg.v_hidden_size, cfg.v_num_attention_heads,
                             cfg.v_attention_probs_dropout_prob, name="attention")(
            x, bias, deterministic=deterministic, gate_q=gate_q, gate_k=gate_k)
        attn = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                        name="attention_output")(attn)
        if not deterministic and drop > 0:
            attn = dropout(self, attn, drop, deterministic=False)
        attn = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="attention_LayerNorm")(attn, x)

        h = nn.Dense(cfg.v_intermediate_size, kernel_init=init, dtype=dtype,
                     name="intermediate")(attn)
        h = act_fn(cfg.v_hidden_act)(h)
        h = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                     name="output")(h)
        if not deterministic and drop > 0:
            h = dropout(self, h, drop, deterministic=False)
        return LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="output_LayerNorm")(h, attn)
