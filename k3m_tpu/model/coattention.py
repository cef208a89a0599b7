"""ViLBERT-style bi-directional co-attention (cross-stream) layers.

Parity targets (vilbert_k3m/vilbert_k3m.py):
  BertBiAttention:712            (v-stream <-> t-stream, bi_hidden_size heads)
  BertBiAttention_two_text:841   (t <-> pv, hidden_size heads)
  BertBiOutput:968 / BertBiOutput_two_txt:999
  BertConnectionLayer:1030 / BertConnectionLayer_two_text:1074

Stream-1 queries attend stream-2 keys/values and vice versa; each stream then
runs its own FFN with post-LN residuals. The reference's `q_dense*` parameters
are dead weights (created but never used, ref :976-984,1007-1014) and are NOT
re-created here; the torch->jax weight converter drops them.

TPU note: both attention directions are computed from one shared set of six
projections; with `config.use_pallas` the two softmax-attention passes run in
a single fused Pallas kernel (k3m_tpu/kernels/coattn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.layers import (
    LayerNorm, act_fn, attention_core, compute_dtype, dense_init, dropout,
    merge_heads, split_heads,
)


class BiAttention(nn.Module):
    """Bi-directional cross attention between stream1 (visual) and stream2
    (text). Returns (ctx_for_stream2, ctx_for_stream1) in reference order:
    context1 = stream2-queries over stream1 values, context2 = vice versa.
    """
    config: K3MConfig
    size1: int          # stream1 (visual-like) hidden size
    size2: int          # stream2 (text-like) hidden size
    bi_size: int
    num_heads: int
    dropout1: float     # applied to probs over stream1 values
    dropout2: float

    @nn.compact
    def __call__(self, x1, bias1, x2, bias2, *, deterministic: bool):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        if cfg.fused_qkv:
            from k3m_tpu.model.layers import DenseParams, fused_dense
            p = lambda n, xin: DenseParams(self.bi_size, xin.shape[-1], init,
                                           name=n)()
            q1, k1, v1 = fused_dense(
                x1, [p("query1", x1), p("key1", x1), p("value1", x1)], dtype)
            q2, k2, v2 = fused_dense(
                x2, [p("query2", x2), p("key2", x2), p("value2", x2)], dtype)
        else:
            d = lambda n: nn.Dense(self.bi_size, kernel_init=init, dtype=dtype, name=n)
            q1, k1, v1 = d("query1")(x1), d("key1")(x1), d("value1")(x1)
            q2, k2, v2 = d("query2")(x2), d("key2")(x2), d("value2")(x2)
        h = self.num_heads

        if cfg.use_pallas:
            on_cpu = jax.default_backend() == "cpu"
            r1 = 0.0 if deterministic else self.dropout1
            r2 = 0.0 if deterministic else self.dropout2
            if not (on_cpu and (r1 > 0.0 or r2 > 0.0)):
                from k3m_tpu.kernels.coattn import padded_fused_biattention
                seed = 0
                if (r1 > 0.0 or r2 > 0.0):
                    seed = jax.random.randint(self.make_rng("dropout"), (),
                                              0, 2**31 - 1)
                # the kernel's contract is [B, H, L, D]; split_heads is
                # reshape-only ([B, L, H, D]), so transpose here
                bhld = lambda x: split_heads(x, h).transpose(0, 2, 1, 3)
                ctx1, ctx2 = padded_fused_biattention(
                    bhld(q1), bhld(k1), bhld(v1), bias1,
                    bhld(q2), bhld(k2), bhld(v2),
                    bias2, seed, dropout1=r1, dropout2=r2, interpret=on_cpu)
                unbhld = lambda x: x.transpose(0, 2, 1, 3)
                return merge_heads(unbhld(ctx1)), merge_heads(unbhld(ctx2))

        # context1: stream2 queries attend stream1 keys/values (ref :786-802)
        ctx1 = attention_core(split_heads(q2, h), split_heads(k1, h),
                              split_heads(v1, h), bias1,
                              dropout_rate=self.dropout1,
                              deterministic=deterministic, module=self,
                              sow_probs=cfg.visualization, sow_name="attn1")
        # context2: stream1 queries attend stream2 keys/values (ref :805-824)
        ctx2 = attention_core(split_heads(q1, h), split_heads(k2, h),
                              split_heads(v2, h), bias2,
                              dropout_rate=self.dropout2,
                              deterministic=deterministic, module=self,
                              sow_probs=cfg.visualization, sow_name="attn2")
        return merge_heads(ctx1), merge_heads(ctx2)


class ConnectionLayer(nn.Module):
    """BertConnectionLayer (ref :1030-1071): bi-attention + per-stream
    projection/LN + per-stream FFN. Stream1 is visual-sized, stream2 text-sized.
    """
    config: K3MConfig

    @nn.compact
    def __call__(self, x1, bias1, x2, bias2, deterministic: bool = True):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        vdrop, tdrop = cfg.v_hidden_dropout_prob, cfg.hidden_dropout_prob

        ctx1, ctx2 = BiAttention(
            cfg, cfg.v_hidden_size, cfg.hidden_size, cfg.bi_hidden_size,
            cfg.bi_num_attention_heads,
            cfg.v_attention_probs_dropout_prob, cfg.attention_probs_dropout_prob,
            name="biattention")(x1, bias1, x2, bias2, deterministic=deterministic)

        # biOutput (ref :968-996): ctx2 (stream1-queries) back onto stream1,
        # ctx1 (stream2-queries) back onto stream2.
        s1 = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                      name="bi_dense1")(ctx2)
        if not deterministic and vdrop > 0:
            s1 = dropout(self, s1, vdrop, deterministic=False)
        s1 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                       name="bi_LayerNorm1")(s1, x1)

        s2 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="bi_dense2")(ctx1)
        if not deterministic and tdrop > 0:
            s2 = dropout(self, s2, tdrop, deterministic=False)
        s2 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                       name="bi_LayerNorm2")(s2, x2)

        # stream1 FFN (image-sized, ref :1065-1066)
        h1 = nn.Dense(cfg.v_intermediate_size, kernel_init=init, dtype=dtype,
                      name="v_intermediate")(s1)
        h1 = act_fn(cfg.v_hidden_act)(h1)
        h1 = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                      name="v_output")(h1)
        if not deterministic and vdrop > 0:
            h1 = dropout(self, h1, vdrop, deterministic=False)
        out1 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="v_output_LayerNorm")(h1, s1)

        # stream2 FFN (text-sized, ref :1068-1069)
        h2 = nn.Dense(cfg.intermediate_size, kernel_init=init, dtype=dtype,
                      name="t_intermediate")(s2)
        h2 = act_fn(cfg.hidden_act)(h2)
        h2 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="t_output")(h2)
        if not deterministic and tdrop > 0:
            h2 = dropout(self, h2, tdrop, deterministic=False)
        out2 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="t_output_LayerNorm")(h2, s2)

        return out1, out2


class ConnectionLayerTwoText(nn.Module):
    """BertConnectionLayer_two_text (ref :1074-1111): both streams text-sized,
    heads = bi_num_attention_heads over hidden_size (ref :844-855); stream1's
    post-attention dropout uses the *visual* dropout prob (ref :1005),
    and both FFNs are text-sized (ref :1081-1085).
    """
    config: K3MConfig

    @nn.compact
    def __call__(self, x1, bias1, x2, bias2, deterministic: bool = True):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        vdrop, tdrop = cfg.v_hidden_dropout_prob, cfg.hidden_dropout_prob

        ctx1, ctx2 = BiAttention(
            cfg, cfg.hidden_size, cfg.hidden_size, cfg.hidden_size,
            cfg.bi_num_attention_heads,
            cfg.v_attention_probs_dropout_prob, cfg.attention_probs_dropout_prob,
            name="biattention")(x1, bias1, x2, bias2, deterministic=deterministic)

        s1 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="bi_dense1")(ctx2)
        if not deterministic and vdrop > 0:
            s1 = dropout(self, s1, vdrop, deterministic=False)
        s1 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                       name="bi_LayerNorm1")(s1, x1)

        s2 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="bi_dense2")(ctx1)
        if not deterministic and tdrop > 0:
            s2 = dropout(self, s2, tdrop, deterministic=False)
        s2 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                       name="bi_LayerNorm2")(s2, x2)

        h1 = nn.Dense(cfg.intermediate_size, kernel_init=init, dtype=dtype,
                      name="v_intermediate")(s1)
        h1 = act_fn(cfg.hidden_act)(h1)
        h1 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="v_output")(h1)
        if not deterministic and tdrop > 0:
            h1 = dropout(self, h1, tdrop, deterministic=False)
        out1 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="v_output_LayerNorm")(h1, s1)

        h2 = nn.Dense(cfg.intermediate_size, kernel_init=init, dtype=dtype,
                      name="t_intermediate")(s2)
        h2 = act_fn(cfg.hidden_act)(h2)
        h2 = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                      name="t_output")(h2)
        if not deterministic and tdrop > 0:
            h2 = dropout(self, h2, tdrop, deterministic=False)
        out2 = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="t_output_LayerNorm")(h2, s2)

        return out1, out2
