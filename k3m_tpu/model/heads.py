"""Poolers and prediction heads.

Parity targets (vilbert_k3m/vilbert_k3m.py):
  BertTextPooler:1753 / BertImagePooler:1768  (CLS token -> Dense(bi) -> ReLU)
  BertPredictionHeadTransform:1783 / BertImgPredictionHeadTransform:1802
  BertLMPredictionHead:1821 (decoder TIED to the word embedding, ref :2266-2272)
  BertImagePredictionHead:1912 (v_hidden -> v_target_size)
  BertPreTrainingHeads:1862 (sum of pooled t+pv(+v) -> dropout -> 2-way)
  ClassificationHead:2164
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.layers import (LayerNorm, act_fn, compute_dtype,
                                  dense_init, dropout)


class Pooler(nn.Module):
    """First-token pooler: Dense(out_size) + ReLU."""
    config: K3MConfig
    out_size: int

    @nn.compact
    def __call__(self, hidden_states):
        cfg = self.config
        x = hidden_states[:, 0]
        x = nn.Dense(self.out_size, kernel_init=dense_init(cfg.initializer_range),
                     dtype=compute_dtype(cfg), name="dense")(x)
        return jax.nn.relu(x)


def chunked_masked_ce(x, table, bias, labels, chunk: int,
                      ignore_index: int = -1) -> jnp.ndarray:
    """Mean CE(ignore -1) over vocab logits `x @ table.T + bias`, computed in
    sequence chunks under a rematerialized scan so the full [B, L, vocab]
    logits tensor never exists in HBM (at B=96 L=256 V=21128 that tensor is
    1.9 GiB fp32 — the single largest allocation of the naive train step).
    Identical math to cross_entropy_ignore(full_logits, labels)."""
    B, L, D = x.shape
    pad = (-L) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=ignore_index)
    n = (L + pad) // chunk

    def body(xi, li):
        logits = jnp.einsum("bcd,vd->bcv", xi, table,
                            preferred_element_type=jnp.float32)
        # Store the [B, C, vocab] chunk in the compute dtype: under bf16 this
        # halves the largest remaining HBM tensor of the step (96x64x21128
        # fp32 = 519 MB per chunk, written + re-read by the reductions and
        # the recomputed backward). The logsumexp below still reduces in
        # fp32 (the upcast fuses into the reduction); in fp32 configs the
        # casts are no-ops, so golden parity vs the reference is unaffected.
        logits = (logits.astype(xi.dtype)
                  + bias.astype(xi.dtype)).astype(xi.dtype)
        valid = li != ignore_index
        safe = jnp.where(valid, li, 0)
        # nll = logsumexp - logit[label]; the label logit comes from a small
        # row-gather of the embedding table, NOT take_along_axis over the
        # [B, C, vocab] tensor — whose backward is a layout-hostile scatter
        # that dominated the train step (92 ms at B=96)
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)
        w_lab = jnp.take(table, safe, axis=0).astype(jnp.float32)  # [B, C, D]
        label_logit = ((xi.astype(jnp.float32) * w_lab).sum(-1)
                       + jnp.take(bias, safe, axis=0))
        nll = lse - label_logit
        return jnp.where(valid, nll, 0.0).sum(), valid.sum()

    # Unrolled static loop over chunks (n is 1-4 at K3M geometry), NOT
    # lax.scan: the while-loop wrapper serializes the chunks and costs
    # ~12 ms/step of loop overhead even for a single-chunk sequence;
    # unrolled, XLA overlaps chunk matmuls freely. jax.checkpoint still
    # keeps each chunk's [B, C, vocab] logits out of the residual set.
    body = jax.checkpoint(body)
    total = jnp.zeros((), jnp.float32)
    count = jnp.zeros((), jnp.int32)
    for i in range(n):
        s, c = body(x[:, i * chunk:(i + 1) * chunk],
                    labels[:, i * chunk:(i + 1) * chunk])
        total = total + s
        count = count + c
    return total / jnp.maximum(count, 1)


class LMPredictionHead(nn.Module):
    """MLM head: transform (dense+act+LN) then decode with the TIED word
    embedding plus an output-only bias (ref :1821-1839). The embedding table
    is passed in explicitly to realize the tie.

    With `labels`, returns the mean masked-CE loss via chunked_masked_ce
    instead of materializing the [B, L, vocab] logits."""
    config: K3MConfig

    @nn.compact
    def __call__(self, hidden_states, word_embedding_table, labels=None):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        x = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                     name="transform_dense")(hidden_states)
        x = act_fn(cfg.hidden_act)(x)
        x = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                      name="transform_LayerNorm")(x)
        bias = self.param("decoder_bias", nn.initializers.zeros,
                          (cfg.vocab_size,), jnp.float32)
        table = word_embedding_table.astype(dtype)
        if labels is not None:
            return chunked_masked_ce(x, table, bias, labels, cfg.ce_chunk)
        logits = jnp.einsum("bld,vd->blv", x, table,
                            preferred_element_type=jnp.float32)
        return logits + bias


class ImagePredictionHead(nn.Module):
    """Masked-RoI head: v transform then decode to v_target_size (ref :1912)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, hidden_states):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        x = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                     name="transform_dense")(hidden_states)
        x = act_fn(cfg.hidden_act)(x)  # note: ref uses hidden_act here (:1806-1811)
        x = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                      name="transform_LayerNorm")(x)
        x = nn.Dense(cfg.v_target_size, kernel_init=init, dtype=dtype,
                     name="decoder")(x)
        return x.astype(jnp.float32)


class PreTrainingHeads(nn.Module):
    """MLM logits for title & pv (shared head), masked-RoI logits, and the
    fused 3-modality alignment score (ref :1862-1909)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, sequence_output_t, sequence_output_v, pooled_output_t,
                 pooled_output_v, sequence_output_pv, pooled_output_pv,
                 word_embedding_table, *, deterministic: bool,
                 lm_labels_t=None, lm_labels_pv=None):
        """With lm_labels_t/lm_labels_pv, the first/third outputs are the
        masked-CE LOSSES (scalars) instead of vocab logits — the memory-lean
        path used by the pretraining model."""
        cfg = self.config
        lm_head = LMPredictionHead(cfg, name="predictions")

        pooled = pooled_output_t + pooled_output_pv
        if pooled_output_v is not None:
            pooled = pooled + pooled_output_v
        if not deterministic:
            pooled = dropout(self, pooled, 0.1, deterministic=False)  # ref :1870
        seq_relationship = nn.Dense(
            2, kernel_init=dense_init(cfg.initializer_range),
            dtype=compute_dtype(cfg), name="seq_relationship")(pooled)

        scores_t = lm_head(sequence_output_t, word_embedding_table,
                           lm_labels_t)
        scores_pv = lm_head(sequence_output_pv, word_embedding_table,
                            lm_labels_pv)
        scores_v = None
        if cfg.use_image and sequence_output_v is not None:
            scores_v = ImagePredictionHead(cfg, name="imagePredictions")(
                sequence_output_v)
        return scores_t, scores_v, scores_pv, seq_relationship.astype(jnp.float32)


class ClassificationHead(nn.Module):
    """Item-alignment CE head (ref :2164-2183): dropout -> Dense(h) -> tanh
    -> dropout -> Dense(2). Input is concat of the two item embeddings."""
    config: K3MConfig

    @nn.compact
    def __call__(self, features, *, deterministic: bool):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        x = features
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = dropout(self, x, cfg.hidden_dropout_prob, deterministic=False)
        x = nn.Dense(cfg.hidden_size, kernel_init=init, dtype=dtype,
                     name="dense")(x)
        x = jnp.tanh(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = dropout(self, x, cfg.hidden_dropout_prob, deterministic=False)
        return nn.Dense(2, kernel_init=init, dtype=dtype,
                        name="out_proj")(x).astype(jnp.float32)
