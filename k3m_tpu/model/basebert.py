"""Single-stream VisualBERT-style baseline (basebert equivalent).

Parity target: reference `vilbert_k3m/basebert.py` — `BertModel`:659,
`BertForMultiModalPreTraining`:777, `BaseBertForVLTasks`:893. Vestigial in
the reference (never imported by the live K3M path) but part of its
component inventory: a baseline that embeds text tokens and image RoIs into
ONE stream and runs the plain BERT encoder over the concatenation.

Re-uses the dual-stream building blocks (k3m_tpu/model/layers.py): the
single-stream encoder is just TextLayer applied to [text ; image] with a
concatenated additive mask (ref :761-781). Differences kept from the
reference on purpose:
  * image tokens get token_type_id = 1 (ref :747-749)
  * image prediction head decodes to 1601 classes with an UNtied Linear
    (ref :622-634) while the MLM decoder is tied to word embeddings
  * masked-image loss = KLDiv vs soft labels over image_label==1 rows
    (ref :869-877); alignment + MLM via CE(ignore_index=-1)
  * SimpleClassifier (ref :966-978) is Dense-ReLU-Dropout-Dense; the
    reference wraps its Linears in weight_norm, a reparametrization with
    identical function class — we use plain Dense kernels.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.layers import (BertEmbeddings, LayerNorm, TextLayer,
                                  act_fn, compute_dtype, dense_init, dropout,
                                  mask_to_bias)
from k3m_tpu.model.pretrain import cross_entropy_ignore


class _BaseImageEmbeddings(nn.Module):
    """basebert's image embedding (ref BertImageEmbeddings, basebert.py:
    324-352): feature + location projections PLUS a token-type embedding —
    image tokens get type id 1 (ref :342-352) — then LN + dropout. The
    dual-stream ImageEmbeddings (layers.py) has no type term, so this model
    keeps its own block."""
    config: K3MConfig

    @nn.compact
    def __call__(self, image_feat, image_loc, *, deterministic: bool):
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        x = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                     name="image_embeddings")(image_feat.astype(dtype))
        loc = nn.Dense(cfg.v_hidden_size, kernel_init=init, dtype=dtype,
                       name="image_location_embeddings")(
            image_loc.astype(dtype))
        type_emb = self.param("token_type_embeddings", init,
                              (cfg.type_vocab_size, cfg.v_hidden_size),
                              jnp.float32)
        x = x + loc + type_emb[1].astype(dtype)    # type id 1 for all RoIs
        x = LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                      name="LayerNorm")(x)
        if not deterministic and cfg.hidden_dropout_prob > 0:
            x = dropout(self, x, cfg.hidden_dropout_prob, deterministic=False)
        return x


class SingleStreamModel(nn.Module):
    """Text + image tokens through one BERT stack (ref BertModel:659-776).

    NOTE: image RoIs are embedded with _BaseImageEmbeddings (feature + loc
    + type-1 embedding), projecting to v_hidden_size; single-stream requires
    v_hidden_size == hidden_size (as the reference's config does when this
    model is used)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, input_ids, image_feat, image_loc,
                 token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, *, deterministic: bool = True):
        cfg = self.config
        B, Lt = input_ids.shape
        Lv = image_feat.shape[1]
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, Lt), jnp.int32)
        if attention_mask is None:
            attention_mask = jnp.ones((B, Lt), jnp.int32)
        if image_attention_mask is None:
            image_attention_mask = jnp.ones((B, Lv), jnp.int32)

        dtype = compute_dtype(cfg)
        word_table = self.param(
            "word_embeddings", dense_init(cfg.initializer_range),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        txt = BertEmbeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, word_table, deterministic=deterministic)
        img = _BaseImageEmbeddings(cfg, name="image_embeddings")(
            image_feat, image_loc, deterministic=deterministic)
        x = jnp.concatenate([txt, img.astype(txt.dtype)], axis=1)

        bias = jnp.concatenate(
            [mask_to_bias(attention_mask, dtype),
             mask_to_bias(image_attention_mask, dtype)], axis=-1)

        for i in range(cfg.num_hidden_layers):
            x = TextLayer(cfg, name=f"layer_{i}")(
                x, bias, deterministic=deterministic)

        # CLS-token pooler, tanh (ref BertPooler:507-519)
        pooled = nn.Dense(cfg.hidden_size,
                          kernel_init=dense_init(cfg.initializer_range),
                          dtype=dtype, name="pooler")(x[:, 0])
        pooled = jnp.tanh(pooled)
        return x, pooled, word_table


class _HeadTransform(nn.Module):
    """Dense + act + LN shared by the prediction heads (ref :522-540)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = compute_dtype(cfg)
        x = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg.initializer_range),
                     dtype=dtype, name="dense")(x)
        x = act_fn(cfg.hidden_act)(x)
        return LayerNorm(dtype=dtype, fused=cfg.use_pallas_ln,
                         name="LayerNorm")(x)


class SingleStreamPreTrainingHeads(nn.Module):
    """Tied MLM head + 2-way alignment + 1601-way image head (ref :637-657)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, sequence_output_t, sequence_output_v, pooled_output,
                 word_table):
        cfg = self.config
        dtype = compute_dtype(cfg)
        h = _HeadTransform(cfg, name="predictions_transform")(sequence_output_t)
        bias_t = self.param("predictions_bias", nn.initializers.zeros,
                            (cfg.vocab_size,), jnp.float32)
        scores_t = (h.astype(jnp.float32) @ word_table.T + bias_t)
        hv = _HeadTransform(cfg, name="image_predictions_transform")(
            sequence_output_v)
        scores_v = nn.Dense(cfg.v_target_size,
                            kernel_init=dense_init(cfg.initializer_range),
                            dtype=dtype, name="image_decoder")(hv)
        seq_rel = nn.Dense(2, kernel_init=dense_init(cfg.initializer_range),
                           dtype=dtype, name="seq_relationship")(pooled_output)
        return (scores_t, scores_v.astype(jnp.float32),
                seq_rel.astype(jnp.float32))


class BaseBertForPretraining(nn.Module):
    """Single-stream pretraining with MLM + masked-image + alignment losses
    (ref BertForMultiModalPreTraining:777-891)."""
    config: K3MConfig

    @nn.compact
    def __call__(self, input_ids, image_feat, image_target, image_loc,
                 token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, masked_lm_labels=None,
                 image_label=None, next_sentence_label=None, *,
                 deterministic: bool = True):
        cfg = self.config
        Lt = input_ids.shape[1]
        seq, pooled, word_table = SingleStreamModel(cfg, name="bert")(
            input_ids, image_feat, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic)
        seq_t, seq_v = seq[:, :Lt], seq[:, Lt:]
        scores_t, scores_v, seq_rel = SingleStreamPreTrainingHeads(
            cfg, name="cls")(seq_t, seq_v, pooled, word_table)

        if masked_lm_labels is None or next_sentence_label is None:
            return scores_t, scores_v, seq_rel

        # masked-image KLDiv vs soft labels; row 0 is the global image token
        # and is dropped (ref :871)
        logp = nn.log_softmax(scores_v[:, 1:], axis=-1)
        kl = -(image_target * logp).sum(-1)  # KLDiv up to target-entropy const
        # reference uses nn.KLDivLoss(log_softmax, target) which includes the
        # target*log(target) term only via torch semantics: KLDiv(l, t) =
        # t*(log t - l); replicate exactly:
        tlogt = jnp.where(image_target > 0,
                          image_target * jnp.log(image_target), 0.0).sum(-1)
        kl = kl + tlogt
        w = (image_label == 1).astype(jnp.float32)
        masked_img_loss = (kl * w).sum() / jnp.maximum(w.sum(), 1e-9)

        masked_lm_loss = cross_entropy_ignore(
            scores_t.reshape(-1, cfg.vocab_size), masked_lm_labels.reshape(-1))
        next_sentence_loss = cross_entropy_ignore(
            seq_rel.reshape(-1, 2), next_sentence_label.reshape(-1))
        return masked_lm_loss, masked_img_loss, next_sentence_loss


class SimpleClassifier(nn.Module):
    """Dense-ReLU-Dropout-Dense classifier (ref :966-978)."""
    hid_dim: int
    out_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hid_dim, name="fc1")(x)
        x = nn.relu(x)
        if not deterministic and self.dropout > 0:
            x = dropout(self, x, self.dropout, deterministic=False)
        return nn.Dense(self.out_dim, name="fc2")(x)


class BaseBertForVLTasks(nn.Module):
    """Task-head bundle over the single-stream trunk (ref :893-963)."""
    config: K3MConfig
    num_labels: int
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, input_ids, image_feat, image_loc,
                 token_type_ids=None, attention_mask=None,
                 image_attention_mask=None, *, deterministic: bool = True):
        cfg = self.config
        B, Lt = input_ids.shape
        Lv = image_feat.shape[1]
        if image_attention_mask is None:
            image_attention_mask = jnp.ones((B, Lv), jnp.int32)
        seq, pooled, word_table = SingleStreamModel(cfg, name="bert")(
            input_ids, image_feat, image_loc, token_type_ids, attention_mask,
            image_attention_mask, deterministic=deterministic)
        seq_t, seq_v = seq[:, :Lt], seq[:, Lt:]
        ling_pred, vision_pred, vil_binary = SingleStreamPreTrainingHeads(
            cfg, name="cls")(seq_t, seq_v, pooled, word_table)

        init = dense_init(cfg.initializer_range)
        vil_prediction = SimpleClassifier(
            cfg.hidden_size * 2, self.num_labels, 0.5, name="vil_prediction")(
            pooled, deterministic=deterministic)
        vil_logit = nn.Dense(1, kernel_init=init, name="vil_logit")(pooled)
        drop_v = seq_v
        drop_t = seq_t
        if not deterministic and self.dropout_prob > 0:
            drop_v = dropout(self, seq_v, self.dropout_prob, deterministic=False)
            drop_t = dropout(self, seq_t, self.dropout_prob, deterministic=False)
        vision_logit = (nn.Dense(1, kernel_init=init, name="vision_logit")(drop_v)
                        + ((1.0 - image_attention_mask.astype(jnp.float32))
                           * -10000.0)[:, :, None])
        linguistic_logit = nn.Dense(1, kernel_init=init,
                                    name="linguistic_logit")(drop_t)
        return (vil_prediction, vil_logit, vil_binary, vision_pred,
                vision_logit, ling_pred, linguistic_logit)
