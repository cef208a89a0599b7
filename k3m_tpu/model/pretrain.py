"""K3M pretraining model: tri-stream trunk + four pretraining losses.

Parity target: reference `BertForMultiModalPreTraining_tri_stru`
(vilbert_k3m/vilbert_k3m.py:2186-2859).

Mask construction matches `bert_tri` (ref :2507-2671): additive
(1 - mask) * -10000 biases; the reference also builds a x5.0 co-attention
mask (ref :2585-2590) that is never consumed inside the attention layers
(the adds at ref :789-790,811-812 are commented out), so it is not computed
here. The reference's t_pooler/v_pooler outputs from bert_tri are likewise
dead in this model (the alignment head consumes the FUSION pooled outputs,
ref :2728-2733), so those pooler params are not created.

Losses (ref forward :2739-2846):
  masked_lm_loss      CE(ignore -1) over title logits
  masked_img_loss     visual_target 0: KLDiv(log_softmax, soft labels) over
                      masked regions / count; 1: masked MSE; 2: NCE with 70/30
                      across/in-batch negatives
  masked_lm_loss_pv   CE(ignore -1) over pv logits
  alignment loss      CE over the fused 3-modality 2-way score with label
                      1 - 1*((is_next + is_next_pv_v + is_next_pv_t) == 0)
  loss_struc          LPM margin ranking loss (see structure.py)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.encoder import TriStreamEncoder
from k3m_tpu.model.fusion import FusionBlock
from k3m_tpu.model.heads import PreTrainingHeads
from k3m_tpu.model.layers import BertEmbeddings, ImageEmbeddings, compute_dtype, mask_to_bias
from k3m_tpu.model.structure import StructureAggregator


def cross_entropy_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                         ignore_index: int = -1) -> jnp.ndarray:
    """Mean CE over labels != ignore_index (torch CrossEntropyLoss parity).

    Deviation from torch: an all-ignored batch yields 0 instead of NaN.
    """
    logits = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    total = jnp.where(valid, nll, 0.0).sum()
    return total / jnp.maximum(valid.sum(), 1)


class K3MTrunk(nn.Module):
    """Shared trunk: embeddings -> tri-stream encoder -> fusion -> c_initial.

    Returns the fused per-modality sequences, pooled outputs and c_initial
    (ref bert_tri :2507-2671 + get_sequence_pooled_output_final :2376-2411 +
    c_initial at :2721-2725).
    """
    config: K3MConfig

    @nn.compact
    def __call__(self, input_ids, image_feat, image_loc, token_type_ids,
                 attention_mask, image_attention_mask,
                 input_ids_pv, token_type_ids_pv, attention_mask_pv,
                 *, deterministic: bool = True, gumbel_noise=None,
                 task_ids=None):
        cfg = self.config
        dtype = compute_dtype(cfg)

        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if attention_mask_pv is None:
            attention_mask_pv = jnp.ones_like(input_ids_pv)
        if token_type_ids_pv is None:
            token_type_ids_pv = jnp.zeros_like(input_ids_pv)

        if cfg.task_specific_tokens:
            # one task token lengthens both text streams; the reference
            # extends each mask by PREPENDING a ones column (ref
            # :2534-2541 — note: prepended, not inserted at position 1,
            # so padding masks shift one slot late; replicated verbatim)
            ones = jnp.ones_like(attention_mask[:, :1])
            attention_mask = jnp.concatenate([ones, attention_mask], axis=1)
            ones_pv = jnp.ones_like(attention_mask_pv[:, :1])
            attention_mask_pv = jnp.concatenate(
                [ones_pv, attention_mask_pv], axis=1)

        txt_bias = mask_to_bias(attention_mask, dtype)
        pv_bias = mask_to_bias(attention_mask_pv, dtype)
        txt_mask2 = attention_mask.astype(dtype)[:, :, None]   # ref :2551
        pv_mask2 = attention_mask_pv.astype(dtype)[:, :, None]

        word_table = self.param(
            "word_embeddings", nn.initializers.normal(cfg.initializer_range),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        embeddings = BertEmbeddings(cfg, name="embeddings")
        txt_emb = embeddings(input_ids, token_type_ids, word_table,
                             deterministic=deterministic, task_ids=task_ids)
        pv_emb = embeddings(input_ids_pv, token_type_ids_pv, word_table,
                            deterministic=deterministic, task_ids=task_ids)

        img_emb = None
        img_bias = None
        if cfg.use_image:
            if image_attention_mask is None:
                image_attention_mask = jnp.ones(image_feat.shape[:2],
                                                dtype=input_ids.dtype)
            img_bias = mask_to_bias(image_attention_mask, dtype)
            img_emb = ImageEmbeddings(cfg, name="v_embeddings")(
                image_feat, image_loc, deterministic=deterministic)

        (t_with_v, v_with_t, pv_with_v, v_with_pv,
         t_with_pv, pv_with_t) = TriStreamEncoder(cfg, name="encoder")(
            txt_emb, img_emb, txt_bias, txt_mask2, img_bias,
            pv_emb, pv_bias, pv_mask2, deterministic=deterministic)

        seq_v, seq_t, seq_pv, pooled_v, pooled_t, pooled_pv = FusionBlock(
            cfg, name="fusion")(
            t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t,
            txt_emb, pv_emb, img_emb, deterministic=deterministic,
            gumbel_noise=gumbel_noise)

        if pooled_v is not None:
            c_initial = (pooled_v + pooled_t + pooled_pv) / 3.0  # ref :2723
        else:
            c_initial = (pooled_t + pooled_pv) / 2.0             # ref :2725
        return dict(
            seq_v=seq_v, seq_t=seq_t, seq_pv=seq_pv,
            pooled_v=pooled_v, pooled_t=pooled_t, pooled_pv=pooled_pv,
            c_initial=c_initial,
            word_embedding_table=word_table,
        )


def masked_image_loss(cfg: K3MConfig, prediction_scores_v, image_label,
                      image_target, rng: Optional[jax.Array] = None,
                      neg_index: Optional[jnp.ndarray] = None):
    """visual_target-dependent masked-RoI loss (ref :2744-2813).

    `prediction_scores_v` must already exclude the global token ([:, 1:]).
    image_label: [B, R] with 1 = masked, -1 = unmasked.
    `neg_index` optionally injects the NCE negative pool indices [B, R, N]
    (flat into B*R) for parity replay of the reference's torch `.random_`
    draws (ref :2769-2798); when given, the random draw is skipped.
    """
    image_target = jnp.asarray(image_target, jnp.float32)
    masked = (image_label == 1)
    if cfg.visual_target == 1:  # MSE (ref :2746-2752)
        err = jnp.square(prediction_scores_v.astype(jnp.float32)
                         - image_target.astype(jnp.float32))
        num = (err * masked[:, :, None]).sum()
        den = jnp.maximum((masked[:, :, None] * jnp.ones_like(err)).sum(), 1)
        return num / den
    if cfg.visual_target == 0:  # KLDiv vs 1601-way soft labels (ref :2753-2760)
        logp = jax.nn.log_softmax(
            prediction_scores_v.astype(jnp.float32), axis=2)
        t = image_target.astype(jnp.float32)
        kl = jax.scipy.special.xlogy(t, t) - t * logp
        num = (kl * masked[:, :, None]).sum()
        return num / jnp.maximum(masked.sum(), 1)
    # visual_target == 2: NCE with 70/30 across/in-batch negatives
    # (ref :2761-2813). The reference gathers only masked rows with dynamic
    # shapes; here all rows are scored and the loss is masked-averaged.
    B, R, H = prediction_scores_v.shape
    if neg_index is None:
        num_neg = cfg.num_negative_image
        n_across = int(num_neg * 0.7)
        n_inside = int(num_neg * 0.3)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        row_across = jax.random.randint(r1, (B, R, n_across), 0,
                                        max(B - 1, 1))
        row_across = jnp.where(
            row_across == jnp.arange(B)[:, None, None], B - 1, row_across)
        col_across = jax.random.randint(r2, (B, R, n_across), 0, R)
        across = row_across * R + col_across
        col_inside = jax.random.randint(r3, (B, R, n_inside), 0,
                                        max(R - 1, 1))
        col_inside = jnp.where(
            col_inside == jnp.arange(R)[None, :, None], R - 1, col_inside)
        inside = jnp.arange(B)[:, None, None] * R + col_inside
        neg_index = jnp.concatenate([across, inside], axis=2)   # [B, R, N]
    flat_target = image_target.reshape(B * R, -1)
    negative = flat_target[neg_index]                           # [B, R, N, D]
    sample = jnp.concatenate([image_target[:, :, None, :], negative],
                             axis=2)                            # [B, R, 1+N, D]
    score = jnp.einsum("brnd,brd->brn", sample,
                       prediction_scores_v.astype(jnp.float32))
    logp = jax.nn.log_softmax(score, axis=-1)
    nll = -logp[..., 0]
    return jnp.where(masked, nll, 0.0).sum() / jnp.maximum(masked.sum(), 1)


class K3MForPretraining(nn.Module):
    """Pretraining wrapper producing the reference's loss tuple as a dict."""
    config: K3MConfig

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 deterministic: bool = True,
                 neg_entity_idx: Optional[jnp.ndarray] = None,
                 neg_value_idx: Optional[jnp.ndarray] = None,
                 gumbel_noise=None,
                 neg_image_idx: Optional[jnp.ndarray] = None):
        cfg = self.config
        if cfg.task_specific_tokens:
            # Implemented in the TRUNK (K3MTrunk task_ids + BertEmbeddings
            # insertion, ref :358-381/:2534-2541) — but the pretraining
            # LOSS path cannot run under it, in the reference either: the
            # inserted token lengthens prediction_scores to L+1 while
            # masked_lm_labels stay L, so the CE at vilbert_k3m.py:2817
            # crashes (its forward never threads task_ids, :2673-2701).
            # Fail loudly instead of silently ignoring the flag.
            raise ValueError(
                "task_specific_tokens is a trunk-level feature (use "
                "K3MTrunk with task_ids); the pretraining losses are "
                "undefined under the inserted token — the reference's own "
                "pretrain path crashes with it (vilbert_k3m.py:2817)")
        trunk = K3MTrunk(cfg, name="trunk")
        out = trunk(
            batch["input_ids"], batch.get("image_feat"), batch.get("image_loc"),
            batch.get("segment_ids"), batch.get("input_mask"),
            batch.get("image_mask"),
            batch["input_ids_pv"], batch.get("segment_ids_pv"),
            batch.get("input_mask_pv"),
            deterministic=deterministic, gumbel_noise=gumbel_noise)

        c_final, loss_struc = StructureAggregator(
            cfg, with_lpm=True, name="structure")(
            out["c_initial"], out["seq_pv"], batch["index_p"], batch["index_v"],
            deterministic=deterministic,
            neg_entity_idx=neg_entity_idx, neg_value_idx=neg_value_idx)

        word_table = out["word_embedding_table"]
        # chunked-CE path: the heads compute the two MLM losses directly so
        # the [B, L, vocab] logits never materialize (see chunked_masked_ce)
        masked_lm_loss, scores_v, masked_lm_loss_pv, seq_rel = \
            PreTrainingHeads(cfg, name="cls")(
                out["seq_t"], out["seq_v"], out["pooled_t"], out["pooled_v"],
                out["seq_pv"], out["pooled_pv"], word_table,
                deterministic=deterministic,
                lm_labels_t=batch["lm_label_ids"],
                lm_labels_pv=batch["lm_label_ids_pv"])
        if cfg.use_image:
            img_rng = None
            if cfg.visual_target == 2 and not deterministic:
                img_rng = self.make_rng("lpm")
            masked_img_loss = masked_image_loss(
                cfg, scores_v[:, 1:], batch["image_label"],
                batch["image_target"], img_rng, neg_index=neg_image_idx)
        else:
            masked_img_loss = jnp.zeros((), jnp.float32)

        align_label = 1 - 1 * ((batch["is_next"] + batch["is_next_pv_v"]
                                + batch["is_next_pv_t"]) == 0)  # ref :2828-2829
        next_sentence_loss_t_v_pv = cross_entropy_ignore(
            seq_rel[:, None, :], align_label[:, None].astype(jnp.int32))

        return dict(
            masked_lm_loss=masked_lm_loss,
            masked_img_loss=masked_img_loss,
            masked_lm_loss_pv=masked_lm_loss_pv,
            next_sentence_loss_t_v_pv=next_sentence_loss_t_v_pv,
            loss_struc=loss_struc,
            c_initial=out["c_initial"],
            c_final=c_final,
        )
