"""K3M item-alignment finetune model (twin tower).

Parity target: reference `K3MForItemAlignment`
(vilbert_k3m/vilbert_k3m.py:2862-3454). Each item runs the same trunk
(bert_tri -> fusion -> c_initial -> structure aggregator WITHOUT the LPM
loss, ref :3105-3161), then the two item embeddings are compared:

  loss_type == "inner":  sigmoid(BCE-with-logits) over inner products.
    NOTE: the reference never constructs `self.loss_fct` for this branch
    (ref :2933-2939 only handles "ce"/"cosine"), so the torch code crashes;
    we implement the intended BCE-with-logits.
  loss_type == "cosine": CosineEmbeddingLoss(margin=0) with targets 2y-1;
    probs = (cos + 1)/2. The reference computes probs from
    cosine(item1, item1) — always 1.0 (bug, ref :3443); replicated unless
    `config.fix_reference_bugs`, which uses cosine(item1, item2).
  loss_type == "ce":     ClassificationHead over concat + CE (ref :3444-3450).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.heads import ClassificationHead
from k3m_tpu.model.pretrain import K3MTrunk
from k3m_tpu.model.structure import StructureAggregator


def cosine_similarity(a, b, eps=1e-8):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return (a * b).sum(-1) / (na * nb)


class K3MForItemAlignment(nn.Module):
    config: K3MConfig

    def setup(self):
        self.trunk = K3MTrunk(self.config, name="trunk")
        self.structure = StructureAggregator(self.config, with_lpm=False,
                                             name="structure")
        if self.config.loss_type == "ce":
            self.classifier = ClassificationHead(self.config, name="classifier")

    def item_embedding(self, item: Dict[str, jnp.ndarray], *,
                       deterministic: bool = True):
        """ref item_embedding :3329-3377 — returns (c_initial, c_final)."""
        out = self.trunk(
            item["input_ids"], item.get("image_feat"), item.get("image_loc"),
            item.get("segment_ids"), item.get("input_mask"),
            item.get("image_mask"),
            item["input_ids_pv"], item.get("segment_ids_pv"),
            item.get("input_mask_pv"),
            deterministic=deterministic)
        c_final, _ = self.structure(
            out["c_initial"], out["seq_pv"], item["index_p"], item["index_v"],
            deterministic=deterministic)
        return out["c_initial"], c_final

    def __call__(self, labels, item1: Dict[str, jnp.ndarray],
                 item2: Dict[str, jnp.ndarray], *, deterministic: bool = True):
        cfg = self.config
        _, emb1 = self.item_embedding(item1, deterministic=deterministic)
        _, emb2 = self.item_embedding(item2, deterministic=deterministic)
        labels_f = labels.astype(jnp.float32)

        if cfg.loss_type == "inner":
            logits = (emb1.astype(jnp.float32) * emb2.astype(jnp.float32)).sum(-1)
            # BCE with logits (the reference's intended loss, see module doc)
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * labels_f
                + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            probs = jax.nn.sigmoid(logits)
        elif cfg.loss_type == "cosine":
            cos12 = cosine_similarity(emb1, emb2)
            target = 2.0 * labels_f - 1.0
            # torch CosineEmbeddingLoss(margin=0): y=1 -> 1-cos; y=-1 -> relu(cos)
            loss = jnp.mean(jnp.where(target > 0, 1.0 - cos12,
                                      jax.nn.relu(cos12)))
            if cfg.fix_reference_bugs:
                probs = (cos12 + 1.0) / 2.0
            else:
                probs = (cosine_similarity(emb1, emb1) + 1.0) / 2.0  # ref :3443
        elif cfg.loss_type == "ce":
            logits = self.classifier(
                jnp.concatenate([emb1, emb2], axis=1),
                deterministic=deterministic)
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(
                logp, labels.astype(jnp.int32)[:, None], axis=1)[:, 0])
            probs_full = jax.nn.softmax(logits, axis=-1)
            emb1 = probs_full[:, 0]  # ref :3448-3449
            emb2 = probs_full[:, 1]
            probs = probs_full[:, 1]
        else:
            raise ValueError(f"unsupported loss_type {cfg.loss_type}")

        return emb1, emb2, probs, loss
