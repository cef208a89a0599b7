"""Structure Aggregation Module + Link Prediction Modeling (LPM) loss.

Parity target: reference `structure_aggregator`
(vilbert_k3m/vilbert_k3m.py:2413-2505 pretrain; :3105-3161 finetune variant
without the LPM loss).

The reference runs Python per-item/per-pv loops (the #1 serial hotspot).
Here everything is vectorized over [B, P] with validity masks:

  * property/value vectors: the reference's `index_select(dim=0, index=index_p[i,j])`
    selects exactly the TWO boundary positions [begin, end] of each span and
    averages them (ref :2443-2444) — i.e. p = (seq[b] + seq[e]) / 2. This is a
    pair gather, done here with take_along_axis.
  * triple reps t = W1([c; p; v]), scores b = W2(leaky_relu(t)), masked
    softmax over the valid pairs, c_final = c + W3(sum attn*t) (ref :2448-2465).
  * zero-pv fallback (ref :2452-2456): softmax over the single row
    t = c_initial[i]  =>  c_final = c + W3(c).
  * LPM loss: TransE norms ||c + p - v|| with `num_negative_pv//2` corrupted
    entities (other items in batch) and the rest corrupted values (other pairs
    of the same item), MarginRankingLoss(margin) with target=1
    (ref :2469-2502). Negatives are sampled WITHOUT replacement exactly like
    `random.sample`, via per-(i,j) masked argsort of uniform noise.

NOTE the reference's MarginRankingLoss call ranks the POSITIVE norm above the
negative (loss = relu(margin - pos + neg)), which is inverted w.r.t. textbook
TransE; we replicate it bit-for-bit and expose `config.fix_reference_bugs`
to flip the sign.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.layers import compute_dtype, dense_init


def gather_pair_mean(seq: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """seq [B, L, H], idx [B, P, 2] -> [B, P, H]: mean of the two positions.

    Implemented as a one-hot matmul (MXU) rather than a fancy gather: the
    gather's backward is a scatter-add into [B, L, H], which XLA lowers to a
    sort-based kernel on TPU (the pv-stream one cost ~46 ms/step at B=96);
    the matmul's backward is just the transposed matmul."""
    L = seq.shape[1]
    # [B, P, L] with 0.5 at each of the two span-boundary positions
    # (1.0 if begin == end, preserving the gather-then-mean semantics)
    weights = ((idx[:, :, 0, None] == jnp.arange(L)).astype(seq.dtype) * 0.5
               + (idx[:, :, 1, None] == jnp.arange(L)).astype(seq.dtype) * 0.5)
    return jnp.einsum("bpl,blh->bph", weights, seq,
                      preferred_element_type=jnp.float32).astype(seq.dtype)


def _sample_without_replacement(rng, noise_shape, valid_mask, k_take):
    """Draw k_take per-row candidates without replacement (uniform over the
    valid set). Returns (indices [..., k_take], slot_valid mask).

    k_take is tiny (num_negative_pv is single-digit), so this runs k_take
    argmin reductions instead of a full argsort — on TPU a [B,P,B] sort was
    the single most expensive non-matmul op of the train step (~46 ms at
    batch 96)."""
    noise = jax.random.uniform(rng, noise_shape)
    noise = jnp.where(valid_mask, noise, 2.0)      # invalid -> never first
    takes = []
    for _ in range(k_take):
        idx = jnp.argmin(noise, axis=-1)           # [...]
        takes.append(idx)
        noise = jnp.where(
            jnp.arange(noise.shape[-1]) == idx[..., None], 3.0, noise)
    take = jnp.stack(takes, axis=-1)               # [..., k_take]
    n_valid = valid_mask.sum(axis=-1, keepdims=True)
    slot_ok = jnp.arange(k_take) < jnp.minimum(n_valid, k_take)
    return take, slot_ok


class StructureAggregator(nn.Module):
    config: K3MConfig
    with_lpm: bool = True

    @nn.compact
    def __call__(self, c_initial, sequence_output_pv, index_p, index_v,
                 *, deterministic: bool = True,
                 neg_entity_idx: Optional[jnp.ndarray] = None,
                 neg_value_idx: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.config
        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        H = cfg.hidden_size
        w1 = nn.Dense(H, kernel_init=init, dtype=dtype, name="struc_w1")
        w2 = nn.Dense(1, kernel_init=init, dtype=dtype, name="struc_w2")
        w3 = nn.Dense(H, kernel_init=init, dtype=dtype, name="struc_w3")

        B, P, _ = index_p.shape
        valid = (index_p[:, :, 0] != 0)                      # [B, P]
        n_valid = valid.sum(axis=1)                          # [B]

        p_vecs = gather_pair_mean(sequence_output_pv, index_p)   # [B, P, H]
        v_vecs = gather_pair_mean(sequence_output_pv, index_v)   # [B, P, H]

        c_rep = jnp.broadcast_to(c_initial[:, None, :], (B, P, H))
        t = w1(jnp.concatenate([c_rep, p_vecs, v_vecs], axis=-1))   # [B, P, H]
        b = w2(jax.nn.leaky_relu(t))[..., 0].astype(jnp.float32)    # [B, P]
        b = jnp.where(valid, b, -1e30)
        atten = jax.nn.softmax(b, axis=1)[..., None]                # [B, P, 1]
        agg = (atten.astype(t.dtype) * t).sum(axis=1)               # [B, H]

        # Zero-pv-pair items: the reference's per-item loop does NOT reset
        # `t` between items (ref :2437-2456), so an item with no pairs
        # silently reuses the attention-aggregated triples of the most recent
        # PRECEDING item that had pairs; the try/except fallback
        # (t = c_initial[i], ref :2452-2456) only ever fires at the FIRST
        # zero-pair run starting at item 0 — and that stale `t` then
        # persists. We replicate the stale-state semantics exactly via a
        # cumulative-max source index; `fix_reference_bugs` switches to the
        # clean per-item fallback c_final = c + W3(c).
        if cfg.fix_reference_bugs:
            agg_sel = jnp.where((n_valid > 0)[:, None], agg, c_initial)
        else:
            idx = jnp.arange(B)
            marked = jnp.where(n_valid > 0, idx, -1)
            src = jax.lax.associative_scan(jnp.maximum, marked)      # [B]
            agg_with_exc = jnp.concatenate([c_initial[0:1], agg], axis=0)
            agg_sel = agg_with_exc[src + 1]
        c_final = c_initial + w3(agg_sel)

        if not self.with_lpm:
            return c_final, None

        # ----------------------------------------------------------- LPM
        margin = cfg.margin
        n_ent = cfg.num_negative_pv // 2
        n_val = cfg.num_negative_pv - n_ent

        cf = c_final.astype(jnp.float32)
        pf = p_vecs.astype(jnp.float32)
        vf = v_vecs.astype(jnp.float32)
        pos = jnp.linalg.norm(cf[:, None, :] + pf - vf, axis=-1)     # [B, P]

        # entity negatives: for each (i, j) sample n_ent items k != i
        if neg_entity_idx is None:
            cand_ok = jnp.broadcast_to(
                ~jnp.eye(B, dtype=bool)[:, None, :], (B, P, B))
            if deterministic:
                rng = jax.random.PRNGKey(0)
            else:
                rng = self.make_rng("lpm")
            rng_e, rng_v = jax.random.split(rng)
            ent_idx, ent_ok = _sample_without_replacement(
                rng_e, (B, P, B), cand_ok, n_ent)
        else:
            ent_idx = neg_entity_idx                                  # [B, P, n_ent]
            # validity derives from the indices: a real candidate is != i
            ent_ok = ent_idx != jnp.arange(B)[:, None, None]
            rng_v = jax.random.PRNGKey(1)
        ent_ok = ent_ok & valid[:, :, None] & (B > 1)
        neg_ent = jnp.linalg.norm(
            cf[ent_idx] + pf[:, :, None, :] - vf[:, :, None, :], axis=-1)  # [B,P,n_ent]

        # value negatives: for each (i, j) sample n_val valid pairs k != j
        if neg_value_idx is None:
            pair_ok = valid[:, None, :] & ~jnp.eye(P, dtype=bool)[None, :, :]
            pair_ok = jnp.broadcast_to(pair_ok, (B, P, P))
            val_idx, val_ok = _sample_without_replacement(
                rng_v, (B, P, P), pair_ok, max(n_val, 1))
            val_idx = val_idx[..., :n_val]
            val_ok = val_ok[..., :n_val]
        else:
            val_idx = neg_value_idx                                   # [B, P, n_val]
            # a real candidate must be a VALID pair of the same item and != j
            val_ok = (val_idx != jnp.arange(P)[None, :, None])
            val_ok = val_ok & valid[jnp.arange(B)[:, None, None], val_idx]
        val_ok = val_ok & valid[:, :, None]
        b_idx = jnp.arange(B)[:, None, None]
        neg_val = jnp.linalg.norm(
            cf[:, None, None, :] + pf[:, :, None, :] - vf[b_idx, val_idx],
            axis=-1)                                                   # [B,P,n_val]

        pos_e = jnp.broadcast_to(pos[:, :, None], neg_ent.shape)
        pos_v = jnp.broadcast_to(pos[:, :, None], neg_val.shape)
        if cfg.fix_reference_bugs:
            # textbook TransE: positive norm should be SMALLER
            rank = lambda p, n: jax.nn.relu(margin + p - n)
        else:
            # reference MarginRankingLoss(pos, neg, y=1) = relu(margin - pos + neg)
            rank = lambda p, n: jax.nn.relu(margin - p + n)
        total = (jnp.where(ent_ok, rank(pos_e, neg_ent), 0.0).sum()
                 + jnp.where(val_ok, rank(pos_v, neg_val), 0.0).sum())
        count = ent_ok.sum() + val_ok.sum()
        loss = total / jnp.maximum(count, 1)
        return c_final, loss
