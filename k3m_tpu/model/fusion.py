"""Modality fusion ("pre-sampling") strategies.

Parity target: reference pre_sampling_sequence / pre_sampling_sequence_soft /
get_sequence_pooled_output_final (vilbert_k3m/vilbert_k3m.py:2274-2411).

Each modality's final sequence combines its *individual* embedding (the
pre-encoder embedding output) with its two *interactive* outputs:

  if_pre_sampling == 0: mean of the three                       (ref :2388-2391)
  if_pre_sampling == 1: HARD straight-through Gumbel-softmax selection over
                        three learned sigmoid scores             (ref :2331-2374)
  if_pre_sampling == 2: SOFT sigmoid-weighted concat + projection (ref :2300-2329)
  else (3):             mean of the two interactive outputs      (ref :2399-2402)

Pooled outputs are the mean over tokens 1: (skipping CLS/global token), with
the visual one mapped bi_hidden -> hidden via `map_bi_to_individual`
(ref :2404-2409).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.layers import compute_dtype, dense_init


def gumbel_softmax_hard(logits: jnp.ndarray, rng, axis: int,
                        noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Straight-through hard Gumbel-softmax, tau=1 (torch F.gumbel_softmax
    with hard=True, ref :2364). `noise` optionally injects pre-drawn Gumbel
    noise (parity replay of torch's global-generator draws)."""
    if noise is not None:
        g = noise.astype(jnp.float32)
    else:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0)
            + 1e-20))
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + g), axis=axis)
    index = jnp.argmax(y_soft, axis=axis, keepdims=True)
    # one-hot by iota comparison — put_along_axis lowers to a sort-based
    # scatter on TPU (tens of ms per step at batch 96)
    iota = jax.lax.broadcasted_iota(jnp.int32, y_soft.shape, axis)
    y_hard = (iota == index).astype(y_soft.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


class ModalityFusion(nn.Module):
    """Fusion for one modality. `size` is the working hidden size
    (bi_hidden_size for 'v', hidden_size for 't'/'pv'); `num_modes` is 3 when
    the image stream is active else 2 (ref :2221-2250)."""
    config: K3MConfig
    size: int
    num_modes: int
    modality: str  # 'v' | 't' | 'pv'

    @nn.compact
    def __call__(self, individual, c1, c2, *, deterministic: bool,
                 gumbel_noise: Optional[jnp.ndarray] = None):
        cfg = self.config
        if individual is None:
            return None
        strategy = cfg.if_pre_sampling
        if strategy == 0:
            return (individual + c1 + c2) / 3.0
        if strategy not in (1, 2):
            return (c1 + c2) / 2.0

        dtype = compute_dtype(cfg)
        init = dense_init(cfg.initializer_range)
        d = lambda n: nn.Dense(self.size, kernel_init=init, dtype=dtype, name=n)
        ind = jax.nn.relu(individual)
        r1 = jax.nn.relu(c1) if c1 is not None else None
        r2 = jax.nn.relu(c2) if c2 is not None else None
        feats = jnp.concatenate([f for f in (ind, r1, r2) if f is not None], axis=2)

        if strategy == 2:  # soft (ref :2300-2329)
            a_s = jax.nn.sigmoid(d(f"score_self_{self.modality}")(feats))
            a_1 = jax.nn.sigmoid(d(f"score_cross1_{self.modality}")(feats))
            a_2 = jax.nn.sigmoid(d(f"score_cross2_{self.modality}")(feats))
            mixed = jnp.concatenate([ind * a_s, r1 * a_1, r2 * a_2], axis=2)
            return d(f"soft_{self.modality}")(mixed)

        # strategy == 1: hard straight-through gumbel (ref :2331-2374)
        alphas = [jax.nn.sigmoid(d(f"score_self_{self.modality}")(feats))[..., None, :]]
        if r1 is not None:
            alphas.append(jax.nn.sigmoid(
                d(f"score_cross1_{self.modality}")(feats))[..., None, :])
        if r2 is not None:
            alphas.append(jax.nn.sigmoid(
                d(f"score_cross2_{self.modality}")(feats))[..., None, :])
        ak = jnp.concatenate(alphas, axis=2)  # [B, L, n_opts, size]
        if gumbel_noise is not None:
            # parity replay: torch F.gumbel_softmax samples even under
            # model.eval() (ref :2364) — injected noise reproduces it
            a_index = gumbel_softmax_hard(ak, None, axis=2,
                                          noise=gumbel_noise)
        elif deterministic:
            # eval: deterministic argmax selection (one-hot, no gumbel
            # noise). DOCUMENTED DEVIATION from torch, which still samples
            # gumbel noise in eval mode; pass gumbel_noise to replay that.
            index = jnp.argmax(ak, axis=2, keepdims=True)
            iota = jax.lax.broadcasted_iota(jnp.int32, ak.shape, 2)
            a_index = (iota == index).astype(ak.dtype)
        else:
            a_index = gumbel_softmax_hard(ak, self.make_rng("gumbel"), axis=2)
        out = ind * a_index[:, :, 0, :]
        i = 1
        if r1 is not None:
            out = out + r1 * a_index[:, :, i, :]
            i += 1
        if r2 is not None:
            out = out + r2 * a_index[:, :, i, :]
        return out.astype(individual.dtype)


class FusionBlock(nn.Module):
    """get_sequence_pooled_output_final (ref :2376-2411) for all modalities."""
    config: K3MConfig

    @nn.compact
    def __call__(self,
                 t_with_v, v_with_t, pv_with_v, v_with_pv, t_with_pv, pv_with_t,
                 individual_txt, individual_pv, individual_v,
                 *, deterministic: bool,
                 gumbel_noise=None) -> Tuple[Optional[jnp.ndarray], ...]:
        cfg = self.config
        gn = gumbel_noise or {}
        num_modes = 3 if cfg.use_image else 2
        seq_v = None
        if cfg.use_image:
            seq_v = ModalityFusion(cfg, cfg.bi_hidden_size, num_modes, "v",
                                   name="fusion_v")(
                individual_v, v_with_t, v_with_pv, deterministic=deterministic,
                gumbel_noise=gn.get("v"))
        seq_t = ModalityFusion(cfg, cfg.hidden_size, num_modes, "t",
                               name="fusion_t")(
            individual_txt, t_with_v, t_with_pv, deterministic=deterministic,
            gumbel_noise=gn.get("t"))
        seq_pv = ModalityFusion(cfg, cfg.hidden_size, num_modes, "pv",
                                name="fusion_pv")(
            individual_pv, pv_with_v, pv_with_t, deterministic=deterministic,
            gumbel_noise=gn.get("pv"))

        pooled_v = None
        if cfg.use_image:
            pooled_v = nn.Dense(cfg.hidden_size,
                                kernel_init=dense_init(cfg.initializer_range),
                                dtype=compute_dtype(cfg),
                                name="map_bi_to_individual")(
                jnp.mean(seq_v[:, 1:, :], axis=1))
        pooled_t = jnp.mean(seq_t[:, 1:, :], axis=1)
        pooled_pv = jnp.mean(seq_pv[:, 1:, :], axis=1)
        return seq_v, seq_t, seq_pv, pooled_v, pooled_t, pooled_pv
