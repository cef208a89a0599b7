"""Optimizer construction: AdamW with the reference's grouping rules.

Parity target (train_concap_struc.py:352-448, pretrain.py:372-384):
  * weight decay 0.01, EXCEPT biases and LayerNorm params         (:244)
  * when starting from pretrained BERT weights, those weights get 0.1x LR
    (:372-373)
  * AdamW betas (0.9, 0.98) — every reference driver passes them
    explicitly (train_concap_struc.py:440, pretrain.py:376, finetune.py:360)
  * WarmupLinearSchedule: linear 0 -> lr over warmup, then linear decay to 0
    (pytorch_transformers WarmupLinearSchedule; local `warmup_linear`
    helpers at train_concap_struc.py:60-65)
  * gradient accumulation via optax.MultiSteps                    (:561-588)

Implemented with optax.inject_hyperparams + a per-parameter lr-scale mask so
one update call covers all groups under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Set

import jax
import jax.numpy as jnp
import optax

NO_DECAY_SUBSTRINGS = ("bias", "LayerNorm", "_LayerNorm")


def is_no_decay(path: tuple) -> bool:
    """bias / LayerNorm params are excluded from weight decay (ref :244).

    Flax param paths end in ('kernel'|'bias'|'scale'|'embedding'...); our
    LayerNorm params are ('...LayerNorm', 'scale'|'bias').
    """
    joined = "/".join(str(p) for p in path)
    return ("bias" in joined) or ("LayerNorm" in joined)


def warmup_linear_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> optax.Schedule:
    """Triangular schedule matching WarmupLinearSchedule (ref :60-65)."""
    warmup_steps = max(int(warmup_steps), 1)
    total_steps = max(int(total_steps), warmup_steps + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps
        decay = jnp.maximum(
            (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1), 0.0)
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def make_optimizer(params: Any,
                   learning_rate: float,
                   warmup_steps: int,
                   total_steps: int,
                   weight_decay: float = 0.01,
                   grad_accum_steps: int = 1,
                   pretrained_paths: Optional[Set[str]] = None,
                   max_grad_norm: float = 0.0,
                   adam_eps: float = 1e-8,
                   b1: float = 0.9,
                   b2: float = 0.98,
                   ) -> optax.GradientTransformation:
    """Build the full optax chain.

    pretrained_paths: set of '/'-joined param paths that were loaded from a
    pretrained BERT checkpoint -> they get 0.1x LR (ref :372-373).
    """
    schedule = warmup_linear_schedule(learning_rate, warmup_steps, total_steps)

    flat = jax.tree_util.tree_leaves_with_path(params)

    def path_str(path):
        return "/".join(getattr(k, "key", str(k)) for k in path)

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: not is_no_decay(tuple(getattr(k, "key", str(k)) for k in p)),
        params)
    lr_scale = jax.tree_util.tree_map_with_path(
        lambda p, _: 0.1 if (pretrained_paths and path_str(p) in pretrained_paths)
        else 1.0, params)

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.extend([
        # betas default (0.9, 0.98): the reference's explicit choice in all
        # three drivers (train_concap_struc.py:440), NOT Adam's textbook
        # 0.999 — a trajectory-visible semantic (tests/test_trainer_trajectory.py)
        optax.scale_by_adam(b1=b1, b2=b2, eps=adam_eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.scale_by_learning_rate(schedule),
        # per-parameter lr multiplier (0.1x for pretrained weights)
        optax.masked(optax.scale(0.1),
                     jax.tree.map(lambda s: s == 0.1, lr_scale))
        if pretrained_paths else optax.identity(),
    ])
    tx = optax.chain(*chain)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
