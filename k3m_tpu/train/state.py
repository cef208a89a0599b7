"""Train state + checkpointing.

The reference saves per-epoch (a) a bare state_dict `.bin` and (b) a full
`{model, optimizer, scheduler, global_step}` `.tar`
(train_concap_struc.py:691-705, pretrain.py:695-711). Here:

  * orbax checkpoints hold the full train state (params + optimizer state +
    step) for exact resume — the `.tar` equivalent;
  * a flax-msgpack params-only file (`params.msgpack`) is the `.bin`
    equivalent, loadable for finetune init.

A torch->jax converter for reference/HF BERT checkpoints lives in
k3m_tpu/train/convert.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import optax
from flax import serialization
from flax import struct

from k3m_tpu.config import K3MConfig


@struct.dataclass
class TrainState:
    step: Any  # int32 scalar array — see initial_step()
    params: Any
    opt_state: Any

    def apply_gradients(self, tx: optax.GradientTransformation, grads):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def apply_gradients_guarded(self, tx: optax.GradientTransformation,
                                grads):
        """apply_gradients that SKIPS the update (params and optimizer state
        unchanged) when any gradient element is non-finite, instead of
        corrupting the whole run with NaN params. The step counter still
        advances so RNG streams and schedules stay aligned with the data
        order. Returns (new_state, ok) with ok a bool scalar (False =
        skipped). All in-graph — no host sync, no branch recompile (a
        `where` select, not lax.cond, so the update math XLA already emits
        is reused). Beyond reference parity: the reference has no anomaly
        handling at all (torch amp's GradScaler skip exists only for fp16
        scaling, and the reference's bf16/fp32 paths run unguarded)."""
        import jax.numpy as jnp
        ok = jnp.bool_(True)
        for g in jax.tree.leaves(grads):
            ok &= jnp.all(jnp.isfinite(g))
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)

        def sel(new, old):
            return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

        return self.replace(step=self.step + 1,
                            params=sel(new_params, self.params),
                            opt_state=sel(new_opt_state, self.opt_state)), ok


def initial_step(mesh=None):
    """TrainState.step start value: a strong-typed int32 scalar, committed
    to `mesh` (replicated) when given.

    A Python-int 0 (weak-typed aval) or an uncommitted default-device
    scalar keys the jit cache differently from apply_gradients' output
    (a strong int32 array committed to the mesh) — so the SECOND
    train_step call would miss the cache and silently recompile the whole
    train step (measured: an extra ~8 min for the alignment step on the
    target host's tunneled chip; pinned by tests/test_no_recompile.py)."""
    import jax.numpy as jnp
    z = jnp.zeros((), jnp.int32)
    if mesh is None:
        return z
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.device_put(z, NamedSharding(mesh, PartitionSpec()))


def save_params_msgpack(params, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params_msgpack(params_template, path: str):
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())


class CheckpointManager:
    """Thin orbax wrapper: per-epoch full-state save + params-only export."""

    def __init__(self, directory: str, config: Optional[K3MConfig] = None):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(config.to_json_string())

    def save(self, state: TrainState, epoch: int) -> str:
        path = os.path.join(self.directory, f"epoch_{epoch}")
        # overwrite like the reference's per-epoch torch.save
        # (train_concap_struc.py:691-705) — re-running an epoch must not crash
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        save_params_msgpack(state.params, os.path.join(path, "params.msgpack"))
        self._ckptr.wait_until_finished()
        self._write_latest({"epoch": epoch, "dir": f"epoch_{epoch}"})
        return path

    def save_step(self, state: TrainState, epoch: int,
                  in_epoch_step: int) -> str:
        """Mid-epoch full-state save (periodic `save_steps` or preemption).

        `in_epoch_step` = number of batches of epoch `epoch` fully consumed;
        resume = restore() + fit(start_epoch=epoch, start_step=that) — exact,
        because the loaders are seed-deterministic and the train step keys
        every RNG off state.step (pretrain_loop._build_train_step). Beyond
        reference parity: the reference checkpoints only per epoch
        (train_concap_struc.py:691-705) and loses up to an epoch of work on
        preemption."""
        name = f"step_e{epoch}_s{in_epoch_step}"
        path = os.path.join(self.directory, name)
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        self._ckptr.wait_until_finished()
        self._write_latest({"epoch": epoch, "in_epoch_step": in_epoch_step,
                            "dir": name})
        return path

    def _write_latest(self, meta: dict) -> None:
        tmp = os.path.join(self.directory, "latest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.directory, "latest.json"))

    def latest(self) -> Optional[dict]:
        meta = os.path.join(self.directory, "latest.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)

    def latest_epoch(self) -> Optional[int]:
        meta = self.latest()
        return None if meta is None else meta["epoch"]

    def restore(self, state_template: TrainState,
                epoch: Optional[int] = None) -> Optional[TrainState]:
        if epoch is not None:
            d = f"epoch_{epoch}"
        else:
            meta = self.latest()
            if meta is None:
                return None
            d = meta.get("dir", f"epoch_{meta['epoch']}")
        path = os.path.join(self.directory, d, "state")
        return self._ckptr.restore(path, state_template)
