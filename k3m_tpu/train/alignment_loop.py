"""Item-alignment finetune: train loop, threshold-sweep eval, prediction.

Parity target: reference `finetune.py` (train :850-984, eval threshold sweep
:1092-1096, predict jsonl dump :1116-1212)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.alignment import K3MForItemAlignment
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.optim import make_optimizer
from k3m_tpu.train.state import CheckpointManager, TrainState, initial_step

logger = logging.getLogger(__name__)

ITEM_KEYS = ("input_ids", "input_mask", "segment_ids", "input_ids_pv",
             "input_mask_pv", "segment_ids_pv", "index_p", "index_v",
             "image_feat", "image_loc", "image_mask")


def device_item(item: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k: item[k] for k in ITEM_KEYS if k in item}


def _local_rows(x) -> np.ndarray:
    """This host's rows of a ('data',)-sharded output (row order preserved).

    On one host this is just device_get; on multi-host a global array's
    remote shards aren't addressable, so fetch the local shards — they
    correspond exactly to the rows this host's loader shard contributed.
    Scalars (loss) pass through."""
    if jax.process_count() == 1 or getattr(x, "ndim", 0) == 0:
        return np.asarray(jax.device_get(x))
    shards = sorted(x.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def precision_recall_f1(labels: np.ndarray, preds: np.ndarray):
    tp = float(((preds == 1) & (labels == 1)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


class AlignmentTrainer:
    def __init__(self, config: K3MConfig, *,
                 learning_rate: float = 5e-5,
                 warmup_steps: int = 0,
                 total_steps: int = 1000,
                 grad_accum_steps: int = 1,
                 micro_steps: int = 1,
                 micro_unroll: bool = False,
                 adam_eps: float = 1e-8,
                 seed: int = 42,
                 n_model: int = 1,
                 mesh: Optional[Any] = None,
                 wire: Optional[str] = None,
                 device_cache: Optional[bool] = None,
                 sample_batch: Optional[Dict] = None,
                 skip_nonfinite: bool = False):
        self.config = config
        # H2D wire codec mode ("fp" | "int8" | "exact"); see train/wire.py
        from k3m_tpu.train import wire as wire_lib
        self.wire = wire_lib.wire_mode(wire)
        # HBM-resident epoch cache (static-masking semantics; the
        # alignment pipeline has no per-epoch masking at all, so for
        # finetune the only frozen draw is the loader's pair shuffle
        # order — re-permuted per epoch anyway). See train/device_cache.py.
        self.device_cache = (bool(int(os.environ.get("K3M_DEVICE_CACHE", "0")))
                             if device_cache is None else device_cache)
        # In-step microbatching (same lever as PretrainTrainer: grads
        # averaged over micro_steps slices inside one jitted step — the
        # reference's own grad-accumulation normalization,
        # train_concap_struc.py:561-575). All three alignment loss types
        # are per-pair means (no cross-batch coupling), so slicing the
        # batch is semantics-preserving. The payoff: live activations cap
        # at one microbatch, letting per-layer remat (config.remat) turn
        # off within 16 GB HBM — the twin tower runs the tri-pass trunk
        # TWICE per step and its batch-32 bwd without remat overflows
        # otherwise.
        self.micro_steps = micro_steps
        self.micro_unroll = micro_unroll
        # skip (don't apply) updates with non-finite grads — see
        # TrainState.apply_gradients_guarded; --skip_nonfinite in finetune.py
        self.skip_nonfinite = skip_nonfinite
        self.model = K3MForItemAlignment(config)
        self.base_rng = jax.random.PRNGKey(seed)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            n_model=n_model)
        if sample_batch is None:
            raise ValueError("sample_batch required")
        label = sample_batch["label"]
        i1 = device_item(sample_batch["item1"])
        i2 = device_item(sample_batch["item2"])
        init_rngs = {"params": self.base_rng,
                     "gumbel": jax.random.fold_in(self.base_rng, 1)}
        from k3m_tpu.kernels.sharding import kernel_mesh_scope
        with kernel_mesh_scope(self.mesh):
            shapes = jax.eval_shape(lambda: self.model.init(
                init_rngs, label, i1, i2, deterministic=True))
            p_shardings = mesh_lib.params_shardings(shapes, self.mesh)
            params = jax.jit(lambda: self.model.init(
                init_rngs, label, i1, i2, deterministic=True),
                out_shardings=p_shardings)()
        self.tx = make_optimizer(params, learning_rate, warmup_steps,
                                 total_steps,
                                 grad_accum_steps=grad_accum_steps,
                                 adam_eps=adam_eps)
        opt_state = mesh_lib.commit_scalars(
            jax.jit(self.tx.init)(params), self.mesh)
        self.state = TrainState(step=initial_step(self.mesh), params=params,
                                opt_state=opt_state)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _build_train_step(self):
        def make_rngs(rng):
            return {"dropout": rng, "gumbel": jax.random.fold_in(rng, 1)}

        def step_fn(state: TrainState, label, i1, i2):
            rng = jax.random.fold_in(self.base_rng, state.step)

            def loss_fn(p):
                e1, e2, probs, loss = self.model.apply(
                    p, label, i1, i2, deterministic=False,
                    rngs=make_rngs(rng))
                return loss, probs

            (loss, probs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if self.skip_nonfinite:
                new_state, _ok = state.apply_gradients_guarded(
                    self.tx, grads)
            else:
                new_state = state.apply_gradients(self.tx, grads)
            return new_state, loss, probs

        def micro_step_fn(state: TrainState, label, i1, i2):
            M = self.micro_steps
            rng = jax.random.fold_in(self.base_rng, state.step)
            B = label.shape[0]
            if B % M:
                raise ValueError(f"batch {B} not divisible by micro_steps {M}")
            split = lambda x: x.reshape((M, B // M) + x.shape[1:])
            mb = (split(label), jax.tree.map(split, i1),
                  jax.tree.map(split, i2))

            def body(carry, xs):
                gacc, lacc = carry
                lb, b1, b2, i = xs

                def loss_fn(p):
                    e1, e2, probs, loss = self.model.apply(
                        p, lb, b1, b2, deterministic=False,
                        rngs=make_rngs(jax.random.fold_in(rng, 3 + i)))
                    return loss, probs

                (loss, probs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return (jax.tree.map(jnp.add, gacc, grads), lacc + loss), probs

            gacc0 = jax.tree.map(jnp.zeros_like, state.params)
            lacc0 = jnp.zeros((), jnp.float32)
            if self.micro_unroll:
                # no scan carry: the fp32 grad accumulator isn't
                # double-buffered and each add fuses into its producer
                # (see PretrainTrainer's micro_unroll note)
                carry, probs_parts = (gacc0, lacc0), []
                for i in range(M):
                    carry, probs_i = body(
                        carry, tuple(jax.tree.map(lambda x: x[i], m)
                                     for m in mb) + (jnp.int32(i),))
                    probs_parts.append(probs_i)
                (gsum, lsum), probs = carry, jnp.stack(probs_parts)
            else:
                (gsum, lsum), probs = jax.lax.scan(
                    body, (gacc0, lacc0), mb + (jnp.arange(M),))
            grads = jax.tree.map(lambda g: g / M, gsum)
            loss = lsum / M
            probs = probs.reshape((B,) + probs.shape[2:])
            if self.skip_nonfinite:
                new_state, _ok = state.apply_gradients_guarded(
                    self.tx, grads)
            else:
                new_state = state.apply_gradients(self.tx, grads)
            return new_state, loss, probs

        fn = micro_step_fn if self.micro_steps > 1 else step_fn

        def traced(state, label, i1, i2):
            # publish the mesh to the Pallas kernels while tracing
            from k3m_tpu.kernels.sharding import kernel_mesh_scope
            from k3m_tpu.model.layers import compute_dtype
            from k3m_tpu.train import wire as wire_lib
            dt = compute_dtype(self.config)
            i1, i2 = wire_lib.decode(i1, dt), wire_lib.decode(i2, dt)
            with kernel_mesh_scope(self.mesh):
                return fn(state, label, i1, i2)

        return jax.jit(traced, donate_argnums=(0,))

    def _build_eval_step(self):
        def step_fn(params, label, i1, i2):
            from k3m_tpu.kernels.sharding import kernel_mesh_scope
            from k3m_tpu.model.layers import compute_dtype
            from k3m_tpu.train import wire as wire_lib
            dt = compute_dtype(self.config)
            i1, i2 = wire_lib.decode(i1, dt), wire_lib.decode(i2, dt)
            with kernel_mesh_scope(self.mesh):
                return self.model.apply(params, label, i1, i2,
                                        deterministic=True)
        return jax.jit(step_fn)

    def _shard(self, batch):
        """Batch-shard (label, item1, item2) over the mesh — on multi-host,
        assembles per-host slices into global arrays (shard_batch's
        make_array_from_process_local_data path), same as the pretrain
        trainer. Under bf16 compute, image_feat is host-cast to bf16
        before transfer (numerically identical — the model casts it first
        thing; halves the dominant wire tensor, see pretrain_loop._stage)."""
        if isinstance(batch.get("label"), jax.Array):
            return batch   # already staged (prefetch_to_device)
        i1, i2 = device_item(batch["item1"]), device_item(batch["item2"])
        if self.wire == "int8":
            from k3m_tpu.train import wire as wire_lib
            for it in (i1, i2):
                if "image_feat" in it:
                    it[wire_lib.FEAT_Q], it[wire_lib.FEAT_S] = \
                        wire_lib.encode_feat(it.pop("image_feat"))
        elif self.wire == "fp" and self.config.dtype == "bfloat16":
            import ml_dtypes
            for it in (i1, i2):
                if "image_feat" in it:
                    it["image_feat"] = np.asarray(
                        it["image_feat"]).astype(ml_dtypes.bfloat16)
        return mesh_lib.shard_batch(
            dict(label=batch["label"], item1=i1, item2=i2), self.mesh)

    def train_step(self, batch):
        db = self._shard(batch)
        self.state, loss, probs = self._train_step(
            self.state, db["label"], db["item1"], db["item2"])
        return loss, probs

    def prefetch_to_device(self, loader, depth: "int | None" = None):
        """Stage `depth` batches ahead on a background thread so the wire
        encode + async H2D copy of batch N+1 overlap the device compute of
        batch N (shared staged_prefetch, train/prefetch.py — same pattern
        as PretrainTrainer.prefetch_to_device)."""
        from k3m_tpu.train.prefetch import staged_prefetch
        return staged_prefetch(loader, self._shard, depth)

    def eval_step(self, batch):
        db = self._shard(batch)
        out = self._eval_step(self.state.params, db["label"],
                              db["item1"], db["item2"])
        return tuple(_local_rows(x) for x in out)

    # ------------------------------------------------------------ phases

    def fit(self, train_loader: Iterable, val_loader=None, num_epochs: int = 1,
            start_epoch: int = 0, log_steps: int = 20,
            checkpoint_dir: Optional[str] = None):
        ckpt = (CheckpointManager(checkpoint_dir, self.config)
                if checkpoint_dir else None)
        if self.device_cache:
            from k3m_tpu.train.device_cache import DeviceEpochCache
            train_loader = DeviceEpochCache(train_loader, self._shard)
        history = []
        for epoch in range(start_epoch, num_epochs):
            if hasattr(train_loader, "epoch"):
                # pin the shuffle-permutation key to the true epoch index
                # (see PretrainTrainer.fit) so resume replays the same order
                train_loader.epoch = epoch
            t0 = time.time()
            n = 0
            for step, batch in enumerate(
                    self.prefetch_to_device(train_loader)):
                loss, _ = self.train_step(batch)
                n += len(batch["label"])
                if (step + 1) % log_steps == 0:
                    logger.info("epoch %d step %d loss %.4f", epoch, step + 1,
                                float(jax.device_get(loss)))
            summary = dict(epoch=epoch, seconds=time.time() - t0,
                           samples_per_sec=n / max(time.time() - t0, 1e-9))
            if val_loader is not None:
                summary["sweep"] = self.evaluate(val_loader, epoch)
            if ckpt is not None:
                ckpt.save(jax.device_get(self.state), epoch)
            history.append(summary)
        return history

    def evaluate(self, loader: Iterable, epoch: int = 0):
        """Threshold sweep 0.1..0.9 P/R/F1 (ref :1092-1096)."""
        all_probs, all_labels = [], []
        for batch in loader:
            _, _, probs, _ = jax.device_get(self.eval_step(batch))
            all_probs.append(np.asarray(probs))
            all_labels.append(np.asarray(batch["label"]))
        probs = np.concatenate(all_probs)
        labels = np.concatenate(all_labels).astype(int)
        if jax.process_count() > 1:
            # each host evaluated its loader shard; gather for the GLOBAL
            # sweep (identical result on every host) — equal-length shards
            # guarantee uniform gather shapes
            from jax.experimental import multihost_utils
            probs = np.concatenate(multihost_utils.process_allgather(probs))
            labels = np.concatenate(
                multihost_utils.process_allgather(labels)).astype(int)
        sweep = {}
        for threshold in np.arange(0.1, 1.0, 0.1):
            p, r, f1 = precision_recall_f1(labels, (probs >= threshold).astype(int))
            sweep[round(float(threshold), 1)] = dict(precision=p, recall=r, f1=f1)
            logger.info("[Epoch-%d] threshold=%.1f precision=%.4f recall=%.4f "
                        "f1=%.4f", epoch, threshold, p, r, f1)
        return sweep

    def predict(self, loader: Iterable, output_path: str,
                threshold: float = 0.5, log_steps: int = 100):
        """Embedding dump, format-compatible with ref :1119-1212.

        Multi-host: each host's loader shard is written to
        `<output_path>.part<process_index>` (item ids are host-local
        strings); concatenate the parts for the full jsonl."""
        if jax.process_count() > 1:
            output_path = f"{output_path}.part{jax.process_index()}"
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with open(output_path, "w", encoding="utf-8") as w:
            for step, batch in enumerate(loader):
                e1, e2, probs, _ = jax.device_get(self.eval_step(batch))
                ids1 = batch["item1"].get("item_id", [""] * len(e1))
                ids2 = batch["item2"].get("item_id", [""] * len(e2))
                for sid, tid, se, te in zip(ids1, ids2, np.asarray(e1),
                                            np.asarray(e2)):
                    fmt = lambda e: ("[" + ",".join(str(x) for x in e) + "]"
                                     if e.ndim else str(e))
                    w.write(json.dumps({
                        "src_item_id": sid, "src_item_emb": fmt(se),
                        "tgt_item_id": tid, "tgt_item_emb": fmt(te),
                        "threshold": threshold}) + "\n")
                if log_steps and step % log_steps == 0:
                    logger.info("[Prediction] %d batches processed", step)
        logger.info("[Prediction] finished -> %s", output_path)
