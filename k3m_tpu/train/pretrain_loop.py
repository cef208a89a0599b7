"""Pretraining driver: one jitted SPMD train step + epoch loop.

Replaces the reference's train loops (train_concap_struc.py:466-705,
pretrain.py:390-711) with a single `jax.jit`-compiled step over a device
mesh. Differences by design (TPU-first):

  * grads are averaged by GSPMD all-reduce on ICI, not DDP/NCCL;
  * loss logging is ASYNC: device scalars are fetched only every
    `log_steps`, so the step loop never blocks on D2H (the reference
    syncs every step, train_concap_struc.py:544-555 — its top non-compute
    bottleneck);
  * mixed precision is bf16 compute (config.dtype), no loss scaling needed.

Loss composition (ref :481-533):
  objective == 1: zero lm/image labels of rows where any is_next label != 0
  objective == 2: zero the alignment loss
  loss = masked_loss_t + masked_loss_v * loss_img_weight
         + masked_loss_pv + loss_struc      (alignment CE is logged only)
"""

from __future__ import annotations

import itertools
import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.pretrain import K3MForPretraining
from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.optim import make_optimizer
from k3m_tpu.train.state import CheckpointManager, TrainState, initial_step

logger = logging.getLogger(__name__)

LOSS_KEYS = ("masked_lm_loss", "masked_img_loss", "masked_lm_loss_pv",
             "next_sentence_loss_t_v_pv", "loss_struc", "loss")

BATCH_KEYS = ("input_ids", "input_mask", "segment_ids", "lm_label_ids",
              "is_next", "input_ids_pv", "input_mask_pv", "segment_ids_pv",
              "lm_label_ids_pv", "is_next_pv_v", "is_next_pv_t",
              "index_p", "index_v", "image_feat", "image_loc", "image_target",
              "image_label", "image_mask")


# RNG-replay injection seam (tests/test_trainer_trajectory.py): the
# reference draws its LPM negatives / Gumbel noise / NCE indices inside
# the torch forward (vilbert_k3m.py:2364,2480,2769); trajectory-parity
# tests replay those draws and feed them through the batch dict, which
# the trainer forwards to model.apply instead of drawing its own.
INJECT_KEYS = ("neg_entity_idx", "neg_value_idx", "gumbel_noise",
               "neg_image_idx")


def device_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    keep = BATCH_KEYS + INJECT_KEYS
    return {k: batch[k] for k in keep if k in batch}


def apply_objective(batch: Dict[str, jnp.ndarray], objective: int
                    ) -> Dict[str, jnp.ndarray]:
    """objective==1 label zeroing (ref train_concap_struc.py:481-493)."""
    if objective != 1:
        return batch
    if_replace = (batch["is_next"] + batch["is_next_pv_v"]
                  + batch["is_next_pv_t"])
    keep = (if_replace == 0).astype(jnp.int32)[:, None]

    def zero_to_ignore(labels):
        z = labels * keep
        return jnp.where(z == 0, -1, z)

    out = dict(batch)
    out["image_label"] = zero_to_ignore(batch["image_label"])
    out["lm_label_ids"] = zero_to_ignore(batch["lm_label_ids"])
    out["lm_label_ids_pv"] = zero_to_ignore(batch["lm_label_ids_pv"])
    return out


class PretrainTrainer:
    def __init__(self, config: K3MConfig, *,
                 learning_rate: float = 1e-4,
                 warmup_steps: int = 0,
                 total_steps: int = 1000,
                 weight_decay: float = 0.01,
                 grad_accum_steps: int = 1,
                 micro_steps: int = 1,
                 micro_unroll: bool = False,
                 skip_nonfinite: bool = False,
                 adam_eps: float = 1e-8,
                 loss_img_weight: float = 1.0,
                 objective: int = 0,
                 seed: int = 42,
                 n_model: int = 1,
                 pretrained_paths=None,
                 mesh: Optional[Any] = None,
                 wire: Optional[str] = None,
                 device_cache: Optional[bool] = None,
                 sample_batch: Optional[Dict[str, np.ndarray]] = None):
        self.config = config
        # H2D wire codec mode ("fp" | "int8" | "exact"); see train/wire.py
        from k3m_tpu.train import wire as wire_lib
        self.wire = wire_lib.wire_mode(wire)
        # keep each epoch's staged batches resident in HBM (static-masking
        # semantics; see train/device_cache.py). --device_cache on the CLIs.
        self.device_cache = (bool(int(os.environ.get("K3M_DEVICE_CACHE", "0")))
                             if device_cache is None else device_cache)
        self.model = K3MForPretraining(config)
        self.loss_img_weight = loss_img_weight
        self.objective = objective
        # In-step microbatching (lax.scan over micro_steps slices of the
        # batch, grads averaged): the reference's gradient-accumulation
        # semantics (loss normalized per microbatch,
        # train_concap_struc.py:561-575) inside ONE jitted step. It caps
        # live activations at one microbatch, which lets config.remat=False
        # fit in HBM — the remat recompute is ~18 TF/step at batch 96, so
        # trading it for accumulation is a pure win (136 -> 154
        # samples/s/chip measured on v5e at micro_steps=3).
        # In-batch-negative losses (visual_target=2 NCE, in_batch_pairs)
        # see a smaller negative pool per microbatch, so we refuse that
        # combination.
        if micro_steps > 1 and (config.visual_target == 2
                                or getattr(config, "in_batch_pairs", False)):
            raise ValueError(
                "micro_steps > 1 changes the in-batch negative pool of "
                "visual_target=2 / in_batch_pairs; use micro_steps=1")
        self.micro_steps = micro_steps
        self.micro_unroll = micro_unroll
        # Anomaly guard: skip (don't apply) any step whose gradients contain
        # non-finite values — see TrainState.apply_gradients_guarded. Off by
        # default for bit-exact reference parity; --skip_nonfinite in the
        # CLIs. When on, metrics carry "nonfinite_skipped" (1.0 = skipped).
        self.skip_nonfinite = skip_nonfinite
        self.base_rng = jax.random.PRNGKey(seed)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            n_model=n_model)
        # Pallas custom calls carry no GSPMD sharding rule, so on a
        # >1-device mesh every kernel call site is shard_mapped over the
        # batch axis instead (kernels/sharding.py) — the measured
        # use_pallas_ln lever survives pods. The mesh is published to the
        # kernels via kernel_mesh_scope while each step is traced.
        if sample_batch is None:
            raise ValueError("sample_batch required to initialize parameters")
        self._sample_batch = sample_batch   # retained for warmup()
        sample = device_batch(sample_batch)
        init_rngs = {"params": self.base_rng,
                     "gumbel": jax.random.fold_in(self.base_rng, 1),
                     "lpm": jax.random.fold_in(self.base_rng, 2)}
        from k3m_tpu.kernels.sharding import kernel_mesh_scope
        with kernel_mesh_scope(self.mesh):
            shapes = jax.eval_shape(
                lambda: self.model.init(init_rngs, sample, deterministic=True))
            p_shardings = mesh_lib.params_shardings(shapes, self.mesh)
            params = jax.jit(
                lambda: self.model.init(init_rngs, sample, deterministic=True),
                out_shardings=p_shardings)()
        self.tx = make_optimizer(
            params, learning_rate, warmup_steps, total_steps,
            weight_decay=weight_decay, grad_accum_steps=grad_accum_steps,
            pretrained_paths=pretrained_paths, adam_eps=adam_eps)
        # optimizer moments inherit the parameter shardings via jit inference
        opt_state = mesh_lib.commit_scalars(
            jax.jit(self.tx.init)(params), self.mesh)
        self.state = TrainState(step=initial_step(self.mesh), params=params,
                                opt_state=opt_state)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._compiled_step = None   # set by warmup()

    # ------------------------------------------------------------- steps

    def _losses(self, params, batch, rngs, deterministic: bool):
        inject = {k: batch[k] for k in INJECT_KEYS if k in batch}
        if inject:
            batch = {k: v for k, v in batch.items() if k not in INJECT_KEYS}
        out = self.model.apply(params, batch, deterministic=deterministic,
                               rngs=rngs, **inject)
        align = out["next_sentence_loss_t_v_pv"]
        if self.objective == 2:
            align = align * 0.0  # ref :497-500
        loss = (out["masked_lm_loss"]
                + out["masked_img_loss"] * self.loss_img_weight
                + out["masked_lm_loss_pv"] + out["loss_struc"])
        metrics = dict(
            loss=loss,
            masked_lm_loss=out["masked_lm_loss"],
            masked_img_loss=out["masked_img_loss"] * self.loss_img_weight,
            masked_lm_loss_pv=out["masked_lm_loss_pv"],
            next_sentence_loss_t_v_pv=align,
            loss_struc=out["loss_struc"],
        )
        return loss, metrics

    def _build_train_step(self):
        mesh = self.mesh

        def make_rngs(rng):
            return {"dropout": rng,
                    "gumbel": jax.random.fold_in(rng, 1),
                    "lpm": jax.random.fold_in(rng, 2)}

        def step_fn(state: TrainState, batch):
            batch = apply_objective(batch, self.objective)
            rng = jax.random.fold_in(self.base_rng, state.step)

            def loss_fn(p):
                return self._losses(p, batch, make_rngs(rng),
                                    deterministic=False)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            if self.skip_nonfinite:
                new_state, ok = state.apply_gradients_guarded(self.tx, grads)
                metrics["nonfinite_skipped"] = 1.0 - ok.astype(jnp.float32)
            else:
                new_state = state.apply_gradients(self.tx, grads)
            return new_state, metrics

        def micro_step_fn(state: TrainState, batch):
            M = self.micro_steps
            if any(k in batch for k in INJECT_KEYS):
                # injected negatives/noise index FULL-batch rows; slicing
                # them per microbatch would silently corrupt the draws
                raise ValueError("RNG-replay injection requires micro_steps=1")
            batch = apply_objective(batch, self.objective)
            rng = jax.random.fold_in(self.base_rng, state.step)
            B = batch["input_ids"].shape[0]
            if B % M:
                raise ValueError(f"batch {B} not divisible by micro_steps {M}")
            mb = jax.tree.map(
                lambda x: x.reshape((M, B // M) + x.shape[1:]), batch)

            def body(carry, xs):
                gacc, macc = carry
                b, i = xs

                def loss_fn(p):
                    return self._losses(
                        p, b, make_rngs(jax.random.fold_in(rng, 3 + i)),
                        deterministic=False)

                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                return (jax.tree.map(jnp.add, gacc, grads),
                        jax.tree.map(jnp.add, macc, metrics)), None

            gacc0 = jax.tree.map(jnp.zeros_like, state.params)
            macc0 = {k: jnp.zeros((), jnp.float32)
                     for k in ("loss", "masked_lm_loss", "masked_img_loss",
                               "masked_lm_loss_pv",
                               "next_sentence_loss_t_v_pv", "loss_struc")}
            if self.micro_unroll:
                # Unrolled accumulation: identical math to the scan below,
                # but no while-loop carry — the ~|params| fp32 accumulator
                # is not double-buffered across iterations and XLA fuses
                # each accumulator add into its grad producer. At the
                # batch-96 bench config the scan's carry pushes live HBM
                # past 16 GB and spills (profiled: param-grad accumulator
                # adds run ~100x over bandwidth bound).
                carry = (gacc0, macc0)
                for i in range(M):
                    carry, _ = body(
                        carry, (jax.tree.map(lambda x: x[i], mb),
                                jnp.int32(i)))
                gsum, msum = carry
            else:
                (gsum, msum), _ = jax.lax.scan(
                    body, (gacc0, macc0), (mb, jnp.arange(M)))
            grads = jax.tree.map(lambda g: g / M, gsum)
            metrics = {k: v / M for k, v in msum.items()}
            if self.skip_nonfinite:
                new_state, ok = state.apply_gradients_guarded(self.tx, grads)
                metrics["nonfinite_skipped"] = 1.0 - ok.astype(jnp.float32)
            else:
                new_state = state.apply_gradients(self.tx, grads)
            return new_state, metrics

        fn = micro_step_fn if self.micro_steps > 1 else step_fn

        def traced(state, batch):
            # publish the mesh to the Pallas kernels for the duration of
            # tracing (shard_map partitioning; kernels/sharding.py)
            from k3m_tpu.kernels.sharding import kernel_mesh_scope
            from k3m_tpu.model.layers import compute_dtype
            from k3m_tpu.train import wire as wire_lib
            batch = wire_lib.decode(batch, compute_dtype(self.config))
            with kernel_mesh_scope(mesh):
                return fn(state, batch)

        return jax.jit(traced, donate_argnums=(0,))

    def _build_eval_step(self):
        def step_fn(params, batch):
            from k3m_tpu.kernels.sharding import kernel_mesh_scope
            from k3m_tpu.model.layers import compute_dtype
            from k3m_tpu.train import wire as wire_lib
            batch = wire_lib.decode(batch, compute_dtype(self.config))
            with kernel_mesh_scope(self.mesh):
                batch = apply_objective(batch, self.objective)
                _, metrics = self._losses(
                    params, batch, rngs={}, deterministic=True)
                return metrics
        return jax.jit(step_fn)

    # -------------------------------------------------------------- api

    def _stage(self, batch):
        """Host batch -> sharded device arrays; no-op if already staged.

        Under bf16 compute, image_feat is cast to bf16 ON THE HOST before
        the transfer: the model's ImageEmbeddings casts it to the compute
        dtype as its first op anyway (model/layers.py), so this is
        numerically identical — and it halves the largest wire tensor
        (batch-96: 29 MB fp32 -> 14.5 MB), which matters when H2D rides a
        host<->chip link that serializes with execution.

        image_target (the 1601-way KL soft labels, visual_target=0) is the
        next-largest tensor (batch-96: 22.7 MB fp32) and IS consumed in
        fp32 (model/pretrain.py:141) — but its values are softmax probs in
        [0,1], which float16 carries at 2^-11 relative error (vs bf16's
        2^-8); probs below fp16-subnormal 6e-8 contribute nothing to the
        KL. So under bf16 compute it ships as fp16 and is up-cast on
        device: ~0.05% relative perturbation of the img-loss term only,
        far inside the bf16 noise floor of the rest of the step. Disable
        with K3M_EXACT_TARGETS=1 for bit-exact fp32 labels.

        wire="int8" (K3M_WIRE=int8) goes further: per-row int8 image_feat
        + uint8 image_target with on-device dequant (train/wire.py),
        ~13 MB/batch at the reference configuration vs 26 MB fp/bf16 wire.
        wire="exact" ships fp32 everything."""
        if isinstance(batch.get("input_ids"), jax.Array):
            return batch
        b = device_batch(batch)
        quantize_target = (self.config.visual_target == 0
                           and "image_target" in b
                           and not os.environ.get("K3M_EXACT_TARGETS"))
        if self.wire == "int8" and "image_feat" in b:
            from k3m_tpu.train import wire as wire_lib
            b = wire_lib.encode_pretrain(b, quantize_target=quantize_target)
        elif (self.wire == "fp" and self.config.dtype == "bfloat16"
                and "image_feat" in b):
            import ml_dtypes
            b["image_feat"] = np.asarray(b["image_feat"]).astype(
                ml_dtypes.bfloat16)
            if quantize_target:
                b["image_target"] = np.asarray(b["image_target"]).astype(
                    np.float16)
        return mesh_lib.shard_batch(b, self.mesh)

    def prefetch_to_device(self, loader: Iterable, depth: "int | None" = None):
        """Stage `depth` batches ahead of the consumer on a background
        thread (train/prefetch.py): both the host wire-encode and the
        async H2D copy of batch N+1 (tens of MB — the whole bottleneck on
        a tunneled chip) overlap the device compute of batch N; the
        device_put overlap alone measured 70.5 -> ~140 samples/s/chip on
        the e2e fit() path (r2), the r5 thread takes the int8 encode off
        the step loop too. Depth default 2; K3M_PREFETCH_DEPTH overrides."""
        from k3m_tpu.train.prefetch import staged_prefetch
        return staged_prefetch(loader, self._stage, depth)

    def warmup(self, batch: Dict[str, np.ndarray],
               barrier_timeout_s: int = 1800) -> None:
        """AOT-compile the train step WITHOUT executing it, then hold all
        processes at a coordination-service barrier until everyone finished
        compiling. Subsequent train_step calls run the compiled executable.

        Multi-process motivation (see jax_setup.distributed_barrier): the
        first jitted call both compiles and executes, so a fast host can
        dispatch the first collective while a slow host is still minutes
        into compilation — past the CPU-Gloo communicator rendezvous
        window. AOT-compile + barrier removes the skew entirely."""
        from k3m_tpu.utils.jax_setup import distributed_barrier
        staged = self._stage(batch)
        self._compiled_step = self._train_step.lower(
            self.state, staged).compile()
        distributed_barrier("k3m_train_step_compiled", barrier_timeout_s)

    def train_step(self, batch: Dict[str, np.ndarray]):
        step = self._compiled_step or self._train_step
        self.state, metrics = step(self.state, self._stage(batch))
        return metrics

    def load_state(self, restored: TrainState) -> None:
        """Install a restored (host-array) TrainState under the trainer's
        existing shardings — mesh-committed exactly like the initial state,
        so the jitted step's cache signature is unchanged (a bare numpy
        state would silently recompile; see mesh.commit_scalars)."""
        shardings = jax.tree.map(lambda x: x.sharding, self.state)
        self.state = jax.device_put(restored, shardings)

    def eval_step(self, batch: Dict[str, np.ndarray]):
        return self._eval_step(self.state.params, self._stage(batch))

    def fit(self, train_loader: Iterable, val_loader: Optional[Iterable] = None,
            num_epochs: int = 1, start_epoch: int = 0, log_steps: int = 20,
            checkpoint_dir: Optional[str] = None,
            save_checkpoints: bool = True, save_steps: Optional[int] = None,
            start_step: int = 0, handle_preemption: bool = True):
        """Train for [start_epoch, num_epochs) epochs.

        Failure/elastic-recovery extensions beyond the reference's per-epoch
        torch.save (train_concap_struc.py:691-705):
          save_steps=N       — additionally checkpoint full state every N
                               batches (CheckpointManager.save_step).
          start_step=K       — skip the first K batches of `start_epoch`
                               (exact mid-epoch resume: loaders are
                               seed-deterministic and all step RNGs key off
                               state.step).
          handle_preemption  — on SIGTERM (the cloud-TPU preemption signal),
                               finish the in-flight step, save a mid-epoch
                               checkpoint, and return cleanly; the next run
                               auto-resumes from it.

        With device_cache on, epoch 1 stages the train set into HBM and
        epochs 2+ iterate on-device at the staged rate — zero input wire
        traffic (train/device_cache.py; falls back to streaming when the
        epoch exceeds the HBM budget).
        """
        import itertools
        import signal
        import threading

        if self.device_cache:
            from k3m_tpu.train.device_cache import DeviceEpochCache
            train_loader = DeviceEpochCache(train_loader, self._stage)

        ckpt = (CheckpointManager(checkpoint_dir, self.config)
                if checkpoint_dir and save_checkpoints else None)
        mlog = None
        if checkpoint_dir:
            from k3m_tpu.utils.metrics import MetricsLogger
            mlog = MetricsLogger(checkpoint_dir)
        if jax.process_count() > 1 and self._compiled_step is None:
            # multi-process: compile-then-barrier so no host dispatches the
            # first collective while another is still compiling (warmup())
            self.warmup(self._sample_batch)

        preempted = threading.Event()
        old_handler = None
        if handle_preemption and threading.current_thread() is threading.main_thread():
            def _on_sigterm(signum, frame):
                logger.info("SIGTERM: will checkpoint at the next step "
                            "boundary and exit cleanly")
                preempted.set()
            try:
                old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:          # non-main interpreter contexts
                old_handler = None

        def _preempt_save(epoch, done_steps):
            if ckpt is not None:
                ckpt.save_step(jax.device_get(self.state), epoch, done_steps)
                logger.info("preemption checkpoint: epoch %d after %d "
                            "batches", epoch, done_steps)

        history = []
        try:
            for epoch in range(start_epoch, num_epochs):
                for ld in (train_loader, val_loader):
                    if hasattr(ld, "epoch"):
                        # pin the loader's shuffle/RNG key to the TRUE epoch
                        # index (the loader's own counter is process-local
                        # and restarts at 0), so a resumed run reproduces
                        # the uninterrupted run's data order exactly
                        ld.epoch = epoch
                t0 = time.time()
                pending = []   # async metric fetch: never block the step loop
                n_samples = 0
                it = iter(train_loader)
                step0 = 0
                if epoch == start_epoch and start_step:
                    it = itertools.islice(it, start_step, None)
                    step0 = start_step
                for step, batch in enumerate(
                        self.prefetch_to_device(it), start=step0):
                    metrics = self.train_step(batch)
                    pending.append(metrics)
                    n_samples += batch["input_ids"].shape[0]
                    if save_steps and ckpt is not None \
                            and (step + 1) % save_steps == 0:
                        ckpt.save_step(jax.device_get(self.state), epoch, step + 1)
                    if preempted.is_set():
                        _preempt_save(epoch, step + 1)
                        history.append(dict(epoch=epoch, preempted_at_step=step + 1))
                        return history
                    if (step + 1) % log_steps == 0:
                        m = jax.device_get(pending[-1])
                        if float(m.get("nonfinite_skipped", 0.0)):
                            logger.warning(
                                "epoch %d step %d: non-finite grads — "
                                "update skipped", epoch, step + 1)
                        logger.info(
                            "epoch %d step %d loss %.3f t %.3f v %.3f pv %.3f "
                            "tri %.3f align %.3f", epoch, step + 1,
                            float(m["loss"]), float(m["masked_lm_loss"]),
                            float(m["masked_img_loss"]),
                            float(m["masked_lm_loss_pv"]), float(m["loss_struc"]),
                            float(m["next_sentence_loss_t_v_pv"]))
                        if mlog is not None:
                            mlog.log(int(jax.device_get(self.state.step)),
                                     {k: float(v) for k, v in m.items()})
                        pending = pending[-1:]
                dt = time.time() - t0
                epoch_summary = dict(epoch=epoch, seconds=dt,
                                     samples_per_sec=n_samples / max(dt, 1e-9))
                if val_loader is not None:
                    vals = []
                    for batch in self.prefetch_to_device(val_loader):
                        vals.append(jax.device_get(self.eval_step(batch)))
                    for k in LOSS_KEYS:
                        epoch_summary[f"val_{k}"] = float(
                            np.mean([v[k] for v in vals])) if vals else float("nan")
                    logger.info("epoch %d eval: %s", epoch, {
                        k: round(v, 4) for k, v in epoch_summary.items()
                        if k.startswith("val_")})
                if ckpt is not None:
                    ckpt.save(jax.device_get(self.state), epoch)
                history.append(epoch_summary)
            return history
        finally:
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)
