"""The second train_step must not trigger a second XLA compilation.

Two silent-retrace sources are pinned here (both measured as an extra
full-step compile — ~8 min for the full-size alignment step on the target
host's tunneled chip):

  * TrainState.step starting as a weak-typed Python int / an uncommitted
    scalar while apply_gradients returns a mesh-committed int32 array
    (fixed by state.initial_step(mesh));
  * optax step counters coming out of jit(tx.init) without the mesh
    context the train step imprints on its outputs (fixed by
    mesh.commit_scalars).

Detection: jax_log_compiles emits one "Compiling ..." record per actual
XLA compilation; after the first step there must be none.
"""

import contextlib
import logging

import numpy as np
import pytest

import jax

from tests.conftest import NANO, make_nano_batch, single_mesh

# NANO + 1-device mesh: the retrace sources under test (weak-typed step,
# uncommitted optimizer scalars) are about sharding commitment, which a
# 1-device Mesh's NamedShardings exercise identically — at a fraction of
# the TINY-on-8-devices compile cost.


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.n = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            self.n += 1


@contextlib.contextmanager
def count_compiles():
    counter = _CompileCounter()
    root = logging.getLogger()
    jax.config.update("jax_log_compiles", True)
    root.addHandler(counter)
    # the compile log goes through jax's internal loggers; ensure they
    # propagate to root where our handler sits
    try:
        yield counter
    finally:
        root.removeHandler(counter)
        jax.config.update("jax_log_compiles", False)


def test_pretrain_later_steps_do_not_recompile():
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    batch = make_nano_batch(B=8)
    t = PretrainTrainer(NANO, learning_rate=1e-3, warmup_steps=0,
                        total_steps=10, sample_batch=batch,
                        mesh=single_mesh(), seed=7)
    t.train_step(batch)   # compiles once
    with count_compiles() as c:
        t.train_step(batch)
        t.train_step(batch)
    assert c.n == 0, (
        f"{c.n} recompile(s) after the first step (weak-typed "
        "TrainState.step or uncommitted optimizer scalars?)")


def test_alignment_later_steps_do_not_recompile():
    from k3m_tpu.train.alignment_loop import AlignmentTrainer
    tiny_config = NANO
    rng = np.random.default_rng(0)
    B, L, Lpv, R, P = 8, 10, 16, 5, 4
    item = lambda: dict(
        input_ids=rng.integers(1, tiny_config.vocab_size, (B, L)).astype(np.int32),
        input_mask=np.ones((B, L), np.int32),
        segment_ids=np.zeros((B, L), np.int32),
        input_ids_pv=rng.integers(1, tiny_config.vocab_size, (B, Lpv)).astype(np.int32),
        input_mask_pv=np.ones((B, Lpv), np.int32),
        segment_ids_pv=np.zeros((B, Lpv), np.int32),
        index_p=np.zeros((B, P, 2), np.int32),
        index_v=np.zeros((B, P, 2), np.int32),
        image_feat=rng.normal(size=(B, R + 1, tiny_config.v_feature_size)
                              ).astype(np.float32),
        image_loc=rng.normal(size=(B, R + 1, 5)).astype(np.float32),
        image_mask=np.ones((B, R + 1), np.int32),
    )
    batch = dict(label=np.array([0, 1, 1, 0, 1, 0, 0, 1], np.float32),
                 item1=item(), item2=item())
    t = AlignmentTrainer(tiny_config, learning_rate=1e-3, warmup_steps=0,
                         total_steps=10, sample_batch=batch,
                         mesh=single_mesh(), seed=7)
    t.train_step(batch)   # compiles once
    with count_compiles() as c:
        t.train_step(batch)
        t.train_step(batch)
    assert c.n == 0, (
        f"{c.n} recompile(s) after the first step (weak-typed "
        "TrainState.step or uncommitted optimizer scalars?)")
