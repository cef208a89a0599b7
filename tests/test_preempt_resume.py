"""Preemption-safe checkpointing + exact mid-epoch resume (beyond-reference
failure recovery: the reference checkpoints per epoch only,
train_concap_struc.py:691-705, and loses up to an epoch of work on
preemption).

Guarantee under test: SIGTERM mid-epoch -> fit() finishes the in-flight
step, saves a full-state step checkpoint, and returns; restoring it and
resuming with fit(start_epoch, start_step) reproduces the uninterrupted
run EXACTLY, because the loaders are deterministic and every train-step RNG
keys off state.step (pretrain_loop._build_train_step make_rngs).
"""

import os
import signal

import numpy as np
import pytest

import jax

from tests.conftest import TINY, make_pretrain_batch

N_BATCHES = 5


def _batches(cfg):
    return [make_pretrain_batch(cfg, B=8, seed=100 + i)
            for i in range(N_BATCHES)]


def _trainer(cfg):
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    return PretrainTrainer(cfg, learning_rate=1e-3, warmup_steps=0,
                           total_steps=2 * N_BATCHES,
                           sample_batch=make_pretrain_batch(cfg, B=8), seed=5)


def _params_vec(state):
    return np.concatenate([np.asarray(x, np.float32).ravel()
                           for x in jax.tree.leaves(state.params)])


class SigtermAfter:
    """Iterable over `batches` that raises SIGTERM in-process when the
    consumer pulls batch index `at` (simulating a cloud preemption notice
    arriving while the input pipeline runs ahead of the device)."""

    def __init__(self, batches, at):
        self.batches, self.at = batches, at

    def __iter__(self):
        for i, b in enumerate(self.batches):
            if i == self.at:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b


@pytest.mark.slow
def test_sigterm_checkpoint_and_exact_resume(tmp_path):
    cfg = TINY
    bs = _batches(cfg)

    ref = _trainer(cfg)
    ref.fit(bs, num_epochs=1, log_steps=100, save_checkpoints=False)
    ref_vec = _params_vec(ref.state)

    # --- preempted run: SIGTERM while the prefetcher pulls batch 2
    t1 = _trainer(cfg)
    hist = t1.fit(SigtermAfter(bs, at=2), num_epochs=1, log_steps=100,
                  checkpoint_dir=str(tmp_path))
    assert hist and "preempted_at_step" in hist[-1]
    done = hist[-1]["preempted_at_step"]
    assert 0 < done < N_BATCHES

    from k3m_tpu.train.state import CheckpointManager
    cm = CheckpointManager(str(tmp_path))
    meta = cm.latest()
    assert meta == {"epoch": 0, "in_epoch_step": done,
                    "dir": f"step_e0_s{done}"}

    # --- fresh process-equivalent: new trainer, restore, resume mid-epoch
    t2 = _trainer(cfg)
    restored = cm.restore(jax.device_get(t2.state))
    assert restored is not None
    t2.load_state(restored)
    assert int(jax.device_get(t2.state.step)) == done
    t2.fit(bs, num_epochs=1, start_epoch=meta["epoch"],
           start_step=meta["in_epoch_step"], log_steps=100,
           save_checkpoints=False)
    np.testing.assert_allclose(_params_vec(t2.state), ref_vec, atol=1e-6,
                               err_msg="mid-epoch resume diverged from the "
                                       "uninterrupted run")


@pytest.mark.slow
def test_save_steps_writes_step_checkpoints(tmp_path):
    cfg = TINY
    bs = _batches(cfg)
    t = _trainer(cfg)
    t.fit(bs, num_epochs=1, log_steps=100, checkpoint_dir=str(tmp_path),
          save_steps=2)
    assert os.path.isdir(tmp_path / "step_e0_s2")
    assert os.path.isdir(tmp_path / "step_e0_s4")
    # the end-of-epoch save supersedes step checkpoints as the resume point
    from k3m_tpu.train.state import CheckpointManager
    assert CheckpointManager(str(tmp_path)).latest() == {
        "epoch": 0, "dir": "epoch_0"}
