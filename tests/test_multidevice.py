"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer
from tests.conftest import TINY, make_pretrain_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = mesh_lib.make_mesh(n_model=2)
    assert mesh.devices.shape == (4, 2)
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.shape == (8, 1)


def test_param_specs():
    from jax.sharding import PartitionSpec as P
    v = np.zeros((8, 16))
    assert mesh_lib.param_spec("trunk/encoder/layer_0/attention/query/kernel",
                               v) == P(None, "model")
    assert mesh_lib.param_spec("trunk/encoder/layer_0/output/kernel",
                               v) == P("model", None)
    assert mesh_lib.param_spec("trunk/word_embeddings", v) == P("model", None)
    assert mesh_lib.param_spec("trunk/embeddings/LayerNorm/scale",
                               np.zeros((16,))) == P()


@pytest.mark.slow
def test_dp_train_step_runs_and_decreases_loss():
    batch = make_pretrain_batch(TINY, B=8)
    trainer = PretrainTrainer(
        TINY, learning_rate=5e-4, warmup_steps=1, total_steps=50,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_model=1))
    losses = []
    for _ in range(6):
        m = trainer.train_step(batch)
        losses.append(float(jax.device_get(m["loss"])))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # same batch -> loss must drop


@pytest.mark.slow
def test_dp_tp_mesh_train_step():
    batch = make_pretrain_batch(TINY, B=8)
    trainer = PretrainTrainer(
        TINY, learning_rate=1e-4, warmup_steps=1, total_steps=10,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_data=4, n_model=2))
    m = trainer.train_step(batch)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    # params actually sharded on the model axis
    q = trainer.state.params["params"]["trunk"]["encoder"]["layer_0"][
        "attention"]["query"]["kernel"]
    assert not q.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_equals_single_device():
    """The sharded step must produce the same loss as a 1-device step."""
    batch = make_pretrain_batch(TINY, B=8)
    t1 = PretrainTrainer(
        TINY, learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
        sample_batch=batch,
        mesh=mesh_lib.make_mesh(n_data=1, n_model=1,
                                devices=jax.devices()[:1]))
    t8 = PretrainTrainer(
        TINY, learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_model=1))
    m1 = jax.device_get(t1.train_step(batch))
    m8 = jax.device_get(t8.train_step(batch))
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=2e-4)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_tp_equals_dp_loss():
    """Tensor parallelism must be a pure layout choice: the DPxTP (4x2)
    sharded step and the DP-only (8x1) step compute the same math, so
    their losses agree to reduction-order noise across multiple steps."""
    batch = make_pretrain_batch(TINY, B=8)
    t_dp = PretrainTrainer(
        TINY, learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_data=8, n_model=1))
    t_tp = PretrainTrainer(
        TINY, learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
        sample_batch=batch, mesh=mesh_lib.make_mesh(n_data=4, n_model=2))
    for step in range(2):
        m_dp = jax.device_get(t_dp.train_step(batch))
        m_tp = jax.device_get(t_tp.train_step(batch))
        np.testing.assert_allclose(m_dp["loss"], m_tp["loss"], rtol=5e-4,
                                   err_msg=f"step {step}")


@pytest.mark.slow
def test_alignment_tp_equals_dp():
    """The item-alignment twin tower must also be layout-invariant: DPxTP
    (4x2) and DP-only (8x1) training steps agree to reduction-order noise.
    (The pretrain-model TP tests above don't cover K3MForItemAlignment's
    twin-tower apply / pair batching path.)"""
    from k3m_tpu.train.alignment_loop import AlignmentTrainer, device_item
    i1 = device_item(make_pretrain_batch(TINY, B=8, seed=1))
    i2 = device_item(make_pretrain_batch(TINY, B=8, seed=2))
    label = (np.arange(8) % 2).astype(np.int32)
    batch = dict(label=label, item1=i1, item2=i2)
    kw = dict(learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
              sample_batch=batch)
    t_dp = AlignmentTrainer(TINY, mesh=mesh_lib.make_mesh(n_data=8,
                                                          n_model=1), **kw)
    t_tp = AlignmentTrainer(TINY, mesh=mesh_lib.make_mesh(n_data=4,
                                                          n_model=2), **kw)
    for step in range(2):
        l_dp, _ = t_dp.train_step(batch)
        l_tp, _ = t_tp.train_step(batch)
        np.testing.assert_allclose(
            jax.device_get(l_dp), jax.device_get(l_tp), rtol=5e-4,
            err_msg=f"step {step}")
    q = t_tp.state.params["params"]["trunk"]["encoder"]["layer_0"][
        "attention"]["query"]["kernel"]
    assert not q.sharding.is_fully_replicated
