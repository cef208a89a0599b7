"""Multi-device sharding tests on the virtual 8-device CPU mesh.

All train-step tests run the MICRO geometry (conftest) — the smallest
config that exercises the full tri-pass architecture — so the cold-compile
cost per trainer is ~1 min instead of TINY's several minutes on this
1-core host. Pallas kernels run in interpret mode (K3M_LN_INTERPRET) so
the mesh>1 shard_map path (kernels/sharding.py) is what's under test: the
same code path a real pod takes, minus the Mosaic compiler.
"""

import jax
import numpy as np
import pytest

from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer
from tests.conftest import MICRO, make_micro_batch, make_pretrain_batch

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
def test_dp_tp_single_parity_kernels_on(monkeypatch):
    """One combined multi-device correctness gate (3 compiles, not 6):

    1. single-device unfused step == 8x1 DP step with Pallas LN+attention
       (sharded via shard_map) — kernels-on sharding is numerically the
       identity;
    2. 8x1 DP == 4x2 DPxTP with kernels on — tensor parallelism is a pure
       layout choice;
    3. loss decreases over repeated DP steps;
    4. TP params are actually sharded on the model axis.
    """
    monkeypatch.setenv("K3M_LN_INTERPRET", "1")
    batch = make_micro_batch(B=8)
    kw = dict(learning_rate=5e-4, warmup_steps=1, total_steps=50, seed=7,
              sample_batch=batch)
    kcfg = MICRO.replace(use_pallas=True)   # use_pallas_ln already default-on
    t1 = PretrainTrainer(
        MICRO.replace(use_pallas=False, use_pallas_ln=False),
        mesh=mesh_lib.make_mesh(n_data=1, n_model=1,
                                devices=jax.devices()[:1]), **kw)
    t_dp = PretrainTrainer(kcfg, mesh=mesh_lib.make_mesh(n_data=8, n_model=1),
                           **kw)
    t_tp = PretrainTrainer(kcfg, mesh=mesh_lib.make_mesh(n_data=4, n_model=2),
                           **kw)

    # deterministic eval FIRST, on bit-identical init params: dropout=0,
    # so the fused attention/bi-attention kernels ACTUALLY execute under
    # the mesh (in training mode on CPU the attention kernels fall back
    # for dropout — interpret-mode PRNG is unsupported — so only eval
    # pins their shard_map path end-to-end). Must run before training:
    # per-step rounding compounds through optimizer moments and the
    # trainers' params drift ~1% apart after a few steps.
    e1 = jax.device_get(t1.eval_step(batch))
    etp = jax.device_get(t_tp.eval_step(batch))
    np.testing.assert_allclose(e1["loss"], etp["loss"], rtol=5e-4)

    m1 = jax.device_get(t1.train_step(batch))
    losses = [float(jax.device_get(t_dp.train_step(batch))["loss"])]
    m_tp = jax.device_get(t_tp.train_step(batch))

    # kernels-on sharded DP == plain single device
    np.testing.assert_allclose(m1["loss"], losses[0], rtol=2e-4)
    # TP == DP (both kernels on)
    np.testing.assert_allclose(m_tp["loss"], losses[0], rtol=5e-4)

    for _ in range(4):
        losses.append(float(jax.device_get(t_dp.train_step(batch))["loss"]))
        m_tp = jax.device_get(t_tp.train_step(batch))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]           # same batch -> loss must drop
    np.testing.assert_allclose(m_tp["loss"], losses[-1], rtol=5e-4)

    q = t_tp.state.params["params"]["trunk"]["encoder"]["layer_0"][
        "attention"]["query"]["kernel"]
    assert not q.sharding.is_fully_replicated


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_alignment_tp_equals_dp(monkeypatch):
    """The item-alignment twin tower must also be layout-invariant with
    kernels on: DPxTP (4x2) and DP-only (8x1) steps agree to
    reduction-order noise. (The pretrain tests above don't cover
    K3MForItemAlignment's twin-tower apply / pair batching path.)"""
    from k3m_tpu.train.alignment_loop import AlignmentTrainer, device_item
    from tests.conftest import NANO, make_nano_batch
    monkeypatch.setenv("K3M_LN_INTERPRET", "1")
    i1 = device_item(make_nano_batch(B=8, seed=1))
    i2 = device_item(make_nano_batch(B=8, seed=2))
    label = (np.arange(8) % 2).astype(np.int32)
    batch = dict(label=label, item1=i1, item2=i2)
    kw = dict(learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
              sample_batch=batch)
    # NANO (1 layer/stream): the twin tower compiles the trunk TWICE per
    # step — at MICRO it was the slowest cold compile in the suite (522s)
    t_dp = AlignmentTrainer(NANO, mesh=mesh_lib.make_mesh(n_data=8,
                                                          n_model=1), **kw)
    t_tp = AlignmentTrainer(NANO, mesh=mesh_lib.make_mesh(n_data=4,
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


@pytest.mark.slow
def test_full_geometry_lowering_gate():
    """Round-3 verdict item 5: the REAL bert-base geometry (12L/768 text,
    vocab 21128, batch 96, bf16, micro_steps=4) must lower + compile under
    the 4x2 DPxTP mesh — a production-shape GSPMD issue (e.g. an
    unshardable dim at 12 heads or vocab 21128 under TP=2) would pass
    every shrunken-geometry gate. Compile-only (no execution); the
    persistent cache makes reruns seconds. Same graph as
    `python __graft_entry__.py --dryrun-full 8`."""
    import __graft_entry__ as g
    g._dryrun_full_impl(8)


@pytest.mark.slow
def test_full_geometry_exec_gate():
    """Round-4 verdict item 4: EXECUTE (not just compile) the bert-base
    geometry on the 4x2 mesh — one real train step at batch 8, finite
    loss, and per-metric parity <= 1e-5 (fp32) vs the same batch + init
    on a 1x1 mesh. Catches TP-reduction numerical bugs (head splits at 12
    heads, vocab shards at 21128) the compile-only gate cannot. Same
    graphs as `python __graft_entry__.py --dryrun-full-exec 8`."""
    import __graft_entry__ as g
    out = g._dryrun_full_exec_impl(8)
    assert out["max_metric_drift_vs_1x1"] <= 1e-5
