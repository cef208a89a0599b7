"""Pin the collective *shape* of the compiled multi-device train step.

The reference scales by DDP allreduce (train_concap_struc.py:301-310,
pretrain.py:59-75): per step, exactly the gradients move between devices.
GSPMD must compile to the same communication pattern — these tests make
that an assertion rather than a hope:

  * DP (8x1): gradient all-reduce traffic is O(|params|) and all-gather
    traffic is negligible (only the LPM negative-sampling index plumbing) —
    i.e. the partitioner did NOT fall back to gathering activations or
    parameters.
  * DP x TP (4x2): NO parameter-sized all-gathers — tensor parallelism
    communicates activation psums (row-parallel outputs + vocab-sharded
    logit reductions), never whole weight matrices.

Kernels (Pallas LN via shard_map, kernels/sharding.py) are ON in interpret
mode, so the pinned HLO is the kernels-on program a pod would run.

Compile-only (lower().compile(), nothing executed); MICRO geometry.
"""

import jax
import numpy as np
import pytest

from k3m_tpu.train import mesh as mesh_lib
from k3m_tpu.train.pretrain_loop import PretrainTrainer
from k3m_tpu.utils import hlo
from tests.conftest import MICRO, make_micro_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _param_bytes(params) -> int:
    return int(sum(np.prod(p.shape) * p.dtype.itemsize
                   for p in jax.tree.leaves(params)))


def _compiled_hlo(n_data, n_model, monkeypatch):
    monkeypatch.setenv("K3M_LN_INTERPRET", "1")
    batch = make_micro_batch(B=8)
    tr = PretrainTrainer(
        MICRO, learning_rate=1e-4, warmup_steps=1, total_steps=10, seed=7,
        sample_batch=batch,
        mesh=mesh_lib.make_mesh(n_data=n_data, n_model=n_model))
    compiled = tr._train_step.lower(tr.state, tr._stage(batch)).compile()
    return compiled.as_text(), _param_bytes(tr.state.params)


@pytest.mark.slow
def test_dp_step_is_one_grad_allreduce(monkeypatch):
    txt, pbytes = _compiled_hlo(8, 1, monkeypatch)
    agg = hlo.collective_bytes(txt)
    print("DP 8x1 collectives:", hlo.summarize(txt), f"params={pbytes}B")

    # gradient all-reduce: O(|params|) — present, and not wildly more
    # (XLA may reassociate into a few buckets and fold in loss/metric
    # scalars; 3x leaves headroom without letting activation psums hide)
    ar = agg.get("all-reduce", 0)
    assert ar >= 0.9 * pbytes, (ar, pbytes)
    assert ar <= 3.0 * pbytes, (ar, pbytes)

    # DP must not gather parameters or activations: the only gathers are
    # the tiny LPM negative-sampling index exchanges (measured 2.6 KB at
    # MICRO geometry; 64 KB bound = far below any param/activation tensor)
    assert agg.get("all-gather", 0) < 64 * 1024, agg
    assert hlo.max_bytes(txt, "all-gather") < 16 * 1024

    # the grad all-reduce is bucketed into a handful of fused ops, not
    # hundreds of per-tensor reductions (NCCL-bucketing equivalent)
    n_ar = sum(1 for c in hlo.parse_collectives(txt)
               if c.op == "all-reduce")
    assert n_ar <= 16, n_ar


@pytest.mark.slow
def test_tp_step_has_no_param_sized_allgather(monkeypatch):
    txt, pbytes = _compiled_hlo(4, 2, monkeypatch)
    agg = hlo.collective_bytes(txt)
    print("TP 4x2 collectives:", hlo.summarize(txt), f"params={pbytes}B")

    # largest single parameter at MICRO geometry (word embeddings
    # 128x16 fp32 = 8 KB): no all-gather may reach parameter size —
    # TP that gathers weights per layer would defeat the sharding
    largest_param = 128 * 16 * 4
    assert hlo.max_bytes(txt, "all-gather") < largest_param, \
        hlo.summarize(txt)
    assert agg.get("all-gather", 0) < 64 * 1024, agg

    # TP adds activation psums on top of grad psums — all-reduce traffic
    # stays O(params + activations), bounded well below any
    # gather-the-weights fallback (measured 332 KB vs 122 KB params)
    ar = agg.get("all-reduce", 0)
    assert ar >= 0.9 * pbytes
    assert ar <= 6.0 * pbytes, (ar, pbytes)


def test_parse_collectives_synthetic_hlo():
    """Unit-pin the async-start tuple accounting on hand-written HLO lines
    (no compiler in the loop): payload counted once per start/done pair,
    rank-0 context scalars excluded from the halving, genuinely scalar
    collectives still counted."""
    txt = "\n".join([
        # plain sync all-reduce: full result counted
        "%ar = f32[1024]{0} all-reduce(f32[1024]{0} %g), to_apply=%add",
        # async pair: (input, output) tuple on the start; -done not counted
        "%st = (f32[256]{0}, f32[256]{0}) all-reduce-start(f32[256]{0} %x)",
        "%dn = f32[256]{0} all-reduce-done((f32[256],f32[256]) %st)",
        # collective-permute-start carrying u32[] context scalars (some XLA
        # versions): naive halving would keep only the scalars
        "%cp = (bf16[8,4]{1,0}, bf16[8,4]{1,0}, u32[], u32[]) "
        "collective-permute-start(bf16[8,4]{1,0} %a)",
        # scalar all-reduce-start: no ranked payload, halve the scalars
        "%sc = (f32[], f32[]) all-reduce-start(f32[] %s)",
    ])
    cs = {}
    for c in hlo.parse_collectives(txt):
        cs.setdefault(c.op, []).append(c.nbytes)
    assert cs["all-reduce"] == [4096, 1024, 4]      # done-op not re-counted
    assert cs["collective-permute"] == [8 * 4 * 2]  # payload, not the u32[]s
    agg = hlo.collective_bytes(txt)
    assert agg == {"all-reduce": 4096 + 1024 + 4,
                   "collective-permute": 64}
