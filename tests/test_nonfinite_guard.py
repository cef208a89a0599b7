"""Non-finite-gradient guard (anomaly handling the reference lacks — its
bf16/fp32 paths apply whatever the backward produces; one poisoned batch
NaNs the parameters permanently).

Guarantee under test (TrainState.apply_gradients_guarded, wired behind
PretrainTrainer/AlignmentTrainer `skip_nonfinite`): a step whose grads
contain NaN/Inf leaves params AND optimizer state bit-identical, advances
the step counter, and reports metrics["nonfinite_skipped"]=1; finite steps
behave exactly like the unguarded path.
"""

import numpy as np

import jax

from tests.conftest import NANO, make_nano_batch, single_mesh

# NANO + a 1-device mesh: the guard property (params/opt-state untouched on
# non-finite grads) is independent of model size and mesh width, and the
# TINY-on-8-virtual-devices version of this file was the single slowest
# fast-tier item (11 min warm on the 1-core host).


def _batch(B=8, seed=0):
    return make_nano_batch(B=B, seed=seed)


def _vec(tree):
    return np.concatenate([np.asarray(x, np.float32).ravel()
                           for x in jax.tree.leaves(tree)])


def _trainer(micro_steps=1):
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    return PretrainTrainer(NANO, learning_rate=1e-3, total_steps=10,
                           micro_steps=micro_steps, skip_nonfinite=True,
                           sample_batch=_batch(),
                           mesh=single_mesh(), seed=7)


def _poisoned(batch):
    bad = {k: np.array(v) for k, v in batch.items()}
    bad["image_feat"] = bad["image_feat"].copy()
    bad["image_feat"][0, 1] = np.nan
    return bad


def test_guard_skips_poisoned_step_and_applies_clean_ones():
    tr = _trainer()
    clean = _batch(seed=3)

    m = jax.device_get(tr.train_step(clean))
    assert m["nonfinite_skipped"] == 0.0
    p_before = _vec(tr.state.params)
    o_before = _vec([x for x in jax.tree.leaves(tr.state.opt_state)
                     if hasattr(x, "dtype")])
    step_before = int(jax.device_get(tr.state.step))

    m = jax.device_get(tr.train_step(_poisoned(clean)))
    assert m["nonfinite_skipped"] == 1.0
    # params and optimizer state untouched, step advanced
    np.testing.assert_array_equal(p_before, _vec(tr.state.params))
    np.testing.assert_array_equal(
        o_before, _vec([x for x in jax.tree.leaves(tr.state.opt_state)
                        if hasattr(x, "dtype")]))
    assert int(jax.device_get(tr.state.step)) == step_before + 1

    # a following clean step trains normally
    m = jax.device_get(tr.train_step(clean))
    assert m["nonfinite_skipped"] == 0.0
    assert np.isfinite(float(m["loss"]))
    assert not np.array_equal(p_before, _vec(tr.state.params))


def test_guard_matches_unguarded_on_finite_grads():
    # The guard's `where` select changes XLA fusion decisions around the
    # optimizer update, so params can differ from the unguarded program by
    # float rounding noise (~1e-9 observed) — losses match exactly, params
    # to tight tolerance.
    from k3m_tpu.train.pretrain_loop import PretrainTrainer
    kw = dict(learning_rate=1e-3, total_steps=10,
              sample_batch=_batch(), mesh=single_mesh(), seed=7)
    guarded = PretrainTrainer(NANO, skip_nonfinite=True, **kw)
    plain = PretrainTrainer(NANO, skip_nonfinite=False, **kw)
    b = _batch(seed=11)
    for _ in range(2):
        mg = jax.device_get(guarded.train_step(b))
        mp = jax.device_get(plain.train_step(b))
        assert mg["nonfinite_skipped"] == 0.0
        assert float(mg["loss"]) == float(mp["loss"])
    np.testing.assert_allclose(_vec(guarded.state.params),
                               _vec(plain.state.params),
                               rtol=1e-5, atol=1e-8)


def test_guard_under_microbatching():
    tr = _trainer(micro_steps=2)
    clean = _batch(seed=3)
    m = jax.device_get(tr.train_step(clean))
    assert m["nonfinite_skipped"] == 0.0
    p_before = _vec(tr.state.params)
    m = jax.device_get(tr.train_step(_poisoned(clean)))
    assert m["nonfinite_skipped"] == 1.0
    np.testing.assert_array_equal(p_before, _vec(tr.state.params))
