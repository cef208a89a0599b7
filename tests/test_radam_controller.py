"""Parity tests for the RAdam transform and StopOnPlateau controller
against the reference implementations (vilbert_k3m/optimization.py:16,
vilbert_k3m/utils.py:39) imported read-only from /root/reference."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


def _shim_reference_deps():
    import types
    boto3 = types.ModuleType("boto3")
    boto3.resource = lambda *a, **k: None
    sys.modules.setdefault("boto3", boto3)
    botocore = types.ModuleType("botocore")
    exceptions = types.ModuleType("botocore.exceptions")
    exceptions.ClientError = type("ClientError", (Exception,), {})
    botocore.exceptions = exceptions
    sys.modules.setdefault("botocore", botocore)
    sys.modules.setdefault("botocore.exceptions", exceptions)
    six = types.ModuleType("torch._six")
    six.inf = float("inf")
    sys.modules.setdefault("torch._six", six)


_shim_reference_deps()


def _ref_radam():
    from vilbert_k3m.optimization import RAdam
    return RAdam


def _ref_controller():
    from vilbert_k3m.utils import MultiTaskStopOnPlateau
    return MultiTaskStopOnPlateau


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_radam_matches_reference(weight_decay):
    import jax.numpy as jnp

    from k3m_tpu.train.radam import radam

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(12)]

    # torch reference trajectory
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = _ref_radam()([tp], lr=1e-2, weight_decay=weight_decay)
    torch_traj = []
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
        torch_traj.append(tp.detach().numpy().copy())

    # ours
    tx = radam(1e-2, weight_decay=weight_decay)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for i, g in enumerate(grads):
        upd, state = tx.update(jnp.asarray(g), state, params)
        params = params + upd
        np.testing.assert_allclose(np.asarray(params), torch_traj[i],
                                   rtol=2e-4, atol=2e-5)


def test_radam_covers_both_rectification_branches():
    # steps 1-4 take the plain-momentum branch (N_sma < 5), later steps the
    # rectified branch -- assert the trajectory actually crosses over
    b2 = 0.999
    n_sma_max = 2 / (1 - b2) - 1
    crossed = [n_sma_max - 2 * t * b2**t / (1 - b2**t) >= 5
               for t in range(1, 13)]
    assert not crossed[0] and crossed[-1]


def test_stop_on_plateau_matches_reference():
    from k3m_tpu.utils.controller import StopOnPlateau

    Ref = _ref_controller()
    rng = np.random.default_rng(1)
    # metric: improves, plateaus (trigger stop), then drops again (resume)
    seq = ([1.0, 0.9, 0.8] + [0.81] * 6          # plateau
           + [0.5, 0.45] + [0.46] * 6 + [0.2])   # resume then plateau again
    ref = Ref(mode="min", patience=3, continue_threshold=0.005)
    ours = StopOnPlateau(mode="min", patience=3, continue_threshold=0.005)
    for m in seq:
        ref.step(m)
        ours.step(m)
        assert ours.in_stop == ref.in_stop, m
        assert ours.best == pytest.approx(ref.best)
        assert ours.num_bad_epochs == ref.num_bad_epochs

    # randomized fuzz
    ref = Ref(mode="min", patience=2, continue_threshold=0.01, cooldown=2)
    ours = StopOnPlateau(mode="min", patience=2, continue_threshold=0.01,
                         cooldown=2)
    for m in rng.random(200):
        ref.step(float(m))
        ours.step(float(m))
        assert ours.in_stop == ref.in_stop
