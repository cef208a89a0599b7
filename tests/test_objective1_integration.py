"""objective=1 label-zeroing, integration-level (VERDICT r2 item 9).

Reference semantics (train_concap_struc.py:481-493): with --objective 1,
any sample whose three alignment labels are not all zero has its lm /
image / pv-lm labels zeroed (0 -> ignore_index -1), so the masked losses
see only aligned samples. Unit coverage lives in test_optim-style
apply_objective tests; this exercises the full fit() path through the
jitted step.
"""

import numpy as np
import pytest

from k3m_tpu.train.pretrain_loop import PretrainTrainer, apply_objective
from tests.conftest import MICRO, make_micro_batch


def _misaligned_batch():
    """Every row misaligned -> objective=1 must blank ALL masked labels."""
    b = make_micro_batch(B=8)
    b["is_next"] = np.ones((8,), np.int32)
    return b


@pytest.mark.slow
def test_objective1_fit_zeroes_masked_losses():
    batch = _misaligned_batch()
    t1 = PretrainTrainer(MICRO, learning_rate=1e-4, warmup_steps=1,
                         total_steps=10, seed=7, objective=1,
                         sample_batch=batch)
    history = t1.fit([batch, batch], num_epochs=1, log_steps=1,
                     save_checkpoints=False)
    assert history and history[0]["samples_per_sec"] > 0

    # with every row misaligned, all masked-lm/img labels became -1:
    # those three loss terms are exactly zero; alignment CE is not
    m = {k: float(v) for k, v in
         __import__("jax").device_get(t1.eval_step(batch)).items()}
    assert m["masked_lm_loss"] == 0.0, m
    assert m["masked_img_loss"] == 0.0, m
    assert m["masked_lm_loss_pv"] == 0.0, m
    assert m["next_sentence_loss_t_v_pv"] > 0.0, m

    # objective=0 on the same batch: masked losses are live
    t0 = PretrainTrainer(MICRO, learning_rate=1e-4, warmup_steps=1,
                         total_steps=10, seed=7, objective=0,
                         sample_batch=batch)
    m0 = {k: float(v) for k, v in
          __import__("jax").device_get(t0.eval_step(batch)).items()}
    assert m0["masked_lm_loss"] > 0.0 and m0["masked_img_loss"] > 0.0, m0


def test_apply_objective_semantics_mixed_batch():
    """Row-wise: aligned rows keep labels; misaligned rows -> -1
    everywhere (0 is remapped to ignore, exactly the reference's
    if_replace logic)."""
    import jax.numpy as jnp
    b = make_micro_batch(B=4)
    b["is_next"] = np.array([0, 1, 0, 0], np.int32)
    b["is_next_pv_v"] = np.array([0, 0, 1, 0], np.int32)
    b["is_next_pv_t"] = np.zeros(4, np.int32)
    out = apply_objective({k: jnp.asarray(v) for k, v in b.items()}, 1)
    for key in ("lm_label_ids", "lm_label_ids_pv", "image_label"):
        got = np.asarray(out[key])
        np.testing.assert_array_equal(got[1], -1)          # is_next=1
        np.testing.assert_array_equal(got[2], -1)          # is_next_pv_v=1
        ref = np.where(b[key][0] == 0, -1, b[key][0])      # aligned: 0->-1
        np.testing.assert_array_equal(got[0], ref)
        np.testing.assert_array_equal(
            got[3], np.where(b[key][3] == 0, -1, b[key][3]))
