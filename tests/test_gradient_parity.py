"""GRADIENT parity vs the reference torch model.

Forward/loss parity (test_reference_parity.py) proves the graphs compute the
same function; this file proves they train the same: d(loss)/d(params) of the
driver's composite loss (train_concap_struc.py:531-533, all five terms)
matches between torch autograd on the actual reference model and jax.grad on
ours, parameter by parameter, through the torch<->flax name mapping.

This exercises backward-pass semantics that no forward test can see:
- the straight-through hard-Gumbel fusion estimator (ref
  vilbert_k3m.py:2364 F.gumbel_softmax(hard=True) backs through the soft
  probs; ours must too),
- the chunked masked-CE custom lowering (k3m_tpu/model/heads.py) whose VJP
  must equal the dense-logits CE gradient,
- tied MLM decoder <-> word-embedding gradient accumulation
  (ref :2266-2272),
- the vectorized structure aggregator + LPM MarginRankingLoss backward
  (ref :2469-2502) vs our one-hot-matmul span gathers,
- fixed_t_layer freezing: torch wraps the first layers in no_grad
  (ref :1188-1195) across ALL THREE passes; ours uses stop_gradient.

RNG replay is identical to test_reference_parity.py (LPM negatives, Gumbel
noise, NCE indices are drawn inside the reference forward and re-injected
into ours).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402  (harness reuse)
    TINY_DICT, _batch, _init_jax, _replay_lpm_draws, _shim_and_import,
    _torch_pretrain_out,
)

GRID = [
    # (name, overrides): each point adds distinct backward-pass coverage
    ("ps0_vt0", {}),                                   # mean fusion, KLDiv
    ("ps1_vt0", {"if_pre_sampling": 1}),               # straight-through Gumbel
    ("ps2_vt0", {"if_pre_sampling": 2}),               # soft sigmoid fusion
    ("ps1_vt2", {"if_pre_sampling": 1, "visual_target": 2,
                 "v_target_size": 12}),                # NCE image loss
    ("frozen", {"fixed_t_layer": 2}),                  # no_grad vs stop_gradient
]


def _torch_grads(ref, cfg_dict, batch):
    """Reference model: composite-loss backward, grads by state-dict name."""
    model_t, out_t, gumbel, nce = _torch_pretrain_out(ref, cfg_dict, batch)
    # re-run WITH grad (the harness ran under no_grad); RNG replay still
    # holds because the generator consumption is identical
    import random as pyrandom

    from test_reference_parity import SEED, TSEED
    tt = {k: torch.tensor(v) for k, v in batch.items()}
    pyrandom.seed(SEED)
    torch.manual_seed(TSEED)
    model_t.zero_grad()
    out = model_t(
        tt["input_ids"], tt["image_feat"], tt["image_loc"],
        tt["segment_ids"], tt["input_mask"], tt["image_mask"],
        tt["lm_label_ids"], tt["image_label"], tt["image_target"],
        tt["is_next"], False,
        input_ids_pv=tt["input_ids_pv"],
        token_type_ids_pv=tt["segment_ids_pv"],
        attention_mask_pv=tt["input_mask_pv"],
        masked_lm_labels_pv=tt["lm_label_ids_pv"],
        next_sentence_label_pv_v=tt["is_next_pv_v"],
        next_sentence_label_pv_t=tt["is_next_pv_t"],
        index_p=tt["index_p"], index_v=tt["index_v"], device="cpu")
    # all five loss terms (train_concap_struc.py:531-533 uses t+v+pv+struc;
    # the 3-way alignment CE out[6] is added for full head coverage)
    loss = out[0] + out[1] + out[3] + out[6] + out[9]
    loss.backward()
    grads = {n: p.grad.detach().numpy().copy()
             for n, p in model_t.named_parameters() if p.grad is not None}
    return float(loss.detach()), grads, gumbel, nce


@pytest.mark.slow
@pytest.mark.parametrize("name,overrides", GRID, ids=[g[0] for g in GRID])
def test_gradient_parity_vs_reference(name, overrides):
    ref = _shim_and_import()
    cfg_dict = dict(TINY_DICT, **overrides)
    rng = np.random.default_rng(0)
    batch = _batch(rng, v_target_size=cfg_dict["v_target_size"])

    loss_t, grads_t, gumbel, nce = _torch_grads(ref, cfg_dict, batch)

    import jax

    from k3m_tpu.train.convert import (
        _flatten, flat_to_reference, merge_flat_into_params,
        reference_to_flat,
    )

    model_j, jb, params = _init_jax(cfg_dict, batch)
    # weights FROM torch so both sides differentiate at the same point
    ref_mod = _shim_and_import()
    torch.manual_seed(0)
    model_t = ref_mod.BertForMultiModalPreTraining_tri_stru(
        ref_mod.BertConfig.from_dict(cfg_dict))
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params2, _, _ = merge_flat_into_params(params, reference_to_flat(sd))

    ent_idx, val_idx = _replay_lpm_draws(batch["index_p"],
                                         cfg_dict["num_negative_pv"])

    def loss_fn(p):
        out = model_j.apply(p, jb, deterministic=True,
                            neg_entity_idx=np.asarray(ent_idx),
                            neg_value_idx=np.asarray(val_idx),
                            gumbel_noise=gumbel,
                            neg_image_idx=nce)
        return (out["masked_lm_loss"] + out["masked_img_loss"]
                + out["masked_lm_loss_pv"] + out["next_sentence_loss_t_v_pv"]
                + out["loss_struc"])

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params2)
    assert abs(float(loss_j) - loss_t) < 1e-3

    ours = flat_to_reference(_flatten(grads_j["params"]))

    compared = 0
    for tname, g_t in grads_t.items():
        if tname not in ours:
            # the only torch params with grads our export may not carry are
            # torch-side-only dead heads; anything with signal must exist
            assert float(np.abs(g_t).max()) < 1e-12, (
                f"torch grad on {tname} has signal but no counterpart")
            continue
        g_j = np.asarray(ours[tname], np.float32)
        scale = max(float(np.abs(g_t).max()), 1e-8)
        np.testing.assert_allclose(
            g_j, g_t, atol=max(2e-6, 2e-4 * scale), rtol=2e-3,
            err_msg=f"{name}: grad mismatch on {tname}")
        compared += 1
    # sanity: the comparison actually covered the model
    assert compared > 50, compared

    if "fixed_t_layer" in overrides:
        # torch's no_grad leaves frozen-layer grads as None (absent from
        # grads_t); our stop_gradient yields exact zeros. Both mean "not
        # trained" — assert the torch side recorded nothing and ours is 0.
        k = overrides["fixed_t_layer"]

        def _is_frozen(nm):
            return any(f"encoder.layer.{i}." in nm for i in range(k))

        assert not any(_is_frozen(n) for n in grads_t), (
            "reference trained a frozen layer?!")
        frozen_ours = [n for n in ours if _is_frozen(n)]
        assert frozen_ours, "freeze grid point matched no layers in export"
        for n in frozen_ours:
            assert float(np.abs(np.asarray(ours[n])).max()) < 1e-12, (
                f"our stop_gradient leaked into {n}")
