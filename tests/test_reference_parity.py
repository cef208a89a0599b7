"""Golden parity vs the reference torch model (BASELINE config 1).

Instantiates the reference `BertForMultiModalPreTraining_tri_stru`
(read-only import from /root/reference with missing-dep shims), converts its
state_dict through k3m_tpu.train.convert, runs BOTH models on the same batch
in eval mode, and asserts loss / embedding parity <= 1e-3.

LPM negative sampling: the torch model draws with python `random.sample`
inside the forward (vilbert_k3m.py:2480,2492). We seed `random`, run torch,
then REPLAY the identical draw sequence to recover the indices and inject
them into our vectorized aggregator.
"""

import random as pyrandom
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _shim_and_import():
    if "vilbert_k3m.vilbert_k3m" in sys.modules:
        return sys.modules["vilbert_k3m.vilbert_k3m"]
    # shims for deps absent in this environment
    boto3 = types.ModuleType("boto3")
    boto3.resource = lambda *a, **k: None
    sys.modules.setdefault("boto3", boto3)
    botocore = types.ModuleType("botocore")
    exceptions = types.ModuleType("botocore.exceptions")

    class ClientError(Exception):
        pass

    exceptions.ClientError = ClientError
    botocore.exceptions = exceptions
    sys.modules.setdefault("botocore", botocore)
    sys.modules.setdefault("botocore.exceptions", exceptions)
    six = types.ModuleType("torch._six")
    six.inf = float("inf")
    sys.modules.setdefault("torch._six", six)
    sys.path.insert(0, "/root/reference")
    import vilbert_k3m.vilbert_k3m as ref
    return ref


TINY_DICT = dict(
    vocab_size=120, hidden_size=24, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=48, hidden_act="gelu",
    hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    max_position_embeddings=64, type_vocab_size=2, initializer_range=0.02,
    v_feature_size=12, v_target_size=9, v_hidden_size=16,
    v_num_hidden_layers=2, v_num_attention_heads=4, v_intermediate_size=16,
    v_attention_probs_dropout_prob=0.1, v_hidden_act="gelu",
    v_hidden_dropout_prob=0.1, v_initializer_range=0.02,
    bi_hidden_size=16, bi_num_attention_heads=4,
    v_biattention_id=[0, 1], t_biattention_id=[2, 3],
    visual_target=0, fast_mode=False, fixed_v_layer=0, fixed_t_layer=0,
    in_batch_pairs=False, fusion_method="mul", dynamic_attention=False,
    with_coattention=True, objective=0, num_negative_image=6,
    num_negative_pv=4, margin=1.0, model="bert", task_specific_tokens=False,
    visualization=False, use_image=True, if_pre_sampling=0,
)

B, L, LPV, R, P = 3, 8, 12, 4, 3
SEED = 1234


def _batch(rng):
    index_p = np.zeros((B, P, 2), np.int64)
    index_v = np.zeros((B, P, 2), np.int64)
    index_p[0, 0] = [1, 2]; index_v[0, 0] = [3, 4]
    index_p[0, 1] = [5, 6]; index_v[0, 1] = [7, 8]
    index_p[1, 0] = [2, 3]; index_v[1, 0] = [4, 6]
    # item 2: zero pairs -> fallback path
    lm = np.full((B, L), -1, np.int64)
    lm[:, 2] = rng.integers(0, 120, B)
    lm_pv = np.full((B, LPV), -1, np.int64)
    lm_pv[:, 3] = rng.integers(0, 120, B)
    img_label = np.full((B, R), -1, np.int64)
    img_label[:, 1] = 1
    target = rng.random((B, R, 9)).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    return dict(
        input_ids=rng.integers(1, 120, (B, L)).astype(np.int64),
        input_mask=np.ones((B, L), np.int64),
        segment_ids=np.zeros((B, L), np.int64),
        lm_label_ids=lm,
        is_next=np.zeros((B,), np.int64),
        input_ids_pv=rng.integers(1, 120, (B, LPV)).astype(np.int64),
        input_mask_pv=np.ones((B, LPV), np.int64),
        segment_ids_pv=np.zeros((B, LPV), np.int64),
        lm_label_ids_pv=lm_pv,
        is_next_pv_v=np.zeros((B,), np.int64),
        is_next_pv_t=np.zeros((B,), np.int64),
        index_p=index_p, index_v=index_v,
        image_feat=rng.normal(size=(B, R + 1, 12)).astype(np.float32),
        image_loc=rng.normal(size=(B, R + 1, 5)).astype(np.float32),
        image_mask=np.ones((B, R + 1), np.int64),
        image_label=img_label,
        image_target=target,
    )


def _replay_lpm_draws(index_p, num_negative_pv):
    """Replay the reference's random.sample sequence (ref :2469-2497)."""
    pyrandom.seed(SEED)
    n_valid = [(index_p[i, :, 0] != 0).sum() for i in range(B)]
    n_ent = num_negative_pv // 2
    n_val = num_negative_pv - n_ent
    ent = np.zeros((B, P, n_ent), np.int32)
    val = np.zeros((B, P, n_val), np.int32)
    # mark invalid slots as self-indices so they are masked out
    ent[:] = np.arange(B)[:, None, None]
    val[:] = np.arange(P)[None, :, None]
    for i in range(B):
        for j in range(int(n_valid[i])):
            cands = [k for k in range(B) if k != i]
            if cands:
                draw = pyrandom.sample(cands, min(len(cands), n_ent))
                for s, k in enumerate(draw):
                    ent[i, j, s] = k
            cands = [k for k in range(int(n_valid[i])) if k != j]
            if cands:
                draw = pyrandom.sample(cands, min(len(cands), n_val))
                for s, k in enumerate(draw):
                    val[i, j, s] = k
    return ent, val


@pytest.mark.slow
def test_pretrain_loss_parity_vs_reference():
    ref = _shim_and_import()
    torch.manual_seed(0)
    cfg_t = ref.BertConfig.from_dict(TINY_DICT)
    model_t = ref.BertForMultiModalPreTraining_tri_stru(cfg_t)
    model_t.eval()

    rng = np.random.default_rng(0)
    batch = _batch(rng)

    tt = {k: torch.tensor(v) for k, v in batch.items()}
    pyrandom.seed(SEED)
    with torch.no_grad():
        out_t = model_t(
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
    (mlm_t, img_t, _, mlm_pv_t, _, _, align_t, c_init_t, c_final_t,
     struc_t) = out_t

    # ---- ours, with converted weights
    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.model.pretrain import K3MForPretraining
    from k3m_tpu.train.convert import merge_flat_into_params, reference_to_flat

    cfg_j = K3MConfig.from_dict(TINY_DICT)
    model_j = K3MForPretraining(cfg_j)
    jb = {k: np.asarray(v, np.int32) if v.dtype == np.int64 else v
          for k, v in batch.items()}
    params = jax.jit(lambda: model_j.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, jb, deterministic=True))()

    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    flat = reference_to_flat(sd)
    params2, loaded, _ = merge_flat_into_params(params, flat)

    # every one of OUR params must come from the torch checkpoint
    def _paths(d, pre=""):
        for k, v in d.items():
            p = f"{pre}/{k}" if pre else k
            if isinstance(v, dict):
                yield from _paths(v, p)
            else:
                yield p
    ours = set(_paths(params["params"]))
    missing = ours - loaded
    assert not missing, f"params not covered by converter: {sorted(missing)}"

    ent_idx, val_idx = _replay_lpm_draws(batch["index_p"],
                                         TINY_DICT["num_negative_pv"])
    out_j = model_j.apply(params2, jb, deterministic=True,
                          neg_entity_idx=np.asarray(ent_idx),
                          neg_value_idx=np.asarray(val_idx))

    tol = 1e-3
    assert abs(float(out_j["masked_lm_loss"]) - float(mlm_t)) < tol
    assert abs(float(out_j["masked_lm_loss_pv"]) - float(mlm_pv_t)) < tol
    assert abs(float(out_j["masked_img_loss"]) - float(img_t)) < tol
    assert abs(float(out_j["next_sentence_loss_t_v_pv"]) - float(align_t)) < tol
    assert abs(float(out_j["loss_struc"]) - float(struc_t)) < tol
    np.testing.assert_allclose(np.asarray(out_j["c_initial"]),
                               c_init_t.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["c_final"]),
                               c_final_t.numpy(), atol=1e-4, rtol=1e-3)


def test_export_loads_into_reference_model():
    """flat_to_reference export must load into the ACTUAL reference torch
    model: every missing key is a documented-dead parameter (poolers,
    q_dense*, map_individual_to_bi, gradvq placeholders), and no exported
    key is unexpected."""
    ref = _shim_and_import()
    torch.manual_seed(0)
    model_t = ref.BertForMultiModalPreTraining_tri_stru(
        ref.BertConfig.from_dict(TINY_DICT))

    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.model.pretrain import K3MForPretraining
    from k3m_tpu.train.convert import flat_to_reference, _flatten

    cfg_j = K3MConfig.from_dict(TINY_DICT)
    model_j = K3MForPretraining(cfg_j)
    rng = np.random.default_rng(0)
    jb = {k: np.asarray(v, np.int32) if v.dtype == np.int64 else v
          for k, v in _batch(rng).items()}
    params = jax.jit(lambda: model_j.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, jb, deterministic=True))()

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flat_to_reference(_flatten(params["params"])).items()}
    result = model_t.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    # DEAD: reference-side parameters that are either dead code (poolers,
    # q_dense*, map_individual_to_bi — see model docstrings) or created
    # unconditionally by the reference but lazily by our fusion module, so
    # they don't exist under this config's strategy (if_pre_sampling=0
    # uses no score/soft projections; they stay at init on the reference
    # side and are unused in its forward too).
    DEAD = ("t_pooler", "v_pooler", "q_dense", "map_individual_to_bi",
            "bi_seq_relationship", "vis_criterion",
            "score_self", "score_cross", "soft_")
    unexplained = [k for k in result.missing_keys
                   if not any(d in k for d in DEAD)]
    assert not unexplained, unexplained
