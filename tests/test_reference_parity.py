"""Golden parity vs the reference torch model (BASELINE config 1).

Instantiates the reference `BertForMultiModalPreTraining_tri_stru` /
`K3MForItemAlignment` (read-only import from /root/reference with
missing-dep shims), converts their state_dicts through
k3m_tpu.train.convert, runs BOTH models on the same batch in eval mode,
and asserts loss / embedding parity <= 1e-3 over a CONFIG GRID:
fusion strategies 0-3, visual_target 0/1/2, roberta embeddings,
dynamic_attention, fast_mode, and all three alignment loss types.

RNG replay (the reference draws randomness inside forward):
- LPM negatives: python `random.sample` (vilbert_k3m.py:2480,2492). We
  seed `random`, run torch, then REPLAY the identical draw sequence and
  inject the indices into our vectorized aggregator.
- Gumbel fusion (if_pre_sampling=1): torch `F.gumbel_softmax` samples
  from the GLOBAL torch generator even under model.eval() (ref :2364).
  We seed torch, run, re-seed, replay `-empty(shape).exponential_().log()`
  in the reference's call order (v, t, pv) and inject via `gumbel_noise`.
- NCE negatives (visual_target=2): torch `.random_()` draws
  (ref :2769-2798), replayed the same way (they follow the gumbel draws
  in the forward's RNG stream) and injected via `neg_image_idx`.
  The reference reads `self.num_negative`, an attribute no code path
  ever sets on the model (train_concap_struc.py:211 patches the CONFIG);
  the test sets it explicitly, documenting the reference bug.
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
SEED = 1234        # python random (LPM draws)
TSEED = 4321       # torch global generator (gumbel + NCE draws)
NUM_NEG_NCE = 10   # reference `self.num_negative` for visual_target=2


def _batch(rng, v_target_size=9):
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
    target = rng.random((B, R, v_target_size)).astype(np.float32)
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
    """Replay the reference's random.sample sequence (ref :2469-2497).

    Shapes come from index_p, so the helper serves both this module's
    (3, 3, 2) fixtures and the trajectory test's pipeline-sized batches."""
    B, P = index_p.shape[:2]
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


def _replay_gumbel_noise(cfg_dict):
    """Replay torch F.gumbel_softmax's noise draws in the reference call
    order v, t, pv (get_sequence_pooled_output_final, ref :2383-2389).
    MUST be called with the torch RNG in the same state as right before
    the reference forward's fusion step (i.e. re-seeded; nothing else in
    eval mode consumes the torch generator earlier)."""
    n = 3 if cfg_dict["use_image"] else 2
    noise = {}
    if cfg_dict["use_image"]:
        g = -torch.empty(
            (B, R + 1, n, cfg_dict["bi_hidden_size"])).exponential_().log()
        noise["v"] = g.numpy()
    g = -torch.empty((B, L, n, cfg_dict["hidden_size"])).exponential_().log()
    noise["t"] = g.numpy()
    g = -torch.empty((B, LPV, n, cfg_dict["hidden_size"])).exponential_().log()
    noise["pv"] = g.numpy()
    return noise


def _replay_nce_indices(num_negative):
    """Replay the reference's `.random_()` NCE negative-pool construction
    (ref :2769-2798) from the current torch RNG state."""
    na, ni = int(num_negative * 0.7), int(num_negative * 0.3)
    row_a = torch.empty((B, R, na), dtype=torch.int64).random_(0, B - 1)
    col_a = torch.empty((B, R, na), dtype=torch.int64).random_(0, R)
    for i in range(B - 1):
        row_a[i][row_a[i] == i] = B - 1
    final_a = row_a * R + col_a
    row_i = torch.zeros((B, R, ni), dtype=torch.int64)
    col_i = torch.empty((B, R, ni), dtype=torch.int64).random_(0, R - 1)
    for i in range(B):
        row_i[i] = i
    for i in range(R - 1):
        col_i[:, i, :][col_i[:, i, :] == i] = R - 1
    final_i = row_i * R + col_i
    return torch.cat((final_a, final_i), dim=2).numpy()


def _torch_pretrain_out(ref, cfg_dict, batch):
    torch.manual_seed(0)
    cfg_t = ref.BertConfig.from_dict(cfg_dict)
    model_t = ref.BertForMultiModalPreTraining_tri_stru(cfg_t)
    model_t.eval()
    if cfg_dict["visual_target"] == 2:
        # reference bug: `self.num_negative` is read at :2764 but never
        # set by any code path (the driver patches config.num_negative,
        # train_concap_struc.py:211, which the model never reads)
        model_t.num_negative = NUM_NEG_NCE
    tt = {k: torch.tensor(v) for k, v in batch.items()}
    pyrandom.seed(SEED)
    torch.manual_seed(TSEED)
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
    # replay the torch-generator stream the forward consumed, in order
    torch.manual_seed(TSEED)
    gumbel = nce = None
    if cfg_dict["if_pre_sampling"] == 1:
        gumbel = _replay_gumbel_noise(cfg_dict)
    if cfg_dict["visual_target"] == 2:
        nce = _replay_nce_indices(NUM_NEG_NCE)
    return model_t, out_t, gumbel, nce


def _init_jax(cfg_dict, batch):
    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.model.pretrain import K3MForPretraining

    cfg_j = K3MConfig.from_dict(cfg_dict)
    model_j = K3MForPretraining(cfg_j)
    jb = {k: np.asarray(v, np.int32) if v.dtype == np.int64 else v
          for k, v in batch.items()}
    params = jax.jit(lambda: model_j.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, jb, deterministic=True))()
    return model_j, jb, params


GRID = [
    # (name, config overrides)
    ("ps0_vt0", {}),
    ("ps1_vt0", {"if_pre_sampling": 1}),
    ("ps2_vt0", {"if_pre_sampling": 2}),
    ("ps3_vt0", {"if_pre_sampling": 3}),
    ("ps0_vt1", {"visual_target": 1, "v_target_size": 12}),
    ("ps1_vt2", {"if_pre_sampling": 1, "visual_target": 2,
                 "v_target_size": 12}),
    ("roberta", {"model": "roberta"}),
    ("dynatt", {"dynamic_attention": True}),
    ("fastmode", {"fast_mode": True}),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,overrides", GRID, ids=[g[0] for g in GRID])
def test_pretrain_loss_parity_vs_reference(name, overrides):
    ref = _shim_and_import()
    cfg_dict = dict(TINY_DICT, **overrides)
    rng = np.random.default_rng(0)
    batch = _batch(rng, v_target_size=cfg_dict["v_target_size"])

    model_t, out_t, gumbel, nce = _torch_pretrain_out(ref, cfg_dict, batch)
    (mlm_t, img_t, _, mlm_pv_t, _, _, align_t, c_init_t, c_final_t,
     struc_t) = out_t

    # ---- ours, with converted weights
    from k3m_tpu.train.convert import merge_flat_into_params, reference_to_flat

    model_j, jb, params = _init_jax(cfg_dict, batch)
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
                                         cfg_dict["num_negative_pv"])
    out_j = model_j.apply(params2, jb, deterministic=True,
                          neg_entity_idx=np.asarray(ent_idx),
                          neg_value_idx=np.asarray(val_idx),
                          gumbel_noise=gumbel,
                          neg_image_idx=nce)

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


# --------------------------------------------------------------- alignment

def _pair_batch(rng):
    """Two item dicts + labels for the twin-tower model (no masking)."""
    items = []
    for _ in range(2):
        b = _batch(rng)
        items.append({k: b[k] for k in (
            "input_ids", "input_mask", "segment_ids",
            "input_ids_pv", "input_mask_pv", "segment_ids_pv",
            "index_p", "index_v", "image_feat", "image_loc", "image_mask")})
    labels = np.array([1, 0, 1], np.float32)
    return labels, items[0], items[1]


@pytest.mark.slow
@pytest.mark.parametrize("loss_type", ["inner", "cosine", "ce"])
def test_alignment_loss_parity_vs_reference(loss_type):
    """K3MForItemAlignment parity for all three loss types (ref :3379-3453).

    loss_type="inner": the reference never constructs `self.loss_fct`
    for this branch (ref :2933-2939) and crashes; the test installs the
    intended BCEWithLogitsLoss to obtain a number (matching our
    documented fix, model/alignment.py docstring).
    """
    ref = _shim_and_import()
    cfg_dict = dict(TINY_DICT, loss_type=loss_type)
    torch.manual_seed(0)
    cfg_t = ref.BertConfig.from_dict(cfg_dict)
    model_t = ref.K3MForItemAlignment(cfg_t)
    model_t.eval()
    if loss_type == "inner":
        model_t.loss_fct = torch.nn.BCEWithLogitsLoss()

    rng = np.random.default_rng(7)
    labels, item1, item2 = _pair_batch(rng)
    t1 = {k: torch.tensor(v) for k, v in item1.items()}
    t2 = {k: torch.tensor(v) for k, v in item2.items()}
    tl = torch.tensor(labels if loss_type != "ce"
                      else labels.astype(np.int64))
    with torch.no_grad():
        e1_t, e2_t, probs_t, loss_t = model_t(
            tl.float() if loss_type != "ce" else tl,
            t1["input_ids"], t1["segment_ids"], t1["input_mask"],
            t1["input_ids_pv"], t1["segment_ids_pv"], t1["input_mask_pv"],
            t1["index_p"], t1["index_v"],
            t1["image_feat"], t1["image_loc"], t1["image_mask"],
            t2["input_ids"], t2["segment_ids"], t2["input_mask"],
            t2["input_ids_pv"], t2["segment_ids_pv"], t2["input_mask_pv"],
            t2["index_p"], t2["index_v"],
            t2["image_feat"], t2["image_loc"], t2["image_mask"])

    import jax
    from k3m_tpu.config import K3MConfig
    from k3m_tpu.model.alignment import K3MForItemAlignment
    from k3m_tpu.train.convert import merge_flat_into_params, reference_to_flat

    cfg_j = K3MConfig.from_dict(cfg_dict)
    model_j = K3MForItemAlignment(cfg_j)
    j1 = {k: np.asarray(v, np.int32) if v.dtype == np.int64 else v
          for k, v in item1.items()}
    j2 = {k: np.asarray(v, np.int32) if v.dtype == np.int64 else v
          for k, v in item2.items()}
    jl = labels.astype(np.float32)
    params = jax.jit(lambda: model_j.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1),
         "lpm": jax.random.PRNGKey(2)}, jl, j1, j2,
        deterministic=True))()
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params2, loaded, _ = merge_flat_into_params(params,
                                                reference_to_flat(sd))

    def _paths(d, pre=""):
        for k, v in d.items():
            p = f"{pre}/{k}" if pre else k
            if isinstance(v, dict):
                yield from _paths(v, p)
            else:
                yield p
    missing = set(_paths(params["params"])) - loaded
    assert not missing, f"params not covered by converter: {sorted(missing)}"

    e1_j, e2_j, probs_j, loss_j = model_j.apply(params2, jl, j1, j2,
                                                deterministic=True)
    tol = 1e-3
    assert abs(float(loss_j) - float(loss_t)) < tol
    np.testing.assert_allclose(np.asarray(probs_j, np.float32),
                               probs_t.numpy().reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(e1_j, np.float32).reshape(-1),
                               e1_t.numpy().reshape(-1),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(e2_j, np.float32).reshape(-1),
                               e2_t.numpy().reshape(-1),
                               atol=1e-3, rtol=1e-3)


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
