"""The two formerly-silent config flags (round-3 verdict item 6):

  visualization         — attention-prob collection via the intermediates
                          collection (ref vilbert_k3m.py:423,466-475,
                          :625-634, :826-838, :953-965)
  task_specific_tokens  — per-task embedding inserted after [CLS]
                          (ref :358-381, mask extension :2534-2541)

Both must be either functional or loudly rejected — never accepted-and-
ignored."""

import numpy as np
import pytest

from k3m_tpu.config import K3MConfig
from tests.conftest import NANO, make_nano_batch, make_pretrain_batch


def _jit_apply(model, params, batch, **kw):
    import jax
    return jax.jit(lambda p, b: model.apply(p, b, deterministic=True, **kw))(
        params, batch)


# --------------------------------------------------------------- visualization

def _init_pretrain(cfg, batch):
    import jax

    from k3m_tpu.model.pretrain import K3MForPretraining
    model = K3MForPretraining(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1), "lpm": jax.random.PRNGKey(2)}
    return model, model.init(rngs, batch, deterministic=True)


def test_visualization_off_sows_nothing():
    import jax
    batch = make_nano_batch(B=2)
    model, params = _init_pretrain(NANO, batch)
    out, mods = jax.jit(
        lambda p, b: model.apply(p, b, deterministic=True,
                                 mutable=["intermediates"]))(params, batch)
    assert mods.get("intermediates", {}) == {}


def test_visualization_collects_probs():
    from k3m_tpu.model.visualize import (flatten_attention,
                                         forward_with_attention)
    cfg = NANO.replace(visualization=True)
    batch = make_nano_batch(B=2)
    model, params = _init_pretrain(cfg, batch)
    out, inter = forward_with_attention(model, params, batch,
                                        deterministic=True)
    flat = flatten_attention(inter)
    assert flat, "visualization=True must sow attention probs"
    # co-attention sites sow both directions under the reference's
    # attn1/attn2 keys (ref :829-838)
    assert any(k.endswith("attn1") or "/attn1/" in k for k in flat)
    assert any(k.endswith("attn2") or "/attn2/" in k for k in flat)
    # every sown tensor is a probability map: rows sum to 1 (deterministic
    # mode, so no dropout perturbs them)
    for k, v in flat.items():
        v = np.asarray(v, np.float32)
        assert v.ndim == 4, (k, v.shape)
        np.testing.assert_allclose(v.sum(-1), 1.0, atol=2e-2, err_msg=k)
    # the loss outputs are unaffected by collection
    base = _jit_apply(*(_init_pretrain(NANO, batch)[:2]), batch)
    assert set(out.keys()) == set(base.keys())


def test_visualization_rejects_pallas():
    with pytest.raises(ValueError, match="visualization"):
        K3MConfig(visualization=True, use_pallas=True)


# --------------------------------------------------------- task_specific_tokens

def test_pretrain_raises_on_task_tokens():
    cfg = NANO.replace(task_specific_tokens=True)
    batch = make_nano_batch(B=2)
    with pytest.raises(ValueError, match="task_specific_tokens"):
        _init_pretrain(cfg, batch)


def test_trunk_task_tokens_shapes_and_mask():
    """Trunk-level feature: one task token lengthens both text streams by
    one; task_ids is required (the reference crashes on None too)."""
    import jax

    from k3m_tpu.model.pretrain import K3MTrunk

    cfg = NANO.replace(task_specific_tokens=True)
    b = make_nano_batch(B=2)
    trunk = K3MTrunk(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)}
    args = (b["input_ids"], b["image_feat"], b["image_loc"],
            b["segment_ids"], b["input_mask"], b["image_mask"],
            b["input_ids_pv"], b["segment_ids_pv"], b["input_mask_pv"])
    task_ids = np.array([3, 7], np.int32)
    params = trunk.init(rngs, *args, deterministic=True, task_ids=task_ids)
    out = trunk.apply(params, *args, deterministic=True, task_ids=task_ids)
    L, Lpv = b["input_ids"].shape[1], b["input_ids_pv"].shape[1]
    assert out["seq_t"].shape[1] == L + 1
    assert out["seq_pv"].shape[1] == Lpv + 1
    assert "task_embeddings" in params["params"]["embeddings"]
    with pytest.raises(ValueError, match="task_ids"):
        trunk.init(rngs, *args, deterministic=True)


def test_task_embedding_parity_vs_reference():
    """Bit-level check of the insertion semantics against the torch
    reference BertEmbeddings (ref :335-381): task token after [CLS], no
    position/type embedding on it, LayerNorm after insertion."""
    torch = pytest.importorskip("torch")
    import jax

    from k3m_tpu.model.layers import BertEmbeddings
    from tests.test_reference_parity import TINY_DICT, _shim_and_import

    ref = _shim_and_import()
    cfg_dict = dict(TINY_DICT, task_specific_tokens=True)
    rcfg = ref.BertConfig.from_dict(cfg_dict)
    torch.manual_seed(0)
    remb = ref.BertEmbeddings(rcfg)
    remb.eval()

    B, L = 3, 8
    rng = np.random.default_rng(5)
    ids = rng.integers(1, cfg_dict["vocab_size"], (B, L)).astype(np.int64)
    types = np.zeros((B, L), np.int64)
    task_ids = np.array([[2], [0], [19]], np.int64)   # ref uses [B, 1]
    with torch.no_grad():
        want = remb(torch.tensor(ids), torch.tensor(types),
                    torch.tensor(task_ids)).numpy()

    cfg = K3MConfig.from_dict(cfg_dict)
    ours = BertEmbeddings(cfg)
    table = remb.word_embeddings.weight.detach().numpy()
    params = {"params": {
        "position_embeddings":
            remb.position_embeddings.weight.detach().numpy(),
        "token_type_embeddings":
            remb.token_type_embeddings.weight.detach().numpy(),
        "task_embeddings": remb.task_embeddings.weight.detach().numpy(),
        "LayerNorm": {"scale": remb.LayerNorm.weight.detach().numpy(),
                      "bias": remb.LayerNorm.bias.detach().numpy()},
    }}
    got = ours.apply(params, ids.astype(np.int32), types.astype(np.int32),
                     jax.numpy.asarray(table), deterministic=True,
                     task_ids=task_ids.astype(np.int32))
    assert got.shape == want.shape == (B, L + 1, cfg_dict["hidden_size"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
