"""Structure aggregator parity vs a literal numpy port of the reference's
per-item loops (vilbert_k3m/vilbert_k3m.py:2413-2505), with injected
negatives so sampling is deterministic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from k3m_tpu.config import K3MConfig
from k3m_tpu.model.structure import StructureAggregator


def numpy_reference(c_initial, seq_pv, index_p, index_v, W1, b1, W2, b2, W3,
                    b3, margin, neg_ent, neg_val, fixed_order=True):
    """Literal loop port of ref :2437-2502 (numpy, torch semantics)."""
    B, P, _ = index_p.shape
    H = c_initial.shape[1]
    p_vecs, v_vecs = [], []
    c_final = np.zeros_like(c_initial)
    t = None  # NOT reset between items — the reference's stale-state quirk
    for i in range(B):
        p_vecs.append([])
        v_vecs.append([])
        rows = []
        for j in range(P):
            if index_p[i, j, 0] == 0:
                break
            p = seq_pv[i][index_p[i, j]].mean(0)   # mean of the TWO endpoints
            v = seq_pv[i][index_v[i, j]].mean(0)
            p_vecs[i].append(p)
            v_vecs[i].append(v)
            rows.append(np.concatenate([c_initial[i], p, v]) @ W1 + b1)
        if rows:
            t = np.stack(rows)
        elif t is None:
            t = c_initial[i][None]  # except-branch (ref :2452-2456), no W1
        lrelu = np.where(t > 0, t, 0.01 * t)
        b = lrelu @ W2 + b2
        atten = np.exp(b - b.max()) / np.exp(b - b.max()).sum()
        c_final[i] = c_initial[i] + ((atten * t).sum(0) @ W3 + b3)

    pos_norms, neg_norms = [], []
    for i in range(B):
        for j, (p, v) in enumerate(zip(p_vecs[i], v_vecs[i])):
            pos = np.linalg.norm(c_final[i] + p - v)
            for k in neg_ent[i][j]:
                neg_norms.append(np.linalg.norm(c_final[k] + p - v))
                pos_norms.append(pos)
            for k in neg_val[i][j]:
                if k < len(v_vecs[i]):
                    neg_norms.append(np.linalg.norm(c_final[i] + p - v_vecs[i][k]))
                    pos_norms.append(pos)
    pos_norms = np.array(pos_norms)
    neg_norms = np.array(neg_norms)
    # torch MarginRankingLoss(pos, neg, y=1) = mean relu(-(pos-neg)+margin)
    loss = np.maximum(0.0, -(pos_norms - neg_norms) + margin).mean()
    return c_final, loss


@pytest.fixture(scope="module")
def setup():
    cfg = K3MConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=16,
                    v_hidden_size=8, v_num_hidden_layers=1,
                    v_num_attention_heads=2, v_intermediate_size=8,
                    bi_hidden_size=8, bi_num_attention_heads=2,
                    v_biattention_id=(0,), t_biattention_id=(1,),
                    num_negative_pv=4, margin=1.0)
    B, L, P, H = 4, 12, 3, 16
    rng = np.random.default_rng(0)
    c_initial = rng.normal(size=(B, H)).astype(np.float32)
    seq_pv = rng.normal(size=(B, L, H)).astype(np.float32)
    # items 0,1 have 2 pairs; item 2 has 1; item 3 has 0 (fallback path)
    index_p = np.zeros((B, P, 2), np.int32)
    index_v = np.zeros((B, P, 2), np.int32)
    index_p[0, 0] = [1, 3]; index_v[0, 0] = [4, 5]
    index_p[0, 1] = [6, 7]; index_v[0, 1] = [8, 10]
    index_p[1, 0] = [2, 4]; index_v[1, 0] = [5, 6]
    index_p[1, 1] = [7, 8]; index_v[1, 1] = [9, 11]
    index_p[2, 0] = [1, 2]; index_v[2, 0] = [3, 4]
    mod = StructureAggregator(cfg, with_lpm=True)
    params = mod.init(
        {"params": jax.random.PRNGKey(0), "lpm": jax.random.PRNGKey(1)},
        jnp.array(c_initial), jnp.array(seq_pv), jnp.array(index_p),
        jnp.array(index_v))
    return cfg, mod, params, c_initial, seq_pv, index_p, index_v


def test_cfinal_matches_reference_loops(setup):
    cfg, mod, params, c_initial, seq_pv, index_p, index_v = setup
    B, P = index_p.shape[:2]
    n_ent, n_val = 2, 2
    # injected negatives: deterministic "random.sample" outcomes.
    # invalid (i,j) slots are never read by the numpy reference.
    neg_ent = [[[(i + 1) % B, (i + 2) % B] for j in range(P)] for i in range(B)]
    neg_val = [[[k for k in range(P) if k != j][:n_val] for j in range(P)]
               for i in range(B)]

    c_final, loss = mod.apply(
        params, jnp.array(c_initial), jnp.array(seq_pv), jnp.array(index_p),
        jnp.array(index_v), deterministic=True,
        neg_entity_idx=jnp.array(neg_ent, jnp.int32),
        neg_value_idx=jnp.array(neg_val, jnp.int32))

    p = params["params"]
    ref_c, ref_loss = numpy_reference(
        c_initial, seq_pv, index_p, index_v,
        np.array(p["struc_w1"]["kernel"]), np.array(p["struc_w1"]["bias"]),
        np.array(p["struc_w2"]["kernel"]), np.array(p["struc_w2"]["bias"]),
        np.array(p["struc_w3"]["kernel"]), np.array(p["struc_w3"]["bias"]),
        cfg.margin, neg_ent, neg_val)

    np.testing.assert_allclose(np.array(c_final), ref_c, rtol=2e-5, atol=2e-5)
    # value-negative validity differs for rows with <2 valid pairs; compare
    # only the aggregate loss which masks identically
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4, atol=1e-4)


def test_zero_pv_stale_state_quirk(setup):
    """Item 3 (no pairs) must reuse item 2's aggregated triples — the
    reference's un-reset `t` (ref :2437-2456)."""
    cfg, mod, params, c_initial, seq_pv, index_p, index_v = setup
    c_final, _ = mod.apply(
        params, jnp.array(c_initial), jnp.array(seq_pv), jnp.array(index_p),
        jnp.array(index_v), deterministic=True)
    # c_final[3] - c_initial[3] must equal c_final[2] - c_initial[2]
    # (same W3(agg_2) term)
    np.testing.assert_allclose(
        np.array(c_final[3] - jnp.array(c_initial[3])),
        np.array(c_final[2] - jnp.array(c_initial[2])), rtol=2e-5, atol=2e-5)


def test_zero_pv_clean_fallback_with_fix():
    """With fix_reference_bugs, a zero-pair item falls back to
    c_final = c + W3(c) independent of batch order."""
    from k3m_tpu.config import K3MConfig
    cfg = K3MConfig(vocab_size=50, hidden_size=16, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=16,
                    v_hidden_size=8, v_num_hidden_layers=1,
                    v_num_attention_heads=2, v_intermediate_size=8,
                    bi_hidden_size=8, bi_num_attention_heads=2,
                    v_biattention_id=(0,), t_biattention_id=(1,),
                    num_negative_pv=4, margin=1.0, fix_reference_bugs=True)
    rng = np.random.default_rng(0)
    B, L, P, H = 3, 10, 2, 16
    c_initial = rng.normal(size=(B, H)).astype(np.float32)
    seq_pv = rng.normal(size=(B, L, H)).astype(np.float32)
    index_p = np.zeros((B, P, 2), np.int32)
    index_v = np.zeros((B, P, 2), np.int32)
    index_p[0, 0] = [1, 2]; index_v[0, 0] = [3, 4]
    mod = StructureAggregator(cfg, with_lpm=False)
    params = mod.init({"params": jax.random.PRNGKey(0)},
                      jnp.array(c_initial), jnp.array(seq_pv),
                      jnp.array(index_p), jnp.array(index_v))
    c_final, _ = mod.apply(params, jnp.array(c_initial), jnp.array(seq_pv),
                           jnp.array(index_p), jnp.array(index_v),
                           deterministic=True)
    p = params["params"]
    for i in (1, 2):
        expected = c_initial[i] + (
            c_initial[i] @ np.array(p["struc_w3"]["kernel"])
            + np.array(p["struc_w3"]["bias"]))
        np.testing.assert_allclose(np.array(c_final[i]), expected, rtol=2e-5,
                                   atol=2e-5)


def test_lpm_random_sampling_runs(setup):
    cfg, mod, params, c_initial, seq_pv, index_p, index_v = setup
    c_final, loss = mod.apply(
        params, jnp.array(c_initial), jnp.array(seq_pv), jnp.array(index_p),
        jnp.array(index_v), deterministic=False,
        rngs={"lpm": jax.random.PRNGKey(3)})
    assert np.isfinite(float(loss))
    assert float(loss) >= 0.0
