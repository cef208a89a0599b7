"""Preprocessing parity tests against hand-computed reference semantics."""

import numpy as np
import pytest

from k3m_tpu.data.preprocess import (
    PretrainPreprocessor, ShapeSpec, add_global_image_token, box_iou,
    index_pv, mask_word_pv,
)
from k3m_tpu.tokenization import get_tokenizer

COLON, SEMI = 131, 132
MASK = 103


def test_box_iou_matches_reference_convention():
    # identical boxes -> IoU 1; the +1 pixel convention
    # (concept_cap_dataset_struc.py:40-77)
    a = np.array([[0., 0., 9., 9.], [10., 10., 19., 19.]])
    o = box_iou(a, a)
    assert np.allclose(np.diag(o), 1.0)
    assert o[0, 1] == 0.0
    b = np.array([[0., 0., 9., 9.]])
    c = np.array([[5., 0., 14., 9.]])
    # iw = min(9,14)-max(0,5)+1 = 5, areas 100 each -> 50/150
    assert np.allclose(box_iou(b, c)[0, 0], 50.0 / 150.0)


def test_index_pv_spans():
    # [CLS] p p : v v ; p : v ; [SEP] (ref index_pv :785-813)
    toks = [101, 5, 6, COLON, 7, 8, SEMI, 9, COLON, 10, SEMI, 102]
    p, v = index_pv(toks, max_num_pv=5)
    assert p == [[1, 3], [7, 8]]
    assert v == [[4, 6], [9, 10]]


def test_index_pv_unbalanced_drops_trailing_colon():
    toks = [101, 5, COLON, 7, SEMI, 8, COLON, 102]  # trailing ':' no ';'
    p, v = index_pv(toks, max_num_pv=5)
    assert p == [[1, 2]] and v == [[3, 4]]


def test_index_pv_mismatch_resets():
    toks = [101, SEMI, 5, SEMI, COLON, 102]  # |132| > |131|
    p, v = index_pv(toks, max_num_pv=5)
    assert p == [] and v == []


def test_mask_word_pv_masks_all_values_except_first():
    # ref mask_word_pv :815-840: first pair's value kept, later values MASKed
    toks = [5, 6, COLON, 7, 8, SEMI, 9, COLON, 10, 11, SEMI]
    out, labels = mask_word_pv(list(toks), MASK)
    # first value (7,8) untouched
    assert out[3] == 7 and out[4] == 8 and labels[3] == -1
    # second value (10,11) masked with original ids as labels
    assert out[8] == MASK and out[9] == MASK
    assert labels[8] == 10 and labels[9] == 11
    # delimiters untouched
    assert out[2] == COLON and out[5] == SEMI and out[10] == SEMI


def test_mask_word_pv_open_final_value():
    # len(132) == len(131)-1 -> virtual terminator at end (ref :827-828)
    toks = [5, COLON, 7, SEMI, 9, COLON, 10, 11]
    out, labels = mask_word_pv(list(toks), MASK)
    assert out[6] == MASK and out[7] == MASK
    assert labels[6] == 10 and labels[7] == 11


@pytest.fixture(scope="module")
def prep():
    return PretrainPreprocessor(
        get_tokenizer(), ShapeSpec(max_seq_len=20, max_seq_len_pv=40,
                                   max_num_pv=5, max_region_len=8,
                                   v_feature_size=4, v_target_size=3))


def _record():
    return dict(item_id="x1", title="上衣2020", pv="风格:明清古典;材质:布;",
                category="c", image_h=100, image_w=200, num_boxes=2,
                boxes=np.array([[0, 0, 99, 99], [50, 50, 199, 99]], np.float32),
                features=np.ones((2, 4), np.float32),
                cls_prob=np.full((2, 3), 0.5, np.float32))


def test_pretrain_preprocessor_shapes_and_masking(prep):
    rng = np.random.default_rng(0)
    f = prep(_record(), rng)
    assert f["input_ids"].shape == (20,)
    assert f["input_ids_pv"].shape == (40,)
    assert f["index_p"].shape == (5, 2)
    assert f["image_feat"].shape == (8, 4)
    assert f["image_target"].shape == (8, 3)
    assert f["image_loc"].shape == (8, 5)
    # location normalization (ref :586-595)
    assert np.isclose(f["image_loc"][0, 2], 99 / 200)
    assert np.isclose(f["image_loc"][0, 3], 99 / 100)
    assert np.isclose(f["image_loc"][0, 4], (99 / 100) * (99 / 200))
    # CLS/SEP wrap
    assert f["input_ids"][0] == 101
    # second pv value is deterministically masked
    pv_ids = f["input_ids_pv"]
    labels_pv = f["lm_label_ids_pv"]
    assert (labels_pv != -1).sum() >= 1
    masked_pos = np.where(labels_pv != -1)[0]
    assert all(pv_ids[i] == MASK for i in masked_pos)


def test_zero_box_fallback(prep):
    rec = _record()
    rec.update(num_boxes=0, boxes=np.zeros((0, 4), np.float32),
               features=np.zeros((0, 4), np.float32),
               cls_prob=np.zeros((0, 3), np.float32))
    f = prep(rec, np.random.default_rng(0))
    # ref :571-576: one 800x800 box
    assert f["image_mask"].sum() == 1
    assert np.isclose(f["image_loc"][0, 0], 0.1 / 800)


def test_determinism(prep):
    f1 = prep(_record(), np.random.default_rng(7))
    f2 = prep(_record(), np.random.default_rng(7))
    for k in f1:
        if isinstance(f1[k], np.ndarray):
            assert np.array_equal(f1[k], f2[k]), k


def test_global_image_token():
    feat = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
    loc = np.zeros((1, 3, 5), np.float32)
    mask = np.ones((1, 3), np.int32)
    divisor = np.array([[2.0]], np.float32)
    f, l, m = add_global_image_token(feat, loc, mask, divisor)
    assert f.shape == (1, 4, 4) and l.shape == (1, 4, 5) and m.shape == (1, 4)
    assert np.allclose(f[0, 0], feat[0].sum(0) / 2.0)
    assert np.allclose(l[0, 0], [0, 0, 1, 1, 1])


def test_title_mlm_statistics(prep):
    # over many samples ~15% of title tokens get labels (ref :763-783)
    tok = get_tokenizer()
    n_tok, n_lab, n_masked = 0, 0, 0
    for i in range(300):
        f = prep(_record(), np.random.default_rng(i))
        real = f["input_mask"].sum() - 2
        n_tok += real
        labels = f["lm_label_ids"]
        n_lab += (labels != -1).sum()
        n_masked += (f["input_ids"] == MASK).sum()
    rate = n_lab / n_tok
    assert 0.10 < rate < 0.20
    assert n_masked < n_lab  # ~80% of labeled become [MASK]
