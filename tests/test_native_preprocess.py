"""Golden tests: the native (C++) batch preprocessor is bit-identical to
the Python pipeline on real corpus text.

The native path (k3m_tpu/runtime/preprocess.cc) replaces the reference's
C-backed online loading stack (LMDB + msgpack-numpy + tensorpack
PrefetchDataZMQ feeding BertPreprocessBatch,
concept_cap_dataset_struc.py:344-367) with one C++ call per batch. These
tests pin it, key by key, to the Python oracle (k3m_tpu/data/preprocess.py)
whose own parity vs the torch reference is covered by
tests/test_reference_parity.py and tests/test_preprocess.py.
"""

import itertools
import os

import numpy as np
import pytest

from k3m_tpu.data.pipeline import AlignmentLoader, PretrainLoader
from k3m_tpu.data.prepare import parse_raw_tsv
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.data.records import write_records
from k3m_tpu.runtime import (
    get_native_pair_preprocessor, get_native_pretrain_preprocessor,
)
from k3m_tpu.tokenization import get_tokenizer

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"
SHAPES = ShapeSpec(max_seq_len=50, max_seq_len_pv=256, max_num_pv=30,
                   max_region_len=8, v_feature_size=32, v_target_size=11)


def _records(n=64, seed=0):
    raw = list(itertools.islice(parse_raw_tsv(SAMPLE), 60))
    rng = np.random.default_rng(seed)
    for i in range(n):
        item = raw[i % len(raw)]
        if i % 11 == 3:        # zero-box fallback path (ref :571-576)
            nb = 0
            boxes = features = cls_prob = None
        else:
            nb = int(rng.integers(1, 9))
            boxes = rng.random((nb, 4), dtype=np.float32) * 300
            boxes[:, 2:] += boxes[:, :2]
            features = rng.random((nb, 32), dtype=np.float32)
            cls_prob = rng.random((nb, 11), dtype=np.float32)
        yield dict(item_id=f"{item['item_id']}_{i}", title=item["title"],
                   pv="" if i % 13 == 5 else item["pv"],
                   category=item["category"], image_h=480, image_w=640,
                   num_boxes=nb, boxes=boxes, features=features,
                   cls_prob=cls_prob)


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nat") / "feat.k3mr")
    write_records(path, _records())
    return path


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer()


@pytest.fixture(scope="module")
def native(record_file, tok):
    nat = get_native_pretrain_preprocessor(record_file, tok, SHAPES)
    if nat is None:
        pytest.skip("native preprocessor unavailable (no toolchain?)")
    return nat


def test_encode_parity_on_corpus(native, tok):
    """C++ WordPiece == Python WordPiece, id for id, on real product text."""
    n = 0
    for item in itertools.islice(parse_raw_tsv(SAMPLE), 120):
        for text in (item["title"], item["pv"], item["category"]):
            assert native.encode(text) == tok.encode(text), repr(text)
            n += 1
    assert n > 300


def test_encode_parity_edge_cases(native, tok):
    cases = [
        "", " ", "abc DEF 中文mixed123", "a:b;c:d;", "ＡＢＣ　全角",
        "émigré naïve Ångström", "x" * 200, "\t\n\r mixed   lines",
        "①②③ ★☆ ——【品牌】", "ＬＥＤ灯 ２０２２新款", "\x00�keep",
    ]
    for text in cases:
        assert native.encode(text) == tok.encode(text), repr(text)


def _py_batch(record_file, tok, idx, seed, epoch, **kw):
    loader = PretrainLoader(record_file, tok, SHAPES, batch_size=len(idx),
                            shuffle=False, seed=seed,
                            native_preprocess=False, **kw)
    loader.epoch = epoch
    return loader._collate([loader._map(int(i)) for i in idx])


def _assert_batches_equal(py, na):
    assert set(py) == set(na)
    for k in py:
        if k == "item_id":
            assert py[k] == na[k]
            continue
        a, b = np.asarray(py[k]), np.asarray(na[k])
        assert a.shape == b.shape, k
        assert a.dtype == b.dtype, k
        assert np.array_equal(a, b), (
            k, np.argwhere(a != b)[:4].tolist())


def test_batch_bit_identical(record_file, tok, native):
    rng = np.random.default_rng(7)
    for epoch in (0, 1):
        idx = rng.permutation(64)[:32]
        py = _py_batch(record_file, tok, idx, seed=3, epoch=epoch)
        na = native.batch(idx, seed=3, epoch=epoch)
        _assert_batches_equal(py, na)


def test_batch_visual_target_nonzero(record_file, tok):
    nat = get_native_pretrain_preprocessor(record_file, tok, SHAPES,
                                           visual_target=1)
    if nat is None:
        pytest.skip("native preprocessor unavailable")
    idx = np.arange(16)
    py = _py_batch(record_file, tok, idx, seed=0, epoch=0, visual_target=1)
    na = nat.batch(idx, seed=0, epoch=0)
    # target = feat.copy() pre-masking, width = v_feature_size (ref :599-601)
    assert na["image_target"].shape == (16, SHAPES.max_region_len,
                                        SHAPES.v_feature_size)
    _assert_batches_equal(py, na)


def test_loader_uses_native_and_matches(record_file, tok):
    kw = dict(batch_size=16, shuffle=True, seed=5)
    nat_loader = PretrainLoader(record_file, tok, SHAPES, **kw)
    if nat_loader.native is None:
        pytest.skip("native preprocessor unavailable")
    py_loader = PretrainLoader(record_file, tok, SHAPES,
                               native_preprocess=False, **kw)
    for nb, pb in zip(nat_loader, py_loader):
        _assert_batches_equal(pb, nb)


def test_env_gate_disables_native(record_file, tok, monkeypatch):
    monkeypatch.setenv("K3M_NATIVE_PREPROCESS", "0")
    loader = PretrainLoader(record_file, tok, SHAPES, batch_size=8)
    assert loader.native is None


# ---------------------------------------------------------------- pairs


@pytest.fixture(scope="module")
def pair_record_file(tmp_path_factory):
    recs = list(_records(40, seed=1))
    path = str(tmp_path_factory.mktemp("natp") / "pairs.k3mr")
    write_records(path, (dict(label=float(i % 2), item1=recs[2 * i],
                              item2=recs[2 * i + 1]) for i in range(20)))
    return path


def _assert_pair_batches_equal(py, na):
    assert set(py) == set(na) == {"label", "item1", "item2"}
    np.testing.assert_array_equal(np.asarray(py["label"]),
                                  np.asarray(na["label"]))
    assert np.asarray(na["label"]).dtype == np.float32
    for k in ("item1", "item2"):
        _assert_batches_equal(py[k], na[k])


def _py_pair_batch(pair_record_file, tok, idx, **kw):
    loader = AlignmentLoader(pair_record_file, tok, SHAPES, batch_size=len(idx),
                             shuffle=False, native_preprocess=False, **kw)
    return loader._collate([loader._map(int(i)) for i in idx])


def test_pair_batch_bit_identical(pair_record_file, tok):
    nat = get_native_pair_preprocessor(pair_record_file, tok, SHAPES)
    if nat is None:
        pytest.skip("native pair preprocessor unavailable")
    idx = np.arange(20)
    py = _py_pair_batch(pair_record_file, tok, idx)
    na = nat.batch(idx)
    _assert_pair_batches_equal(py, na)


def test_pair_batch_visual_target_nonzero(pair_record_file, tok):
    nat = get_native_pair_preprocessor(pair_record_file, tok, SHAPES,
                                       visual_target=1)
    if nat is None:
        pytest.skip("native pair preprocessor unavailable")
    idx = np.arange(10)
    py = _py_pair_batch(pair_record_file, tok, idx, visual_target=1)
    na = nat.batch(idx)
    assert na["item1"]["image_target"].shape == (
        10, SHAPES.max_region_len, SHAPES.v_feature_size)
    _assert_pair_batches_equal(py, na)


def test_alignment_loader_uses_native_and_matches(pair_record_file, tok):
    kw = dict(batch_size=8, shuffle=True, seed=5)
    nat_loader = AlignmentLoader(pair_record_file, tok, SHAPES, **kw)
    if nat_loader.native is None:
        pytest.skip("native pair preprocessor unavailable")
    py_loader = AlignmentLoader(pair_record_file, tok, SHAPES,
                                native_preprocess=False, **kw)
    n = 0
    for nb, pb in zip(nat_loader, py_loader):
        _assert_pair_batches_equal(pb, nb)
        n += 1
    assert n == len(py_loader)
