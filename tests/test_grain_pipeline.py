"""ArrayRecord + Grain pipeline tests (the north-star tensorpack/LMDB
replacement). Skipped if grain/array_record are unavailable."""

import json

import numpy as np
import pytest

from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.tokenization import get_tokenizer

grain_pipeline = pytest.importorskip("k3m_tpu.data.grain_pipeline")
if not grain_pipeline.HAVE_GRAIN:
    pytest.skip("grain/array_record not available", allow_module_level=True)

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"
SHAPES = ShapeSpec(max_seq_len=24, max_seq_len_pv=48, max_num_pv=6,
                   max_region_len=4)


@pytest.fixture(scope="module")
def array_record_file(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gr") / "train_feat.array_record")
    n = grain_pipeline.write_array_records(
        out, build_feature_records(list(parse_raw_tsv(SAMPLE))[:24]))
    assert n == 24
    return out


def test_array_record_store_roundtrip(array_record_file):
    store = grain_pipeline.ArrayRecordStore(array_record_file)
    assert len(store) == 24
    rec = store[0]
    assert rec["title"] and rec["pv"]
    assert rec["features"].shape == (0, 2048)  # zero-box placeholder


def test_grain_pretrain_loader_batches(array_record_file):
    tok = get_tokenizer()
    loader = grain_pipeline.GrainPretrainLoader(
        array_record_file, tok, SHAPES, batch_size=8, shuffle=True, seed=3,
        num_epochs=1)
    assert len(loader) == 3
    batches = list(iter(loader))
    assert len(batches) == 3
    b = batches[0]
    assert b["input_ids"].shape == (8, 24)
    assert b["input_ids_pv"].shape == (8, 48)
    assert b["image_feat"].shape == (8, 5, 2048)   # 4 regions + global token
    assert b["index_p"].shape == (8, 6, 2)
    assert (b["input_ids"][:, 0] == tok.cls_token_id).all()
    # MLM masking happened (some labels set)
    assert (np.asarray(b["lm_label_ids"]) != -1).sum() > 0


@pytest.mark.parametrize("num_workers", [0, 2])
def test_grain_batches_byte_identical_to_pretrain_loader(
        array_record_file, num_workers):
    """The Grain loader derives each sample's rng from (seed, epoch,
    record_index, 0) — the exact PretrainLoader stream — so with
    shuffle=False the two backends must produce BYTE-IDENTICAL batches,
    masking included, at any worker count."""
    from k3m_tpu.data.pipeline import PretrainLoader

    tok = get_tokenizer()
    kw = dict(batch_size=8, shuffle=False, seed=11)
    ref_loader = PretrainLoader(array_record_file, tok, SHAPES, **kw)
    g_loader = grain_pipeline.GrainPretrainLoader(
        array_record_file, tok, SHAPES, num_epochs=1,
        num_workers=num_workers, **kw)
    ref_batches = list(iter(ref_loader))
    g_batches = list(iter(g_loader))
    assert len(ref_batches) == len(g_batches) == 3
    for rb, gb in zip(ref_batches, g_batches):
        assert set(rb) == set(gb)
        for k in rb:
            if k == "item_id":
                assert [str(x) for x in rb[k]] == [str(x) for x in gb[k]]
                continue
            np.testing.assert_array_equal(
                np.asarray(rb[k]), np.asarray(gb[k]), err_msg=k)


def test_grain_loader_feeds_k3mr_consumers(array_record_file):
    """The K3MR threaded loader must read .array_record files directly
    (extension dispatch), yielding the same batch schema."""
    from k3m_tpu.data.pipeline import PretrainLoader

    tok = get_tokenizer()
    loader = PretrainLoader(array_record_file, tok, SHAPES, batch_size=8,
                            shuffle=False, seed=0, use_native=True)
    b = next(iter(loader))
    assert b["input_ids"].shape == (8, 24)
    assert b["image_mask"].shape == (8, 5)


def test_grain_alignment_loader(array_record_file, tmp_path):
    from k3m_tpu.data.prepare import build_pair_records
    from k3m_tpu.data.records import write_records

    rows = list(parse_raw_tsv(SAMPLE))[:24]
    pairs = str(tmp_path / "pairs.jsonl")
    with open(pairs, "w", encoding="utf-8") as f:
        for i in range(0, 16, 2):
            f.write(json.dumps({"src_item_id": rows[i]["item_id"],
                                "tgt_item_id": rows[i + 1]["item_id"],
                                "item_label": i % 4 == 0}) + "\n")
    out = str(tmp_path / "pairs.array_record")
    n = grain_pipeline.write_array_records(
        out, build_pair_records(pairs, array_record_file))
    assert n == 8

    tok = get_tokenizer()
    loader = grain_pipeline.GrainAlignmentLoader(
        out, tok, SHAPES, batch_size=4, shuffle=False, seed=0, num_epochs=1)
    batches = list(iter(loader))
    assert len(batches) == 2
    b = batches[0]
    assert b["label"].shape == (4,)
    assert b["item1"]["input_ids"].shape == (4, 24)
    assert b["item2"]["image_feat"].shape == (4, 5, 2048)


@pytest.fixture(scope="module")
def sibling_pair_files(tmp_path_factory):
    """Same records written to BOTH backends (the native-hybrid contract:
    K3MR sibling holds identical records in identical order)."""
    from k3m_tpu.data.records import write_records
    d = tmp_path_factory.mktemp("hy")
    recs = list(build_feature_records(list(parse_raw_tsv(SAMPLE))[:24]))
    ar, k3mr = str(d / "t.array_record"), str(d / "t.k3mr")
    grain_pipeline.write_array_records(ar, iter(recs))
    write_records(k3mr, iter(recs))
    return ar, k3mr


def test_grain_native_hybrid_bit_identical(sibling_pair_files):
    """r5 Grain native-hybrid (Grain sampler -> C++ batch producer) must
    produce byte-identical batches to the pure-Grain per-record path, at
    every epoch (epoch-mixed shuffle + per-record rng streams)."""
    ar, k3mr = sibling_pair_files
    tok = get_tokenizer()
    kw = dict(shapes=SHAPES, batch_size=8, shuffle=True, seed=5)
    pure = grain_pipeline.GrainPretrainLoader(
        ar, tok, native_preprocess=False, **kw)
    hybrid = grain_pipeline.GrainPretrainLoader(
        ar, tok, native_sibling=k3mr, **kw)
    if hybrid._native is None:
        pytest.skip("native preprocessor unavailable")
    for epoch in range(2):
        # list() so BOTH generators run to completion (zip() abandons the
        # second one mid-epilogue and its epoch counter would never bump)
        for i, (bp, bh) in enumerate(zip(list(iter(pure)),
                                         list(iter(hybrid)))):
            assert set(bp) == set(bh)
            for k in bp:
                np.testing.assert_array_equal(
                    np.asarray(bp[k]), np.asarray(bh[k]),
                    err_msg=f"epoch {epoch} batch {i} key {k}")


def test_grain_native_hybrid_refuses_mismatched_sibling(
        array_record_file, tmp_path):
    """A K3MR sibling with different content/order must NOT be used."""
    from k3m_tpu.data.records import write_records
    bad = str(tmp_path / "bad.k3mr")
    recs = list(build_feature_records(list(parse_raw_tsv(SAMPLE))[:24]))
    write_records(bad, iter(reversed(recs)))
    tok = get_tokenizer()
    loader = grain_pipeline.GrainPretrainLoader(
        array_record_file, tok, SHAPES, batch_size=8,
        native_sibling=bad)
    assert loader._native is None
