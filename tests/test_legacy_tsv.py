"""Tests for the legacy TSV path (2_/3_ script equivalents)."""

import base64
import csv
import os

import numpy as np

from k3m_tpu.data.legacy_tsv import (FIELDNAMES, load_caption_index,
                                     read_tsv, serialize_tsv_to_records,
                                     write_tsv)
from k3m_tpu.data.records import RecordReader


def _fake_dets(n):
    rng = np.random.default_rng(0)
    for i in range(n):
        nb = 36
        yield dict(image_id=f"img_{i}", image_h=480, image_w=640,
                   num_boxes=nb,
                   boxes=rng.random((nb, 4)).astype(np.float32) * 100,
                   features=rng.normal(size=(nb, 2048)).astype(np.float32),
                   cls_prob=rng.random((nb, 1601)).astype(np.float32))


def test_tsv_roundtrip(tmp_path):
    path = str(tmp_path / "feat.tsv.0")
    dets = list(_fake_dets(3))
    assert write_tsv(dets, path) == 3
    back = list(read_tsv(path))
    assert len(back) == 3
    for a, b in zip(dets, back):
        assert b["image_id"] == a["image_id"]
        assert b["num_boxes"] == 36
        np.testing.assert_array_equal(b["boxes"], a["boxes"])
        np.testing.assert_array_equal(b["features"], a["features"])
        np.testing.assert_array_equal(b["cls_prob"], a["cls_prob"])


def test_tsv_uses_reference_b64_framing(tmp_path):
    """Rows must decode with the reference's [2:-1] slice
    (2_generate_tsv_ali.py:222-226)."""
    path = str(tmp_path / "feat.tsv.0")
    det = next(_fake_dets(1))
    write_tsv([det], path)
    csv.field_size_limit(500 * 1024 * 1024)
    with open(path) as f:
        row = next(csv.DictReader(f, delimiter="\t", fieldnames=FIELDNAMES))
    assert row["boxes"].startswith("b'") and row["boxes"].endswith("'")
    boxes = np.frombuffer(base64.b64decode(row["boxes"][2:-1]),
                          dtype=np.float32).reshape(36, 4)
    np.testing.assert_array_equal(boxes, det["boxes"])


def test_serialize_join(tmp_path):
    tsv = str(tmp_path / "feat.tsv.0")
    dets = list(_fake_dets(4))
    write_tsv(dets, tsv)
    df = str(tmp_path / "df_train.csv")
    with open(df, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=["image_id", "caption", "pv",
                                          "category"])
        w.writeheader()
        for i in range(3):  # one TSV row intentionally unmatched
            w.writerow({"image_id": f"img_{i}", "caption": f"title {i}",
                        "pv": "品牌:x;颜色:红", "category": "cat"})
    out = str(tmp_path / "train_feat.k3mr")
    assert serialize_tsv_to_records([tsv], df, out) == 3
    reader = RecordReader(out)
    assert len(reader) == 3
    rec = reader[0]
    assert rec["caption"] == "title 0"
    assert rec["pv"] == "品牌:x;颜色:红"
    assert rec["features"].shape == (36, 2048)
    reader.close()

    idx = load_caption_index(df)
    assert idx["img_1"] == ("品牌:x;颜色:红", "title 1", "cat")


def test_caption_index_accepts_our_schema(tmp_path):
    df = str(tmp_path / "df.csv")
    with open(df, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=["item_id", "title", "pv",
                                          "category"])
        w.writeheader()
        w.writerow({"item_id": "a1", "title": "t", "pv": "p:v",
                    "category": "c"})
    assert load_caption_index(df)["a1"] == ("p:v", "t", "c")
