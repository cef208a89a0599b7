"""Offline prep / indexing / cleaning CLI tests on the bundled sample."""

import json
import os

import numpy as np

SAMPLE = "/root/reference/data/raw_multidata_of_product_preatrain.small_train"


def test_parse_raw_tsv():
    from k3m_tpu.data.prepare import parse_raw_tsv
    rows = list(parse_raw_tsv(SAMPLE))
    assert len(rows) == 399
    r = rows[0]
    assert r["item_id"] and r["title"] and r["category"]
    assert "#" not in r["pv"]
    assert r["pv"].endswith(";")
    assert ":" in r["pv"]


def test_build_feature_records_and_index(tmp_path):
    from k3m_tpu.data.index import build_index
    from k3m_tpu.data.prepare import build_feature_records, parse_raw_tsv
    from k3m_tpu.data.records import RecordReader, write_records

    out = str(tmp_path / "t.k3mr")
    n = write_records(out, build_feature_records(
        list(parse_raw_tsv(SAMPLE))[:20]))
    assert n == 20
    r = RecordReader(out)
    rec = r[0]
    assert rec["num_boxes"] == 0  # no images in this environment

    stats = build_index(parse_raw_tsv(SAMPLE), str(tmp_path), "train")
    assert stats["rows"] == 399
    for f in ("df_train.csv", "caption_train.json", "pv_train.json",
              "itemID_train.json", "category_train.json", "pic_train.json"):
        assert os.path.exists(tmp_path / f), f
    caps = json.load(open(tmp_path / "caption_train.json"))
    assert len(caps) == 399 and caps[0]


def test_clean_and_download_offline(tmp_path):
    from k3m_tpu.data.download import clean_and_download
    n = clean_and_download(SAMPLE, 0, str(tmp_path), download=False)
    assert n == 399
    lines = open(tmp_path / "id_title_pvs_cls.txt0", encoding="utf-8"
                 ).read().splitlines()
    assert len(lines) == 399
    first = lines[0].split("\t")
    assert first[0] == "0_s0"
    assert "#" not in first[3]
    assert len(first) == 6


def test_item_info_jsonl(tmp_path):
    from k3m_tpu.data.prepare import parse_item_info_jsonl
    p = tmp_path / "info.jsonl"
    p.write_text(json.dumps({
        "item_id": 7, "item_image_name": "7.jpg", "title": "上衣",
        "item_pvs": "风格#:#古典#;#材质#:#布", "cate_name": "c"},
        ensure_ascii=False) + "\n", encoding="utf-8")
    rows = list(parse_item_info_jsonl(str(p), segment_jieba=False))
    assert rows[0]["pv"] == "风格:古典;材质:布;"
    assert rows[0]["item_id"] == "7"
