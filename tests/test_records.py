"""Record store and loader tests."""

import numpy as np

from k3m_tpu.data.pipeline import PretrainLoader
from k3m_tpu.data.preprocess import ShapeSpec
from k3m_tpu.data.records import RecordReader, RecordWriter, write_records
from k3m_tpu.tokenization import get_tokenizer


def _records(n=10):
    for i in range(n):
        yield dict(item_id=str(i), title=f"标题{i}", pv="风格:古典;",
                   category="c", image_h=10, image_w=10, num_boxes=1,
                   boxes=np.array([[0, 0, 9, 9]], np.float32),
                   features=np.full((1, 8), i, np.float32),
                   cls_prob=np.full((1, 3), 0.1, np.float32))


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.k3mr")
    n = write_records(path, _records(10))
    assert n == 10
    r = RecordReader(path)
    assert len(r) == 10
    rec = r[3]
    assert rec["item_id"] == "3"
    assert rec["title"] == "标题3"
    assert rec["features"].dtype == np.float32
    assert np.all(rec["features"] == 3)
    # random access out of order
    assert r[9]["item_id"] == "9" and r[0]["item_id"] == "0"


def test_truncated_file_detected(tmp_path):
    path = str(tmp_path / "t.k3mr")
    write_records(path, _records(3))
    with open(path, "r+b") as f:
        f.truncate(50)
    try:
        RecordReader(path)
        assert False, "should have raised"
    except ValueError:
        pass


def test_loader_epoch_reshuffles(tmp_path):
    path = str(tmp_path / "t.k3mr")
    write_records(path, _records(20))
    shapes = ShapeSpec(max_seq_len=12, max_seq_len_pv=16, max_num_pv=3,
                       max_region_len=4, v_feature_size=8, v_target_size=3)
    loader = PretrainLoader(path, get_tokenizer(), shapes, batch_size=4,
                            shuffle=True, seed=1)
    e0 = [b["input_ids"].copy() for b in loader]
    e1 = [b["input_ids"].copy() for b in loader]
    assert len(e0) == 5
    assert not all(np.array_equal(a, b) for a, b in zip(e0, e1))


def test_loader_fixed_shapes(tmp_path):
    path = str(tmp_path / "t.k3mr")
    write_records(path, _records(9))
    shapes = ShapeSpec(max_seq_len=12, max_seq_len_pv=16, max_num_pv=3,
                       max_region_len=4, v_feature_size=8, v_target_size=3)
    loader = PretrainLoader(path, get_tokenizer(), shapes, batch_size=4,
                            shuffle=False, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["input_ids"].shape == (4, 12)
        assert b["image_feat"].shape == (4, 5, 8)   # +1 global token
        assert b["image_target"].shape == (4, 4, 3)  # no global token
