"""ImageFeaturesReader: K3MR and HDF5 backends give identical outputs.

Reference: vilbert_k3m/datasets/_image_features_reader.py:17-181 (the
documented h5 schema at :23-29; the K3MR path replaces its live LMDB
branch).
"""

import numpy as np
import pytest

from k3m_tpu.data.feature_reader import ImageFeaturesReader
from k3m_tpu.data.records import write_records


def _fake_items(n=4, p=7, f=16, seed=0):
    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        boxes = np.abs(rng.rand(p, 4).astype(np.float32)) * 50
        boxes[:, 2:] += boxes[:, :2]  # x2>x1, y2>y1
        items.append(dict(
            item_id=f"item{i}",
            features=rng.rand(p, f).astype(np.float32),
            boxes=boxes,
            num_boxes=p - (i % 3),
            image_h=120, image_w=160,
        ))
    return items


def _write_k3mr(path, items):
    write_records(str(path), items)


def _write_h5(path, items):
    h5py = pytest.importorskip("h5py")
    with h5py.File(path, "w") as f:
        f.create_dataset("image_id",
                         data=np.array([it["item_id"] for it in items],
                                       dtype="S16"))
        f.create_dataset("features",
                         data=np.stack([it["features"] for it in items]))
        f.create_dataset("boxes",
                         data=np.stack([it["boxes"] for it in items]))
        f.create_dataset("num_boxes",
                         data=np.array([it["num_boxes"] for it in items]))
        f.create_dataset("image_h",
                         data=np.array([it["image_h"] for it in items]))
        f.create_dataset("image_w",
                         data=np.array([it["image_w"] for it in items]))


def test_h5_matches_k3mr(tmp_path):
    items = _fake_items()
    _write_k3mr(tmp_path / "feat.k3mr", items)
    _write_h5(tmp_path / "feat.h5", items)
    r_rec = ImageFeaturesReader(str(tmp_path / "feat.k3mr"))
    r_h5 = ImageFeaturesReader(str(tmp_path / "feat.h5"))
    assert len(r_rec) == len(r_h5) == len(items)
    for it in items:
        a_feat, a_num, a_loc = r_rec[it["item_id"]]
        b_feat, b_num, b_loc = r_h5[it["item_id"]]
        assert a_num == b_num == it["num_boxes"] + 1  # +1 global token
        np.testing.assert_allclose(a_feat, b_feat, rtol=0, atol=0)
        np.testing.assert_allclose(a_loc, b_loc, rtol=0, atol=0)
        # global token layout: mean feature + [0,0,1,1,1] loc
        np.testing.assert_allclose(
            a_feat[0], it["features"][:it["num_boxes"]].mean(0), rtol=1e-6)
        np.testing.assert_array_equal(a_loc[0], [0, 0, 1, 1, 1])


def test_h5_minimal_schema(tmp_path):
    """Only image_id + features datasets (the documented minimum)."""
    h5py = pytest.importorskip("h5py")
    items = _fake_items(n=2)
    with h5py.File(tmp_path / "min.h5", "w") as f:
        f.create_dataset("image_id",
                         data=np.array([it["item_id"] for it in items],
                                       dtype="S16"))
        f.create_dataset("features",
                         data=np.stack([it["features"] for it in items]))
    r = ImageFeaturesReader(str(tmp_path / "min.h5"))
    feats, num, loc = r["item0"]
    assert num == items[0]["features"].shape[0] + 1
    assert loc.shape == (num, 5)
    assert "item1" in r and "nope" not in r


def test_in_memory_cache(tmp_path):
    items = _fake_items(n=2)
    _write_h5(tmp_path / "c.h5", items)
    r = ImageFeaturesReader(str(tmp_path / "c.h5"), in_memory=True)
    a = r["item0"]
    b = r["item0"]
    assert a is b  # cached tuple identity
