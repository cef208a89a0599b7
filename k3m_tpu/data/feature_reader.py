"""Random-access RoI feature reader keyed by item/image id.

API-parity component for the reference `ImageFeaturesH5Reader`
(vilbert_k3m/datasets/_image_features_reader.py:17-181; kept for compat,
not used by the live loaders there either). Reads a K3MR feature record
file — or an HDF5 file laid out per the reference docstring's schema
(`image_id` (N,), `features` (N, P, 2048) datasets,
_image_features_reader.py:23-29; the reference's own h5 code path is
commented out upstream, so the schema doc is the contract) — and returns
(features, num_boxes, locations) with the global token prepended and the
5-d normalized location layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from k3m_tpu.data.records import RecordReader


class _H5Records:
    """Adapter exposing an HDF5 feature file through RecordReader's
    dict-per-record interface. Datasets: `image_id` (N,), `features`
    (N, P, F); optional `boxes` (N, P, 4), `num_boxes` (N,),
    `image_h`/`image_w` (N,). Missing boxes yield zero locations, like
    the reference's zero-box fallback."""

    def __init__(self, path: str):
        import h5py

        self.f = h5py.File(path, "r")
        self.n = len(self.f["image_id"])

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Dict:
        f = self.f
        feats = np.asarray(f["features"][i], np.float32)
        num = (int(f["num_boxes"][i]) if "num_boxes" in f
               else feats.shape[0])
        boxes = (np.asarray(f["boxes"][i], np.float32) if "boxes" in f
                 else np.zeros((feats.shape[0], 4), np.float32))
        iid = f["image_id"][i]
        if isinstance(iid, bytes):
            iid = iid.decode("utf-8")
        return dict(item_id=iid, features=feats, boxes=boxes,
                    num_boxes=num,
                    image_h=int(f["image_h"][i]) if "image_h" in f else 1,
                    image_w=int(f["image_w"][i]) if "image_w" in f else 1)


class ImageFeaturesReader:
    def __init__(self, record_path: str, in_memory: bool = False):
        if record_path.endswith((".h5", ".hdf5")):
            self.reader = _H5Records(record_path)
        else:
            self.reader = RecordReader(record_path)
        self._by_id = {str(self.reader[i]["item_id"]): i
                       for i in range(len(self.reader))}
        self._cache: Dict[str, Tuple] = {} if in_memory else None
        self.keys = list(self._by_id)

    def __len__(self) -> int:
        return len(self.reader)

    def __contains__(self, image_id) -> bool:
        return str(image_id) in self._by_id

    def __getitem__(self, image_id) -> Tuple[np.ndarray, int, np.ndarray]:
        key = str(image_id)
        if self._cache is not None and key in self._cache:
            return self._cache[key]
        rec = self.reader[self._by_id[key]]
        num_boxes = int(rec["num_boxes"])
        features = np.asarray(rec["features"], np.float32)
        boxes = np.asarray(rec["boxes"], np.float32)
        h, w = float(rec["image_h"] or 1), float(rec["image_w"] or 1)
        loc = np.zeros((num_boxes, 5), np.float32)
        if num_boxes:
            loc[:, :4] = boxes[:num_boxes]
            loc[:, 4] = ((loc[:, 3] - loc[:, 1]) * (loc[:, 2] - loc[:, 0])
                         / (w * h))
            loc[:, 0] /= w
            loc[:, 1] /= h
            loc[:, 2] /= w
            loc[:, 3] /= h
        # prepend global feature (mean) + full-image location
        if num_boxes:
            g_feat = features[:num_boxes].mean(0, keepdims=True)
        else:
            g_feat = np.zeros((1, features.shape[1] if features.size else 2048),
                              np.float32)
        g_loc = np.array([[0, 0, 1, 1, 1]], np.float32)
        features = np.concatenate([g_feat, features[:num_boxes]], axis=0)
        loc = np.concatenate([g_loc, loc], axis=0)
        out = (features, num_boxes + 1, loc)
        if self._cache is not None:
            self._cache[key] = out
        return out
