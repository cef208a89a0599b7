"""ArrayRecord + Grain data pipeline — the north-star replacement for the
reference's tensorpack/LMDB/ZeroMQ stack (SURVEY §2.2, BASELINE.json).

Storage: ArrayRecord files whose payloads are the same msgpack records as
the K3MR store (k3m_tpu/data/records.py) — `write_array_records` /
`ArrayRecordStore` mirror RecordWriter/RecordReader, so every consumer
(PretrainLoader, prepare CLI, feature reader) can run on either backend.

Loading: `GrainPretrainLoader` / `GrainAlignmentLoader` wrap
`grain.python.DataLoader` with Grain's ArrayRecordDataSource, IndexSampler
(seeded, sharded by jax process for multi-host) and multiprocess prefetch —
the Grain equivalents of the reference's `LMDBSerializer.load ->
MapData(BertPreprocessBatch) -> PrefetchDataZMQ -> BatchData`
(concept_cap_dataset_struc.py:344-367). Per-sample RNG is derived from
Grain's record seed so preprocessing stays reproducible and
worker-schedule-independent.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from k3m_tpu.data.preprocess import (PairPreprocessor, PretrainPreprocessor,
                                     ShapeSpec, add_global_image_token)
from k3m_tpu.data.records import pack_record, unpack_record
from k3m_tpu.tokenization import WordPieceTokenizer

try:  # the pipeline is optional: everything falls back to the K3MR loaders
    import grain.python as grain
    from array_record.python.array_record_module import ArrayRecordWriter
    HAVE_GRAIN = True
except Exception:  # pragma: no cover
    grain = None
    ArrayRecordWriter = None
    HAVE_GRAIN = False


def write_array_records(path: str, records) -> int:
    """ArrayRecord counterpart of records.write_records (same payloads)."""
    if ArrayRecordWriter is None:
        raise RuntimeError("array_record is not available")
    writer = ArrayRecordWriter(path, "group_size:1")
    n = 0
    try:
        for rec in records:
            writer.write(pack_record(rec))
            n += 1
    finally:
        writer.close()
    return n


class ArrayRecordStore:
    """Random-access reader over an ArrayRecord file of msgpack records —
    drop-in for records.RecordReader."""

    def __init__(self, path: str):
        if grain is None:
            raise RuntimeError("grain is not available")
        self._src = grain.ArrayRecordDataSource(path)

    def __len__(self) -> int:
        return len(self._src)

    def __getitem__(self, i: int) -> Dict:
        return unpack_record(self._src[int(i)])

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self)):
            yield self[i]

    def close(self) -> None:  # parity with RecordReader
        pass


class _PretrainMap(grain.RandomMapTransform if HAVE_GRAIN else object):
    """Decode + BertPreprocessBatch-equivalent, seeded by Grain's per-record
    rng (reproducible regardless of worker scheduling)."""

    def __init__(self, preprocessor):
        self._pre = preprocessor

    def random_map(self, element, rng: np.random.Generator):
        return self._pre(unpack_record(element), rng)


class _PairMap(grain.MapTransform if HAVE_GRAIN else object):
    def __init__(self, preprocessor):
        self._pre = preprocessor

    def map(self, element):
        return self._pre(unpack_record(element))


class _Collate(grain.MapTransform if HAVE_GRAIN else object):
    """Post-batch: global image token prepend (train-loader divide semantics,
    ref concept_cap_dataset_struc.py:381-397)."""

    def map(self, batch):
        sum_count = (batch["masked_label"] == 0).sum(axis=1, keepdims=True)
        sum_count[sum_count == 0] = 1
        feat, loc, mask = add_global_image_token(
            batch["image_feat"], batch["image_loc"], batch["image_mask"],
            sum_count)
        out = dict(batch)
        out["image_feat"], out["image_loc"], out["image_mask"] = \
            feat, loc, mask
        return out


class _CollatePair(grain.MapTransform if HAVE_GRAIN else object):
    """Pair post-process: per-item global token divided by num_boxes
    (ref post_process :272-294)."""

    @staticmethod
    def _item(d):
        divisor = d.pop("num_boxes")[:, None].astype(np.float32)
        feat, loc, mask = add_global_image_token(
            d["image_feat"], d["image_loc"], d["image_mask"], divisor)
        d["image_feat"], d["image_loc"], d["image_mask"] = feat, loc, mask
        return d

    def map(self, batch):
        return dict(label=batch["label"].astype(np.float32),
                    item1=self._item(dict(batch["item1"])),
                    item2=self._item(dict(batch["item2"])))


def _loader(path: str, transform, collate, batch_size: int, shuffle: bool,
            seed: int, num_epochs: Optional[int], num_workers: int,
            drop_last: bool):
    source = grain.ArrayRecordDataSource(path)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardByJaxProcess(drop_remainder=True),
        shuffle=shuffle, num_epochs=num_epochs, seed=seed)
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[transform,
                    grain.Batch(batch_size, drop_remainder=drop_last),
                    collate],
        worker_count=num_workers)


class GrainPretrainLoader:
    """Grain-backed pretrain loader; same batch dict as PretrainLoader."""

    def __init__(self, path: str, tokenizer: WordPieceTokenizer,
                 shapes: Optional[ShapeSpec] = None, batch_size: int = 32,
                 shuffle: bool = True, seed: int = 0, visual_target: int = 0,
                 num_epochs: Optional[int] = None, num_workers: int = 0,
                 drop_last: bool = True):
        if not HAVE_GRAIN:
            raise RuntimeError("grain/array_record not available")
        shapes = shapes or ShapeSpec()
        pre = PretrainPreprocessor(tokenizer, shapes,
                                   visual_target=visual_target)
        self._path = path
        self.num_dataset = len(grain.ArrayRecordDataSource(path))
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._dl = _loader(path, _PretrainMap(pre), _Collate(), batch_size,
                           shuffle, seed, num_epochs, num_workers, drop_last)

    def __len__(self) -> int:
        n = self.num_dataset
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self):
        return iter(self._dl)


class GrainAlignmentLoader:
    """Grain-backed item-alignment pair loader; same batches as
    AlignmentLoader."""

    def __init__(self, path: str, tokenizer: WordPieceTokenizer,
                 shapes: Optional[ShapeSpec] = None, batch_size: int = 32,
                 shuffle: bool = False, seed: int = 0, visual_target: int = 0,
                 num_epochs: Optional[int] = None, num_workers: int = 0,
                 drop_last: bool = True):
        if not HAVE_GRAIN:
            raise RuntimeError("grain/array_record not available")
        shapes = shapes or ShapeSpec()
        pre = PairPreprocessor(tokenizer, shapes, visual_target=visual_target)
        self.num_dataset = len(grain.ArrayRecordDataSource(path))
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._dl = _loader(path, _PairMap(pre), _CollatePair(), batch_size,
                           shuffle, seed, num_epochs, num_workers, drop_last)

    def __len__(self) -> int:
        n = self.num_dataset
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self):
        return iter(self._dl)
