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

from k3m_tpu.data.pipeline import collate_pairs, collate_pretrain
from k3m_tpu.data.preprocess import (PairPreprocessor, PretrainPreprocessor,
                                     ShapeSpec)
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


class _PretrainMap:
    """Decode + BertPreprocessBatch-equivalent.

    Implemented as a raw Grain Operation (iterator of Records) rather than
    a RandomMapTransform so it can see `metadata.record_key` BEFORE Grain
    strips it: the per-sample rng is np.default_rng((seed, epoch,
    record_index, 0)) — the EXACT stream PretrainLoader uses
    (pipeline.py:_sample_rng), making batches from the two backends
    byte-identical for the same records regardless of worker count or
    scheduling (golden-tested in tests/test_grain_pipeline.py)."""

    def __init__(self, preprocessor, seed: int, num_records: int,
                 epoch_base: int = 0):
        self._pre = preprocessor
        self._seed = seed
        self._n = num_records
        self._epoch_base = epoch_base

    def __call__(self, input_iterator):
        for rec in input_iterator:
            epoch = self._epoch_base + rec.metadata.index // self._n
            key = int(rec.metadata.record_key)
            rng = np.random.default_rng((self._seed, epoch, key, 0))
            data = self._pre(unpack_record(rec.data), rng)
            yield grain.Record(rec.metadata.remove_record_key(), data)


class _PairMap(grain.MapTransform if HAVE_GRAIN else object):
    def __init__(self, preprocessor):
        self._pre = preprocessor

    def map(self, element):
        return self._pre(unpack_record(element))


def _sampled_keys(num_records: int, shuffle: bool, seed: int):
    """The sampled record-key sequence, straight off grain.IndexSampler.

    The native-hybrid path uses Grain purely for its sampler — seeded
    shuffle, per-jax-process sharding, deterministic order — so it
    iterates the sampler DIRECTLY instead of spinning a DataLoader:
    the DataLoader's per-record Record/metadata/stats plumbing measured
    ~0.6 ms/record even with an identity operation (1435 -> 779
    samples/s at the bench config), while sampler[i] is a dict lookup.
    Order parity with the DataLoader path is golden-tested
    (tests/test_grain_pipeline.py::test_grain_native_hybrid_bit_identical)."""
    sampler = grain.IndexSampler(
        num_records=num_records,
        shard_options=grain.ShardByJaxProcess(drop_remainder=True),
        shuffle=shuffle, num_epochs=1, seed=seed)
    i = 0
    while True:
        try:
            md = sampler[i]
        except IndexError:
            return
        yield int(md.record_key)
        i += 1


def _native_sibling(path: str, explicit: Optional[str]) -> Optional[str]:
    if explicit is not None:
        return explicit if os.path.exists(explicit) else None
    if path.endswith(".array_record"):
        sib = path[: -len(".array_record")] + ".k3mr"
        return sib if os.path.exists(sib) else None
    return None


def _siblings_match(ar_path: str, k3mr_path: str, n: int) -> bool:
    """Cheap same-content guard for the hybrid: the K3MR sibling must hold
    the SAME records in the SAME order (the native producer reads by
    index). Checks length + first/last item_id — full-content parity is
    golden-tested in tests/test_grain_pipeline.py."""
    from k3m_tpu.data.records import RecordReader
    try:
        rd = RecordReader(k3mr_path)
        if len(rd) != n:
            return False
        store = ArrayRecordStore(ar_path)
        for i in (0, n - 1):
            if str(rd[i].get("item_id")) != str(store[i].get("item_id")):
                return False
        return True
    except Exception:
        return False


def _loader(path: str, transform, batch_size: int, shuffle: bool,
            seed: int, num_workers: int):
    """One-EPOCH DataLoader yielding PER-SAMPLE dicts. Batching happens in
    the parent (`_batched`), NOT inside a grain.Batch operation: Grain runs
    operations per worker over round-robin record shards, so in-worker
    batching would compose batches from every worker_count-th record —
    batch contents would depend on worker count. The parent-side batcher
    consumes Grain's deterministic order-restoring interleave, so batches
    are identical to PretrainLoader's at ANY worker count.

    Epochs are handled by the owning loader (a fresh DataLoader per
    __iter__ with an epoch-mixed shuffle seed), mirroring
    pipeline._LoaderBase's epoch counter — NOT by Grain's num_epochs,
    whose single long iterator would restart from epoch 0 every time the
    trainer re-enters `for batch in loader`."""
    source = grain.ArrayRecordDataSource(path)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardByJaxProcess(drop_remainder=True),
        shuffle=shuffle, num_epochs=1, seed=seed)
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[transform],
        worker_count=num_workers)


def _epoch_seed(seed: int, epoch: int) -> int:
    """Deterministic per-epoch shuffle seed (Grain seeds are plain ints)."""
    return int(np.random.default_rng((seed, epoch, 1)).integers(2**31 - 1))


def _batched(sample_iter, batch_size: int, drop_last: bool, collate):
    batch = []
    for s in sample_iter:
        batch.append(s)
        if len(batch) == batch_size:
            yield collate(batch)
            batch = []
    if batch and not drop_last:
        yield collate(batch)


class GrainPretrainLoader:
    """Grain-backed pretrain loader; same batch dict as PretrainLoader."""

    def __init__(self, path: str, tokenizer: WordPieceTokenizer,
                 shapes: Optional[ShapeSpec] = None, batch_size: int = 32,
                 shuffle: bool = True, seed: int = 0, visual_target: int = 0,
                 num_epochs: Optional[int] = None, num_workers: int = 0,
                 drop_last: bool = True, native_preprocess: bool = True,
                 native_sibling: Optional[str] = None):
        if not HAVE_GRAIN:
            raise RuntimeError("grain/array_record not available")
        shapes = shapes or ShapeSpec()
        self._pre = PretrainPreprocessor(tokenizer, shapes,
                                         visual_target=visual_target)
        self._path = path
        self.num_dataset = len(grain.ArrayRecordDataSource(path))
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._shuffle = shuffle
        self._seed = seed
        self._workers = num_workers
        self.epoch = 0   # bumped per full iteration, like _LoaderBase
        # Native hybrid (r5, closes the 3x per-record tax profiled in
        # docs/GRAIN.md): Grain supplies ONLY the sampled record order
        # (seeded shuffle + ShardByJaxProcess); whole batches are then
        # produced by the C++ producer (runtime/preprocess.cc) from a
        # same-content K3MR sibling file, exactly like PretrainLoader's
        # native path. Batches are bit-identical to the pure-Grain path
        # (same per-record rng stream (seed, epoch, key, 0); golden test
        # in tests/test_grain_pipeline.py). Opt out with
        # native_preprocess=False / K3M_NATIVE_PREPROCESS=0.
        self._native = None
        if native_preprocess and hasattr(tokenizer, "vocab_list"):
            sib = _native_sibling(path, native_sibling)
            if sib and _siblings_match(path, sib, self.num_dataset):
                from k3m_tpu.runtime import get_native_pretrain_preprocessor
                nat = get_native_pretrain_preprocessor(
                    sib, tokenizer, shapes, visual_target=visual_target)
                if nat is not None and len(nat) == self.num_dataset:
                    self._native = nat

    def __len__(self) -> int:
        n = self.num_dataset
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self):
        ep = self.epoch
        epoch_seed = (_epoch_seed(self._seed, ep) if self._shuffle
                      else self._seed)
        if self._native is not None:
            keys = _sampled_keys(self.num_dataset, self._shuffle, epoch_seed)
            yield from _batched(
                keys, self.batch_size, self.drop_last,
                lambda ks: self._native.batch(ks, self._seed, ep))
            self.epoch += 1
            return
        dl = _loader(
            self._path,
            _PretrainMap(self._pre, self._seed, self.num_dataset,
                         epoch_base=ep),
            self.batch_size, self._shuffle, epoch_seed,
            self._workers)
        yield from _batched(iter(dl), self.batch_size, self.drop_last,
                            collate_pretrain)
        self.epoch += 1


class GrainAlignmentLoader:
    """Grain-backed item-alignment pair loader; same batches as
    AlignmentLoader."""

    def __init__(self, path: str, tokenizer: WordPieceTokenizer,
                 shapes: Optional[ShapeSpec] = None, batch_size: int = 32,
                 shuffle: bool = False, seed: int = 0, visual_target: int = 0,
                 num_epochs: Optional[int] = None, num_workers: int = 0,
                 drop_last: bool = True, native_preprocess: bool = True,
                 native_sibling: Optional[str] = None):
        if not HAVE_GRAIN:
            raise RuntimeError("grain/array_record not available")
        shapes = shapes or ShapeSpec()
        self._pre = PairPreprocessor(tokenizer, shapes,
                                     visual_target=visual_target)
        self._path = path
        self.num_dataset = len(grain.ArrayRecordDataSource(path))
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._shuffle = shuffle
        self._seed = seed
        self._workers = num_workers
        self.epoch = 0
        # native hybrid: Grain sampling + C++ pair-batch producer (see
        # GrainPretrainLoader.__init__; pair preprocessing draws no rng)
        self._native = None
        if native_preprocess and hasattr(tokenizer, "vocab_list"):
            sib = _native_sibling(path, native_sibling)
            if sib and _siblings_match(path, sib, self.num_dataset):
                from k3m_tpu.runtime import get_native_pair_preprocessor
                nat = get_native_pair_preprocessor(
                    sib, tokenizer, shapes, visual_target=visual_target)
                if nat is not None and len(nat) == self.num_dataset:
                    self._native = nat

    def __len__(self) -> int:
        n = self.num_dataset
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self):
        epoch_seed = (_epoch_seed(self._seed, self.epoch) if self._shuffle
                      else self._seed)
        if self._native is not None:
            keys = _sampled_keys(self.num_dataset, self._shuffle, epoch_seed)
            yield from _batched(keys, self.batch_size, self.drop_last,
                                self._native.batch)
            self.epoch += 1
            return
        dl = _loader(self._path, _PairMap(self._pre),
                     self.batch_size, self._shuffle, epoch_seed,
                     self._workers)
        yield from _batched(iter(dl), self.batch_size, self.drop_last,
                            collate_pairs)
        self.epoch += 1
