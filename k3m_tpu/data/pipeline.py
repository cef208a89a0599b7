"""Online data loading: record file -> fixed-shape numpy batches.

Replaces the reference tensorpack pipeline
(`LMDBSerializer.load -> MapData(BertPreprocessBatch) -> PrefetchDataZMQ ->
BatchData`, concept_cap_dataset_struc.py:344-367) with a seeded, threaded
prefetch loader. Fixed shapes per batch make every step identically shaped
for XLA (no recompilation).

Reproducibility: sample i of epoch e is preprocessed with
np.random.Generator(Philox(key=(seed, e, i))) — fully deterministic and
independent of worker scheduling (unlike the reference's process-global
`random`).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from k3m_tpu.data.preprocess import (
    PairPreprocessor, PretrainPreprocessor, ShapeSpec, add_global_image_token,
)
from k3m_tpu.data.records import RecordReader
from k3m_tpu.tokenization import WordPieceTokenizer

_SCALAR_KEYS = ("is_next", "is_next_pv_v", "is_next_pv_t", "label", "num_boxes")


def _stack(samples, key):
    # prealloc + row-assign, NOT np.stack: stacking 96 separately-allocated
    # [36,2048] sample arrays via np.stack (= expand_dims + concatenate)
    # measures ~124 ms on this host vs ~11 ms for block row-assigns; this
    # is the producer's critical path at full batch rate
    first = np.asarray(samples[0][key])
    out = np.empty((len(samples),) + first.shape, first.dtype)
    for j, s in enumerate(samples):
        out[j] = s[key]
    return out


def collate_pretrain(samples) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into a pretrain batch and prepend the global
    image token: divide by count of NOT-co-masked regions (ref :381-397),
    min 1. Shared by PretrainLoader and GrainPretrainLoader so the two
    backends batch identically."""
    keys = [k for k in samples[0] if k != "item_id"]
    batch = {k: _stack(samples, k) for k in keys}
    batch["item_id"] = [s["item_id"] for s in samples]
    sum_count = (batch["masked_label"] == 0).sum(axis=1, keepdims=True)
    sum_count[sum_count == 0] = 1
    feat, loc, mask = add_global_image_token(
        batch["image_feat"], batch["image_loc"], batch["image_mask"],
        sum_count)
    batch["image_feat"], batch["image_loc"], batch["image_mask"] = \
        feat, loc, mask
    return batch


def _collate_alignment_item(items) -> Dict[str, np.ndarray]:
    keys = [k for k in items[0] if k != "item_id"]
    d = {k: _stack(items, k) for k in keys}
    d["item_id"] = [s["item_id"] for s in items]
    # global image token divides by num_boxes (ref post_process :272-294)
    divisor = d.pop("num_boxes")[:, None].astype(np.float32)
    feat, loc, mask = add_global_image_token(
        d["image_feat"], d["image_loc"], d["image_mask"], divisor)
    d["image_feat"], d["image_loc"], d["image_mask"] = feat, loc, mask
    return d


def collate_pairs(samples) -> Dict:
    """Pair-batch collate (K3MDataLoader semantics); shared by
    AlignmentLoader and GrainAlignmentLoader."""
    return dict(
        label=np.stack([s["label"] for s in samples]).astype(np.float32),
        item1=_collate_alignment_item([s["item1"] for s in samples]),
        item2=_collate_alignment_item([s["item2"] for s in samples]),
    )


class _LoaderBase:
    def __init__(self, record_path: str, tokenizer: WordPieceTokenizer,
                 shapes: ShapeSpec, batch_size: int, shuffle: bool,
                 seed: int, drop_last: bool = True, prefetch: int = 4,
                 use_native: bool = True,
                 num_shards: int = 1, shard_index: int = 0):
        self.reader = None
        if record_path.endswith(".array_record"):
            from k3m_tpu.data.grain_pipeline import ArrayRecordStore
            self.reader = ArrayRecordStore(record_path)
        if self.reader is None and use_native:
            from k3m_tpu.runtime import get_native_reader
            self.reader = get_native_reader(record_path)
        if self.reader is None:
            self.reader = RecordReader(record_path)
        self.tokenizer = tokenizer
        self.shapes = shapes
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.num_dataset = len(self.reader)
        # Per-host data sharding for multi-host training (the reference
        # splits batch/workers/cache per DDP rank, train_concap_struc.py
        # :215-219): every host draws the SAME seeded epoch permutation and
        # takes a disjoint stride slice, so the union covers the dataset.
        assert 0 <= shard_index < num_shards, (shard_index, num_shards)
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __len__(self) -> int:
        n = (self.num_dataset // self.num_shards if self.num_shards > 1
             else self.num_dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(self.num_dataset)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch, 1)).shuffle(idx)
        if self.num_shards > 1:
            # every shard truncated to the same length (num_dataset //
            # num_shards): hosts must dispatch identical step counts or the
            # last collective deadlocks — the DistributedSampler
            # equal-length contract
            idx = idx[self.shard_index::self.num_shards]
            idx = idx[:self.num_dataset // self.num_shards]
        return idx

    def _sample_rng(self, i: int) -> np.random.Generator:
        # SeedSequence spawns a unique, order-independent stream per sample
        return np.random.default_rng((self.seed, self.epoch, i, 0))

    def _produce(self, out_q: "queue.Queue"):
        try:
            batch = []
            for i in self._indices():
                batch.append(self._map(int(i)))
                if len(batch) == self.batch_size:
                    out_q.put(self._collate(batch))
                    batch = []
            if batch and not self.drop_last:
                out_q.put(self._collate(batch))
        finally:
            out_q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
        self.epoch += 1

    # subclasses implement _map / _collate


class PretrainLoader(_LoaderBase):
    """Pretrain loader matching ConceptCapLoaderTrain_struc/Val_struc
    (ref :297-529) but yielding a dict-of-arrays batch.

    When the native (C++) batch preprocessor is available and the record
    file is K3MR, the producer thread maps whole batches through one C++
    call (record decode + tokenize + mask + collate, releasing the GIL) —
    ~16x the Python producer's rate, bit-identical output (golden-tested
    in tests/test_native_preprocess.py). This is the TPU-side equivalent
    of the reference's C-backed LMDB/msgpack/ZMQ pipeline
    (concept_cap_dataset_struc.py:344-367). Disable with
    K3M_NATIVE_PREPROCESS=0 or native_preprocess=False.
    """

    def __init__(self, record_path, tokenizer, shapes: Optional[ShapeSpec] = None,
                 batch_size: int = 32, shuffle: bool = True, seed: int = 0,
                 visual_target: int = 0, visualization: bool = False,
                 native_preprocess: bool = True, **kw):
        shapes = shapes or ShapeSpec()
        super().__init__(record_path, tokenizer, shapes, batch_size, shuffle,
                         seed, **kw)
        self.preprocessor = PretrainPreprocessor(
            tokenizer, shapes, visual_target=visual_target,
            visualization=visualization)
        self.native = None
        if native_preprocess and hasattr(tokenizer, "vocab_list"):
            from k3m_tpu.runtime import get_native_pretrain_preprocessor
            self.native = get_native_pretrain_preprocessor(
                record_path, tokenizer, shapes, visual_target=visual_target,
                visualization=visualization)

    def _map(self, i: int) -> Dict[str, np.ndarray]:
        return self.preprocessor(self.reader[i], self._sample_rng(i))

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        return collate_pretrain(samples)

    def _produce(self, out_q: "queue.Queue"):
        if self.native is None:
            return super()._produce(out_q)
        try:
            idx = self._indices()
            B = self.batch_size
            full = len(idx) - len(idx) % B
            for k in range(0, full, B):
                out_q.put(self.native.batch(idx[k:k + B], self.seed,
                                            self.epoch))
            if full < len(idx) and not self.drop_last:
                out_q.put(self.native.batch(idx[full:], self.seed, self.epoch))
        finally:
            out_q.put(None)


class AlignmentLoader(_LoaderBase):
    """Item-alignment pair loader matching K3MDataLoader (ref :179-294).

    Like PretrainLoader, whole batches go through one native (C++) call
    when available (record decode + tokenize + pad + num_boxes-divide
    collate; bit-identical, golden-tested in
    tests/test_native_preprocess.py). Disable with
    K3M_NATIVE_PREPROCESS=0 or native_preprocess=False.
    """

    def __init__(self, record_path, tokenizer, shapes: Optional[ShapeSpec] = None,
                 batch_size: int = 32, shuffle: bool = False, seed: int = 0,
                 visual_target: int = 0, native_preprocess: bool = True, **kw):
        shapes = shapes or ShapeSpec()
        super().__init__(record_path, tokenizer, shapes, batch_size, shuffle,
                         seed, **kw)
        self.preprocessor = PairPreprocessor(tokenizer, shapes,
                                             visual_target=visual_target)
        self.native = None
        if native_preprocess and hasattr(tokenizer, "vocab_list"):
            from k3m_tpu.runtime import get_native_pair_preprocessor
            self.native = get_native_pair_preprocessor(
                record_path, tokenizer, shapes, visual_target=visual_target)

    def _map(self, i: int) -> Dict:
        return self.preprocessor(self.reader[i])

    def _collate(self, samples) -> Dict:
        return collate_pairs(samples)

    def _produce(self, out_q: "queue.Queue"):
        if self.native is None:
            return super()._produce(out_q)
        try:
            idx = self._indices()
            B = self.batch_size
            full = len(idx) - len(idx) % B
            for k in range(0, full, B):
                out_q.put(self.native.batch(idx[k:k + B]))
            if full < len(idx) and not self.drop_last:
                out_q.put(self.native.batch(idx[full:]))
        finally:
            out_q.put(None)
