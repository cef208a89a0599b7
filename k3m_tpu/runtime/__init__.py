"""Native runtime pieces: C++ K3MR record reader and batch preprocessor.

Built on demand with g++ (cached as .so next to the source).
`NativeRecordReader` is a drop-in for the Python RecordReader
(k3m_tpu/data/records.py); `NativePretrainPreprocessor` maps a batch of
record indices straight to the final collated pretrain batch (record
decode + WordPiece + masking + padding + global image token in one C++
call, bit-identical to the Python path — the TPU-native replacement for
the reference's LMDB/msgpack/ZMQ C stack). `get_native_reader` /
`get_native_pretrain_preprocessor` return None when the toolchain or
build is unavailable so callers can fall back.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "recordio.cc")
_LIB = os.path.join(_DIR, "libk3mrecordio.so")
_lib_handle = None
_build_failed = False

_PREP_SRC = os.path.join(_DIR, "preprocess.cc")
_PREP_LIB = os.path.join(_DIR, "libk3mpreprocess.so")
_prep_handle = None
_prep_build_failed = False


def _compile(src: str, out: str, extra: Sequence[str] = ()) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", *extra, "-o", out, src],
            check=True, capture_output=True)
        return True
    except Exception as e:  # toolchain missing or compile error
        logger.warning("native build of %s failed: %s", src, e)
        return False


def _build() -> bool:
    return _compile(_SRC, _LIB)


def _load():
    global _lib_handle, _build_failed
    if _lib_handle is not None or _build_failed:
        return _lib_handle
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB)
    lib.k3mr_open.restype = ctypes.c_void_p
    lib.k3mr_open.argtypes = [ctypes.c_char_p]
    lib.k3mr_count.restype = ctypes.c_int64
    lib.k3mr_count.argtypes = [ctypes.c_void_p]
    lib.k3mr_record.restype = ctypes.c_int64
    lib.k3mr_record.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.k3mr_close.restype = None
    lib.k3mr_close.argtypes = [ctypes.c_void_p]
    _lib_handle = lib
    return lib


class NativeRecordReader:
    """C++ mmap-backed reader with the RecordReader interface."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native recordio unavailable")
        self._lib = lib
        self._h = lib.k3mr_open(path.encode())
        if not self._h:
            raise ValueError(f"{path}: cannot open (bad magic/truncated?)")
        self._n = lib.k3mr_count(self._h)
        self.path = path

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Dict[str, Any]:
        from k3m_tpu.data.records import unpack_record
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        length = self._lib.k3mr_record(self._h, int(i), ctypes.byref(ptr))
        if length < 0:
            raise IndexError(f"record {i}: error {length}")
        data = ctypes.string_at(ptr, length)
        return unpack_record(data)

    def __iter__(self):
        for i in range(self._n):
            yield self[i]

    def close(self) -> None:
        if self._h:
            self._lib.k3mr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def get_native_reader(path: str) -> Optional[NativeRecordReader]:
    try:
        return NativeRecordReader(path)
    except Exception:
        return None


# --------------------------------------------------------------------------
# Native batch preprocessor (preprocess.cc)
# --------------------------------------------------------------------------

_i32 = ctypes.c_int32
_i64 = ctypes.c_int64


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def _load_prep():
    global _prep_handle, _prep_build_failed
    if _prep_handle is not None or _prep_build_failed:
        return _prep_handle
    stale = (not os.path.exists(_PREP_LIB)
             or os.path.getmtime(_PREP_LIB) < os.path.getmtime(_PREP_SRC)
             or os.path.getmtime(_PREP_LIB) < os.path.getmtime(_SRC))
    # -ffp-contract=off: no FMA contraction, so float32 IoU/loc arithmetic
    # rounds exactly like numpy's (the golden tests require bit equality)
    if stale and not _compile(_PREP_SRC, _PREP_LIB,
                              ["-ffp-contract=off", "-pthread"]):
        _prep_build_failed = True
        return None
    lib = ctypes.CDLL(_PREP_LIB)
    lib.k3mprep_create.restype = ctypes.c_void_p
    lib.k3mprep_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, _i64,      # record_path, vocab
        ctypes.c_void_p, _i64,                       # flags
        ctypes.c_void_p, ctypes.c_void_p,            # troff, trlen
        ctypes.c_void_p, _i64,                       # trpool
        _i32, _i32,                                  # do_lower, char_fallback
        _i32, _i32, _i32, _i32,                      # seq/seq_pv/num_pv/region
        _i32, _i32, _i32, _i32,                      # v_feat, v_target, vt, vis
        _i32, _i32, _i32, _i32, _i32]                # mask/unk/cls/sep/max_chars
    lib.k3mprep_len.restype = _i64
    lib.k3mprep_len.argtypes = [ctypes.c_void_p]
    lib.k3mprep_encode.restype = _i32
    lib.k3mprep_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, _i64,
                                   ctypes.c_void_p, _i32]
    lib.k3mprep_pretrain_batch.restype = _i32
    lib.k3mprep_pretrain_batch.argtypes = (
        [ctypes.c_void_p, ctypes.c_void_p, _i32]
        + [ctypes.c_void_p] * 20 + [_i32])
    lib.k3mprep_pair_batch.restype = _i32
    lib.k3mprep_pair_batch.argtypes = (
        [ctypes.c_void_p, ctypes.c_void_p, _i32]
        + [ctypes.c_void_p] * 27 + [_i32])
    lib.k3mprep_destroy.restype = None
    lib.k3mprep_destroy.argtypes = [ctypes.c_void_p]
    _prep_handle = lib
    return lib


class NativePretrainPreprocessor:
    """C++ batch producer: record indices -> final collated pretrain batch.

    Output is bit-identical to PretrainLoader's Python path
    (tests/test_native_preprocess.py): same record decode, tokenization,
    masking (consuming the SAME pre-drawn random blocks, see
    k3m_tpu/data/preprocess.py:draw_mask_randoms), padding, pv span
    indexing, and global-image-token collate (ref
    concept_cap_dataset_struc.py:532-933 + :381-397 semantics).
    """

    def __init__(self, record_path: str, tokenizer, shapes,
                 visual_target: int = 0, visualization: bool = False,
                 n_threads: Optional[int] = None):
        lib = _load_prep()
        if lib is None:
            raise RuntimeError("native preprocess unavailable")
        from k3m_tpu.runtime.unicode_tables import get_tables
        flags, troff, trlen, trpool = get_tables()
        flags = np.ascontiguousarray(flags, np.uint8)
        troff = np.ascontiguousarray(troff, np.int32)
        trlen = np.ascontiguousarray(trlen, np.uint8)
        trpool = np.ascontiguousarray(trpool, np.uint32)
        vocab_blob = "\n".join(tokenizer.vocab_list).encode("utf-8")
        s = shapes
        # visual_target != 0 writes target = feat.copy(), so the target
        # width is the feature width (preprocess.py:196-197)
        t_size = s.v_target_size if visual_target == 0 else s.v_feature_size
        self._h = lib.k3mprep_create(
            record_path.encode(), vocab_blob, len(vocab_blob),
            _ptr(flags), flags.size,
            _ptr(troff), _ptr(trlen), _ptr(trpool), trpool.size,
            int(tokenizer.do_lower_case), int(tokenizer.char_fallback),
            s.max_seq_len, s.max_seq_len_pv, s.max_num_pv, s.max_region_len,
            s.v_feature_size, t_size, visual_target, int(visualization),
            tokenizer.mask_token_id, tokenizer.unk_token_id,
            tokenizer.cls_token_id, tokenizer.sep_token_id,
            tokenizer.max_chars_per_word)
        if not self._h:
            raise RuntimeError(f"k3mprep_create failed for {record_path}")
        self._lib = lib
        self._shapes = s
        self._t_size = t_size
        self._vocab_size = len(tokenizer.vocab_list)
        self._n_threads = n_threads or min(8, os.cpu_count() or 1)
        # keep the table arrays alive: k3mprep_create copies them, but the
        # vocab blob is parsed during create only — nothing to retain after.

    def __len__(self) -> int:
        return int(self._lib.k3mprep_len(self._h))

    def encode(self, text: str) -> List[int]:
        """Tokenize-only entry (parity testing against tokenizer.encode)."""
        raw = text.encode("utf-8")
        cap = max(64, 4 * len(raw))
        while True:
            out = np.empty(cap, np.int32)
            n = self._lib.k3mprep_encode(self._h, raw, len(raw), _ptr(out), cap)
            if n >= 0:
                return out[:n].tolist()
            if n <= -1000:
                raise RuntimeError(f"native encode error {n}")
            cap = -n  # buffer too small; retry with the exact size

    def batch(self, indices: Sequence[int], seed: int, epoch: int
              ) -> Dict[str, Any]:
        """Produce one collated pretrain batch for `indices`."""
        s = self._shapes
        B = len(indices)
        W, R = s.max_seq_len - 2, s.max_region_len
        L, Lpv, NP = s.max_seq_len, s.max_seq_len_pv, s.max_num_pv
        D, T = s.v_feature_size, self._t_size

        idx = np.ascontiguousarray(indices, np.int64)
        probs_w = np.empty((B, W), np.float64)
        rand_w = np.empty((B, W), np.int64)
        probs_r = np.empty((B, R), np.float64)
        for b in range(B):
            rng = np.random.default_rng((seed, epoch, int(idx[b]), 0))
            probs_w[b] = rng.random(W)
            rand_w[b] = rng.integers(0, self._vocab_size, size=W)
            probs_r[b] = rng.random(R)

        o = dict(
            input_ids=np.empty((B, L), np.int32),
            input_mask=np.empty((B, L), np.int32),
            segment_ids=np.empty((B, L), np.int32),
            lm_label_ids=np.empty((B, L), np.int32),
            input_ids_pv=np.empty((B, Lpv), np.int32),
            input_mask_pv=np.empty((B, Lpv), np.int32),
            segment_ids_pv=np.empty((B, Lpv), np.int32),
            lm_label_ids_pv=np.empty((B, Lpv), np.int32),
            index_p=np.empty((B, NP, 2), np.int32),
            index_v=np.empty((B, NP, 2), np.int32),
            image_feat=np.empty((B, R + 1, D), np.float32),
            image_loc=np.empty((B, R + 1, 5), np.float32),
            image_target=np.empty((B, R, T), np.float32),
            image_label=np.empty((B, R), np.int32),
            image_mask=np.empty((B, R + 1), np.int32),
            masked_label=np.empty((B, R), np.float32),
        )
        item_ids = np.zeros((B, 64), np.uint8)
        rc = self._lib.k3mprep_pretrain_batch(
            self._h, _ptr(idx), B, _ptr(probs_w), _ptr(rand_w), _ptr(probs_r),
            _ptr(o["input_ids"]), _ptr(o["input_mask"]), _ptr(o["segment_ids"]),
            _ptr(o["lm_label_ids"]), _ptr(o["input_ids_pv"]),
            _ptr(o["input_mask_pv"]), _ptr(o["segment_ids_pv"]),
            _ptr(o["lm_label_ids_pv"]), _ptr(o["index_p"]), _ptr(o["index_v"]),
            _ptr(o["image_feat"]), _ptr(o["image_loc"]), _ptr(o["image_target"]),
            _ptr(o["image_label"]), _ptr(o["image_mask"]),
            _ptr(o["masked_label"]), _ptr(item_ids), self._n_threads)
        if rc != 0:
            raise RuntimeError(f"k3mprep_pretrain_batch error {rc}")
        zeros = np.zeros(B, np.int32)
        o["is_next"] = zeros
        o["is_next_pv_v"] = zeros.copy()
        o["is_next_pv_t"] = zeros.copy()
        o["item_id"] = [bytes(row).split(b"\0", 1)[0].decode("utf-8", "replace")
                        for row in item_ids]
        return o

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.k3mprep_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePairPreprocessor(NativePretrainPreprocessor):
    """C++ batch producer for item-alignment pair records: indices -> the
    final collated twin-item batch, bit-identical to AlignmentLoader's
    Python path (PairPreprocessor + collate_pairs; ref K3MPreprocessBatch
    concept_cap_dataset_struc.py:936-1263 with the num_boxes-divide
    global-token quirk, post_process :272-294). Pairs carry no masking, so
    no random blocks are needed."""

    def _item_arrays(self, B: int) -> Dict[str, Any]:
        s = self._shapes
        L, Lpv, NP = s.max_seq_len, s.max_seq_len_pv, s.max_num_pv
        R, D, T = s.max_region_len, s.v_feature_size, self._t_size
        return dict(
            input_ids=np.empty((B, L), np.int32),
            input_mask=np.empty((B, L), np.int32),
            segment_ids=np.empty((B, L), np.int32),
            input_ids_pv=np.empty((B, Lpv), np.int32),
            input_mask_pv=np.empty((B, Lpv), np.int32),
            segment_ids_pv=np.empty((B, Lpv), np.int32),
            index_p=np.empty((B, NP, 2), np.int32),
            index_v=np.empty((B, NP, 2), np.int32),
            image_feat=np.empty((B, R + 1, D), np.float32),
            image_loc=np.empty((B, R + 1, 5), np.float32),
            image_target=np.empty((B, R, T), np.float32),
            image_mask=np.empty((B, R + 1), np.int32),
        )

    def batch(self, indices: Sequence[int]) -> Dict[str, Any]:
        B = len(indices)
        idx = np.ascontiguousarray(indices, np.int64)
        label = np.empty(B, np.float32)
        items = [self._item_arrays(B) for _ in range(2)]
        ids_raw = [np.zeros((B, 64), np.uint8) for _ in range(2)]
        args = [self._h, _ptr(idx), B, _ptr(label)]
        for o, raw in zip(items, ids_raw):
            args += [_ptr(o[k]) for k in (
                "input_ids", "input_mask", "segment_ids", "input_ids_pv",
                "input_mask_pv", "segment_ids_pv", "index_p", "index_v",
                "image_feat", "image_loc", "image_target", "image_mask")]
            args.append(_ptr(raw))
        args.append(self._n_threads)
        rc = self._lib.k3mprep_pair_batch(*args)
        if rc != 0:
            raise RuntimeError(f"k3mprep_pair_batch error {rc}")
        for o, raw in zip(items, ids_raw):
            o["item_id"] = [
                bytes(row).split(b"\0", 1)[0].decode("utf-8", "replace")
                for row in raw]
        return dict(label=label, item1=items[0], item2=items[1])


def get_native_pretrain_preprocessor(record_path: str, tokenizer, shapes,
                                     **kw) -> Optional[NativePretrainPreprocessor]:
    if os.environ.get("K3M_NATIVE_PREPROCESS", "1") == "0":
        return None
    try:
        return NativePretrainPreprocessor(record_path, tokenizer, shapes, **kw)
    except Exception as e:
        logger.info("native preprocessor unavailable (%s); python fallback", e)
        return None


def get_native_pair_preprocessor(record_path: str, tokenizer, shapes,
                                 **kw) -> Optional[NativePairPreprocessor]:
    if os.environ.get("K3M_NATIVE_PREPROCESS", "1") == "0":
        return None
    try:
        return NativePairPreprocessor(record_path, tokenizer, shapes, **kw)
    except Exception as e:
        logger.info("native pair preprocessor unavailable (%s); python fallback", e)
        return None
