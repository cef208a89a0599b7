"""Sharded mmap record store — the LMDB/tensorpack replacement.

The reference serializes training data into LMDB via tensorpack
(`3_generate_lmdb_ali.py:108-119`, `data_prepare.py:496-516`) and decodes
with msgpack-numpy (`concept_cap_dataset_struc.py:25-88`). Here we use a
single-file append-only record format with a trailer index, designed for
zero-copy mmap reads:

    [magic "K3MR"][u32 version]
    [u64 len][payload] * N
    [u64 offset] * N            <- trailer index
    [u64 N][u64 index_offset][magic "K3MX"]

Payloads are msgpack maps; numpy arrays are encoded as
{"__nd__": 1, "d": dtype-str, "s": shape, "b": raw-bytes} and decoded with
np.frombuffer straight out of the mmap (no copy until the consumer writes).

A native C++ reader with identical layout lives in k3m_tpu/runtime
(readers are interchangeable; Python falls back automatically).
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Any, Dict, Iterator, List, Optional

import msgpack
import numpy as np

MAGIC = b"K3MR"
TRAILER_MAGIC = b"K3MX"
VERSION = 1


def _encode_hook(obj):
    if isinstance(obj, np.ndarray):
        return {"__nd__": 1, "d": obj.dtype.str, "s": list(obj.shape),
                "b": obj.tobytes()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"cannot serialize {type(obj)}")


def _decode_hook(obj):
    if isinstance(obj, dict) and obj.get("__nd__") == 1:
        arr = np.frombuffer(obj["b"], dtype=np.dtype(obj["d"]))
        return arr.reshape(obj["s"])
    return obj


def pack_record(record: Dict[str, Any]) -> bytes:
    return msgpack.packb(record, default=_encode_hook, use_bin_type=True)


def unpack_record(data: bytes) -> Dict[str, Any]:
    return msgpack.unpackb(data, object_hook=_decode_hook, raw=False,
                           strict_map_key=False)


class RecordWriter:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "wb")
        self._f.write(MAGIC + struct.pack("<I", VERSION))
        self._offsets: List[int] = []

    def write(self, record: Dict[str, Any]) -> None:
        payload = pack_record(record)
        self._offsets.append(self._f.tell())
        self._f.write(struct.pack("<Q", len(payload)))
        self._f.write(payload)

    def close(self) -> None:
        index_offset = self._f.tell()
        for off in self._offsets:
            self._f.write(struct.pack("<Q", off))
        self._f.write(struct.pack("<QQ", len(self._offsets), index_offset))
        self._f.write(TRAILER_MAGIC)
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordReader:
    """Random-access mmap reader. Thread-safe for reads."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[:4] != MAGIC:
            raise ValueError(f"{path}: bad magic")
        if self._mm[-4:] != TRAILER_MAGIC:
            raise ValueError(f"{path}: bad trailer (truncated file?)")
        n, index_offset = struct.unpack("<QQ", self._mm[-20:-4])
        self._n = n
        idx = np.frombuffer(self._mm, dtype="<u8", count=n, offset=index_offset)
        self._offsets = idx

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Dict[str, Any]:
        off = int(self._offsets[i])
        (length,) = struct.unpack_from("<Q", self._mm, off)
        return unpack_record(self._mm[off + 8: off + 8 + length])

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for i in range(self._n):
            yield self[i]

    def close(self) -> None:
        # the index (and any decoded arrays) are zero-copy views into the
        # mmap; closing with live exports raises BufferError — release our
        # own view and leave the mapping to the GC in that case
        self._offsets = None
        try:
            self._mm.close()
        except BufferError:
            pass
        self._file.close()


def write_records(path: str, records) -> int:
    n = 0
    with RecordWriter(path) as w:
        for r in records:
            w.write(r)
            n += 1
    return n
