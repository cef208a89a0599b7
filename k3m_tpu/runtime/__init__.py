"""Native runtime pieces: C++ K3MR record reader via ctypes.

Built on demand with g++ (cached as libk3mrecordio.so next to the source).
`NativeRecordReader` is a drop-in for the Python RecordReader
(k3m_tpu/data/records.py); `get_native_reader` returns None when the
toolchain or build is unavailable so callers can fall back.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "recordio.cc")
_LIB = os.path.join(_DIR, "libk3mrecordio.so")
_lib_handle = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return True
    except Exception as e:  # toolchain missing or compile error
        logger.warning("native recordio build failed: %s", e)
        return False


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
