"""ctypes bindings for the native zkey/wtns parser (io/native/zkparse.cc).

Builds the shared library on first use (g++, ~1s); falls back to the pure
Python parser in io/zkey.py if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(_DIR, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libzkparse.so")

_lib = None


class _MappedFile(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("size", ctypes.c_uint64),
        ("fd", ctypes.c_int),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_NATIVE_DIR, "zkparse.cc")
    ):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.zk_mmap_open.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MappedFile)]
    lib.zk_mmap_open.restype = ctypes.c_int
    lib.zk_mmap_close.argtypes = [ctypes.POINTER(_MappedFile)]
    lib.zk_find_section.argtypes = [
        ctypes.POINTER(_MappedFile), ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.zk_find_section.restype = ctypes.c_uint64
    u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
    lib.zk_repack_limbs.argtypes = [
        ctypes.POINTER(_MappedFile), ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint32, u32p,
    ]
    lib.zk_repack_limbs.restype = ctypes.c_int
    lib.zk_repack_limbs_strided.argtypes = [
        ctypes.POINTER(_MappedFile), ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, u32p,
    ]
    lib.zk_repack_limbs_strided.restype = ctypes.c_int
    lib.zk_gather_u32.argtypes = [
        ctypes.POINTER(_MappedFile), ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint32, ctypes.c_uint32, u32p,
    ]
    lib.zk_gather_u32.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeFile:
    def __init__(self, path: str):
        lib = _load()
        self._f = _MappedFile()
        rc = lib.zk_mmap_open(path.encode(), ctypes.byref(self._f))
        if rc != 0:
            raise OSError(f"mmap failed ({rc}): {path}")
        self._lib = lib

    def close(self):
        self._lib.zk_mmap_close(ctypes.byref(self._f))

    def find_section(self, typ: int, occurrence: int = 0):
        size = ctypes.c_uint64()
        off = self._lib.zk_find_section(
            ctypes.byref(self._f), typ, occurrence, ctypes.byref(size)
        )
        return (off, size.value) if off else (None, 0)

    def repack_limbs(self, off: int, n: int, n8: int) -> np.ndarray:
        out = np.ascontiguousarray(np.empty((n8 // 2, n), dtype=np.uint32))
        rc = self._lib.zk_repack_limbs(
            ctypes.byref(self._f), off, n, n8, out
        )
        if rc != 0:
            raise ValueError(
                f"truncated file: repack [{off}, +{n}*{n8}] out of bounds")
        return out

    def repack_limbs_strided(self, off, n, stride, value_off, n8) -> np.ndarray:
        out = np.empty((n8 // 2, n), dtype=np.uint32)
        rc = self._lib.zk_repack_limbs_strided(
            ctypes.byref(self._f), off, n, stride, value_off, n8, out
        )
        if rc != 0:
            raise ValueError(
                f"truncated file: strided repack at {off} out of bounds")
        return out

    def gather_u32(self, off, n, stride, field_off) -> np.ndarray:
        out = np.empty((n,), dtype=np.uint32)
        rc = self._lib.zk_gather_u32(
            ctypes.byref(self._f), off, n, stride, field_off, out
        )
        if rc != 0:
            raise ValueError(
                f"truncated file: gather at {off} out of bounds")
        return out

    def read_bytes(self, off: int, n: int) -> bytes:
        if off < 0 or n < 0 or off + n > self._f.size:
            raise ValueError(
                f"read_bytes [{off}, +{n}] exceeds file size {self._f.size}")
        return ctypes.string_at(self._f.data + off, n)
