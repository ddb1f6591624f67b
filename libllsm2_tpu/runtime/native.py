"""ctypes bindings to the native streaming runtime (native/llsm_ring.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is
not, so the C ABI + ctypes is the binding layer).  A pure-Python fallback
ring keeps the API functional if the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libllsm_ring.so"))

_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.llsm_ring_create.restype = ctypes.c_void_p
        lib.llsm_ring_create.argtypes = [ctypes.c_int64]
        lib.llsm_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.llsm_ring_add.restype = ctypes.c_int
        lib.llsm_ring_add.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64]
        lib.llsm_ring_advance.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.llsm_ring_readable.restype = ctypes.c_int64
        lib.llsm_ring_readable.argtypes = [ctypes.c_void_p]
        lib.llsm_ring_read.restype = ctypes.c_int64
        lib.llsm_ring_read.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class OLARing:
    """Overlap-add ring buffer: native-backed when available.

    add(seg, pos): OLA `seg` at absolute sample position `pos`.
    advance(upto): finalize samples < upto (ready for read).
    read(n): pop up to n finalized samples.
    """

    def __init__(self, capacity: int):
        self._lib = _load()
        self.capacity = capacity
        if self._lib is not None:
            self._ptr = self._lib.llsm_ring_create(capacity)
            self.native = self._ptr is not None and self._ptr != 0
        else:
            self.native = False
        if not self.native:
            self._buf = np.zeros(capacity, np.float32)
            self._head = 0
            self._tail = 0
            self._wmax = 0

    def add(self, seg: np.ndarray, pos: int) -> None:
        seg = np.ascontiguousarray(seg, np.float32)
        if self.native:
            rc = self._lib.llsm_ring_add(
                self._ptr, seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(seg), pos)
            if rc != 0:
                raise BufferError("ring overrun")
            return
        if pos < self._head or pos + len(seg) - self._head > self.capacity:
            raise BufferError("ring overrun")
        for i, v in enumerate(seg):
            a = pos + i
            idx = a % self.capacity
            if a >= self._wmax:
                self._buf[idx] = v
            else:
                self._buf[idx] += v
        self._wmax = max(self._wmax, pos + len(seg))

    def advance(self, upto: int) -> None:
        if self.native:
            self._lib.llsm_ring_advance(self._ptr, upto)
        else:
            self._tail = max(self._tail, min(upto, self._wmax))

    def readable(self) -> int:
        if self.native:
            return int(self._lib.llsm_ring_readable(self._ptr))
        return self._tail - self._head

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        if self.native:
            got = int(self._lib.llsm_ring_read(
                self._ptr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n))
            return out[:got]
        got = min(n, self.readable())
        for i in range(got):
            idx = (self._head + i) % self.capacity
            out[i] = self._buf[idx]
            self._buf[idx] = 0.0
        self._head += got
        return out[:got]

    def __del__(self):
        if getattr(self, "native", False) and self._lib is not None:
            try:
                self._lib.llsm_ring_destroy(self._ptr)
            except Exception:
                pass
