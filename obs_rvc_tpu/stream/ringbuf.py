"""ctypes bindings for the native SPSC ring buffer, with a pure-Python
fallback so the package works before ``make -C native``.

The native side replaces the reference's crossbeam ``ArrayQueue<Frame>``
pair (``obs-rvc/src/lib.rs:141-142``); unlike the reference's
frame-granularity queues, this is sample-granular, which removes the
re-chunking copies of ``thread_loop`` (``lib.rs:835-846``).
"""

from __future__ import annotations

import ctypes
import pathlib
import threading

import numpy as np

_LIB_PATHS = [
    pathlib.Path(__file__).resolve().parents[2] / "native" / "librvc_ringbuf.so",
]


def _load_lib():
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.rvc_ringbuf_create.restype = ctypes.c_void_p
            lib.rvc_ringbuf_create.argtypes = [ctypes.c_uint64]
            lib.rvc_ringbuf_destroy.argtypes = [ctypes.c_void_p]
            for fn in ("rvc_ringbuf_capacity", "rvc_ringbuf_available", "rvc_ringbuf_free_space"):
                getattr(lib, fn).restype = ctypes.c_uint64
                getattr(lib, fn).argtypes = [ctypes.c_void_p]
            for fn in ("rvc_ringbuf_push", "rvc_ringbuf_pop", "rvc_ringbuf_pop_exact"):
                getattr(lib, fn).restype = ctypes.c_uint64
                getattr(lib, fn).argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_uint64,
                ]
            lib.rvc_ringbuf_discard.restype = ctypes.c_uint64
            lib.rvc_ringbuf_discard.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            return lib
    return None


_LIB = _load_lib()


class NativeRingBuffer:
    """SPSC float ring buffer backed by native/librvc_ringbuf.so."""

    def __init__(self, min_capacity: int):
        if _LIB is None:
            raise RuntimeError("native ring buffer not built (make -C native)")
        self._lib = _LIB
        self._ptr = self._lib.rvc_ringbuf_create(min_capacity)
        if not self._ptr:
            raise MemoryError("rvc_ringbuf_create failed")

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.rvc_ringbuf_destroy(self._ptr)
            self._ptr = None

    @property
    def capacity(self) -> int:
        return self._lib.rvc_ringbuf_capacity(self._ptr)

    def available(self) -> int:
        return self._lib.rvc_ringbuf_available(self._ptr)

    def push(self, samples: np.ndarray) -> int:
        samples = np.ascontiguousarray(samples, dtype=np.float32)
        ptr = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return self._lib.rvc_ringbuf_push(self._ptr, ptr, samples.size)

    def pop_exact(self, n: int) -> np.ndarray | None:
        out = np.empty(n, dtype=np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        got = self._lib.rvc_ringbuf_pop_exact(self._ptr, ptr, n)
        return out if got == n else None

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        got = self._lib.rvc_ringbuf_pop(self._ptr, ptr, n)
        return out[:got]

    def discard(self, n: int) -> int:
        return self._lib.rvc_ringbuf_discard(self._ptr, n)


class PyRingBuffer:
    """Fallback implementation (threading.Lock; same API)."""

    def __init__(self, min_capacity: int):
        cap = 1
        while cap < min_capacity:
            cap <<= 1
        self.capacity = cap
        self._buf = np.zeros(0, dtype=np.float32)
        self._lock = threading.Lock()

    def available(self) -> int:
        with self._lock:
            return self._buf.size

    def push(self, samples: np.ndarray) -> int:
        samples = np.asarray(samples, dtype=np.float32).ravel()
        with self._lock:
            space = self.capacity - self._buf.size
            n = min(space, samples.size)
            self._buf = np.concatenate([self._buf, samples[:n]])
            return n

    def pop_exact(self, n: int) -> np.ndarray | None:
        with self._lock:
            if self._buf.size < n:
                return None
            out, self._buf = self._buf[:n].copy(), self._buf[n:]
            return out

    def pop(self, n: int) -> np.ndarray:
        with self._lock:
            n = min(n, self._buf.size)
            out, self._buf = self._buf[:n].copy(), self._buf[n:]
            return out

    def discard(self, n: int) -> int:
        with self._lock:
            n = min(n, self._buf.size)
            self._buf = self._buf[n:]
            return n


def make_ring_buffer(min_capacity: int):
    """Native if built, else Python fallback."""
    if _LIB is not None:
        return NativeRingBuffer(min_capacity)
    return PyRingBuffer(min_capacity)
