"""Native host runtime pieces (C++, loaded via ctypes).

The TPU compute path is jax/XLA; this package holds the host-side runtime
the reference keeps in C++ (AMReX particle packing / parallel IO): GIL-free
multithreaded particle compaction used by the diagnostics/checkpoint
writers, compiled on first use with the in-image g++ and cached next to the
source.  Falls back to numpy transparently when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["compact", "native_available", "AsyncFlusher"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_compact.so")
_SRC = os.path.join(_HERE, "compact.cpp")
_lib = None
_tried = False
_lock = threading.Lock()


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.wxt_mask_offsets.restype = ctypes.c_int64
        lib.wxt_mask_offsets.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        for nm in ("wxt_compact_f64", "wxt_compact_f32"):
            fn = getattr(lib, nm)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_int32, ctypes.c_int32,
            ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def compact(mask: np.ndarray, arrays, nthreads: int = 0):
    """Pack the masked elements of each array: returns list of packed copies.

    Uses the native multithreaded gather when available (all arrays must
    share mask's length); otherwise numpy fancy indexing.
    """
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    n = mask.shape[0]
    arrays = [np.ascontiguousarray(a) for a in arrays]
    lib = _load()
    same_f64 = all(a.dtype == np.float64 for a in arrays)
    same_f32 = all(a.dtype == np.float32 for a in arrays)
    if lib is None or not (same_f64 or same_f32) or not arrays:
        sel = mask.astype(bool)
        return [a[sel] for a in arrays]
    offsets = np.empty(n, dtype=np.int64)
    count = lib.wxt_mask_offsets(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    dtype = np.float64 if same_f64 else np.float32
    outs = [np.empty(count, dtype=dtype) for _ in arrays]
    SrcArr = ctypes.c_void_p * len(arrays)
    srcs = SrcArr(*[a.ctypes.data_as(ctypes.c_void_p) for a in arrays])
    dsts = SrcArr(*[o.ctypes.data_as(ctypes.c_void_p) for o in outs])
    fn = lib.wxt_compact_f64 if same_f64 else lib.wxt_compact_f32
    fn(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, srcs, dsts, len(arrays), nthreads,
    )
    return outs


class AsyncFlusher:
    """Background diagnostics writer: hand off host arrays, write in a
    worker thread so IO overlaps the next simulation steps (the reference
    gets this from AMReX's async-out machinery)."""

    def __init__(self):
        import queue

        self._q = queue.Queue()
        self._err = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001
                self._err = e
            finally:
                self._q.task_done()

    def submit(self, fn, *args, **kwargs):
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put((fn, args, kwargs))

    def drain(self):
        """Block until all pending writes are on disk."""
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def close(self):
        self._q.join()
        self._q.put(None)
        self._worker.join()
