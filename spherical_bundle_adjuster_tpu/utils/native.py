"""ctypes bindings for the native host library (csrc/sba_native.cpp):
image codecs, threaded prefetch loader, and the float64 reference oracle.

Everything degrades gracefully: if the .so is absent and a compiler is
unavailable, `available()` returns False and PIL paths take over.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _so_path():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
        "sba_native.so",
    )


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _so_path()
    if not os.path.exists(path):
        try:  # build on demand if the toolchain is present
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "sba_build", os.path.join(os.path.dirname(path), "build.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mod.build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.sba_load_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sba_load_image.restype = ctypes.c_int
    lib.sba_save_png.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.sba_save_png.restype = ctypes.c_int
    lib.sba_free.argtypes = [ctypes.c_void_p]
    lib.sba_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.sba_loader_create.restype = ctypes.c_void_p
    lib.sba_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sba_loader_next.restype = ctypes.c_int
    lib.sba_loader_destroy.argtypes = [ctypes.c_void_p]
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int)
    lib.sba_oracle_eight_point.argtypes = [d, d, ctypes.c_int, d, d, d, i, i]
    lib.sba_oracle_bcd.argtypes = [d, d, ctypes.c_int, d, d, d, ctypes.c_int, ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_image_native(path: str):
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_uint8)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.sba_load_image(path.encode(), ctypes.byref(buf), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    n = h.value * w.value * 3
    arr = np.ctypeslib.as_array(buf, shape=(n,)).reshape(h.value, w.value, 3).copy()
    lib.sba_free(buf)
    return arr


def save_png_native(path: str, rgb) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(np.asarray(rgb, dtype=np.uint8))
    rc = lib.sba_save_png(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p), arr.shape[0], arr.shape[1]
    )
    return rc == 0


class NativeImageLoader:
    """Threaded prefetching loader over a list of image paths (all images
    must share dimensions). Iterates (index, array) in completion order."""

    def __init__(self, paths, n_threads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._n = len(paths)
        self._handle = lib.sba_loader_create(arr, self._n, n_threads)
        self._buf = None

    def __iter__(self):
        h = ctypes.c_int()
        w = ctypes.c_int()
        while True:
            if self._buf is None:
                # allocate generously on first use; resized after first dims
                self._buf = np.empty(64 * 1024 * 1024, np.uint8)
            idx = self._lib.sba_loader_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.c_void_p),
                self._buf.nbytes,
                ctypes.byref(h),
                ctypes.byref(w),
            )
            if idx == -1:
                break
            if idx == -2:
                continue
            n = h.value * w.value * 3
            yield idx, self._buf[:n].reshape(h.value, w.value, 3).copy()

    def close(self):
        if self._handle:
            self._lib.sba_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def oracle_eight_point(b1, b2):
    """Float64 reference-convention 8-point (golden oracle).

    Returns (euler1, euler2, t, valid1, valid2)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b1 = np.ascontiguousarray(b1, np.float64)
    b2 = np.ascontiguousarray(b2, np.float64)
    n = b1.shape[0]
    e1 = np.zeros(3)
    e2 = np.zeros(3)
    t = np.zeros(3)
    v1 = ctypes.c_int()
    v2 = ctypes.c_int()
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.sba_oracle_eight_point(
        dptr(b1), dptr(b2), n, dptr(e1), dptr(e2), dptr(t),
        ctypes.byref(v1), ctypes.byref(v2),
    )
    return e1, e2, t, bool(v1.value), bool(v2.value)


def oracle_bcd(b1, b2, rot0, tran0, d0, iters=50, compat=True):
    """Float64 reference-convention three-stage BCD solve (golden oracle).

    Returns (rot, tran, d) after d -> rot -> tran stages."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    b1 = np.ascontiguousarray(b1, np.float64)
    b2 = np.ascontiguousarray(b2, np.float64)
    n = b1.shape[0]
    rot = np.array(rot0, np.float64).copy()
    tran = np.array(tran0, np.float64).copy()
    d = np.ascontiguousarray(d0, np.float64).copy()
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.sba_oracle_bcd(
        dptr(b1), dptr(b2), n, dptr(rot), dptr(tran), dptr(d), iters, int(compat)
    )
    return rot, tran, d
