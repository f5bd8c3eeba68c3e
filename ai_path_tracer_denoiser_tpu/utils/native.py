"""ctypes bindings to the native C++ runtime library (native/).

The reference's native host pieces (tinyobj scene loading, stb image
writing) map to libaptd_native.so here.  Pure-Python fallbacks exist for
every entry point; this module is a transparent accelerator, auto-built on
first use when a toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libaptd_native.so")

_lib = None
_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if _build_attempted or os.environ.get("APTD_NO_NATIVE"):
                return None
            _build_attempted = True
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.aptd_obj_load.restype = ctypes.c_int
        lib.aptd_obj_load.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.aptd_free.restype = None
        lib.aptd_free.argtypes = [ctypes.c_void_p]
        lib.aptd_png_write.restype = ctypes.c_int
        lib.aptd_png_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_obj(path: str, transform: Optional[np.ndarray] = None,
             recompute_normals: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """OBJ -> (vertices (F,3,3), normals (F,3,3)) world-space float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if transform is None:
        transform = np.eye(4)
    t = np.ascontiguousarray(transform, np.float32)
    verts_p = ctypes.POINTER(ctypes.c_float)()
    norms_p = ctypes.POINTER(ctypes.c_float)()
    nf = lib.aptd_obj_load(
        path.encode(), t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(recompute_normals), ctypes.byref(verts_p), ctypes.byref(norms_p))
    if nf < 0:
        raise FileNotFoundError(f"aptd_obj_load failed for {path}")
    try:
        verts = np.ctypeslib.as_array(verts_p, shape=(nf, 3, 3)).copy()
        norms = np.ctypeslib.as_array(norms_p, shape=(nf, 3, 3)).copy()
    finally:
        lib.aptd_free(verts_p)
        lib.aptd_free(norms_p)
    return verts, norms


def write_png(path: str, arr: np.ndarray):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w, c = arr.shape
    rc = lib.aptd_png_write(path.encode(),
                            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                            w, h, c)
    if rc != 0:
        raise IOError(f"aptd_png_write failed for {path}")
