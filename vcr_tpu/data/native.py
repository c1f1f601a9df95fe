"""ctypes bindings for the native (C++) batch feature loader.

Builds ``native/npy_loader.cpp`` into a shared library on first use (g++ -O3,
cached next to the package) and exposes :func:`load_feature_batch`, which
assembles a padded (B, num_frames, *feat) float32 batch from per-video .npy
files with a C++ thread pool — the native replacement for the reference's
torch DataLoader workers (dataset.py:73-89, num_workers=4). Falls back to the
pure-numpy path transparently if the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "npy_loader.cpp")
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libnpy.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (os.path.exists(_LIB) and os.path.exists(_SRC)
                 and os.path.getmtime(_SRC) > os.path.getmtime(_LIB))
        if not os.path.exists(_LIB) or stale:
            if not (os.path.exists(_SRC) and _build()):
                # NEVER load a .so older than its source: a changed ABI
                # behind the same symbol corrupts batches silently. Fall
                # back to the numpy path instead.
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.vcr_load_feature_batch.restype = ctypes.c_int
        lib.vcr_load_feature_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_int]
        lib.vcr_probe_npy.restype = ctypes.c_int
        lib.vcr_probe_npy.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong)]
        _lib = lib
        return _lib


def probe_npy(path: str) -> Tuple[int, int]:
    """-> (rows, row_elems) of a .npy file via the native parser."""
    lib = get_lib()
    assert lib is not None
    rows = ctypes.c_longlong()
    elems = ctypes.c_longlong()
    rc = lib.vcr_probe_npy(path.encode(), ctypes.byref(rows), ctypes.byref(elems))
    if rc != 0:
        raise IOError(f"vcr_probe_npy({path}) failed: {rc}")
    return rows.value, elems.value


def load_feature_batch(paths: Sequence[str], num_frames: int,
                       feat_shape: Tuple[int, ...],
                       n_threads: int = 8) -> Optional[np.ndarray]:
    """Assemble (B, num_frames, *feat_shape) float32, zero-padded/truncated on
    the frame axis. Returns None if the native path is unavailable (caller
    falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    b = len(paths)
    row_elems = int(np.prod(feat_shape))
    out = np.zeros((b, num_frames, row_elems), dtype=np.float32)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    rc = lib.vcr_load_feature_batch(
        arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_frames, row_elems, n_threads)
    if rc != 0:
        raise IOError(f"vcr_load_feature_batch failed: {rc}")
    return out.reshape(b, num_frames, *feat_shape)
