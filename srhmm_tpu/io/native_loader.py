"""ctypes bindings for the native batched .perfil loader.

Builds srhmm_tpu/native/loader.cpp on first use (g++ -O3 -shared) and caches
the .so next to the source; falls back to the pure-Python reader when no
toolchain is available.  See loader.cpp for the layout contract.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libsrhmm_loader.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        src = _NATIVE_DIR / "loader.cpp"
        if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
            r = subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", str(_SO), str(src), "-lpthread",
                ],
                capture_output=True,
                text=True,
            )
            if r.returncode != 0:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            _build_failed = True
            return None
        lib.srhmm_load_batch_f32.restype = ctypes.c_int32
        lib.srhmm_load_batch_f64.restype = ctypes.c_int32
        lib.srhmm_scan_perfil.restype = ctypes.c_int32
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _paths_array(paths: list[str]):
    buf = [ctypes.c_char_p(p.encode()) for p in paths]
    arr = (ctypes.c_char_p * len(paths))(*buf)
    return arr


def scan_perfil(paths: list[str]) -> np.ndarray:
    """(N, 2) int64 array of (frames, dim) per file; zeros on failure."""
    lib = _get_lib()
    if lib is None:
        from .perfil import read_perfil

        out = np.zeros((len(paths), 2), np.int64)
        for i, p in enumerate(paths):
            try:
                f = read_perfil(p)
                out[i] = (f.shape[0], f.shape[1])
            except Exception:
                pass
        return out
    out = np.zeros((len(paths), 2), np.int64)
    lib.srhmm_scan_perfil(
        _paths_array(paths),
        ctypes.c_int64(len(paths)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def load_batch_native(
    paths: list[str],
    t_max: int,
    dim: int,
    dtype=np.float32,
    n_threads: int = 8,
    strict: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Load .perfil files into a padded (B, t_max, dim) array + (B,) lengths
    using the native worker pool; falls back to pure Python when no native
    library can be built."""
    lib = _get_lib()
    if lib is None:
        from .perfil import read_perfil

        feats = np.zeros((len(paths), t_max, dim), dtype)
        lengths = np.zeros(len(paths), np.int32)
        for i, p in enumerate(paths):
            f = read_perfil(p)
            if f.shape[1] != dim and strict:
                raise ValueError(f"{p}: dim {f.shape[1]} != {dim}")
            n = min(len(f), t_max)
            feats[i, :n] = f[:n]
            lengths[i] = n
        return feats, lengths

    feats = np.zeros((len(paths), t_max, dim), dtype)
    lengths = np.zeros(len(paths), np.int32)
    status = np.zeros(len(paths), np.int32)
    fn = lib.srhmm_load_batch_f32 if dtype == np.float32 else lib.srhmm_load_batch_f64
    ptr_t = ctypes.POINTER(ctypes.c_float if dtype == np.float32 else ctypes.c_double)
    fn(
        _paths_array(paths),
        ctypes.c_int64(len(paths)),
        feats.ctypes.data_as(ptr_t),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(t_max),
        ctypes.c_int64(dim),
        ctypes.c_int32(n_threads),
    )
    if strict and (status != 0).any():
        bad = [(paths[i], int(status[i])) for i in np.nonzero(status)[0][:5]]
        raise IOError(f"native loader failures (path, code): {bad}")
    return feats, lengths
