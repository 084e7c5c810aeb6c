"""ctypes binding for the native C++ audio loader (loader.cc).

Builds the shared library on first import (g++, cached next to the source);
falls back cleanly to the pure-numpy path when no toolchain is available —
`available()` tells callers which path is live.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_LIB = os.path.join(_DIR, "libdl4ss_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB)
        lib.dl4ss_decode_wav.restype = ctypes.c_int
        lib.dl4ss_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.dl4ss_resample_poly.restype = ctypes.c_int
        lib.dl4ss_resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.dl4ss_load_utterance.restype = ctypes.c_int
        lib.dl4ss_load_utterance.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.dl4ss_load_batch.restype = ctypes.c_int
        lib.dl4ss_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_wav(path) -> Tuple[np.ndarray, int]:
    lib = _load()
    assert lib is not None, _build_error
    cap = 1 << 22
    out = np.empty(cap, np.float32)
    rate = ctypes.c_int(0)
    n = lib.dl4ss_decode_wav(str(path).encode(), _fptr(out), cap,
                             ctypes.byref(rate))
    if n < 0:
        raise ValueError(f"native decode failed: {path}")
    if n > cap:  # extremely long file: retry with the exact size
        out = np.empty(n, np.float32)
        n = lib.dl4ss_decode_wav(str(path).encode(), _fptr(out), n,
                                 ctypes.byref(rate))
    return out[:n].copy(), rate.value


def resample_poly(x: np.ndarray, up: int, down: int,
                  beta: float = 14.769656459379492) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    x = np.ascontiguousarray(x, np.float32)
    cap = int(len(x) * up / down) + 8
    out = np.empty(cap, np.float32)
    n = lib.dl4ss_resample_poly(_fptr(x), len(x), up, down, beta,
                                _fptr(out), cap)
    if n < 0:
        raise ValueError("native resample buffer overflow")
    return out[:n].copy()


def load_utterance(path, target_rate: int, max_len: int,
                   normalize: bool = False) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    out = np.empty(max_len, np.float32)
    n = lib.dl4ss_load_utterance(str(path).encode(), target_rate, max_len,
                                 int(normalize), _fptr(out))
    if n < 0:
        raise ValueError(f"native load failed: {path}")
    return out


def load_batch(paths: List, target_rate: int, max_len: int,
               normalize: bool = False,
               num_threads: Optional[int] = None) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    out = np.empty((len(paths), max_len), np.float32)
    threads = num_threads or min(len(paths), os.cpu_count() or 1)
    fails = lib.dl4ss_load_batch(blob, len(paths), target_rate, max_len,
                                 int(normalize), threads, _fptr(out))
    if fails:
        raise ValueError(f"native batch load: {fails} file(s) failed")
    return out
