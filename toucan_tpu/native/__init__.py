"""Native (C++) host-side components, loaded through ctypes.

The reference leans on native dependencies for its host-side hot paths —
most prominently Praat (C++) for F0 extraction during dataset building
(``FastSpeech2/PitchCalculator.py:64-73``).  This package provides the
TPU build's equivalents as first-party C++ compiled on demand with the
system toolchain (g++): no pip dependencies, no pybind11 — plain C ABI +
ctypes.

Currently:
 * ``estimate_f0`` — Boersma AC + Viterbi pitch tracker (f0.cpp), a
   numerically-matching native port of ``toucan_tpu.frontend.pitch`` that
   is ~1-2 orders of magnitude faster than the numpy path for corpus
   builds.  Falls back to the numpy implementation when no compiler is
   available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_path():
    return os.path.join(_HERE, "f0.cpp")


def _lib_path():
    with open(_source_path(), "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("TOUCAN_NATIVE_CACHE",
                           os.path.join(_HERE, "_build"))
    return os.path.join(cache, f"libtoucanf0-{digest}.so")


def _compile(lib_path: str) -> bool:
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           _source_path(), "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    os.replace(tmp, lib_path)
    return True


def load_f0_library():
    """Compile (once, cached by source hash) and load the F0 library.

    Returns the ctypes library or None when no toolchain is available.
    """
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        lib_path = _lib_path()
        if not os.path.exists(lib_path) and not _compile(lib_path):
            return None
        lib = ctypes.CDLL(lib_path)
        lib.toucan_estimate_f0.restype = ctypes.c_int
        lib.toucan_estimate_f0.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _LIB = lib
        return _LIB


def native_f0_available() -> bool:
    return load_f0_library() is not None


def estimate_f0(audio, sr: int = 16000, hop: int = 256, fmin: float = 40.0,
                fmax: float = 600.0) -> np.ndarray:
    """Native-path F0 per frame (0 for unvoiced); numpy fallback when the
    toolchain is unavailable.  Same contract as frontend.pitch.estimate_f0."""
    lib = load_f0_library()
    if lib is None:
        from toucan_tpu.frontend.pitch import estimate_f0 as py_f0
        return py_f0(audio, sr=sr, hop=hop, fmin=fmin, fmax=fmax)
    audio = np.ascontiguousarray(audio, dtype=np.float64)
    capacity = max(1, len(audio) // hop + 2)
    out = np.zeros(capacity, dtype=np.float64)
    n = lib.toucan_estimate_f0(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(audio)), ctypes.c_double(sr), ctypes.c_int(hop),
        ctypes.c_double(fmin), ctypes.c_double(fmax),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(capacity))
    if n <= 0:
        from toucan_tpu.frontend.pitch import estimate_f0 as py_f0
        return py_f0(audio, sr=sr, hop=hop, fmin=fmin, fmax=fmax)
    return out[:n]
