"""Native (C++) host-side components, loaded through ctypes.

The reference leans on native dependencies for its host-side hot paths —
most prominently Praat (C++) for F0 extraction during dataset building
(``FastSpeech2/PitchCalculator.py:64-73``) and torchaudio's native Resample
in preprocessing (``AudioPreprocessor.py:24-44``).  This package provides
the TPU build's equivalents as first-party C++ compiled on demand with the
system toolchain (g++): no pip dependencies, no pybind11 — plain C ABI +
ctypes.

Currently:
 * ``estimate_f0`` — Boersma AC + Viterbi pitch tracker (f0.cpp), a
   numerically-matching native port of ``toucan_tpu.frontend.pitch`` that
   is ~1-2 orders of magnitude faster than the numpy path for corpus
   builds.  Falls back to the numpy implementation when no compiler is
   available.
 * ``resample`` — multithreaded polyphase windowed-sinc resampler
   (resample.cpp), the corpus data-loader's per-utterance hot path; same
   kernel math as ``toucan_tpu.frontend.audio.resample``.
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
_LIBS: dict = {}


def _lib_path(source: str) -> str:
    src = os.path.join(_HERE, source)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("TOUCAN_NATIVE_CACHE",
                           os.path.join(_HERE, "_build"))
    stem = os.path.splitext(source)[0]
    return os.path.join(cache, f"libtoucan{stem}-{digest}.so")


def _compile(source: str, lib_path: str) -> bool:
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    tmp = lib_path + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
           os.path.join(_HERE, source), "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    os.replace(tmp, lib_path)
    return True


def _load(source: str, configure):
    """Compile (once, cached by source hash) and load a native library.
    Returns the ctypes library or None when no toolchain is available."""
    with _LOCK:
        if source in _LIBS:
            return _LIBS[source]
        lib = None
        lib_path = _lib_path(source)
        if os.path.exists(lib_path) or _compile(source, lib_path):
            lib = ctypes.CDLL(lib_path)
            configure(lib)
        _LIBS[source] = lib
        return lib


# ------------------------------------------------------------------ F0

def _configure_f0(lib):
    lib.toucan_estimate_f0.restype = ctypes.c_int
    lib.toucan_estimate_f0.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]


def load_f0_library():
    return _load("f0.cpp", _configure_f0)


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


# ------------------------------------------------------------- resample

def _configure_resample(lib):
    lib.toucan_resample_out_len.restype = ctypes.c_int64
    lib.toucan_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                            ctypes.c_int64]
    lib.toucan_resample.restype = ctypes.c_int64
    lib.toucan_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32,
    ]


def load_resample_library():
    return _load("resample.cpp", _configure_resample)


def native_resample_available() -> bool:
    return load_resample_library() is not None


def resample(audio, orig_sr: int, new_sr: int,
             n_threads: int = 0) -> np.ndarray:
    """Native polyphase sinc resampling (numpy fallback without g++).
    Matches frontend.audio.resample to float32 rounding."""
    lib = load_resample_library()
    if lib is None:
        from toucan_tpu.frontend.audio import resample as py_resample
        return py_resample(np.asarray(audio, np.float32), orig_sr, new_sr)
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    cap = int(lib.toucan_resample_out_len(len(audio), orig_sr, new_sr)) + 1
    out = np.empty(cap, dtype=np.float32)
    n = lib.toucan_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(audio)), ctypes.c_int64(orig_sr),
        ctypes.c_int64(new_sr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(cap), ctypes.c_int32(n_threads))
    if n < 0:
        from toucan_tpu.frontend.audio import resample as py_resample
        return py_resample(audio, orig_sr, new_sr)
    return out[:n]
