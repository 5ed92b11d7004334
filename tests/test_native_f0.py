"""Native (C++/ctypes) F0 extractor parity vs the numpy reference path.

The native port (toucan_tpu/native/f0.cpp) must match frontend.pitch
frame-for-frame — same candidates, same Viterbi — up to fp reordering
(direct vs FFT autocorrelation).
"""

import numpy as np
import pytest

from toucan_tpu.frontend.pitch import estimate_f0 as py_f0
from toucan_tpu.native import estimate_f0 as native_f0, native_f0_available

pytestmark = pytest.mark.skipif(not native_f0_available(),
                                reason="no host C++ toolchain")


def _vibrato(seed=0, seconds=2.0, sr=16000, base=150.0, depth=30.0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(sr * seconds)) / sr
    f = base + depth * np.sin(2 * np.pi * 2 * t)
    sig = 0.5 * np.sin(np.cumsum(2 * np.pi * f / sr))
    sig += 0.01 * rng.randn(len(sig))
    return sig


@pytest.mark.parametrize("base", [90.0, 150.0, 320.0])
def test_native_matches_numpy(base):
    sig = _vibrato(base=base)
    sig[:4000] = 0.001 * np.random.RandomState(1).randn(4000)  # unvoiced head
    a = native_f0(sig)
    b = py_f0(sig)
    assert len(a) == len(b)
    assert np.mean((a > 0) == (b > 0)) > 0.98
    both = (a > 0) & (b > 0)
    assert both.any()
    np.testing.assert_allclose(a[both], b[both], rtol=1e-6)


def test_native_tracks_true_pitch():
    sr = 16000
    sig = _vibrato(base=200.0, depth=0.0)
    f0 = native_f0(sig, sr=sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.9 * len(f0)
    assert abs(np.median(voiced) - 200.0) < 2.0


def test_native_silence_is_unvoiced():
    f0 = native_f0(np.zeros(16000))
    assert (f0 == 0).all()
