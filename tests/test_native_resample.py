"""Native C++ resampler vs the numpy reference implementation."""

import numpy as np
import pytest

from toucan_tpu.frontend.audio import resample as py_resample
from toucan_tpu.native import native_resample_available, resample as native_resample

pytestmark = pytest.mark.skipif(not native_resample_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("orig_sr,new_sr", [(48000, 16000), (24000, 16000),
                                            (22050, 16000), (16000, 24000),
                                            (44100, 16000)])
def test_native_matches_numpy(orig_sr, new_sr, monkeypatch):
    rng = np.random.RandomState(0)
    audio = rng.randn(orig_sr * 2 + 317).astype(np.float32)  # ~2 s, odd tail
    monkeypatch.setenv("TOUCAN_NATIVE_RESAMPLE", "0")  # numpy reference
    expect = py_resample(audio, orig_sr, new_sr)
    monkeypatch.delenv("TOUCAN_NATIVE_RESAMPLE")
    got = native_resample(audio, orig_sr, new_sr)
    assert got.shape == expect.shape
    # numpy path accumulates in float32 sgemm, native in double: agreement is
    # at float32 rounding level
    np.testing.assert_allclose(got, expect, atol=2e-6)


def test_native_identity_and_threads():
    rng = np.random.RandomState(1)
    audio = rng.randn(48000 * 5).astype(np.float32)
    same = native_resample(audio, 16000, 16000)
    np.testing.assert_array_equal(same, audio)
    # thread count must not change the result (per-output double accumulation)
    one = native_resample(audio, 48000, 16000, n_threads=1)
    many = native_resample(audio, 48000, 16000, n_threads=8)
    np.testing.assert_array_equal(one, many)


def test_in_band_signal_preserved():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = native_resample(audio, sr_in, sr_out)
    t_out = np.arange(len(out)) / sr_out
    expect = np.sin(2 * np.pi * 440 * t_out)
    # ignore filter edges
    sl = slice(200, -200)
    assert np.abs(out[sl] - expect[sl]).max() < 5e-3
