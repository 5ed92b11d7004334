import numpy as np
import jax.numpy as jnp

from toucan_tpu.frontend.audio import (
    AudioPreprocessor,
    amplitude_spectrogram,
    integrated_loudness,
    log_mel_spectrogram,
    mel_filterbank,
    normalize_loudness,
    resample,
    trim_silence,
)


def test_stft_matches_numpy_reference():
    """Compare the JAX STFT against a straightforward numpy implementation of
    librosa's semantics (reflect-centered, periodic hann)."""
    rng = np.random.RandomState(0)
    audio = rng.randn(4000).astype(np.float32)
    n_fft, hop = 1024, 256
    got = np.asarray(amplitude_spectrogram(jnp.asarray(audio), n_fft, hop))

    padded = np.pad(audio, n_fft // 2, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(padded) - n_fft) // hop
    expect = np.stack([np.abs(np.fft.rfft(padded[i * hop:i * hop + n_fft] * win))
                       for i in range(n_frames)])
    assert got.shape == expect.shape == (n_frames, n_fft // 2 + 1)
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_matmul_dft_matches_fft_path():
    """The MXU matmul-DFT path (default on TPU) must agree with the XLA FFT
    path (default on CPU) — batched, and for both mel configs (16 kHz
    acoustic: 1024/256; 24 kHz vocoder loss: 1536/384)."""
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, 9600).astype(np.float32))
    for n_fft, hop in ((1024, 256), (1536, 384)):
        via_fft = np.asarray(
            amplitude_spectrogram(audio, n_fft, hop, use_matmul_dft=False))
        via_mm = np.asarray(
            amplitude_spectrogram(audio, n_fft, hop, use_matmul_dft=True))
        assert via_fft.shape == via_mm.shape
        np.testing.assert_allclose(via_mm, via_fft, atol=1e-3)


def test_stft_frames_gather_fallback_agrees():
    """hop that does not divide n_fft exercises the gather fallback; it must
    produce the same frames as the reshape path semantics."""
    from toucan_tpu.frontend.audio import stft_frames

    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(3210).astype(np.float32))
    fast = np.asarray(stft_frames(audio, 1024, 256))
    padded = np.pad(np.asarray(audio), 512, mode="reflect")
    n_frames = 1 + (len(padded) - 1024) // 256
    expect = np.stack([padded[i * 256:i * 256 + 1024] for i in range(n_frames)])
    np.testing.assert_allclose(fast, expect, rtol=0, atol=0)

    slow = np.asarray(stft_frames(audio, 1024, 300))  # 300 does not divide 1024
    n_frames = 1 + (len(padded) - 1024) // 300
    expect = np.stack([padded[i * 300:i * 300 + 1024] for i in range(n_frames)])
    np.testing.assert_allclose(slow, expect, rtol=0, atol=0)


def test_mel_filterbank_properties():
    basis = mel_filterbank(16000, 1024, 80, 40.0, 8000.0)
    assert basis.shape == (80, 513)
    # every filter is nonnegative with a single peak inside (fmin, fmax)
    assert (basis >= 0).all()
    fft_freqs = np.linspace(0, 8000, 513)
    peaks = fft_freqs[basis.argmax(1)]
    assert peaks[0] > 40.0 and peaks[-1] < 8000.0
    assert (np.diff(peaks) >= 0).all()
    # slaney normalization: each filter integrates to ~1 over frequency
    assert abs(basis[40].sum() * (fft_freqs[1] - fft_freqs[0]) - 1.0) < 0.2


def test_log_mel_pipeline_shapes():
    audio = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    assert mel.shape == (63, 80)
    # energy should concentrate near the 440 Hz filters
    assert 3 < mel.argmax(1).mean() < 20

    ap = AudioPreprocessor(input_sr=16000)
    ref_orient = ap.audio_to_mel_spec_tensor(audio, normalize=False)
    assert ref_orient.shape == (80, 63)


def test_resample_sine_reconstruction():
    sr = 48000
    audio = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    out = resample(audio, 48000, 16000)
    assert len(out) == 16000
    ref = np.sin(2 * np.pi * 440 * np.arange(len(out)) / 16000)
    assert np.abs(out[50:-50] - ref[50:-50]).max() < 1e-3


def test_resample_against_scipy_in_band():
    """In-band content must agree with scipy's polyphase resampler."""
    from scipy.signal import resample_poly, firwin, lfilter
    rng = np.random.RandomState(0)
    noise = rng.randn(48000).astype(np.float32)
    audio = lfilter(firwin(1001, 3000, fs=48000), [1.0], noise).astype(np.float32)
    out = resample(audio, 48000, 16000)
    ref = resample_poly(audio, 1, 3)
    corr = np.corrcoef(out[200:-200], ref[200:-200])[0, 1]
    assert corr > 0.999


def test_loudness_normalization():
    rng = np.random.RandomState(0)
    sr = 16000
    audio = (0.01 * np.sin(2 * np.pi * 997 * np.arange(2 * sr) / sr)).astype(np.float64)
    # a -40 dBFS sine measures about -43 LUFS after K-weighting at 997 Hz
    lufs = integrated_loudness(audio, sr)
    assert -46 < lufs < -40
    normed = normalize_loudness(audio, sr)
    assert abs(np.abs(normed).max() - 1.0) < 1e-6  # peak normalized


def test_trim_silence():
    sr = 16000
    silence = np.zeros(sr // 2, np.float32)
    speech = np.sin(2 * np.pi * 200 * np.arange(sr) / sr).astype(np.float32)
    audio = np.concatenate([silence, speech, silence])
    trimmed, start, end = trim_silence(audio, sr)
    assert start < len(silence) + sr // 10
    assert end > len(silence) + len(speech) - sr // 10
    assert len(trimmed) < len(audio)
