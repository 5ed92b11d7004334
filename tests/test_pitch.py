import numpy as np

from toucan_tpu.frontend.pitch import estimate_f0


def _tone(f0, sr=16000, seconds=1.0, harmonics=5):
    t = np.arange(int(sr * seconds)) / sr
    sig = sum((1.0 / (h + 1)) * np.sin(2 * np.pi * f0 * (h + 1) * t)
              for h in range(harmonics))
    return sig.astype(np.float64)


def test_pure_tones():
    for f0 in [80, 120, 220, 330, 440]:
        sig = _tone(f0)
        est = estimate_f0(sig)
        voiced = est[est > 0]
        assert len(voiced) > 0.9 * len(est)
        err = np.abs(np.median(voiced) - f0) / f0
        assert err < 0.01, f"f0={f0}: got {np.median(voiced)}"


def test_sweep_tracks():
    sr = 16000
    t = np.arange(sr) / sr
    f_inst = 100 + 150 * t  # 100 -> 250 Hz sweep
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    sig = np.sin(phase) + 0.5 * np.sin(2 * phase)
    est = estimate_f0(sig)
    n = len(est)
    # compare mid-region frames against the instantaneous frequency
    mid = slice(n // 4, 3 * n // 4)
    centers = (np.arange(n) * 256 + len(sig) // 2 % 256)[mid]
    expected = 100 + 150 * (np.arange(n)[mid] * 256 / sr)
    got = est[mid]
    voiced = got > 0
    assert voiced.mean() > 0.9
    rel = np.abs(got[voiced] - expected[voiced]) / expected[voiced]
    assert np.median(rel) < 0.05


def test_silence_is_unvoiced():
    sig = np.random.RandomState(0).randn(16000) * 1e-5
    sig[:4000] = 0.0
    est = estimate_f0(np.concatenate([np.zeros(8000), _tone(150, seconds=0.5)]))
    # leading silence mostly unvoiced, tone region mostly voiced
    n = len(est)
    lead = est[: n // 3]
    tail = est[-n // 3:]
    assert (lead == 0).mean() > 0.7
    assert (tail > 0).mean() > 0.7
