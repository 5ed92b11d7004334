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


def test_synthetic_vowel_with_vibrato():
    """Speech-like signal: glottal pulse train with 5 Hz vibrato, shaped by
    vowel formants (/a/: 730, 1090, 2440 Hz) + additive noise.  The tracker
    must stay within 2% of the instantaneous F0 on interior voiced frames
    (the 'Praat-parity on real speech' tolerance study, NEXT.md)."""
    import numpy as np
    from toucan_tpu.frontend.pitch import estimate_f0

    sr, dur, hop = 16000, 1.2, 256
    t = np.arange(int(sr * dur)) / sr
    f0 = 120.0 * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * t))  # vibrato
    phase = 2 * np.pi * np.cumsum(f0) / sr
    # impulse-ish glottal source: sharpened cosine series
    source = np.zeros_like(t)
    for k in range(1, 30):
        source += np.cos(k * phase) / k
    # cascade formant resonators (2nd-order IIR)
    x = source
    for fc, bw in ((730, 80), (1090, 100), (2440, 150)):
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * fc / sr
        a1, a2 = -2 * r * np.cos(theta), r * r
        y = np.zeros_like(x)
        for n in range(len(x)):  # short signal; plain loop is fine
            y[n] = x[n] - a1 * (y[n - 1] if n > 0 else 0) - a2 * (y[n - 2] if n > 1 else 0)
        x = y
    x = x / np.abs(x).max()
    x += 0.01 * np.random.RandomState(0).randn(len(x))

    f0_hat = estimate_f0(x.astype(np.float32), sr=sr, hop=hop)
    voiced = f0_hat > 0
    # frame centers as the tracker lays them out (centered analysis,
    # 3/fmin-second window): t_start + half + i*hop
    window_len = int(3.0 / 40.0 * sr) + (int(3.0 / 40.0 * sr) % 2)
    n_frames = len(f0_hat)
    t_start = (len(x) - ((n_frames - 1) * hop + window_len)) // 2
    centers = (t_start + window_len // 2 + np.arange(n_frames) * hop) / sr
    true_f0 = 120.0 * (1.0 + 0.03 * np.sin(2 * np.pi * 5.0 * centers))
    interior = (centers > 0.1) & (centers < dur - 0.1)
    assert voiced[interior].mean() > 0.95
    sel = interior & voiced
    rel_err = np.abs(f0_hat[sel] - true_f0[sel]) / true_f0[sel]
    assert np.median(rel_err) < 0.01, np.median(rel_err)
    assert (rel_err < 0.02).mean() > 0.95, rel_err.max()
