"""Prosody extraction parity vs the reference calculators."""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

from toucan_tpu.data.extraction import (
    compute_frame_energy,
    durations_from_alignment,
    insert_word_boundary_durations,
    split_repeated_phoneme_durations,
    token_average_energy,
    token_average_pitch,
)
from toucan_tpu.frontend.inventory import feature_index

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def _random_text(n, rng):
    f2i = feature_index()
    text = (rng.rand(n, 62) > 0.5).astype(np.float32)
    return text


def test_durations_match_reference_calculator():
    import torch
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.FastSpeech2.DurationCalculator")
    dc = ref_mod.DurationCalculator(reduction_factor=1)
    rng = np.random.RandomState(0)
    align = np.zeros((40, 6), np.float32)
    path = np.sort(rng.randint(0, 6, size=40))
    align[np.arange(40), path] = 1.0
    expect = dc(torch.tensor(align)).numpy()
    got = durations_from_alignment(align)
    np.testing.assert_array_equal(got, expect)


def test_energy_token_average_matches_reference():
    import torch
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.FastSpeech2.EnergyCalculator")
    calc = ref_mod.EnergyCalculator(fs=16000)
    rng = np.random.RandomState(1)
    wave = rng.randn(16000).astype(np.float32) * 0.3
    durations = np.array([10, 0, 15, 20, 8, 10])
    n_frames = int(durations.sum())
    text = _random_text(6, rng)

    expect = calc(input_waves=torch.tensor(wave[None]),
                  input_waves_lengths=torch.tensor([16000]),
                  feats_lengths=torch.tensor([n_frames]),
                  text=torch.tensor(text),
                  durations=torch.tensor(durations[None]),
                  durations_lengths=torch.tensor([6]))[0].squeeze(0).numpy()

    frame_energy = compute_frame_energy(wave)
    got = token_average_energy(frame_energy, durations, text, n_frames)
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4)


def test_pitch_token_average_matches_reference_averaging():
    """Feed the same synthetic F0 track through the reference's averaging
    (its _average_by_duration + normalization) and ours."""
    import torch
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.FastSpeech2.PitchCalculator")
    parsel = ref_mod.Parselmouth.__new__(ref_mod.Parselmouth)
    rng = np.random.RandomState(2)
    durations = np.array([5, 0, 12, 9, 7])
    n_frames = int(durations.sum())
    f0 = np.abs(rng.randn(n_frames)).astype(np.float32) * 100
    f0[3:7] = 0.0
    text = _random_text(5, rng)

    avg = parsel._average_by_duration(torch.tensor(f0), torch.tensor(durations),
                                      torch.tensor(text))
    expect = (avg / avg[avg != 0].mean()).numpy()[:, None]
    got = token_average_pitch(f0, durations, text, n_frames)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_word_boundary_insertion_and_repeat_split():
    durations = np.array([10, 20, 30])
    out = insert_word_boundary_durations(durations, [1, 3])
    np.testing.assert_array_equal(out, [10, 0, 20, 0, 30])

    text = np.array([[1, 0], [1, 0], [0, 1]], np.float32)
    durs = np.array([10, 5, 7])
    out = split_repeated_phoneme_durations(durs, text)
    np.testing.assert_array_equal(out, [9, 6, 7])  # 15 -> 9 + 6
    assert out.sum() == durs.sum()
