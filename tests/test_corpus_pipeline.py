"""Integration: raw wavs + transcripts -> caches -> TTS training.

This is the jit-scale analog of the reference's ``tt_it`` integration
pipeline: corpus prep (aligner cache, durations via MAS, pitch/energy) and
a couple of training steps, all on a synthetic tiny corpus.
"""

import os
import wave as wave_mod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.data.corpus import (
    build_aligner_cache,
    build_fastspeech_cache,
    load_cache,
    read_wave,
)
from toucan_tpu.models.aligner import Aligner

IPA_SENTENCES = [
    "~ðɪs ɪz ə tˈɛst~#",
    "~hɛlˈoʊ wˈɜːld~#",
    "~ə ʃˈɔːt sˈɛntəns~#",
    "~wˈʌn mˈoːɹ tˈaɪm~#",
]


def _write_wav(path, seconds, freq, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    sig = (0.5 * np.sin(2 * np.pi * freq * t)
           + 0.2 * np.sin(2 * np.pi * 2.5 * freq * t)).astype(np.float32)
    pcm = (sig * 32767).astype(np.int16)
    with wave_mod.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    mapping = {}
    rng = np.random.RandomState(0)
    for i, ipa in enumerate(IPA_SENTENCES):
        path = root / f"utt_{i}.wav"
        _write_wav(path, seconds=1.2 + 0.3 * i, freq=160 + 40 * i)
        mapping[str(path)] = ipa
    return mapping


def test_read_wave_roundtrip(tiny_corpus):
    path = next(iter(tiny_corpus))
    wave, sr = read_wave(path)
    assert sr == 16000 and wave.dtype == np.float32 and len(wave) > 16000


def test_full_pipeline(tiny_corpus, tmp_path):
    cache_dir = str(tmp_path / "cache")
    data = build_aligner_cache(tiny_corpus, cache_dir, lang="en",
                               loading_processes=1, use_g2p=False,
                               min_len_s=0.5)
    assert len(data) == 4
    for d in data:
        assert d["text"].shape[1] == 62
        assert d["mel"].shape[1] == 80
        assert abs(len(d["wave"]) // 256 - len(d["mel"])) <= 1

    # cache round-trips
    again = load_cache(os.path.join(cache_dir, "aligner_train_cache.npz"))
    assert len(again) == 4
    np.testing.assert_array_equal(again[0]["text"], data[0]["text"])

    # durations/pitch/energy via a random-init aligner (MAS still yields a
    # valid monotonic segmentation)
    aligner_vars = Aligner().init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 80)))
    fast = build_fastspeech_cache(data, aligner_vars, cache_dir, lang="en",
                                  ctc_selection=True)
    assert len(fast) == 4
    for d in fast:
        assert d["durations"].sum() == len(d["mel"])
        assert d["durations"].shape[0] == len(d["text"])
        assert np.isfinite(d["pitch"]).all() and np.isfinite(d["energy"]).all()
        assert d["lang_id"] == 12

    # and the datapoints feed straight into the training loop
    from tests.test_train_dist import TINY
    from toucan_tpu.models.gst import StyleEmbedding
    from toucan_tpu.train.loop import train_loop
    gst_vars = StyleEmbedding().init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 20, 80)), jnp.array([20]))
    state, history = train_loop(fast, gst_vars, str(tmp_path / "run"), config=TINY,
                                batch_size=2, steps=2, postnet_start_steps=0,
                                warmup_steps=1, log_every=1, fine_tune=False)
    assert len(history) > 0 and np.isfinite(history[-1]["total_loss"])
