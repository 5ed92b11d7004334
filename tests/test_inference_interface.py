"""End-to-end inference interface + prosody cloner on tiny random models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.infer.cloner import UtteranceCloner
from toucan_tpu.infer.interface import ToucanTTSInterface
from toucan_tpu.models.aligner import Aligner
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig
from toucan_tpu.models.vocoders import HiFiGANGenerator

TINY = ToucanTTSConfig(adim=32, aheads=2, enc_layers=1, enc_units=64, dec_layers=1,
                       dec_units=64, duration_layers=1, pitch_layers=1,
                       energy_layers=1, duration_chans=16, pitch_chans=16,
                       energy_chans=16, glow_blocks=2, glow_hidden=16,
                       utt_embed_dim=64, lang_embs=100)

IPA = "~ðɪs ɪz ə tˈɛst~#"


@pytest.fixture(scope="module")
def interface():
    rng = jax.random.PRNGKey(0)
    model = ToucanTTS(TINY)
    text = jnp.zeros((1, 8, 62))
    tts_vars = model.init(rng, text, jnp.array([8]), 32,
                          utterance_embedding=jnp.zeros((1, 64)),
                          lang_ids=jnp.zeros((1, 1), jnp.int32),
                          method=ToucanTTS.infer)
    voc = HiFiGANGenerator(channels=64)
    voc_vars = voc.init(rng, jnp.zeros((1, 16, 80)))
    gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)), jnp.array([20]))
    iface = ToucanTTSInterface(tts_vars, voc_vars, gst_vars, config=TINY,
                               vocoder=voc, language="en", use_g2p=False)
    return iface


def test_basic_synthesis(interface):
    wave = interface(IPA, input_is_phones=True)
    assert wave.ndim == 1 and len(wave) % 384 == 0 and len(wave) > 0
    assert np.isfinite(wave).all()


def test_prosody_overrides_control_length(interface):
    phones = interface.text2phone.string_to_features(IPA, input_phonemes=True)
    n = len(phones)
    durations = np.full(n, 4)
    wave, dur, pit, ene = interface(IPA, input_is_phones=True, durations=durations,
                                    pitch=np.ones((n, 1)), energy=np.ones((n, 1)),
                                    return_duration_pitch_energy=True)
    # word-boundary tokens get zero duration (linguistic fix), glow
    # truncates to an even frame count
    from toucan_tpu.frontend.inventory import feature_index
    wb = phones[:, feature_index()["word-boundary"]] == 1
    expect_frames = int(durations[~wb].sum()) // 2 * 2
    assert len(wave) == expect_frames * 384
    np.testing.assert_array_equal(dur[~wb], durations[~wb])
    np.testing.assert_array_equal(dur[wb], 0)


def test_duration_scaling_changes_length(interface):
    w1 = interface(IPA, input_is_phones=True)
    w2 = interface(IPA, input_is_phones=True, duration_scaling_factor=1.5)
    assert len(w2) >= len(w1)


def test_set_utterance_embedding_from_wave(interface):
    before = interface.default_utterance_embedding.copy()
    wave = np.sin(2 * np.pi * 220 * np.arange(16000) / 16000).astype(np.float32)
    interface.set_utterance_embedding(wave=wave, sr=16000)
    after = interface.default_utterance_embedding
    assert after.shape == (64,)
    assert not np.allclose(before, after)


def test_read_to_file(interface, tmp_path):
    out = tmp_path / "out.wav"
    wav = interface.read_to_file([IPA, IPA], str(out), input_is_phones=True)
    assert out.exists()
    assert len(wav) > 2 * 10600


def test_cloner_end_to_end(interface):
    rng = jax.random.PRNGKey(1)
    aligner_vars = Aligner(conv_dim=64, lstm_dim=32).init(
        rng, jnp.zeros((1, 20, 80)), jnp.array([20]))
    cloner = UtteranceCloner(interface, aligner_vars)
    # patch the tiny aligner into the cloner's calls
    import toucan_tpu.infer.cloner as cloner_mod
    orig = cloner_mod.Aligner
    cloner_mod.Aligner = lambda: orig(conv_dim=64, lstm_dim=32)
    try:
        sr = 16000
        ref = np.concatenate([
            np.zeros(2000, np.float32),
            np.sin(2 * np.pi * 180 * np.arange(sr) / sr).astype(np.float32),
            np.zeros(2000, np.float32)])
        wave = cloner.clone_utterance(ref, IPA, sr=sr, lang="en",
                                      input_is_phones=True)
        assert np.isfinite(wave).all() and len(wave) > 0
    finally:
        cloner_mod.Aligner = orig


def test_return_plot_as_filepath(interface):
    import os

    wave, path = interface(IPA, input_is_phones=True, return_plot_as_filepath=True)
    assert np.isfinite(wave).all()
    assert os.path.isfile(path) and os.path.getsize(path) > 0
    os.unlink(path)


def test_synthesize_batch_multispeaker(interface):
    """BASELINE config 2: batched multi-speaker/multilingual synthesis in a
    single device invocation; per-sample results line up with the
    single-utterance path (deterministic parts)."""
    texts = [IPA, "~hɛlˈoʊ wˈɜːld~#", "~ə tˈɛst~#"]
    rng = np.random.RandomState(0)
    embs = rng.randn(3, 64).astype(np.float32)
    waves = interface.synthesize_batch(texts, input_is_phones=True,
                                       utterance_embeddings=embs)
    assert len(waves) == 3
    for w in waves:
        assert w.ndim == 1 and len(w) > 0 and len(w) % 384 == 0
        assert np.isfinite(w).all()

    # deterministic parts must match the single-utterance path per sample
    for text, emb, wave in zip(texts, embs, waves):
        interface.set_utterance_embedding(embedding=emb)
        _, dur, _, _ = interface(text, input_is_phones=True,
                                 return_duration_pitch_energy=True)
        expect_len = (int(dur.sum()) // 2) * 2 * 384  # glow even-truncation
        assert len(wave) == expect_len, (len(wave), expect_len)
    interface.set_utterance_embedding(embedding=np.zeros(64, np.float32))


def test_synthesize_batch_multilingual(interface):
    texts = ["~hɛlˈoʊ~#", "~hˈaloː~#"]
    waves = interface.synthesize_batch(texts, input_is_phones=True,
                                       languages=["en", "de"])
    assert len(waves) == 2 and all(np.isfinite(w).all() for w in waves)


def test_interface_accepts_vocoder_instance_and_dtype():
    """The constructor takes a vocoder module directly and a serving dtype
    override (the TPU configuration is bf16)."""
    import jax
    import jax.numpy as jnp
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    rng = jax.random.PRNGKey(0)
    from toucan_tpu.models.toucan_tts import ToucanTTS
    model = ToucanTTS(TINY)
    tts_vars = model.init(rng, jnp.zeros((1, 8, 62)), jnp.array([8]), 32,
                          utterance_embedding=jnp.zeros((1, 64)),
                          lang_ids=jnp.zeros((1, 1), jnp.int32),
                          method=ToucanTTS.infer)
    voc = HiFiGANGenerator(channels=64)
    voc_vars = voc.init(rng, jnp.zeros((1, 16, 80)))
    gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)), jnp.array([20]))

    iface = ToucanTTSInterface(tts_vars, voc_vars, gst_vars, config=TINY,
                               vocoder=voc, language="en", use_g2p=False)
    assert iface.vocoder is voc
    wave = iface("~tˈɛst~#", input_is_phones=True)
    assert np.isfinite(wave).all() and len(wave) > 0

    import dataclasses
    bf16_iface = ToucanTTSInterface(
        tts_vars, voc_vars, gst_vars,
        config=dataclasses.replace(TINY), vocoder="hifigan", use_g2p=False,
        dtype=jnp.bfloat16)
    assert bf16_iface.config.dtype == jnp.bfloat16
    assert bf16_iface.vocoder.dtype == jnp.bfloat16


def test_precompile_warms_caches(interface):
    interface._e2e_cache.clear()
    interface.precompile(phone_buckets=(32,), batch_sizes=(1,))
    assert (32, 32 * 16, False) in interface._e2e_cache
    # a matching request now runs without tracing a new bucket
    wave = interface(IPA, input_is_phones=True)
    assert np.isfinite(wave).all()
    assert len(interface._e2e_cache) == 1


def test_synthesize_batch_pcm16(interface):
    waves = interface.synthesize_batch(["~tˈɛst~#"], input_is_phones=True,
                                       return_pcm16=True)
    assert waves[0].dtype == np.int16
    ref = interface.synthesize_batch(["~tˈɛst~#"], input_is_phones=True)
    # same content up to PCM quantization (glow noise differs per call, so
    # compare via a fresh seeded interface state instead: lengths only)
    assert len(waves[0]) == len(ref[0])


def test_fused_path_matches_standalone_vocode(interface):
    """The fused text->mel->wave call must equal vocoding the trimmed mel
    separately (zero-masked padding is outside the vocoder's receptive
    field of any kept sample)."""
    n_pad, max_frames = 32, 32 * 16
    fn = interface._e2e_fn(n_pad, max_frames, False)
    phones = interface.text2phone.string_to_features(IPA, input_phonemes=True)
    text = np.zeros((1, n_pad, 62), np.float32)
    text[0, :len(phones)] = phones
    noise = jax.random.normal(jax.random.PRNGKey(9), (1, max_frames, 80)) * 0.8
    wave, after, dur, pit, ene, lens = fn(
        interface.tts_variables, interface.vocoder_variables,
        jnp.asarray(text), jnp.asarray([len(phones)], jnp.int32),
        jnp.zeros((1, 64)), jnp.zeros((1, 1), jnp.int32), noise,
        jnp.ones((4,), jnp.float32))
    mel_len = int(lens[0])
    fused = np.asarray(wave)[0, :mel_len * 384]
    standalone = interface._vocode(np.asarray(after)[0, :mel_len])
    np.testing.assert_allclose(fused, standalone, atol=2e-6)


def test_read_aloud_plays_through_injected_player(interface):
    """read_aloud (ToucanTTSInterface.py:287-296): synthesis + trailing
    silence pad + playback call; 48 kHz PCM16 in compatibility mode."""
    calls = []

    class Player:
        @staticmethod
        def play(wav, samplerate):
            calls.append((np.asarray(wav), samplerate))

        @staticmethod
        def wait():
            calls.append(("wait", None))

    assert interface.read_aloud("", _player=Player) is None  # empty: no-op
    wav = interface.read_aloud(IPA, input_is_phones=True, _player=Player)
    assert calls and calls[-1][1] == 24000
    assert len(calls[-1][0]) == len(wav)
    assert (calls[-1][0][-12000:] == 0).all()  # silence pad

    calls.clear()
    interface.read_aloud(IPA, input_is_phones=True, blocking=True,
                         increased_compatibility_mode=True, _player=Player)
    assert calls[0][1] == 48000 and calls[0][0].dtype == np.int16
    assert calls[-1] == ("wait", None)


def test_quantize_vocoder_int8_serving(interface):
    """quantize_vocoder: calibration through the acoustic model, then int8
    synthesis stays close to the exact path (tiny models, interpret mode)."""
    exact = interface(IPA, input_is_phones=True)
    scales = interface.quantize_vocoder()
    assert interface.vocoder.stage_mode == "int8"
    quant = interface(IPA, input_is_phones=True)
    assert quant.shape == exact.shape
    assert np.isfinite(quant).all()
    assert np.abs(quant - exact).max() < 0.05
    # restore for other tests sharing the fixture
    interface.vocoder = interface.vocoder.clone(stage_mode="")
    interface._voc_act_scales = None
    interface._e2e_cache.clear()
    interface._vocoder_cache.clear()
