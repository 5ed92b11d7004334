"""Pipelined acoustic↔vocoder serving (SURVEY §2.10 PP row) and long-form
time-sharded synthesis reachable through the user interface (BASELINE
config 4) — VERDICT r03 next-round items #5 and #7.

Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from toucan_tpu.infer.interface import ToucanTTSInterface
from toucan_tpu.infer.pipelined import PipelinedSynthesizer, make_stage_fns
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig
from toucan_tpu.models.vocoders import HiFiGANGenerator

TINY = ToucanTTSConfig(adim=32, aheads=2, enc_layers=1, enc_units=64,
                       dec_layers=1, dec_units=64, duration_layers=1,
                       pitch_layers=1, energy_layers=1, duration_chans=16,
                       pitch_chans=16, energy_chans=16, glow_blocks=2,
                       glow_hidden=16, utt_embed_dim=64, lang_embs=100)


def _tiny_models():
    rng = jax.random.PRNGKey(0)
    model = ToucanTTS(TINY)
    text = jnp.zeros((1, 8, 62))
    tts_vars = model.init(rng, text, jnp.array([8]), 32,
                          utterance_embedding=jnp.zeros((1, 64)),
                          lang_ids=jnp.zeros((1, 1), jnp.int32),
                          method=ToucanTTS.infer)
    voc = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(11,),
                           resblock_dilations=((1, 3, 5),))
    voc_vars = voc.init(rng, jnp.zeros((1, 16, 80)))
    gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)),
                                     jnp.array([20]))
    return model, tts_vars, voc, voc_vars, gst_vars


# ----------------------------------------------------------- stage pipeline


def _batch(b, tmax, frames, seed=0):
    rng = jax.random.PRNGKey(seed)
    text = (jax.random.uniform(rng, (b, tmax, 62)) > 0.5).astype(jnp.float32)
    lens = jnp.full((b,), tmax, jnp.int32)
    utt = jax.random.normal(rng, (b, 64), jnp.float32)
    lang = jnp.zeros((b, 1), jnp.int32)
    noise = jax.random.normal(rng, (b, frames, 80)) * 0.8
    knobs = jnp.ones((4,), jnp.float32)
    return text, lens, utt, lang, noise, knobs


def test_pipelined_stages_match_fused():
    """The two-stage split (acoustic program + vocoder program on separate
    devices) produces the same wave as the fused single-program path."""
    model, tts_vars, voc, voc_vars, _ = _tiny_models()
    frames = 64
    batch = _batch(2, 8, frames)
    acoustic_fn, vocode_fn = make_stage_fns(model, voc, frames)
    mel, lens = acoustic_fn(tts_vars, *batch[:1], *batch[1:])
    wave_stages = vocode_fn(voc_vars, mel)

    def fused(tv, vv, b):
        text, tlens, utt, lang, noise, knobs = b
        outs = model.apply(tv, text, tlens, frames, utterance_embedding=utt,
                           lang_ids=lang, glow_noise=noise, run_glow=True,
                           method=ToucanTTS.infer)
        _, after, _, _, _, mlens = outs
        mask = (jnp.arange(frames)[None, :] < mlens[:, None])[..., None]
        m = jnp.where(mask, after.astype(jnp.float32), 0.0)
        return voc.apply(vv, m)[..., 0]

    wave_fused = jax.jit(fused)(tts_vars, voc_vars, batch)
    np.testing.assert_allclose(np.asarray(wave_stages),
                               np.asarray(wave_fused), atol=1e-6)


def test_pipelined_stream_two_devices():
    """Double-buffered stream over ≥2 devices: stage placement on separate
    chips, every batch's wave identical to its standalone dispatch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    model, tts_vars, voc, voc_vars, _ = _tiny_models()
    frames = 64
    pipe = PipelinedSynthesizer(model, tts_vars, voc, voc_vars, frames,
                                depth=2)
    assert pipe.two_stage
    batches = [_batch(2, 8, frames, seed=s) for s in range(4)]
    results = list(pipe.synthesize_stream(iter(batches)))
    assert len(results) == 4
    # reference: dispatch each batch alone through the same stage fns
    for (wave, lens), batch in zip(results, batches):
        mel_ref, lens_ref = pipe.acoustic_fn(pipe.tts_variables, *batch)
        wave_ref = pipe.vocode_fn(pipe.vocoder_variables,
                                  jax.device_put(mel_ref, pipe.dev_vocoder))
        np.testing.assert_allclose(wave, np.asarray(wave_ref), atol=1e-6)
        np.testing.assert_array_equal(lens, np.asarray(lens_ref))


# ------------------------------------------------- longform via interface


def test_longform_sharded_synthesis_through_interface():
    """BASELINE config 4 through the USER API: an interface constructed
    with a mesh routes long syntheses through dist/longform.py's
    halo-exchange time sharding and the wave matches the unsharded
    interface bit-for-bit (same injected glow noise + durations)."""
    model, tts_vars, voc, voc_vars, gst_vars = _tiny_models()
    devices = np.array(jax.devices()[:8]).reshape(-1)
    mesh = Mesh(devices, ("data",))

    # long input: well past longform_frames=512 (ragged across 8 shards)
    # with fixed 8-frame durations
    phones = "~" + "ðɪs ɪz ə tˈɛst " * 16 + "~#"
    iface_plain = ToucanTTSInterface(tts_vars, voc_vars, gst_vars,
                                     config=TINY, vocoder=voc, language="en",
                                     use_g2p=False)
    n = len(iface_plain.text2phone.string_to_features(phones,
                                                      input_phonemes=True))
    durations = np.full(n, 8)
    noise = np.random.RandomState(0).randn(4096, 80).astype(np.float32) * 0.8

    wave_plain = iface_plain(phones, input_is_phones=True,
                             durations=durations, glow_noise=noise)
    assert len(wave_plain) / 24000.0 > 12.0  # well past longform_frames

    iface_mesh = ToucanTTSInterface(tts_vars, voc_vars, gst_vars,
                                    config=TINY, vocoder=voc, language="en",
                                    use_g2p=False, mesh=mesh,
                                    longform_frames=512)
    wave_mesh = iface_mesh(phones, input_is_phones=True,
                           durations=durations, glow_noise=noise)
    assert len(wave_mesh) == len(wave_plain)
    np.testing.assert_allclose(wave_mesh, wave_plain, atol=2e-6)


def test_short_input_skips_longform_path():
    """Below the frame threshold a mesh-built interface uses the fused
    single-device path (no sharding overhead for short sentences)."""
    model, tts_vars, voc, voc_vars, gst_vars = _tiny_models()
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(-1), ("data",))
    iface = ToucanTTSInterface(tts_vars, voc_vars, gst_vars, config=TINY,
                               vocoder=voc, language="en", use_g2p=False,
                               mesh=mesh, longform_frames=1024)
    # a one-phrase input pads to 32 phones -> 512 frames < 1024 threshold
    wave = iface("~ðɪs ɪz ə tˈɛst~#", input_is_phones=True)
    assert len(wave) > 0 and not iface._acoustic_cache  # fused path used
