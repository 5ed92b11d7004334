"""Numerical parity of the JAX ToucanTTS against the PyTorch reference.

Strategy: instantiate the reference model with random weights, convert the
state_dict with ``toucan_tpu.compat.torch_toucan``, and compare forwards in
eval mode (dropout off, batch-norm running stats) with identical inputs —
the strongest correctness check available without pretrained checkpoints.
"""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax
import jax.numpy as jnp

from toucan_tpu.compat.torch_toucan import convert_toucan_tts
from toucan_tpu.models import ToucanTTS, ToucanTTSConfig
from toucan_tpu.train.losses import toucan_tts_loss

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


# the reference hardcodes its 18-block post-flow, so only the conformers shrink
SMALL = dict(enc_layers=2, dec_layers=2, pitch_layers=2)


@pytest.fixture(scope="module")
def pair():
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.ToucanTTS.ToucanTTS")
    ref = ref_mod.ToucanTTS(encoder_layers=SMALL["enc_layers"],
                            decoder_layers=SMALL["dec_layers"],
                            pitch_predictor_layers=SMALL["pitch_layers"])
    # shrink the post-flow: rebuild with fewer blocks for test speed
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = ToucanTTSConfig(enc_layers=SMALL["enc_layers"], dec_layers=SMALL["dec_layers"],
                          pitch_layers=SMALL["pitch_layers"])
    model = ToucanTTS(cfg)
    variables = convert_toucan_tts(sd, enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
                                   pitch_layers=cfg.pitch_layers, energy_layers=cfg.energy_layers,
                                   glow_blocks=cfg.glow_blocks, glow_layers=cfg.glow_layers)
    variables = jax.tree.map(jnp.asarray, variables)
    return ref, model, variables


def _dummy_batch(b=2, t=6, l=20, seed=0):
    rng = np.random.RandomState(seed)
    text = (rng.rand(b, t, 62) > 0.5).astype(np.float32)
    text_lens = np.array([t - 2, t], dtype=np.int64)
    durations = rng.randint(1, 5, size=(b, t))
    for i, tl in enumerate(text_lens):
        durations[i, tl:] = 0
    spec_lens = durations.sum(1)
    l = int(spec_lens.max())
    speech = rng.randn(b, l, 80).astype(np.float32)
    pitch = rng.randn(b, t, 1).astype(np.float32)
    energy = rng.randn(b, t, 1).astype(np.float32)
    utt = rng.randn(b, 64).astype(np.float32)
    lang = np.array([[3], [5]])
    return text, text_lens, speech, spec_lens, durations, pitch, energy, utt, lang


def test_train_forward_parity(pair):
    import torch
    ref, model, variables = pair
    text, text_lens, speech, spec_lens, durations, pitch, energy, utt, lang = _dummy_batch()

    with torch.no_grad():
        r_before, r_after, r_dur, r_pitch, r_energy, r_glow = ref._forward(
            torch.tensor(text), torch.tensor(text_lens), torch.tensor(speech),
            torch.tensor(spec_lens), torch.tensor(durations), torch.tensor(pitch),
            torch.tensor(energy), is_inference=False,
            utterance_embedding=torch.tensor(utt), lang_ids=torch.tensor(lang),
            run_glow=True)

    before, after, dur, pit, ene, glow_loss = model.apply(
        variables, jnp.asarray(text), jnp.asarray(text_lens), jnp.asarray(speech),
        jnp.asarray(spec_lens), jnp.asarray(durations), jnp.asarray(pitch),
        jnp.asarray(energy), utterance_embedding=jnp.asarray(utt),
        lang_ids=jnp.asarray(lang), run_glow=True)

    np.testing.assert_allclose(np.asarray(before), r_before.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(after), r_after.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dur), r_dur.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pit), r_pitch.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ene), r_energy.numpy(), atol=2e-4)
    np.testing.assert_allclose(float(glow_loss), float(r_glow), atol=2e-3)


def test_loss_parity(pair):
    import torch
    ref, model, variables = pair
    text, text_lens, speech, spec_lens, durations, pitch, energy, utt, lang = _dummy_batch()

    with torch.no_grad():
        r_l1, r_dl, r_pl, r_el, r_gl = ref(
            torch.tensor(text), torch.tensor(text_lens), torch.tensor(speech),
            torch.tensor(spec_lens), torch.tensor(durations), torch.tensor(pitch),
            torch.tensor(energy), utterance_embedding=torch.tensor(utt),
            lang_ids=torch.tensor(lang), run_glow=True)

    before, after, dur, pit, ene, glow_loss = model.apply(
        variables, jnp.asarray(text), jnp.asarray(text_lens), jnp.asarray(speech),
        jnp.asarray(spec_lens), jnp.asarray(durations), jnp.asarray(pitch),
        jnp.asarray(energy), utterance_embedding=jnp.asarray(utt),
        lang_ids=jnp.asarray(lang), run_glow=True)
    l1, dl, pl, el = toucan_tts_loss(before, after, jnp.asarray(speech),
                                     jnp.asarray(spec_lens), jnp.asarray(text_lens),
                                     jnp.asarray(durations), dur, pit, ene,
                                     jnp.asarray(pitch), jnp.asarray(energy))
    np.testing.assert_allclose(float(l1), float(r_l1), rtol=1e-4)
    np.testing.assert_allclose(float(dl), float(r_dl), rtol=1e-4)
    np.testing.assert_allclose(float(pl), float(r_pl), rtol=1e-4)
    np.testing.assert_allclose(float(el), float(r_el), rtol=1e-4)


@pytest.fixture(scope="module")
def inference_ref(pair):
    """The production inference copy, loaded with the same weights."""
    ref, _, _ = pair
    inf_mod = import_reference_module(
        "InferenceInterfaces.InferenceArchitectures.InferenceToucanTTS")
    return inf_mod.ToucanTTS(encoder_layers=SMALL["enc_layers"],
                             decoder_layers=SMALL["dec_layers"],
                             pitch_predictor_layers=SMALL["pitch_layers"],
                             weights=ref.state_dict())


def test_inference_parity(pair, inference_ref):
    """Our infer() must match InferenceToucanTTS._forward (the production path),
    including the injected glow noise, on a padded static-shape run."""
    import torch
    _, model, variables = pair
    rng = np.random.RandomState(1)
    t = 7
    text = (rng.rand(t, 62) > 0.5).astype(np.float32)
    utt = rng.randn(64).astype(np.float32)
    lang = np.array([4])

    with torch.no_grad():
        torch.manual_seed(7)
        r_before, r_after, r_dur, r_pitch, r_energy = inference_ref._forward(
            torch.tensor(text[None]), torch.tensor([t]),
            utterance_embedding=torch.tensor(utt[None]),
            lang_ids=torch.tensor(lang[None]))

    mel_len = int(r_dur.sum())
    assert mel_len > 0
    # reproduce the z the reference drew: torch.randn on the (B, 80, T) layout
    torch.manual_seed(7)
    z = (torch.randn(1, 80, mel_len) * 0.8).numpy().transpose(0, 2, 1)
    max_frames = mel_len + 8 - (mel_len % 2)  # even padding headroom
    z_pad = np.zeros((1, max_frames, 80), np.float32)
    z_pad[:, :mel_len] = z

    before, after, dur, pit, ene, lens = model.apply(
        variables, jnp.asarray(text[None]), jnp.asarray(np.array([t])), max_frames,
        utterance_embedding=jnp.asarray(utt[None]), lang_ids=jnp.asarray(lang[None]),
        glow_noise=jnp.asarray(z_pad), run_glow=True, method=ToucanTTS.infer)

    np.testing.assert_array_equal(np.asarray(dur)[0], r_dur.numpy())
    np.testing.assert_allclose(np.asarray(pit)[0, :, 0], r_pitch.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ene)[0, :, 0], r_energy.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(before)[0, :mel_len], r_before.numpy()[:mel_len],
                               atol=3e-4)
    even_len = int(lens[0])
    assert even_len == (mel_len // 2) * 2 == r_after.shape[0]
    np.testing.assert_allclose(np.asarray(after)[0, :even_len], r_after.numpy(),
                               atol=3e-3)


def test_inference_control_knobs(pair, inference_ref):
    """Scaling knobs (duration/pause/pitch/energy) must match the reference."""
    import torch
    _, model, variables = pair
    rng = np.random.RandomState(3)
    t = 9
    text = (rng.rand(t, 62) > 0.5).astype(np.float32)
    utt = rng.randn(64).astype(np.float32)
    lang = np.array([6])
    knobs = dict(duration_scaling_factor=1.3, pitch_variance_scale=1.2,
                 energy_variance_scale=0.7, pause_duration_scaling_factor=1.5)

    with torch.no_grad():
        torch.manual_seed(3)
        r_before, r_after, r_dur, r_pitch, r_energy = inference_ref._forward(
            torch.tensor(text[None]), torch.tensor([t]),
            utterance_embedding=torch.tensor(utt[None]),
            lang_ids=torch.tensor(lang[None]), **knobs)

    mel_len = int(r_dur.sum())
    assert mel_len > 0
    max_frames = mel_len + 8 - (mel_len % 2)
    before, after, dur, pit, ene, lens = model.apply(
        variables, jnp.asarray(text[None]), jnp.asarray(np.array([t])), max_frames,
        utterance_embedding=jnp.asarray(utt[None]), lang_ids=jnp.asarray(lang[None]),
        run_glow=False, method=ToucanTTS.infer, **knobs)

    np.testing.assert_array_equal(np.asarray(dur)[0], r_dur.numpy())
    np.testing.assert_allclose(np.asarray(pit)[0, :, 0], r_pitch.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ene)[0, :, 0], r_energy.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(before)[0, :mel_len], r_before.numpy()[:mel_len],
                               atol=3e-4)
