"""End-to-end checkpoint-file loading: torch.save -> our loaders -> parity."""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_load_toucan_tts_checkpoint_file(tmp_path):
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.ToucanTTS.ToucanTTS")
    ref = ref_mod.ToucanTTS(encoder_layers=1, decoder_layers=1,
                            pitch_predictor_layers=1)
    ref.eval()
    path = tmp_path / "best.pt"
    default_emb = torch.randn(64)
    torch.save({"model": ref.state_dict(), "default_emb": default_emb}, path)

    from toucan_tpu.compat.torch_toucan import convert_toucan_tts
    from toucan_tpu.compat import load as load_mod

    # loaders only need the converter signature to line up with the config
    ckpt = load_mod._torch_load(str(path))
    sd = load_mod._to_numpy_state_dict(ckpt["model"])
    import jax
    variables = jax.tree.map(jnp.asarray, convert_toucan_tts(
        sd, enc_layers=1, dec_layers=1, pitch_layers=1))

    from toucan_tpu.models import ToucanTTS, ToucanTTSConfig
    model = ToucanTTS(ToucanTTSConfig(enc_layers=1, dec_layers=1, pitch_layers=1))
    rng = np.random.RandomState(0)
    text = (rng.rand(5, 62) > 0.5).astype(np.float32)
    with torch.no_grad():
        r_before = ref.inference(torch.tensor(text),
                                 utterance_embedding=default_emb,
                                 lang_id=torch.tensor([3]),
                                 return_duration_pitch_energy=True,
                                 run_postflow=False)[0]
    before, *_ = model.apply(variables, jnp.asarray(text[None]), jnp.asarray([5]),
                             int(r_before.shape[0]) + 2 + int(r_before.shape[0]) % 2,
                             utterance_embedding=jnp.asarray(default_emb.numpy()[None]),
                             lang_ids=jnp.asarray([[3]]), run_glow=False,
                             method=ToucanTTS.infer)
    n = r_before.shape[0]
    np.testing.assert_allclose(np.asarray(before)[0, :n], r_before.numpy(),
                               atol=3e-4)


def test_load_vocoder_checkpoint_file(tmp_path):
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Wave.HiFiGAN.HiFiGAN")
    ref = ref_mod.HiFiGANGenerator()
    ref.eval()
    path = tmp_path / "best.pt"
    torch.save({"generator": ref.state_dict()}, path)

    from toucan_tpu.compat.load import load_vocoder
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    variables = load_vocoder(str(path), kind="hifigan")
    mel = np.random.RandomState(0).randn(1, 12, 80).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.tensor(mel.transpose(0, 2, 1)))[0].numpy()
    wave = HiFiGANGenerator().apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(wave)[..., 0], expect[:, 0, :], atol=2e-5)


def test_load_aligner_checkpoint_file(tmp_path):
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.AutoAligner.Aligner")
    ref = ref_mod.Aligner()
    ref.eval()
    path = tmp_path / "aligner.pt"
    torch.save({"asr_model": ref.state_dict()}, path)

    from toucan_tpu.compat.load import load_aligner
    from toucan_tpu.models.aligner import Aligner

    variables = load_aligner(str(path))
    mel = np.random.RandomState(0).randn(1, 30, 80).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.tensor(mel)).numpy()
    got = Aligner().apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-4)


def test_checkpoint_config_three_way_fallback(tmp_path):
    """The reference tolerates multilingual -> multispeaker-only ->
    single-speaker checkpoints (ToucanTTSInterface.py:56-63); the loader
    detects each variant from the state-dict layout."""
    import torch

    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.ToucanTTS.ToucanTTS")
    from toucan_tpu.compat.load import load_toucan_tts, sniff_toucan_config
    from toucan_tpu.compat import load as load_mod
    from toucan_tpu.models import ToucanTTS

    torch.manual_seed(0)
    variants = {
        "multilingual": dict(),
        "multispeaker": dict(lang_embs=None),
        "singlespeaker": dict(lang_embs=None, utt_embed_dim=None),
    }
    for name, kwargs in variants.items():
        ref = ref_mod.ToucanTTS(encoder_layers=1, decoder_layers=1,
                                pitch_predictor_layers=1, **kwargs)
        ref.eval()
        path = tmp_path / f"{name}.pt"
        torch.save({"model": ref.state_dict(),
                    "default_emb": torch.randn(64)}, path)
        sd = load_mod._to_numpy_state_dict(ref.state_dict())
        config = sniff_toucan_config(sd)
        if name == "multilingual":
            assert config.lang_embs == 8000 and config.utt_embed_dim == 64
        elif name == "multispeaker":
            assert config.lang_embs is None and config.utt_embed_dim == 64
        else:
            assert config.lang_embs is None and config.utt_embed_dim is None
            assert not config.conditional_predictors

        # full loader path (converter defaults are full-size; re-convert at
        # the variant's layer counts to actually apply the model)
        from toucan_tpu.compat.torch_toucan import convert_toucan_tts
        import dataclasses
        import jax
        config = dataclasses.replace(config, enc_layers=1, dec_layers=1,
                                     pitch_layers=1)
        variables = jax.tree.map(jnp.asarray, convert_toucan_tts(
            sd, enc_layers=1, dec_layers=1, pitch_layers=1,
            conditional=config.conditional_predictors))
        model = ToucanTTS(config)
        rng = np.random.RandomState(0)
        text = (rng.rand(5, 62) > 0.5).astype(np.float32)
        import torch as _t
        with _t.no_grad():
            kw = {}
            if config.utt_embed_dim is not None:
                kw["utterance_embedding"] = _t.zeros(64)
            if config.lang_embs is not None:
                kw["lang_id"] = _t.tensor([3])
            r_before = ref.inference(_t.tensor(text),
                                     return_duration_pitch_energy=True,
                                     run_postflow=False, **kw)[0]
        jkw = {}
        if config.utt_embed_dim is not None:
            jkw["utterance_embedding"] = jnp.zeros((1, 64))
        if config.lang_embs is not None:
            jkw["lang_ids"] = jnp.full((1, 1), 3, jnp.int32)
        frames = int(r_before.shape[0])
        outs = model.apply(variables, jnp.asarray(text[None]),
                           jnp.asarray([5]), frames + 2 + frames % 2,
                           run_glow=False, method=ToucanTTS.infer, **jkw)
        before = outs[0]
        np.testing.assert_allclose(np.asarray(before)[0, :frames],
                                   r_before.numpy(), atol=3e-4, rtol=1e-3)
