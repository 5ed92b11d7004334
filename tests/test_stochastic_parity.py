"""StochasticToucanTTS / spline-flow parity vs the PyTorch reference."""

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax
import jax.numpy as jnp

from toucan_tpu.nn.stochastic_flows import (
    StochasticVariancePredictor,
    unconstrained_rational_quadratic_spline,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


def test_spline_matches_reference():
    import torch
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.StochasticToucanTTS."
        "StochasticVariancePredictor")
    rng = np.random.RandomState(0)
    shape = (2, 1, 20)
    inputs = (rng.randn(*shape) * 2).astype(np.float32)
    widths = rng.randn(*shape, 10).astype(np.float32)
    heights = rng.randn(*shape, 10).astype(np.float32)
    derivs = rng.randn(*shape, 9).astype(np.float32)

    for inverse in (False, True):
        expect, expect_lad = ref_mod.piecewise_rational_quadratic_transform(
            torch.tensor(inputs), torch.tensor(widths), torch.tensor(heights),
            torch.tensor(derivs), inverse=inverse, tails="linear", tail_bound=5.0)
        got, got_lad = unconstrained_rational_quadratic_spline(
            jnp.asarray(inputs), jnp.asarray(widths), jnp.asarray(heights),
            jnp.asarray(derivs), inverse=inverse, tail_bound=5.0)
        np.testing.assert_allclose(np.asarray(got), expect.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_lad), expect_lad.numpy(), atol=2e-4)


@pytest.fixture(scope="module")
def svp_pair():
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.StochasticToucanTTS."
        "StochasticVariancePredictor")
    ref = ref_mod.StochasticVariancePredictor(in_channels=32, kernel_size=5,
                                              p_dropout=0.0, n_flows=3,
                                              conditioning_signal_channels=16)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = StochasticVariancePredictor(in_channels=32, kernel_size=5, dropout=0.0,
                                        n_flows=3, cond_channels=16)
    from toucan_tpu.compat.torch_stochastic import convert_stochastic_predictor
    variables = jax.tree.map(jnp.asarray,
                             convert_stochastic_predictor(sd, n_flows=3, n_post_flows=4))
    return ref, model, variables


def test_stochastic_predictor_sample_parity(svp_pair):
    """Reverse (sampling) path with identical injected noise."""
    import torch
    ref, model, variables = svp_pair
    rng = np.random.RandomState(1)
    b, t, c = 2, 9, 32
    x = rng.randn(b, t, c).astype(np.float32)
    gcond = rng.randn(b, 16).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    noise = rng.randn(b, t, 2).astype(np.float32) * 0.3

    with torch.no_grad():
        expect = ref(torch.tensor(x.transpose(0, 2, 1)),
                     torch.tensor(mask.transpose(0, 2, 1)), w=None,
                     g=torch.tensor(gcond)[..., None], reverse=True,
                     noise_scale=1.0)  # noise injected manually below

    # reference draws z inside; redo its reverse manually with our noise
    with torch.no_grad():
        xt = ref.pre(torch.tensor(x.transpose(0, 2, 1)))
        xt = xt + ref.cond(torch.tensor(gcond)[..., None])
        xt = ref.convs(xt, torch.tensor(mask.transpose(0, 2, 1)))
        xt = ref.proj(xt) * torch.tensor(mask.transpose(0, 2, 1))
        flows = list(reversed(ref.flows))
        flows = flows[:-2] + [flows[-1]]
        z = torch.tensor(noise.transpose(0, 2, 1))
        for flow in flows:
            z = flow(z, torch.tensor(mask.transpose(0, 2, 1)), g=xt, reverse=True)
        expect = z[:, :1].numpy().transpose(0, 2, 1)

    got = model.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                      g=jnp.asarray(gcond)[:, None, :],
                      rng=jax.random.PRNGKey(0), noise_scale=1.0,
                      method=StochasticVariancePredictor.sample)
    # replace our rng draw with the same noise: re-run via custom method
    import flax.linen as nn

    class _Sampler(StochasticVariancePredictor):
        def __call__(self, x, mask, g, z):
            x = self._condition(x, mask, g)
            from toucan_tpu.nn.stochastic_flows import _flip
            for flow in list(reversed(self.conv_flows))[:-1]:
                z = _flip(z)
                z = flow(z, mask, g=x, reverse=True)
            z = _flip(z)
            z = self.affine(z, mask, reverse=True)
            return z[..., :1]

    sampler = _Sampler(in_channels=32, kernel_size=5, dropout=0.0, n_flows=3,
                       cond_channels=16)
    got = sampler.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                        jnp.asarray(gcond)[:, None, :], jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(got), expect, atol=3e-4)


def test_stochastic_predictor_nll_parity(svp_pair):
    """Forward (NLL) path with identical injected posterior noise."""
    import torch
    ref, model, variables = svp_pair
    rng = np.random.RandomState(2)
    b, t, c = 2, 7, 32
    x = rng.randn(b, t, c).astype(np.float32)
    gcond = rng.randn(b, 16).astype(np.float32)
    mask = np.ones((b, t, 1), np.float32)
    w = np.abs(rng.randn(b, t, 1)).astype(np.float32) + 1.0
    e_q = rng.randn(b, t, 2).astype(np.float32)

    # run the reference with a monkeypatched randn producing our e_q
    with torch.no_grad():
        orig_randn = torch.randn
        try:
            torch.randn = lambda *shape, **kw: orig_randn(*shape, **kw) * 0 + \
                torch.tensor(e_q.transpose(0, 2, 1))
            expect = ref(torch.tensor(x.transpose(0, 2, 1)),
                         torch.tensor(mask.transpose(0, 2, 1)),
                         w=torch.tensor(w.transpose(0, 2, 1)),
                         g=torch.tensor(gcond)[..., None]).numpy()
        finally:
            torch.randn = orig_randn

    class _NLL(StochasticVariancePredictor):
        def __call__(self, x, mask, w, g, e_q):
            import types
            import jax as _jax
            fake_rng = object()
            orig_normal = _jax.random.normal
            try:
                _jax.random.normal = lambda *a, **k: jnp.asarray(e_q)
                return self.nll(x, mask, w, g=g, rng=_jax.random.PRNGKey(0))
            finally:
                _jax.random.normal = orig_normal

    nll_model = _NLL(in_channels=32, kernel_size=5, dropout=0.0, n_flows=3,
                     cond_channels=16)
    got = nll_model.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                          jnp.asarray(w), jnp.asarray(gcond)[:, None, :], e_q)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-3)


@pytest.fixture(scope="module")
def full_pair():
    """Tiny full StochasticToucanTTS on both sides with converted weights."""
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.StochasticToucanTTS."
        "StochasticToucanTTS")
    ref = ref_mod.StochasticToucanTTS(encoder_layers=2, decoder_layers=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from toucan_tpu.compat.torch_stochastic import convert_stochastic_toucan_tts
    from toucan_tpu.models.stochastic_toucan_tts import StochasticToucanTTS
    from toucan_tpu.models.toucan_tts import ToucanTTSConfig

    cfg = ToucanTTSConfig(enc_layers=2, dec_layers=2)
    model = StochasticToucanTTS(cfg)
    variables = jax.tree.map(jnp.asarray,
                             convert_stochastic_toucan_tts(sd, enc_layers=2,
                                                           dec_layers=2))
    return ref, model, variables


def test_stochastic_full_model_inference_parity(full_pair):
    """End-to-end inference parity with identical noise injected into all
    three variance flows and the glow (reference inference path:
    ``StochasticToucanTTS.py:281-306``, flows' reverse draw at
    ``StochasticVariancePredictor.py:110``)."""
    import torch
    ref, model, variables = full_pair
    from toucan_tpu.models.stochastic_toucan_tts import StochasticToucanTTS

    rng = np.random.RandomState(3)
    t = 7
    text = (rng.rand(t, 62) > 0.5).astype(np.float32)
    # ensure a word boundary and both voiced/unvoiced phones appear
    utt = rng.randn(64).astype(np.float32)
    lang = np.array([4])

    with torch.no_grad():
        torch.manual_seed(11)
        r_before, r_after, r_dur, r_pitch, r_energy = ref._forward(
            torch.tensor(text[None]), torch.tensor([t]), None,
            is_inference=True, utterance_embedding=torch.tensor(utt[None]),
            lang_ids=torch.tensor(lang[None]), run_glow=True)

    mel_len = int(r_dur.sum())
    assert mel_len > 0

    # replay the reference's four draws in order (pitch, energy, duration
    # flows draw (1, 2, T); the glow reverse draws (1, 80, L) * 0.8)
    torch.manual_seed(11)
    z_pitch = torch.randn(1, 2, t).numpy().transpose(0, 2, 1)
    z_energy = torch.randn(1, 2, t).numpy().transpose(0, 2, 1)
    z_dur = torch.randn(1, 2, t).numpy().transpose(0, 2, 1)
    z_glow = (torch.randn(1, 80, mel_len) * 0.8).numpy().transpose(0, 2, 1)

    max_frames = mel_len + 8 - (mel_len % 2)
    z_pad = np.zeros((1, max_frames, 80), np.float32)
    z_pad[:, :mel_len] = z_glow

    queue = [jnp.asarray(z) for z in (z_pitch, z_energy, z_dur)]
    orig_normal = jax.random.normal
    try:
        jax.random.normal = lambda *a, **k: queue.pop(0)
        before, after, dur, pit, ene, lens = model.apply(
            variables, jnp.asarray(text[None]), jnp.asarray(np.array([t])),
            max_frames, utterance_embedding=jnp.asarray(utt[None]),
            lang_ids=jnp.asarray(lang[None]), glow_noise=jnp.asarray(z_pad),
            run_glow=True, method=StochasticToucanTTS.infer)
    finally:
        jax.random.normal = orig_normal

    # the reference inference path returns squeezed (T,) / (L, 80) tensors
    np.testing.assert_array_equal(np.asarray(dur)[0], r_dur.numpy())
    np.testing.assert_allclose(np.asarray(pit)[0, :, 0], r_pitch.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(ene)[0, :, 0], r_energy.numpy(),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(before)[0, :mel_len],
                               r_before.numpy()[:mel_len], atol=5e-4)
    even_len = int(lens[0])
    assert even_len == (mel_len // 2) * 2
    # untrained glow weights blow the output scale up to ~1e4; relative
    np.testing.assert_allclose(np.asarray(after)[0, :even_len],
                               r_after.numpy()[:even_len], rtol=3e-5, atol=5e-3)
