"""Vocoder parity vs the PyTorch reference (random weights, converted)."""

import sys
import types

import numpy as np
import pytest

from tests.conftest import import_reference_module, reference_available

import jax
import jax.numpy as jnp

from toucan_tpu.compat.torch_vocoder import convert_bigvgan, convert_hifigan
from toucan_tpu.models.vocoders import BigVGAN, HiFiGANGenerator

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference not mounted")


@pytest.mark.parametrize("use_pallas", [False, True])
def test_hifigan_parity(use_pallas):
    import torch
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Wave.HiFiGAN.HiFiGAN")
    ref = ref_mod.HiFiGANGenerator()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    mel = np.random.RandomState(0).randn(2, 30, 80).astype(np.float32)
    with torch.no_grad():
        r_wave, r_x2, r_x1 = ref(torch.tensor(mel.transpose(0, 2, 1)))

    model = HiFiGANGenerator(use_pallas=use_pallas)
    variables = jax.tree.map(jnp.asarray, convert_hifigan(sd))
    wave, x2, x1 = model.apply(variables, jnp.asarray(mel), return_intermediates=True)

    assert wave.shape == (2, 30 * 384, 1)
    np.testing.assert_allclose(np.asarray(wave)[..., 0], r_wave.numpy()[:, 0, :],
                               atol=2e-5 if not use_pallas else 2e-4)
    np.testing.assert_allclose(np.asarray(x1)[..., 0], r_x1.numpy()[:, 0, :], atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2)[..., 0], r_x2.numpy()[:, 0, :], atol=2e-4)


def _install_alias_free_stub():
    """A faithful torch implementation of alias_free_torch.Activation1d, used
    only to let the reference BigVGAN run for the parity test."""
    import math
    import torch
    import torch.nn.functional as F

    def kaiser_sinc_filter1d(cutoff, half_width, kernel_size):
        even = kernel_size % 2 == 0
        half_size = kernel_size // 2
        delta_f = 4 * half_width
        A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
        if A > 50.0:
            beta = 0.1102 * (A - 8.7)
        elif A >= 21.0:
            beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
        else:
            beta = 0.0
        window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
        if even:
            time = torch.arange(-half_size, half_size) + 0.5
        else:
            time = torch.arange(kernel_size) - half_size
        filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
        filt /= filt.sum()
        return filt.view(1, 1, kernel_size)

    class Activation1d(torch.nn.Module):
        def __init__(self, activation, up_ratio=2, down_ratio=2,
                     up_kernel_size=12, down_kernel_size=12):
            super().__init__()
            self.act = activation
            self.up_ratio, self.down_ratio = up_ratio, down_ratio
            self.up_k, self.down_k = up_kernel_size, down_kernel_size
            self.register_buffer("up_filter",
                                 kaiser_sinc_filter1d(0.5 / up_ratio, 0.6 / up_ratio,
                                                      up_kernel_size))
            self.register_buffer("down_filter",
                                 kaiser_sinc_filter1d(0.5 / down_ratio, 0.6 / down_ratio,
                                                      down_kernel_size))

        def forward(self, x):
            _, C, _ = x.shape
            ratio, k = self.up_ratio, self.up_k
            pad = k // ratio - 1
            pad_left = pad * ratio + (k - ratio) // 2
            pad_right = pad * ratio + (k - ratio + 1) // 2
            h = F.pad(x, (pad, pad), mode="replicate")
            h = ratio * F.conv_transpose1d(h, self.up_filter.expand(C, -1, -1),
                                           stride=ratio, groups=C)
            h = h[..., pad_left:h.shape[-1] - pad_right]
            h = self.act(h)
            k = self.down_k
            even = k % 2 == 0
            h = F.pad(h, (k // 2 - int(even), k // 2), mode="replicate")
            return F.conv1d(h, self.down_filter.expand(C, -1, -1),
                            stride=self.down_ratio, groups=C)

    mod = types.ModuleType("alias_free_torch")
    mod.Activation1d = Activation1d
    mod.nn = __import__("torch").nn
    mod.torch = __import__("torch")
    sys.modules["alias_free_torch"] = mod


def test_bigvgan_parity():
    import torch
    _install_alias_free_stub()
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Wave.BigVGAN.BigVGAN")
    ref = ref_mod.BigVGAN()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # make snake alphas nontrivial so the activation actually gets exercised
    rng = np.random.RandomState(1)
    for k in list(sd):
        if k.endswith(("alpha", "beta")):
            sd[k] = rng.randn(*sd[k].shape).astype(np.float32) * 0.1
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})

    mel = np.random.RandomState(0).randn(1, 20, 80).astype(np.float32)
    with torch.no_grad():
        r_wave, r_x2, r_x1 = ref(torch.tensor(mel.transpose(0, 2, 1)))

    model = BigVGAN()
    variables = jax.tree.map(jnp.asarray, convert_bigvgan(sd))
    wave, x2, x1 = model.apply(variables, jnp.asarray(mel), return_intermediates=True)

    assert wave.shape == (1, 20 * 384, 1)
    np.testing.assert_allclose(np.asarray(wave)[..., 0], r_wave.numpy()[:, 0, :], atol=2e-5)
    np.testing.assert_allclose(np.asarray(x1)[..., 0], r_x1.numpy()[:, 0, :], atol=2e-4)
    np.testing.assert_allclose(np.asarray(x2)[..., 0], r_x2.numpy()[:, 0, :], atol=2e-4)
