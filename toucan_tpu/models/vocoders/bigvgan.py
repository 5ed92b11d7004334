"""BigVGAN generator with anti-aliased SnakeBeta activations.

Behavioral equivalent of the reference
(``TrainingInterfaces/Spectrogram_to_Wave/BigVGAN/BigVGAN.py:19-121``,
``AMP.py:19-60``, ``Snake.py:10-69``): the HiFiGAN upsampling skeleton with
residual AMP blocks whose activations run at 2x rate between kaiser-sinc
resamplers; same Avocodo intermediate taps.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from toucan_tpu.nn.alias_free import alias_free_snake
from toucan_tpu.models.vocoders.hifigan import conv_transpose_1d


class AMPBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def act(xs, idx):
            alpha = self.param(f"alpha_{idx}", nn.initializers.zeros,
                               (self.channels,), self.dtype)
            beta = self.param(f"beta_{idx}", nn.initializers.zeros,
                              (self.channels,), self.dtype)
            return alias_free_snake(xs, alpha, beta, logscale=True)

        for i, dilation in enumerate(self.dilations):
            xt = act(x, 2 * i)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=dilation,
                         dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = act(xt, 2 * i + 1)
            xt = nn.Conv(self.channels, (self.kernel_size,), dtype=self.dtype,
                         name=f"conv2_{i}")(xt)
            x = xt + x
        return x


class BigVGAN(nn.Module):
    num_mels: int = 80
    channels: int = 512
    upsample_rates: Tuple[int, ...] = (8, 6, 4, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 12, 8, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, return_intermediates: bool = False):
        """c (B, T, 80) -> wave (B, 384*T, 1) [+ x2, x1 Avocodo taps]."""
        x = nn.Conv(self.channels, (7,), dtype=self.dtype, name="conv_pre")(c)
        x1 = x2 = None
        ch = self.channels
        for i, (scale, up_k) in enumerate(zip(self.upsample_rates,
                                              self.upsample_kernel_sizes)):
            ch = self.channels // (2 ** (i + 1))
            kernel = self.param(f"up_{i}_kernel", nn.initializers.normal(0.01),
                                (up_k, ch, self.channels // (2 ** i)), self.dtype)
            bias = self.param(f"up_{i}_bias", nn.initializers.zeros, (ch,), self.dtype)
            x = conv_transpose_1d(x, kernel, scale, (up_k - scale) // 2) + bias

            acc = 0.0
            for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                               self.resblock_dilations)):
                acc = acc + AMPBlock(ch, rk, dils, dtype=self.dtype,
                                     name=f"amp_{i}_{j}")(x)
            x = acc / len(self.resblock_kernel_sizes)
            if i == 1:
                x1 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x1")(x)
            elif i == 2:
                x2 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x2")(x)

        alpha = self.param("post_alpha", nn.initializers.zeros, (ch,), self.dtype)
        beta = self.param("post_beta", nn.initializers.zeros, (ch,), self.dtype)
        x = alias_free_snake(x, alpha, beta, logscale=True)
        x = nn.Conv(1, (7,), dtype=self.dtype, name="conv_post")(x)
        x = jnp.tanh(x)
        if return_intermediates:
            return x, x2, x1
        return x
