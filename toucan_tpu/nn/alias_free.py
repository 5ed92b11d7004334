"""Alias-free resampling (kaiser-windowed sinc) for Snake activations.

TPU-native equivalent of the ``alias_free_torch`` dependency used by the
reference BigVGAN (``TrainingInterfaces/Spectrogram_to_Wave/BigVGAN/AMP.py:8``):
activations are applied at 2x sample rate between a sinc interpolator and a
sinc low-pass decimator so the nonlinearity cannot fold harmonics above
Nyquist back into the band.  Filters are fixed (non-trainable) and the
up/down convolutions are grouped per-channel.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """(kernel_size,) low-pass FIR; matches alias_free_torch.filter semantics."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def _grouped_conv(x, filt, stride):
    """x (B, T, C) depthwise-filtered with the shared 1-D filter."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)


def upsample2(x, ratio: int = 2, kernel_size: int = 12):
    """Sinc interpolation by ``ratio`` with replicate edge padding."""
    filt = jnp.asarray(kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size))
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    c = x.shape[-1]
    kernel = jnp.broadcast_to(filt[::-1][:, None, None], (kernel_size, 1, c))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c)
    y = ratio * y
    return y[:, pad_left:y.shape[1] - pad_right]


def downsample2(x, ratio: int = 2, kernel_size: int = 12):
    """Sinc anti-alias low-pass + decimation by ``ratio``."""
    filt = jnp.asarray(kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size))
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _grouped_conv(x, filt, ratio)


def snake_beta(x, alpha, beta, logscale: bool = True, eps: float = 1e-9):
    """SnakeBeta activation x + sin^2(alpha x) / beta (per channel)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + eps)) * jnp.sin(x * alpha) ** 2


def alias_free_snake(x, alpha, beta, logscale: bool = True):
    """upsample 2x -> SnakeBeta -> downsample 2x (Activation1d equivalent)."""
    x = upsample2(x)
    x = snake_beta(x, alpha, beta, logscale)
    return downsample2(x)
