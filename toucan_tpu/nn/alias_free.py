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


# ---------------------------------------------------------------------------
# Shifted-add (polyphase) formulation.
#
# The up/down FIRs share ONE 12-tap filter across all channels, so instead of
# a grouped conv (which XLA lowers poorly on TPU for small channel counts)
# each output is a sum of 6 scalar-weighted, edge-clamped time shifts of the
# input — pure VPU adds that XLA fuses, with no channel mixing at all.  This
# also makes the operation exact in *time-folded* layout (B, T/f, f*C): a
# time shift is a pad+slice on the unfolded view (a free reshape), while the
# adds run on >=128-lane arrays.  Derivations are checked exactly against the
# conv implementations above in tests/test_bigvgan_folded.py.
# ---------------------------------------------------------------------------


def _shift_edge(x, s: int):
    """x (B, T, C) -> x[t + s] with edge clamping (replicate padding)."""
    t = x.shape[1]
    if s == 0:
        return x
    if s > 0:
        return jnp.concatenate(
            [x[:, s:], jnp.repeat(x[:, -1:], s, axis=1)], axis=1)
    return jnp.concatenate(
        [jnp.repeat(x[:, :1], -s, axis=1), x[:, :t + s]], axis=1)


def upsample2_shifted(x, kernel_size: int = 12):
    """Exact ``upsample2(x, 2)`` via 2x6 scalar-weighted shifted adds.

    y[2u+r] = 2 * sum_q filt[11-2q-r] * x[u + q + r - 3]  (x edge-clamped).
    """
    assert kernel_size == 12, "shifted-add path is specialized to k=12"
    filt = kaiser_sinc_filter(0.25, 0.3, kernel_size)
    phases = []
    for r in range(2):
        acc = None
        for q in range(6):
            term = 2.0 * float(filt[11 - 2 * q - r]) * _shift_edge(x, q + r - 3)
            acc = term if acc is None else acc + term
        phases.append(acc)
    y = jnp.stack(phases, axis=2)  # (B, T, 2, C)
    return y.reshape(x.shape[0], 2 * x.shape[1], x.shape[2])


def downsample2_shifted(x, kernel_size: int = 12):
    """Exact ``downsample2(x, 2)`` via deinterleave + shifted adds.

    z[u] = sum_m filt[2m] * odd[u+m-3] + sum_m filt[2m+1] * even[u+m-2]
    where even/odd are the two input phases (edge clamping applied in the
    original, un-deinterleaved domain — reproduced exactly below).
    """
    assert kernel_size == 12, "shifted-add path is specialized to k=12"
    filt = kaiser_sinc_filter(0.25, 0.3, kernel_size)
    b, t, c = x.shape
    xv = x.reshape(b, t // 2, 2, c)
    even, odd = xv[:, :, 0], xv[:, :, 1]
    # Edge clamp in the 2x domain: left pad replicates x[0] (an *even* sample)
    # into both phases; right pad replicates x[-1] (an *odd* sample).
    acc = None
    for m in range(6):
        src_e = _shift_edge(even, m - 2)
        src_o = _shift_edge(odd, m - 3)
        # boundary corrections: odd phase shifted left pulls x[-1]=even[0]
        # at positions where the clamped 2x index was even; even phase
        # shifted right pulls x[T-1]=odd[-1] likewise.
        if m - 3 < 0:
            n = 3 - m
            src_o = jnp.concatenate(
                [jnp.repeat(even[:, :1], n, axis=1), odd[:, :odd.shape[1] - n]],
                axis=1)
        if m - 2 > 0:
            n = m - 2
            src_e = jnp.concatenate(
                [even[:, n:], jnp.repeat(odd[:, -1:], n, axis=1)], axis=1)
        term = float(filt[2 * m + 1]) * src_e + float(filt[2 * m]) * src_o
        acc = term if acc is None else acc + term
    return acc


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
