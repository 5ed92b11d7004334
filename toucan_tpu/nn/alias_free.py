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

from toucan_tpu.kernels.folded_conv import fold_time, folded_conv, unfold_time


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
    filt = filt.astype(x.dtype)
    kernel = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)


def upsample2(x, ratio: int = 2, kernel_size: int = 12):
    """Sinc interpolation by ``ratio`` with replicate edge padding."""
    filt = jnp.asarray(kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size),
                       dtype=x.dtype)
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


# sin^2(pi t) = z * P(z), z = t^2, t in [-0.5, 0.5]; max abs err 6.8e-8
# (Chebyshev fit).  jnp.sin costs ~2.3 ms per pass over a vocoder stage on
# the VPU (measured, BENCH_NOTES.md); this 6-term even polynomial with
# period-pi range reduction is ~5x cheaper and fuses into conv epilogues.
_SIN_SQ_COEFS = (9.869604338201981, -32.46967731890368, 42.72741895949323,
                 -30.104237595081692, 13.063995182628235, -3.3807205898726918)


def sin_sq(y):
    """sin(y)^2 to ~7e-8 absolute accuracy, cheap on TPU VPUs."""
    dtype = y.dtype
    t = y.astype(jnp.float32) * jnp.float32(1.0 / np.pi)
    t = t - jnp.floor(t + 0.5)  # period-pi reduction; continuous at t=+-0.5
    z = t * t
    p = jnp.float32(_SIN_SQ_COEFS[-1])
    for coef in _SIN_SQ_COEFS[-2::-1]:
        p = p * z + jnp.float32(coef)
    return (z * p).astype(dtype)


def snake_beta(x, alpha, beta, logscale: bool = True, eps: float = 1e-9):
    """SnakeBeta activation x + sin^2(alpha x) / beta (per channel)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + eps)) * sin_sq(x * alpha)


# ---------------------------------------------------------------------------
# MXU (folded phase-conv) formulation.
#
# The 2x-rate signal never needs to exist: up/down split into two 6-tap
# polyphase FIRs per direction, each expressible as a 7-tap *dense folded*
# conv (diagonal channel structure, block-Toeplitz over fold slots — see
# kernels/folded_conv.py) running on >=128 MXU lanes, and Snake applies to
# the two phase arrays elementwise in folded layout.  Measured ~2x faster
# than the grouped-conv FIRs on the C<128 vocoder stages.  folded_conv
# zero-pads where the reference replicates edges, so the first/last samples
# are patched with the exact shifted-add computation on small edge windows.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _phase_filters():
    """12-tap up/down kaiser-sinc filters as 4 centered 7-tap phase FIRs.

    up:   y[2u+r] = 2 * sum_q filt[11-2q-r] * x[u + (q+r-3)]
    down: z[t]    = sum_m filt[2m+1] * even[t + (m-2)] + filt[2m] * odd[t + (m-3)]
    (derivations verified exactly against upsample2/downsample2 in
    tests/test_bigvgan_folded.py)
    """
    filt = kaiser_sinc_filter(0.25, 0.3, 12)
    k_up0 = np.zeros(7, np.float32)
    k_up1 = np.zeros(7, np.float32)
    k_dn_even = np.zeros(7, np.float32)
    k_dn_odd = np.zeros(7, np.float32)
    for q in range(6):
        k_up0[q] = 2.0 * filt[11 - 2 * q]          # offset q-3
        k_up1[q + 1] = 2.0 * filt[11 - 2 * q - 1]  # offset q-2
        k_dn_even[q + 1] = filt[2 * q + 1]         # offset q-2
        k_dn_odd[q] = filt[2 * q]                  # offset q-3
    return k_up0, k_up1, k_dn_even, k_dn_odd


def _diag_kernel(taps: np.ndarray, c: int, dtype) -> jnp.ndarray:
    return jnp.asarray(taps[:, None, None] * np.eye(c, dtype=np.float32)[None],
                       dtype)


def alias_free_snake_folded(x_folded, alpha, beta, f: int, logscale: bool = True,
                            pallas: bool = False, pallas_interpret: bool = False):
    """Activation1d equivalent on a time-folded (B, T/f, f*C) sequence.

    Interior samples come from the MXU phase-conv path (or, with
    ``pallas=True``, the fused VPU kernel in ``kernels/pallas_aliasfree.py``
    — same zero-pad semantics, no intermediate HBM round-trips); the <=6
    samples at each sequence edge (where zero padding differs from the
    reference's replicate padding) are recomputed exactly and stitched back
    in at fold-block granularity.
    """
    fc = x_folded.shape[-1]
    c = fc // f
    if pallas:
        from toucan_tpu.kernels.pallas_aliasfree import (
            fused_alias_free_snake_interior,
        )

        z = fused_alias_free_snake_interior(
            x_folded, alpha, beta, f, logscale, interpret=pallas_interpret)
    else:
        # batched-phase formulation (round-3, measured −14% full-model):
        # ONE folded conv lifts x to [even|odd] on 2fC lanes, snake runs
        # once over both phases, ONE folded conv folds them back — same
        # taps/FLOPs as four separate convs, half the conv dispatches and
        # intermediate tensors
        k0, k1, kde, kdo = _phase_filters()
        up = jnp.concatenate([_diag_kernel(k0, c, x_folded.dtype),
                              _diag_kernel(k1, c, x_folded.dtype)], axis=2)
        dn = jnp.concatenate([_diag_kernel(kde, c, x_folded.dtype),
                              _diag_kernel(kdo, c, x_folded.dtype)], axis=1)
        alpha2 = jnp.tile(jnp.concatenate([alpha, alpha]), f)
        beta2 = jnp.tile(jnp.concatenate([beta, beta]), f)
        both = folded_conv(x_folded, up, jnp.zeros((2 * c,), x_folded.dtype),
                           f, 1)
        both = snake_beta(both, alpha2, beta2, logscale)
        z = folded_conv(both, dn, jnp.zeros((c,), x_folded.dtype), f, 1)

    # exact edge patch: w >= 6 samples, rounded up to whole fold blocks
    # (dynamic_update_slice, NOT concat — the 3-way concat copied the whole
    # tensor and cost ~19% of BigVGAN end-to-end; round-3 measurement)
    w = -(-6 // f) * f
    blocks = w // f
    win = w + 18  # dependency halo of z[0:w] is x[:w+12]; margin is free
    b, n, _ = x_folded.shape
    win_blocks = -(-win // f)  # ceil
    if n >= 2 * win_blocks:
        left = unfold_time(x_folded[:, :win_blocks], f)
        right = unfold_time(x_folded[:, -win_blocks:], f)
        zl = alias_free_snake_shifted(left, alpha, beta, logscale)[:, :w]
        zr = alias_free_snake_shifted(right, alpha, beta, logscale)[:, -w:]
        z = jax.lax.dynamic_update_slice(z, fold_time(zl, f).astype(z.dtype),
                                         (0, 0, 0))
        z = jax.lax.dynamic_update_slice(z, fold_time(zr, f).astype(z.dtype),
                                         (0, n - blocks, 0))
    else:  # sequence too short for interior/edge split: exact path throughout
        z = fold_time(alias_free_snake_shifted(
            unfold_time(x_folded, f), alpha, beta, logscale), f)
    return z


def alias_free_snake_shifted(x, alpha, beta, logscale: bool = True):
    """upsample2 -> SnakeBeta -> downsample2 via the shifted-add resamplers
    (exact replicate-edge semantics; used for edge patches and tests)."""
    x = upsample2_shifted(x)
    x = snake_beta(x, alpha, beta, logscale)
    return downsample2_shifted(x)


def alias_free_snake_dw(x, alpha, beta, logscale: bool = True):
    """Activation1d via depthwise 7-tap phase convs (no lhs dilation, no
    stride): the 2x-rate signal never materializes.  Zero-padded interior +
    exact edge patch, like the folded variant; best layout for channels
    around 256 where grouped convs are lane-efficient but the dilated
    transpose of ``upsample2`` is not.  Batched-phase: one grouped conv
    lifts to [even|odd] interleaved per channel, one folds back."""
    k0, k1, kde, kdo = _phase_filters()
    c = x.shape[-1]

    # up: groups of 1 -> 2 (channel c yields lanes 2c = even, 2c+1 = odd)
    up = jnp.stack([jnp.asarray(k0, x.dtype), jnp.asarray(k1, x.dtype)],
                   axis=-1)[:, None, :]                      # (7, 1, 2)
    up = jnp.tile(up, (1, 1, c))                             # (7, 1, 2C)
    both = jax.lax.conv_general_dilated(
        x, up, (1,), [(3, 3)], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c)
    a2 = jnp.repeat(alpha, 2)
    b2 = jnp.repeat(beta, 2)
    both = snake_beta(both, a2, b2, logscale)
    # down: groups of 2 -> 1 (kde on even lane, kdo on odd lane)
    dn = jnp.stack([jnp.asarray(kde, x.dtype), jnp.asarray(kdo, x.dtype)],
                   axis=-1)[:, :, None].reshape(7, 2, 1)     # (7, 2, 1)
    dn = jnp.tile(dn, (1, 1, c))                             # (7, 2, C)
    z = jax.lax.conv_general_dilated(
        both, dn, (1,), [(3, 3)], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c)

    w, win = 6, 24
    if x.shape[1] >= 2 * win:
        zl = alias_free_snake_shifted(x[:, :win], alpha, beta, logscale)[:, :w]
        zr = alias_free_snake_shifted(x[:, -win:], alpha, beta, logscale)[:, -w:]
        z = jax.lax.dynamic_update_slice(z, zl.astype(z.dtype), (0, 0, 0))
        z = jax.lax.dynamic_update_slice(z, zr.astype(z.dtype),
                                         (0, x.shape[1] - w, 0))
    else:
        z = alias_free_snake_shifted(x, alpha, beta, logscale)
    return z


def alias_free_snake(x, alpha, beta, logscale: bool = True):
    """upsample 2x -> SnakeBeta -> downsample 2x (Activation1d equivalent)."""
    x = upsample2(x)
    x = snake_beta(x, alpha, beta, logscale)
    return downsample2(x)
