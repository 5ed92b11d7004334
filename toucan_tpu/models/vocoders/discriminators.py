"""Vocoder discriminators: MSD + MPD + Avocodo CoMBD + SubBand (PQMF).

Behavioral equivalents of the reference stacks
(``Spectrogram_to_Wave/HiFiGAN/HiFiGAN_Discriminators.py`` and
``Spectrogram_to_Wave/Avocodo/AvocodoDiscriminators.py``).  These are
training-time critics; every conv carries the reference's weight-norm
reparameterization (torch weight_g/weight_v semantics), and the first
multi-scale discriminator uses spectral norm ("follow_official_norm",
``HiFiGAN_Discriminators.py:365-372``) — see ``toucan_tpu/nn/param_norm.py``.

All modules take (B, T, 1) waves and return lists of per-layer feature
maps with the final score tensor last, matching the loss conventions of
``AdversarialLosses.py`` / ``FeatureMatchingLoss.py``.
"""

from functools import lru_cache
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from toucan_tpu.nn.param_norm import NormedConv


def _lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------- periods

class PeriodDiscriminator(nn.Module):
    period: int
    channels: int = 32
    kernel_size: int = 5
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, T, 1) -> list of fmaps + flattened score."""
        b, t, c = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, c)  # (B, T/P, P, C)

        outs = []
        ch = self.channels
        for i, scale in enumerate(self.downsample_scales):
            x = NormedConv(ch, (self.kernel_size, 1), strides=(scale, 1),
                           padding=(((self.kernel_size - 1) // 2,) * 2, (0, 0)),
                           dtype=self.dtype, name=f"conv_{i}")(x)
            x = _lrelu(x)
            outs.append(x)
            ch = min(ch * 4, self.max_channels)
        x = NormedConv(1, (2, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                       name="output_conv")(x)
        outs.append(x.reshape(b, -1))
        return outs


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    channels: int = 32
    max_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return [PeriodDiscriminator(p, channels=self.channels,
                                    max_channels=self.max_channels,
                                    dtype=self.dtype, name=f"period_{p}")(x)
                for p in self.periods]


# ----------------------------------------------------------------- scales

class ScaleDiscriminator(nn.Module):
    channels: int = 128
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    downsample_scales: Sequence[int] = (4, 4, 4, 4, 1)
    max_channels: int = 1024
    max_groups: int = 16
    norm: str = "weight"  # "spectral" for the first scale (official norm)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        x = NormedConv(self.channels, (self.kernel_sizes[0],), norm=self.norm,
                       dtype=self.dtype, name="conv_first")(x)
        x = _lrelu(x)
        outs.append(x)
        in_chs = self.channels
        out_chs = self.channels
        groups = 4
        for i, scale in enumerate(self.downsample_scales):
            x = NormedConv(out_chs, (self.kernel_sizes[1],), strides=(scale,),
                           feature_group_count=groups, norm=self.norm,
                           dtype=self.dtype, name=f"down_{i}")(x)
            x = _lrelu(x)
            outs.append(x)
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_channels)
            groups = min(groups * 4, self.max_groups)
        out_chs = min(in_chs * 2, self.max_channels)
        x = NormedConv(out_chs, (self.kernel_sizes[2],), norm=self.norm,
                       dtype=self.dtype, name="post_conv")(x)
        x = _lrelu(x)
        outs.append(x)
        x = NormedConv(1, (self.kernel_sizes[3],), norm=self.norm,
                       dtype=self.dtype, name="output_conv")(x)
        outs.append(x)
        return outs


class MultiScaleDiscriminator(nn.Module):
    scales: int = 3
    channels: int = 128
    max_channels: int = 1024
    follow_official_norm: bool = True  # scale 0 spectral, others weight norm
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.scales):
            norm = "spectral" if (self.follow_official_norm and i == 0) \
                else "weight"
            outs.append(ScaleDiscriminator(channels=self.channels,
                                           max_channels=self.max_channels,
                                           norm=norm,
                                           dtype=self.dtype, name=f"scale_{i}")(x))
            # AvgPool1d(kernel=4, stride=2, padding=2)
            x = nn.avg_pool(x, (4,), strides=(2,), padding=((2, 2),),
                            count_include_pad=True)
        return outs


# ------------------------------------------------------------------- PQMF

@lru_cache(maxsize=None)
def pqmf_analysis_filters(n: int, taps: int, cutoff: float, beta: float) -> np.ndarray:
    """(n, taps+1) cosine-modulated kaiser prototype filterbank
    (reference PQMF, AvocodoDiscriminators.py:225-265)."""
    from scipy.signal import firwin
    qmf = firwin(taps + 1, cutoff, window=("kaiser", beta))
    h = np.zeros((n, taps + 1))
    for k in range(n):
        factor = ((2 * k + 1) * (np.pi / (2 * n))
                  * (np.arange(taps + 1) - (taps - 1) / 2))
        h[k] = 2 * qmf * np.cos(factor + (-1) ** k * np.pi / 4)
    return h.astype(np.float32)


def pqmf_analysis(x: jnp.ndarray, n: int, taps: int = 62, cutoff: float = 0.15,
                  beta: float = 9.0) -> jnp.ndarray:
    """x (B, T, 1) -> (B, T//n, n) critically-sampled subbands."""
    filt = jnp.asarray(pqmf_analysis_filters(n, taps, cutoff, beta))
    kernel = filt.T[:, None, :]  # (taps+1, 1, n)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(n,), padding=[(taps // 2, taps // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"))


# ------------------------------------------------------------------ CoMBD

class CoMBD(nn.Module):
    filters: Sequence[int] = (16, 64, 256, 1024, 1024, 1024)
    kernels: Sequence[int] = (7, 11, 11, 11, 11, 5)
    groups: Sequence[int] = (1, 4, 16, 64, 256, 1)
    strides: Sequence[int] = (1, 1, 4, 4, 4, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fmap = []
        for i, (f, k, g, s) in enumerate(zip(self.filters, self.kernels,
                                             self.groups, self.strides)):
            x = NormedConv(f, (k,), strides=(s,), feature_group_count=g,
                           dtype=self.dtype, name=f"conv_{i}")(x)
            x = _lrelu(x)
            fmap.append(x)
        score = NormedConv(1, (3,), dtype=self.dtype, name="conv_post")(x)
        return score.reshape(score.shape[0], -1), fmap


class MultiCoMBDiscriminator(nn.Module):
    """Collaborative multi-band critic: full-band + PQMF-band inputs paired
    with the generator's intermediate upsampling taps."""

    filters: Sequence[int] = (16, 64, 256, 1024, 1024, 1024)
    groups: Sequence[int] = (1, 4, 16, 64, 256, 1)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kernels = [(7, 11, 11, 11, 11, 5), (11, 21, 21, 21, 21, 5),
                   (15, 41, 41, 41, 41, 5)]
        self.combd_1 = CoMBD(filters=self.filters, kernels=kernels[0],
                             groups=self.groups, dtype=self.dtype)
        self.combd_2 = CoMBD(filters=self.filters, kernels=kernels[1],
                             groups=self.groups, dtype=self.dtype)
        self.combd_3 = CoMBD(filters=self.filters, kernels=kernels[2],
                             groups=self.groups, dtype=self.dtype)

    def __call__(self, wave_final, upsampled_twice=None, upsampled_once=None):
        """Returns list of [*fmaps, score] lists (score appended so the
        shared loss conventions see it at index -1)."""
        outs = []
        s3, f3 = self.combd_3(wave_final)
        outs.append(f3 + [s3])
        x2 = pqmf_analysis(wave_final, 2, taps=256, cutoff=0.25, beta=10.0)[..., :1]
        x1 = pqmf_analysis(wave_final, 8, taps=192, cutoff=0.13, beta=10.0)[..., :1]
        if upsampled_twice is not None and upsampled_once is not None:
            s2i, f2i = self.combd_2(upsampled_twice)
            outs.append(f2i + [s2i])
            s1i, f1i = self.combd_1(upsampled_once)
            outs.append(f1i + [s1i])
        else:
            s2i, f2i = self.combd_2(x2)
            outs.append(f2i + [s2i])
            s1i, f1i = self.combd_1(x1)
            outs.append(f1i + [s1i])
        s2, f2 = self.combd_2(x2)
        outs.append(f2 + [s2])
        s1, f1 = self.combd_1(x1)
        outs.append(f1 + [s1])
        return outs


# ---------------------------------------------------------------- SubBand

class MDC(nn.Module):
    channel: int
    kernel: int
    stride: int
    dilations: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        acc = 0.0
        for i, d in enumerate(self.dilations):
            acc = acc + NormedConv(self.channel, (self.kernel,),
                                   kernel_dilation=(d,), dtype=self.dtype,
                                   name=f"conv_{i}")(x)
        x = acc / len(self.dilations)
        x = NormedConv(self.channel, (3,), strides=(self.stride,),
                       dtype=self.dtype, name="conv_out")(x)
        return _lrelu(x)


class SubBandDiscriminator(nn.Module):
    channels: Sequence[int]
    kernel: int
    strides: Sequence[int]
    dilations: Sequence[Sequence[int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fmap = []
        for i, (ch, s, dil) in enumerate(zip(self.channels, self.strides,
                                             self.dilations)):
            x = MDC(ch, self.kernel, s, dil, dtype=self.dtype, name=f"mdc_{i}")(x)
            fmap.append(x)
        score = NormedConv(1, (3,), dtype=self.dtype, name="conv_post")(x)
        return score.reshape(score.shape[0], -1), fmap


class MultiSubBandDiscriminator(nn.Module):
    tsubband: Sequence[int] = (6, 11, 16)
    n: int = 16
    m: int = 64
    channel_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        s = self.channel_scale
        tch = tuple(max(16, int(c * s) // 16 * 16) for c in (64, 128, 256, 256, 256))
        fch = tuple(max(16, int(c * s) // 16 * 16) for c in (32, 64, 128, 128, 128))
        tstr = (1, 1, 3, 3, 1)
        self.tsbd1 = SubBandDiscriminator(tch, 7, tstr,
                                          ((5, 7, 11),) * 5, dtype=self.dtype)
        self.tsbd2 = SubBandDiscriminator(tch, 5, tstr,
                                          ((3, 5, 7),) * 5, dtype=self.dtype)
        self.tsbd3 = SubBandDiscriminator(tch, 3, tstr,
                                          ((1, 2, 3),) * 5, dtype=self.dtype)
        self.fsbd = SubBandDiscriminator(fch, 5, tstr,
                                         ((1, 2, 3), (1, 2, 3), (1, 2, 3),
                                          (2, 3, 5), (2, 3, 5)), dtype=self.dtype)

    def __call__(self, wave):
        outs = []
        xn = pqmf_analysis(wave, self.n, taps=256, cutoff=0.03, beta=10.0)
        for tsb, disc in [(self.tsubband[2], self.tsbd3),
                          (self.tsubband[1], self.tsbd2),
                          (self.tsubband[0], self.tsbd1)]:
            score, fmap = disc(xn[..., :tsb])
            outs.append(fmap + [score])
        xm = pqmf_analysis(wave, self.m, taps=256, cutoff=0.1, beta=9.0)
        # frequency analysis: transpose time<->band (reference :137)
        score, fmap = self.fsbd(xm.transpose(0, 2, 1))
        outs.append(fmap + [score])
        return outs


# ------------------------------------------------------------------ joint

class AvocodoJointDiscriminator(nn.Module):
    """MSD + MPD + CoMBD + SubBand, as in the reference joint critic
    (``HiFiGAN_Discriminators.py:473-568``).

    ``channel_scale`` < 1 shrinks every critic's width proportionally —
    production uses 1.0; tests use small scales to keep compiles cheap.
    """

    channel_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        s = self.channel_scale

        def sc(n):
            # multiples of 16 keep every grouped conv's channel counts valid
            return max(16, int(n * s) // 16 * 16)

        self.msd = MultiScaleDiscriminator(channels=sc(128), max_channels=sc(1024),
                                           dtype=self.dtype)
        self.mpd = MultiPeriodDiscriminator(channels=sc(32), max_channels=sc(1024),
                                            dtype=self.dtype)
        groups = (1, 4, 16, 64, 256, 1) if s == 1.0 else (1, 4, 4, 4, 4, 1)
        self.mcmbd = MultiCoMBDiscriminator(
            filters=tuple(sc(f) for f in (16, 64, 256, 1024, 1024, 1024)),
            groups=groups, dtype=self.dtype)
        self.msbd = MultiSubBandDiscriminator(channel_scale=s, dtype=self.dtype)

    def __call__(self, wave, upsampled_twice=None, upsampled_once=None):
        return (self.msd(wave) + self.mpd(wave)
                + self.mcmbd(wave, upsampled_twice, upsampled_once)
                + self.msbd(wave))
