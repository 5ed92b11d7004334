"""BigVGAN generator with anti-aliased SnakeBeta activations.

Behavioral equivalent of the reference
(``TrainingInterfaces/Spectrogram_to_Wave/BigVGAN/BigVGAN.py:19-121``,
``AMP.py:19-60``, ``Snake.py:10-69``): the HiFiGAN upsampling skeleton with
residual AMP blocks whose activations run at 2x rate between kaiser-sinc
resamplers; same Avocodo intermediate taps.

TPU mapping: stages whose channel count falls below 128 run their dense
convs *time-folded* (block-Toeplitz kernels on >=128 MXU lanes, exact — see
``kernels/folded_conv.py``), while each alias-free Snake activation runs on
the unfolded view (a free reshape) using the shifted-add polyphase
resamplers from ``nn/alias_free.py`` (scalar-weighted fused VPU adds, no
grouped convs).  Parameter trees are identical between the folded and plain
paths, so checkpoints are interchangeable.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from toucan_tpu.nn.alias_free import (
    alias_free_snake,
    alias_free_snake_dw,
    alias_free_snake_folded,
    alias_free_snake_shifted,
)
from toucan_tpu.kernels.folded_conv import (
    fold_time,
    folded_conv,
    folded_conv_transpose,
    unfold_time,
)
from toucan_tpu.models.vocoders.hifigan import _ConvParams, conv_transpose_1d


class AMPBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32
    fold: int = 1  # >1: run convs time-folded on fold*channels MXU lanes
    mxu_act: bool = False  # phase-conv activation even at fold == 1
    shifted_resample: bool = False  # fold==1 FIRs: shifted adds vs grouped conv
    dw_act: bool = False  # fold==1 FIRs as depthwise phase convs (no 2x signal)
    pallas_act: bool = False  # fused VPU kernel for the alias-free snake
    pallas_interpret: bool = False

    def _act_params(self, idx):
        alpha = self.param(f"alpha_{idx}", nn.initializers.zeros,
                           (self.channels,), self.dtype)
        beta = self.param(f"beta_{idx}", nn.initializers.zeros,
                          (self.channels,), self.dtype)
        return alpha, beta

    @nn.compact
    def __call__(self, x):
        """x: (B, T, C) when fold == 1, else folded (B, T/fold, fold*C)."""

        def act(xs, idx):
            alpha, beta = self._act_params(idx)
            if self.fold > 1 or self.mxu_act:  # folded layout (MXU or VPU)
                return alias_free_snake_folded(
                    xs, alpha, beta, self.fold, pallas=self.pallas_act,
                    pallas_interpret=self.pallas_interpret)
            if self.dw_act:
                return alias_free_snake_dw(xs, alpha, beta, logscale=True)
            fn = (alias_free_snake_shifted if self.shifted_resample
                  else alias_free_snake)
            return fn(xs, alpha, beta, logscale=True)

        for i, dilation in enumerate(self.dilations):
            xt = act(x, 2 * i)
            if self.fold > 1:
                k1, b1 = _ConvParams(self.kernel_size, self.channels,
                                     self.channels, self.dtype,
                                     name=f"conv1_{i}")()
                k2, b2 = _ConvParams(self.kernel_size, self.channels,
                                     self.channels, self.dtype,
                                     name=f"conv2_{i}")()
                xt = folded_conv(xt, k1, b1, self.fold, dilation)
                xt = act(xt, 2 * i + 1)
                xt = folded_conv(xt, k2, b2, self.fold, 1)
            else:
                xt = nn.Conv(self.channels, (self.kernel_size,),
                             kernel_dilation=dilation, dtype=self.dtype,
                             name=f"conv1_{i}")(xt)
                xt = act(xt, 2 * i + 1)
                xt = nn.Conv(self.channels, (self.kernel_size,),
                             dtype=self.dtype, name=f"conv2_{i}")(xt)
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
    min_lanes: int = 128   # fold stages whose channels fall below this
    use_folding: bool = True
    mxu_act: bool = False  # phase-conv activations on the >=128-channel stages too
    shifted_resample: bool = False
    dw_act: bool = False  # f=1 stages: depthwise phase-conv acts
    pallas_act: bool = False  # fused VPU alias-free snake (folded stages)
    pallas_interpret: bool = False

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
            fold = (self.min_lanes // ch
                    if (self.use_folding and ch < self.min_lanes) else 1)
            if self.use_folding:
                # emit directly into folded layout: scale*ch output lanes
                x = folded_conv_transpose(x, kernel, bias, scale,
                                          (up_k - scale) // 2)
                x = fold_time(unfold_time(x, scale), fold) if fold != scale else x
            else:
                x = conv_transpose_1d(x, kernel, scale, (up_k - scale) // 2) + bias

            acc = 0.0
            for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                               self.resblock_dilations)):
                acc = acc + AMPBlock(ch, rk, dils, dtype=self.dtype, fold=fold,
                                     mxu_act=self.mxu_act,
                                     dw_act=self.dw_act,
                                     shifted_resample=self.shifted_resample,
                                     pallas_act=self.pallas_act,
                                     pallas_interpret=self.pallas_interpret,
                                     name=f"amp_{i}_{j}")(x)
            x = acc / len(self.resblock_kernel_sizes)
            if fold > 1:
                x = unfold_time(x, fold)
            if return_intermediates and i == 1:
                x1 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x1")(x)
            elif return_intermediates and i == 2:
                x2 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x2")(x)

        alpha = self.param("post_alpha", nn.initializers.zeros, (ch,), self.dtype)
        beta = self.param("post_beta", nn.initializers.zeros, (ch,), self.dtype)
        post_fold = (self.min_lanes // ch
                     if (self.use_folding and ch < self.min_lanes) else 1)
        if post_fold > 1 and x.shape[1] % post_fold == 0:
            x = unfold_time(alias_free_snake_folded(
                fold_time(x, post_fold), alpha, beta, post_fold,
                pallas=self.pallas_act,
                pallas_interpret=self.pallas_interpret), post_fold)
        else:
            post_act = (alias_free_snake_shifted if self.shifted_resample
                        else alias_free_snake)
            x = post_act(x, alpha, beta, logscale=True)
        if self.use_folding and x.shape[1] % 64 == 0:
            # C_out=1 leaves the MXU 99% idle; emit 64 folded output lanes
            ok, ob = _ConvParams(7, ch, 1, self.dtype, name="conv_post")()
            xf = folded_conv(fold_time(x, 64), ok, ob, 64, 1)
            x = unfold_time(jnp.tanh(xf), 64)
        else:
            x = nn.Conv(1, (7,), dtype=self.dtype, name="conv_post")(x)
            x = jnp.tanh(x)
        if return_intermediates:
            return x, x2, x1
        return x
