"""HiFiGAN generator (Avocodo variant).

Behavioral equivalent of the reference generator
(``TrainingInterfaces/Spectrogram_to_Wave/HiFiGAN/HiFiGAN.py:13-179``):
80-mel at 16 kHz-rate frames -> 24 kHz waveform via 8*6*4*2 = 384x
upsampling; each stage is a transposed conv followed by three multi-kernel
residual stacks averaged together; intermediate outputs after stages 2 and
3 are tapped through 1x1-ish convs for the Avocodo CoMBD discriminator.

Layout is (B, T, C); weight-norm is folded at checkpoint conversion.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from toucan_tpu.kernels.folded_conv import (
    fold_time,
    folded_conv,
    folded_conv_transpose,
    unfold_time,
)


def conv_transpose_1d(x, kernel, stride: int, padding: int):
    """Exact torch ``conv_transpose1d`` semantics on (B, T, C).

    kernel is (k, out, in) — the flax-style layout our params use; output
    length is (T-1)*stride + k - 2*padding.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0).transpose(0, 2, 1)  # (k, in, out)
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"))


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


class ResidualStack(nn.Module):
    """Dilated residual block: LReLU->dilated conv->LReLU->conv, 3 rounds."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, dilation in enumerate(self.dilations):
            xt = leaky_relu(x, self.slope)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=dilation,
                         dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = leaky_relu(xt, self.slope)
            xt = nn.Conv(self.channels, (self.kernel_size,), dtype=self.dtype,
                         name=f"conv2_{i}")(xt)
            x = xt + x
        return x


class _ConvParams(nn.Module):
    """Bare conv parameters with nn.Conv-compatible naming/shapes, so folded
    stacks share checkpoints with the unfolded ones."""

    kernel_size: int
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.normal(0.01),
                            (self.kernel_size, self.in_channels, self.out_channels),
                            self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), self.dtype)
        return kernel, bias


class _StackParams(nn.Module):
    """Parameter container matching FoldedResidualStack's tree, used when the
    stacks execute inside the fused pallas kernel."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        out = []
        for i, _ in enumerate(self.dilations):
            k1, b1 = _ConvParams(self.kernel_size, self.channels, self.channels,
                                 self.dtype, name=f"conv1_{i}")()
            k2, b2 = _ConvParams(self.kernel_size, self.channels, self.channels,
                                 self.dtype, name=f"conv2_{i}")()
            out.append((k1, b1, k2, b2))
        return out


class FoldedResidualStack(nn.Module):
    """ResidualStack computed on a time-folded (B, T/f, f*C) sequence.

    Identical math and identical parameter tree as ResidualStack — the conv
    kernels are re-expressed as block-Toeplitz folded kernels at trace time
    (see kernels/folded_conv.py) so the MXU sees >=128 output lanes.
    """

    channels: int
    kernel_size: int
    fold: int
    dilations: Sequence[int] = (1, 3, 5)
    slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_folded):
        for i, dilation in enumerate(self.dilations):
            k1, b1 = _ConvParams(self.kernel_size, self.channels, self.channels,
                                 self.dtype, name=f"conv1_{i}")()
            k2, b2 = _ConvParams(self.kernel_size, self.channels, self.channels,
                                 self.dtype, name=f"conv2_{i}")()
            xt = leaky_relu(x_folded, self.slope)
            xt = folded_conv(xt, k1, b1, self.fold, dilation)
            xt = leaky_relu(xt, self.slope)
            xt = folded_conv(xt, k2, b2, self.fold, 1)
            x_folded = xt + x_folded
        return x_folded


def calibrate_act_scales(model: "HiFiGANGenerator", variables, mel):
    """Per-stage activation scales for the int8 serving mode
    (``stage_mode="int8"``).

    Runs the exact (XLA folded) generator once on a representative mel,
    capturing each stage's folded input, then computes per-conv max
    activations (kernels/pallas_stage.py::calibrate_stage_scales).  Returns
    ``{stage_index: (n_convs,) f32}`` to pass as ``act_scales``.
    """
    import jax

    from toucan_tpu.kernels.pallas_stage import calibrate_stage_scales

    # serving checkpoints may hold bf16 params; the exact calibration pass
    # runs in f32 (folded_conv calls lax.conv directly, no dtype promotion)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    # ... and the module compute dtype must be f32 too: a bf16-dtype serving
    # generator would otherwise feed bf16 activations into the f32-cast params
    # inside folded_conv_transpose (mixed-dtype lax.conv error)
    capture = model.clone(stage_mode="", sow_stage_inputs=True,
                          dtype=jnp.float32)
    _, state = capture.apply(variables, jnp.asarray(mel, jnp.float32),
                             mutable=["intermediates"])
    inter = state["intermediates"]
    params = variables["params"]
    scales = {}
    for i, scale in enumerate(model.upsample_scales):
        ch = model.channels // (2 ** (i + 1))
        fold = model.min_lanes // ch if ch < model.min_lanes else 1
        if fold * ch not in (128, 256):
            continue
        x_f = inter[f"stage_input_{i}"][0]
        stack_params = []
        for j, (rk, dils) in enumerate(zip(model.resblock_kernel_sizes,
                                           model.resblock_dilations)):
            block = params[f"block_{i}_{j}"]
            stack_params.append([
                (block[f"conv1_{r}"]["kernel"], block[f"conv1_{r}"]["bias"],
                 block[f"conv2_{r}"]["kernel"], block[f"conv2_{r}"]["bias"])
                for r in range(len(dils))])
        scales[i] = jax.jit(calibrate_stage_scales, static_argnums=(2, 3, 4, 5))(
            x_f, stack_params, fold, tuple(model.resblock_kernel_sizes),
            tuple(model.resblock_dilations[0]), model.slope)
    return scales


class HiFiGANGenerator(nn.Module):
    in_channels: int = 80
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (8, 6, 4, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 12, 8, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    slope: float = 0.1
    min_lanes: int = 128  # fold stages whose channels fall below this
    use_folding: bool = True
    use_pallas: bool = False  # fused resstack kernel for the folded stages
    # im2col fused-stage kernel (kernels/pallas_imcol.py) for stages whose
    # channels are <= 128: "" = off, else "int8" | "bf16" | "f32"
    imcol_mode: str = ""
    imcol_stages: Tuple[int, ...] = (1, 2, 3)  # stage indices eligible
    imcol_dense: bool = False  # full-row taps (dense folded weights)
    # v4 scratch-staged fused-stage kernel (kernels/pallas_stage.py):
    # "" = off, else "int8" (serving PTQ; pass act_scales from
    # calibrate_act_scales) | "bf16" | "f32" (exact)
    stage_mode: str = ""
    stage_tile: int = 512
    stage_indices: Tuple[int, ...] = (0, 1, 2, 3)  # stages the kernel covers
    stage_tap_pack: str = "tap"  # "tap" | "scratch" (im2col, MXU accum) | "concat"
    sow_stage_inputs: bool = False  # sow folded stage inputs (calibration)
    skip_stages: Tuple[int, ...] = ()  # benchmarking aid: skip resblocks
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c, return_intermediates: bool = False,
                 act_scales=None):
        """c (B, T, 80) -> wave (B, 384*T, 1) [+ x2, x1 Avocodo taps]."""
        x = nn.Conv(self.channels, (self.kernel_size,), dtype=self.dtype,
                    name="input_conv")(c)
        x1 = x2 = None
        for i, (scale, up_k) in enumerate(zip(self.upsample_scales,
                                              self.upsample_kernel_sizes)):
            ch = self.channels // (2 ** (i + 1))
            x = leaky_relu(x, self.slope)
            kernel = self.param(f"upsample_{i}_kernel", nn.initializers.normal(0.01),
                                (up_k, ch, self.channels // (2 ** i)), self.dtype)
            bias = self.param(f"upsample_{i}_bias", nn.initializers.zeros, (ch,), self.dtype)
            if self.use_folding:
                # emit directly into folded layout: scale*ch output lanes
                x = unfold_time(folded_conv_transpose(x, kernel, bias, scale,
                                                      (up_k - scale) // 2), scale)
            else:
                x = conv_transpose_1d(x, kernel, scale, (up_k - scale) // 2) + bias

            fold = self.min_lanes // ch if (self.use_folding and ch < self.min_lanes) else 1
            if self.sow_stage_inputs:
                self.sow("intermediates", f"stage_input_{i}",
                         fold_time(x, fold) if fold > 1 else x)
            if i in self.skip_stages:
                for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                   self.resblock_dilations)):
                    _StackParams(ch, rk, dils, dtype=self.dtype,
                                 name=f"block_{i}_{j}")()
            elif (self.stage_mode and fold * ch in (128, 256)
                  and i in self.stage_indices):
                from toucan_tpu.kernels.pallas_stage import fused_stage_resstacks
                import jax as _jax
                stack_params = [
                    _StackParams(ch, rk, dils, dtype=self.dtype,
                                 name=f"block_{i}_{j}")()
                    for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                       self.resblock_dilations))]
                assert all(d == self.resblock_dilations[0]
                           for d in self.resblock_dilations), \
                    "stage kernel assumes uniform dilations across stacks"
                x_f = fold_time(x, fold) if fold > 1 else x
                stream = jnp.float32 if self.stage_mode == "f32" else jnp.bfloat16
                fused = fused_stage_resstacks(
                    x_f, stack_params, fold, self.resblock_kernel_sizes,
                    self.resblock_dilations[0],
                    act_scales=None if act_scales is None else act_scales[i],
                    tile=self.stage_tile, slope=self.slope,
                    mode=self.stage_mode, stream_dtype=stream,
                    tap_pack=self.stage_tap_pack,
                    interpret=_jax.devices()[0].platform == "cpu")
                x = unfold_time(fused, fold) if fold > 1 else fused
            elif self.imcol_mode and ch <= 128 and i in self.imcol_stages:
                from toucan_tpu.kernels.pallas_imcol import fused_imcol_resstacks
                import jax as _jax
                stack_params = [
                    _StackParams(ch, rk, dils, dtype=self.dtype,
                                 name=f"block_{i}_{j}")()
                    for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                       self.resblock_dilations))]
                assert all(d == self.resblock_dilations[0]
                           for d in self.resblock_dilations), \
                    "imcol path assumes uniform dilations across stacks"
                fused = fused_imcol_resstacks(
                    fold_time(x, fold), stack_params, fold,
                    self.resblock_kernel_sizes, self.resblock_dilations[0],
                    slope=self.slope, mode=self.imcol_mode,
                    dense=self.imcol_dense,
                    interpret=_jax.devices()[0].platform == "cpu")
                x = unfold_time(fused, fold)
            elif fold > 1 and self.use_pallas:
                from toucan_tpu.kernels.pallas_resstack import fused_folded_resstacks
                import jax as _jax
                stack_params = [
                    _StackParams(ch, rk, dils, dtype=self.dtype,
                                 name=f"block_{i}_{j}")()
                    for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                       self.resblock_dilations))]
                x_f = fold_time(x, fold)
                t_f = x_f.shape[1]
                tile = next(c for c in (512, 256, 128, 64, 32, 16, 8)
                            if t_f % c == 0)
                assert all(d == self.resblock_dilations[0]
                           for d in self.resblock_dilations), \
                    "pallas path assumes uniform dilations across stacks"
                fused = fused_folded_resstacks(
                    x_f, stack_params, fold, self.resblock_kernel_sizes,
                    self.resblock_dilations[0], tile=tile, slope=self.slope,
                    interpret=_jax.devices()[0].platform == "cpu")
                x = unfold_time(fused, fold)
            elif fold > 1:
                x_f = fold_time(x, fold)
                acc = 0.0
                for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                   self.resblock_dilations)):
                    acc = acc + FoldedResidualStack(ch, rk, fold, dils, self.slope,
                                                    dtype=self.dtype,
                                                    name=f"block_{i}_{j}")(x_f)
                x = unfold_time(acc / len(self.resblock_kernel_sizes), fold)
            else:
                acc = 0.0
                for j, (rk, dils) in enumerate(zip(self.resblock_kernel_sizes,
                                                   self.resblock_dilations)):
                    acc = acc + ResidualStack(ch, rk, dils, self.slope, dtype=self.dtype,
                                              name=f"block_{i}_{j}")(x)
                x = acc / len(self.resblock_kernel_sizes)
            # Avocodo taps are only consumed by the CoMBD discriminator in
            # training; skipping them in inference saves two C_out=1 convs.
            if return_intermediates and i == 1:
                x1 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x1")(x)
            elif return_intermediates and i == 2:
                x2 = nn.Conv(1, (7,), dtype=self.dtype, name="out_proj_x2")(x)

        x = leaky_relu(x, 0.01)  # reference output stage uses default slope
        if self.use_folding and x.shape[1] % 64 == 0:
            # C_out=1 leaves the MXU 99% idle; emit 64 folded output lanes
            # instead (exact — same block-Toeplitz machinery as the stages)
            ok, ob = _ConvParams(self.kernel_size, x.shape[-1], 1, self.dtype,
                                 name="output_conv")()
            xf = folded_conv(fold_time(x, 64), ok, ob, 64, 1)
            x = unfold_time(jnp.tanh(xf), 64)
        else:
            x = nn.Conv(1, (self.kernel_size,), dtype=self.dtype,
                        name="output_conv")(x)
            x = jnp.tanh(x)
        if return_intermediates:
            return x, x2, x1
        return x
