"""Pallas TPU kernel: fused (time-folded) HiFiGAN residual stacks.

One vocoder stage runs three parallel residual stacks of six convs each —
18 convolutions with elementwise glue.  Executed as separate XLA ops each
conv round-trips the full activation tensor through HBM (~190 MB per pass
at stage 4).  This kernel keeps a time tile resident in VMEM across all 18
convs: the input tile (plus halo) is DMA'd in once, every folded conv is a
short unrolled sum of (tile, C) @ (C, C) MXU matmuls over its taps, leaky
ReLUs and residual adds stay in registers, and only the final averaged
result is written back.

Works on the time-folded representation (C = fold * channels = 128 lanes,
see folded_conv.py), so the matmuls are lane-optimal too.  Halo handling:
the caller zero-pads time by H; inside a tile, intermediate convs read
wrapped (garbage) values only inside the margin that later convs consume,
so the central `tile` rows are exact.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from toucan_tpu.kernels.folded_conv import (
    fold_conv_kernel,
    folded_conv_padding,
)


def _stack_specs(kernel_sizes, dilations, fold):
    """Static per-conv (lo, hi) paddings and the per-stack halo."""
    specs = []
    for ks in kernel_sizes:
        convs = []
        for d in dilations:
            convs.append((ks, d, folded_conv_padding(ks, fold, d)))
            convs.append((ks, 1, folded_conv_padding(ks, fold, 1)))
        specs.append(convs)
    halo = max(sum(max(lo, hi) for _, _, (lo, hi) in stack) for stack in specs)
    return specs, halo


def _resstack_kernel(x_ref, *refs, tile, halo, n_stacks, taps_per_conv, slope,
                     seq_len):
    """refs = [w_0, b_0, w_1, b_1, ...] then out_ref, then scratch+sem."""
    n_convs = len(taps_per_conv)
    w_refs = refs[:2 * n_convs:2]
    b_refs = refs[1:2 * n_convs:2]
    out_ref = refs[2 * n_convs]
    xtile = refs[2 * n_convs + 1]
    sem = refs[2 * n_convs + 2]

    b = pl.program_id(0)
    t = pl.program_id(1)
    width = tile + 2 * halo

    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * tile, width), :], xtile, sem)
    copy.start()
    copy.wait()

    io_dtype = xtile.dtype
    # elementwise math stays f32 (Mosaic on this target lacks bf16 compares);
    # only the MXU dot inputs are bf16
    x_in = xtile[:].astype(jnp.float32)
    # rows outside the actual sequence (the global zero-pad region) must stay
    # zero after every conv — each conv in the reference zero-pads its own
    # (evolving) input at the sequence boundary
    g0 = t * tile  # global padded coordinate of local row 0
    c_lanes = x_in.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, c_lanes), 0) + g0
    in_seq = (rows >= halo) & (rows < halo + seq_len)

    def roll_rows(x, k):
        """Static circular roll by k rows (Mosaic lacks bf16 rotate)."""
        if k == 0:
            return x
        return jnp.concatenate([x[width - k:], x[:width - k]], axis=0)

    def conv(x, w_ref, b_ref, lo):
        """One wide MXU matmul per conv: the rolled tap copies concatenate
        along lanes, contracting (width, taps*C) @ (taps*C, C)."""
        taps = w_ref.shape[0]
        c = x.shape[-1]
        xc = x.astype(io_dtype)
        stacked = jnp.concatenate(
            [roll_rows(xc, (lo - p) % width) for p in range(taps)], axis=1)
        w_flat = w_ref[:].reshape(taps * c, c)
        acc = jnp.dot(stacked, w_flat, preferred_element_type=jnp.float32)
        out = acc + b_ref[:].astype(jnp.float32)
        return jnp.where(in_seq, out, 0.0)

    def lrelu(v):
        return jnp.where(v >= 0, v, slope * v)

    acc_out = jnp.zeros((tile, x_in.shape[-1]), jnp.float32)
    conv_idx = 0
    convs_per_stack = n_convs // n_stacks
    for s in range(n_stacks):
        xb = x_in
        for i in range(convs_per_stack // 2):
            w1, b1, lo1 = w_refs[conv_idx], b_refs[conv_idx], taps_per_conv[conv_idx][1]
            conv_idx += 1
            w2, b2, lo2 = w_refs[conv_idx], b_refs[conv_idx], taps_per_conv[conv_idx][1]
            conv_idx += 1
            xt = lrelu(xb)
            xt = conv(xt, w1, b1, lo1)
            xt = lrelu(xt)
            xt = conv(xt, w2, b2, lo2)
            xb = xb + xt
        acc_out = acc_out + xb[halo:halo + tile]

    out_ref[0] = (acc_out / n_stacks).astype(io_dtype)


def fused_folded_resstacks(x_folded: jnp.ndarray, stack_params: Sequence,
                           fold: int, kernel_sizes=(3, 7, 11),
                           dilations=(1, 3, 5), tile: int = 512,
                           slope: float = 0.1, interpret: bool = False):
    """x_folded (B, T, fold*C); stack_params: per kernel-size stack, a list
    of (w1, b1, w2, b2) tuples per dilation with unfolded conv params
    w (k, C, C), b (C,).  Returns mean over stacks of the residual-stack
    outputs — identical math to three FoldedResidualStacks averaged.
    """
    b, t, c = x_folded.shape
    specs, halo = _stack_specs(kernel_sizes, dilations, fold)
    # round halo so the VMEM buffer keeps sublane alignment
    halo = (halo + 7) // 8 * 8
    assert t % tile == 0, f"time {t} not divisible by tile {tile}"
    width = tile + 2 * halo

    # build folded kernels + flat ref list (static at trace time)
    flat_inputs = []
    taps_per_conv = []
    for stack_i, ks in enumerate(kernel_sizes):
        for dil_i, d in enumerate(dilations):
            w1, b1, w2, b2 = stack_params[stack_i][dil_i]
            for w, bias, dd in ((w1, b1, d), (w2, b2, 1)):
                wp = fold_conv_kernel(w.astype(x_folded.dtype), fold, dd)
                lo, hi = folded_conv_padding(w.shape[0], fold, dd)
                flat_inputs += [wp, jnp.tile(bias.astype(x_folded.dtype), fold)]
                taps_per_conv.append((wp.shape[0], lo))

    x_padded = jnp.pad(x_folded, ((0, 0), (halo, halo), (0, 0)))

    n_convs = len(taps_per_conv)
    kernel = functools.partial(
        _resstack_kernel, tile=tile, halo=halo, n_stacks=len(kernel_sizes),
        taps_per_conv=tuple(taps_per_conv), slope=slope, seq_len=t)

    grid = (b, t // tile)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_convs))
    out_spec = pl.BlockSpec((1, tile, c), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x_folded.dtype),
        scratch_shapes=[pltpu.VMEM((width, c), x_folded.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(x_padded, *flat_inputs)
