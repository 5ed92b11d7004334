"""Pallas TPU kernel v4: scratch-staged fused vocoder stages (int8 serving).

Round-1 findings (BENCH_NOTES.md) that shape this design:

* raw int8 ``dot_general`` sustains 355 TOPS on this chip (bf16: ~120-180
  TFLOP/s), but XLA's conv op never uses the int8 MXU path — int8 must be
  cashed in inside a kernel;
* the round-1 im2col kernel (kernels/pallas_imcol.py) lost its int8 win to
  two overheads: (a) f32 residual streams too large for the vector register
  file, so Mosaic spilled every elementwise op, and (b) value-level circular
  rolls (concats) for the tap shifts.

The v4 kernel removes both:

* **scratch-staged dataflow** — the quantized activation stream lives in an
  int8 VMEM scratch ring with a static margin; every conv reads its tap
  inputs as *static sublane-offset slices* of that scratch (free addressing,
  no rolls/concats) and dense block-Toeplitz weights carry all lane
  structure (zero lane moves, the round-1 "dense" insight);
* **bf16 residual streams** — the only f32 state is the (tile, 128) output
  accumulator;
* **static activation scales** — per-conv quantization scales come from a
  one-off calibration pass (``calibrate_stage_scales``), so the kernel has
  no per-tile max reductions; dequant + bias + leaky-ReLU + requant folds
  into a single elementwise chain per conv (positive scales commute with
  leaky ReLU: lrelu(s*x) = s*lrelu(x) for s > 0).

Stage semantics match ``ResidualStack`` (reference
``Spectrogram_to_Wave/HiFiGAN/HiFiGAN.py:13-179`` residual stacks averaged
per stage); the f32 mode of this kernel is numerically equivalent to the
XLA folded path and is what the parity tests pin down; int8 is the
opt-in serving mode with a measured quality bound.

Round-3 measurement (BENCH_NOTES.md): ``mode="bf16"`` with selective taps
TIES the production XLA path within +-7% at every stage (one marginal
standalone win at the C=64 stage) — per-tap MXU weight-load fill eats what
the tap skip saves, and the bf16 "scratch"/"concat" packs lose/crash like
their int8 counterparts.  The XLA folded graph therefore remains the
serving default; this kernel stays the structured playground for future
hardware where fill or lane-shuffle costs differ.
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
    _fold_conv_index_map,
    fold_conv_kernel,
    folded_conv,
    folded_conv_padding,
)


def _round_up(n, m):
    return (n + m - 1) // m * m


def _selective_taps(k: int, fold: int, dilation: int):
    """Row offsets (relative to the dense folded kernel's first tap) whose
    folded weight block is structurally nonzero.

    The dense block-Toeplitz kernel materializes dilation zeros — e.g. a
    fold=1 d=5 k=11 conv becomes 51 dense taps of which only 11 carry
    weight.  Skipping the zero taps is exact and cuts the kernel's matmul
    FLOPs by 1.86x at fold=1 and 1.14x at fold=2 at these geometries
    (no structural zeros survive at fold=4 — the dilation pattern fills in).
    """
    idx = _fold_conv_index_map(k, fold, dilation)  # (kp, f, f); k = no tap
    mask = (idx != k).any(axis=(1, 2))
    return tuple(int(j) for j in np.nonzero(mask)[0])


def stage_meta(kernel_sizes: Sequence[int], dilations: Sequence[int],
               fold: int):
    """Static per-conv geometry, in execution order (per stack: conv1
    dilated / conv2 plain per dilation round).

    Returns ``convs``: list over stacks of lists of (lo, offsets) with
    ``offsets`` the structurally-nonzero tap rows; ``halo``: rows of
    one-sided recompute margin so the central tile rows of a stack output
    are exact; ``m_lo``/``m_hi``: scratch margins covering every tap shift.
    """
    convs = []
    halos = []
    m_lo = m_hi = 0
    for k in kernel_sizes:
        stack = []
        shrink = 0
        for d in dilations:
            for dd in (d, 1):
                lo, hi = folded_conv_padding(k, fold, dd)
                stack.append((lo, _selective_taps(k, fold, dd)))
                shrink += max(lo, hi)
                m_lo = max(m_lo, lo)
                m_hi = max(m_hi, hi)
        convs.append(stack)
        halos.append(shrink)
    halo = _round_up(max(halos), 8)
    return convs, halo, m_lo, m_hi


def _quantize_weight_cols(wt):
    """(k', L, L) f32 -> int8 with per-output-column scales (L,)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(wt), axis=(0, 1)), 1e-12)
    scale = (absmax / 127.0).astype(jnp.float32)
    w8 = jnp.clip(jnp.round(wt / scale[None, None, :]), -127, 127)
    return w8.astype(jnp.int8), scale


def calibrate_stage_scales(x_folded, stack_params, fold: int,
                           kernel_sizes=(3, 7, 11), dilations=(1, 3, 5),
                           slope: float = 0.1):
    """Per-conv input activation scales a_c = max|lrelu(conv input)| for the
    static-quantization serving mode, computed with the exact folded f32
    path on a calibration batch.  Returns a (n_convs,) f32 array in the
    kernel's execution order."""
    x = x_folded.astype(jnp.float32)
    scales = []

    def lrelu(v):
        return jnp.where(v >= 0, v, slope * v)

    for stack_i, k in enumerate(kernel_sizes):
        xb = x
        for dil_i, d in enumerate(dilations):
            w1, b1, w2, b2 = stack_params[stack_i][dil_i]
            a = lrelu(xb)
            scales.append(jnp.max(jnp.abs(a)))
            h = folded_conv(a, jnp.asarray(w1, jnp.float32),
                            jnp.asarray(b1, jnp.float32), fold, d)
            m = lrelu(h)
            scales.append(jnp.max(jnp.abs(m)))
            xb = xb + folded_conv(m, jnp.asarray(w2, jnp.float32),
                                  jnp.asarray(b2, jnp.float32), fold, 1)
    return jnp.maximum(jnp.stack(scales), 1e-6)


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _stage_kernel(x_ref, *refs, tile, halo, m_lo, m_hi, convs, slope, seq_len,
                  lanes, mode, tap_pack):
    n_convs = sum(len(s) for s in convs)
    w_refs = refs[0:3 * n_convs:3]
    s_refs = refs[1:3 * n_convs:3]
    b_refs = refs[2:3 * n_convs:3]
    out_ref = refs[3 * n_convs]
    x_in = refs[3 * n_convs + 1]     # (width, L) stream scratch
    q_buf = refs[3 * n_convs + 2]    # (m_lo + width + m_hi, L) quant scratch
    im2col = refs[3 * n_convs + 3] if tap_pack == "scratch" else None
    sem = refs[3 * n_convs + 3 + (tap_pack == "scratch")]

    b = pl.program_id(0)
    t = pl.program_id(1)
    width = tile + 2 * halo
    is_int8 = mode == "int8"
    acc_dtype = jnp.int32 if is_int8 else jnp.float32

    @pl.when((b == 0) & (t == 0))
    def _():
        q_buf[:] = jnp.zeros_like(q_buf)

    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * tile, width), :], x_in, sem)
    copy.start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0) + t * tile
    in_seq = (rows >= halo) & (rows < halo + seq_len)

    def lrelu(v):
        return jnp.maximum(v, slope * v)

    def store_quant(vals):
        """One fused elementwise pass: (re)quantize + sequence mask."""
        if is_int8:
            q = jnp.clip(jnp.round(vals), -127.0, 127.0)
            q = jnp.where(in_seq, q, 0.0).astype(jnp.int8)
        else:
            q = jnp.where(in_seq, vals, 0.0).astype(q_buf.dtype)
        q_buf[m_lo:m_lo + width, :] = q

    def conv(ci):
        """Σ_j q_buf[shift j] @ W[j] with static sublane-offset reads over
        the structurally-nonzero taps only.

        tap_pack: "tap" = one matmul per tap + int32/f32 VPU accumulation
        (accumulation dominates at many taps); "scratch" = copy tap slices
        into lane-aligned column blocks of an im2col scratch, then ONE
        deep-contraction matmul per conv — accumulation happens inside the
        MXU and the VPU only pays int8 copies; "concat" = value-level
        concat along lanes (Mosaic-lowering dependent).
        """
        lo, offsets = ci_meta[ci]
        n = len(offsets)
        if tap_pack == "scratch":
            for i, j in enumerate(offsets):
                im2col[:, i * lanes:(i + 1) * lanes] = (
                    q_buf[m_lo - lo + j:m_lo - lo + j + width, :])
            wm = w_refs[ci][:].reshape(n * lanes, lanes)
            return jax.lax.dot_general(
                im2col[:, :n * lanes], wm, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        if tap_pack == "concat":
            xm = jnp.concatenate(
                [q_buf[m_lo - lo + j:m_lo - lo + j + width, :]
                 for j in offsets], axis=1)
            wm = w_refs[ci][:].reshape(n * lanes, lanes)
            return jax.lax.dot_general(xm, wm, (((1,), (0,)), ((), ())),
                                       preferred_element_type=acc_dtype)
        acc = None
        for i, j in enumerate(offsets):
            xj = q_buf[m_lo - lo + j:m_lo - lo + j + width, :]
            y = jax.lax.dot_general(xj, w_refs[ci][i],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            acc = y if acc is None else acc + y
        return acc

    ci_meta = [m for stack in convs for m in stack]

    copy.wait()
    acc_out = jnp.zeros((tile, lanes), jnp.float32)
    ci = 0
    for stack in convs:
        res = x_in[:]
        for _ in range(len(stack) // 2):
            # conv1 (dilated): quantize lrelu(res), matmul, then a single
            # fused dequant+bias+lrelu+requant chain (scales pre-folded)
            store_quant(lrelu(res.astype(jnp.float32)) * s_refs[ci][0, 0]
                        if is_int8 else lrelu(res.astype(jnp.float32)))
            acc = conv(ci)
            mid = lrelu(acc.astype(jnp.float32) * s_refs[ci][1]
                        + b_refs[ci][:])
            store_quant(mid)
            # conv2 (plain): matmul, dequant, residual add in stream dtype
            acc2 = conv(ci + 1)
            upd = acc2.astype(jnp.float32) * s_refs[ci + 1][2] + b_refs[ci + 1][:]
            res = (res.astype(jnp.float32)
                   + jnp.where(in_seq, upd, 0.0)).astype(res.dtype)
            ci += 2
        acc_out = acc_out + res[halo:halo + tile].astype(jnp.float32)

    out_ref[0] = (acc_out / len(convs)).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def fused_stage_resstacks(x_folded: jnp.ndarray, stack_params: Sequence,
                          fold: int, kernel_sizes=(3, 7, 11),
                          dilations=(1, 3, 5), act_scales=None,
                          tile: int = 512, slope: float = 0.1,
                          mode: str = "int8", stream_dtype=jnp.bfloat16,
                          tap_pack: str = "tap",
                          interpret: bool = False):
    """Whole vocoder stage (3 residual stacks, 18 convs) in one VMEM pass.

    ``x_folded`` (B, T', fold*C) with fold*C = 128 lanes (fold=1 for the
    C=128 stage).  ``stack_params[i]`` = list over dilation rounds of
    (w1, b1, w2, b2) unfolded conv params, exactly as ``FoldedResidualStack``
    consumes.  ``mode``: "int8" (serving; needs ``act_scales`` from
    ``calibrate_stage_scales``) | "bf16" | "f32" (exact, parity tests).
    Returns the averaged stack output, shaped like the input.
    """
    b, t, lanes = x_folded.shape
    convs, halo, m_lo, m_hi = stage_meta(kernel_sizes, dilations, fold)
    if mode == "int8" and act_scales is None:
        raise ValueError("int8 mode requires act_scales "
                         "(calibrate_stage_scales)")

    t_pad = _round_up(t, tile)
    if t_pad != t:
        x_folded = jnp.pad(x_folded, ((0, 0), (0, t_pad - t), (0, 0)))
    width = tile + 2 * halo

    # weight/scale/bias prep, execution order.  s_ref per conv is a (1, 3)
    # row: [quant-in scale 127/a, dequant+requant scale, dequant scale] —
    # only the slots that conv position uses are read.
    flat_inputs = []
    ci = 0
    for stack_i, k in enumerate(kernel_sizes):
        for dil_i, d in enumerate(dilations):
            w1, b1, w2, b2 = stack_params[stack_i][dil_i]
            sel1 = np.asarray(_selective_taps(k, fold, d))
            sel2 = np.asarray(_selective_taps(k, fold, 1))
            wt1 = fold_conv_kernel(jnp.asarray(w1, jnp.float32), fold, d)[sel1]
            wt2 = fold_conv_kernel(jnp.asarray(w2, jnp.float32), fold, 1)[sel2]
            bias1 = jnp.tile(jnp.asarray(b1, jnp.float32), fold)
            bias2 = jnp.tile(jnp.asarray(b2, jnp.float32), fold)
            if mode == "int8":
                a1 = act_scales[ci]
                a2 = act_scales[ci + 1]
                w8_1, cs1 = _quantize_weight_cols(wt1)
                w8_2, cs2 = _quantize_weight_cols(wt2)
                # conv1: input quantized by 127/a1; output dequant by
                # cs1*a1/127, then requant by 127/a2 — fold into one vector
                deq1 = cs1 * a1 / 127.0 * (127.0 / a2)
                deq2 = cs2 * a2 / 127.0
                flat_inputs += [
                    w8_1,
                    jnp.stack([jnp.full((lanes,), 127.0 / a1), deq1,
                               jnp.zeros((lanes,))]),
                    bias1 * (127.0 / a2),
                ]
                flat_inputs += [
                    w8_2,
                    jnp.stack([jnp.zeros((lanes,)), jnp.zeros((lanes,)), deq2]),
                    bias2,
                ]
            else:
                wdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
                ones = jnp.ones((lanes,), jnp.float32)
                zer = jnp.zeros((lanes,), jnp.float32)
                flat_inputs += [wt1.astype(wdt),
                                jnp.stack([ones, ones, zer]), bias1]
                flat_inputs += [wt2.astype(wdt),
                                jnp.stack([zer, zer, ones]), bias2]
            ci += 2

    x_padded = jnp.pad(x_folded.astype(stream_dtype),
                       ((0, 0), (halo, halo), (0, 0)))

    n_convs = sum(len(s) for s in convs)
    q_dtype = jnp.int8 if mode == "int8" else (
        jnp.bfloat16 if mode == "bf16" else jnp.float32)
    kernel = functools.partial(
        _stage_kernel, tile=tile, halo=halo, m_lo=m_lo, m_hi=m_hi,
        convs=convs, slope=slope, seq_len=t, lanes=lanes, mode=mode,
        tap_pack=tap_pack)

    grid = (b, t_pad // tile)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * n_convs))
    out_spec = pl.BlockSpec((1, tile, lanes), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)
    scratch_shapes = [
        pltpu.VMEM((width, lanes), stream_dtype),
        pltpu.VMEM((m_lo + width + m_hi, lanes), q_dtype),
    ]
    if tap_pack == "scratch":
        n_max = max(len(offs) for stack in convs for _, offs in stack)
        scratch_shapes.append(pltpu.VMEM((width, n_max * lanes), q_dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA(()))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, lanes), x_folded.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(x_padded, *flat_inputs)
    return out[:, :t]
