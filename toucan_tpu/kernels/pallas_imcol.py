"""Pallas TPU kernel v3: fused residual stacks as im2col int8/bf16 matmuls.

Motivation (see BENCH_NOTES.md): the vocoder's late stages execute dilated
convs with 32-64 channels.  The XLA path time-folds them to 128 lanes with
*dense* block-Toeplitz kernels, which inflates FLOPs by k'·f/k — ~2.2x at
stage 3 and ~3.5x at stage 4, and the convs then run at ~140 TFLOP/s on
those inflated FLOPs.  Measured on this chip, int8 `dot_general` sustains
355 TOPS (vs 121 TFLOP/s bf16), but XLA's *conv* op does not use the int8
MXU path (57 TOPS measured) — so the only way to cash the int8 rate in is
to express the convs as explicit matmuls inside a kernel.

This kernel processes one whole stage (three parallel residual stacks of
six convs each, reference `Layers/ResidualBlock.py:35-98`) on a VMEM-
resident time tile:

 * activations stay in the time-folded layout (T/f, f*C = 128 lanes);
 * each conv builds an im2col matrix X~ (width, S*C) whose column blocks
   are the *used* sample offsets only (S = |{r + d*tau - pad}|), cutting
   the folded-FLOP overhead to ~1.46x (stage 3) / ~2.24x (stage 4);
 * block extraction needs only sublane-offset reads from a scratch buffer
   plus channel-block moves, done in the i32-bitcast domain because Mosaic
   on this target lacks sub-32-bit lane rotates;
 * one MXU matmul per conv: (width, S*C) @ (S*C, f*C) — int8 with int32
   accumulation (per-output-channel weight scales, per-tile dynamic
   activation scales) or bf16/f32 for the exact path;
 * leaky ReLUs, (de)quantization, residual adds, and the 3-stack average
   never leave VMEM/vregs; HBM sees one tile read and one tile write per
   stage instead of 18 round trips.

Parity: the f32 path is numerically equivalent to the XLA folded path
(tests compare allclose); the int8 path is a post-training-quantized
variant gated behind an explicit flag with measured SNR (BENCH_NOTES.md).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# trace-time index math + weight building (numpy)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def imcol_offsets(k: int, d: int, f: int):
    """Distinct sample offsets o = r + d*tau - pad used by a SAME-padded
    dilated conv producing f consecutive (folded) outputs.  Returns the
    sorted offsets and, per offset, (q, p) = (o // f, o % f)."""
    pad = (k - 1) // 2 * d
    offs = sorted({r + d * t - pad for r in range(f) for t in range(k)})
    qs = tuple(o // f for o in offs)
    ps = tuple(o % f for o in offs)
    return tuple(offs), qs, ps


@functools.lru_cache(maxsize=None)
def _imcol_index_map(k: int, d: int, f: int):
    """(i, r) -> source tap index tau, or k as the zero sentinel."""
    pad = (k - 1) // 2 * d
    offs, _, _ = imcol_offsets(k, d, f)
    pos = {o: i for i, o in enumerate(offs)}
    idx = np.full((len(offs), f), k, dtype=np.int32)
    for r in range(f):
        for t in range(k):
            idx[pos[r + d * t - pad], r] = t
    return idx


def build_imcol_weight(w, f: int, d: int):
    """w (k, C, C_out) -> W~ (S*C, f*C_out) such that

        y[f*u + r, co] = sum_{i, ci} X~[u, i*C + ci] * W~[i*C + ci, r*C_out + co]

    with X~[u, i*C + ci] = x[f*u + o_i, ci]  (o_i the i-th used offset).
    Traceable (one gather), so it works on jitted checkpoint params.
    """
    k, c_in, c_out = w.shape
    idx = jnp.asarray(_imcol_index_map(k, d, f))  # (S, f)
    w_ext = jnp.concatenate([w, jnp.zeros((1, c_in, c_out), w.dtype)])
    wt = w_ext[idx]  # (S, f, C_in, C_out)
    return wt.transpose(0, 2, 1, 3).reshape(idx.shape[0] * c_in, f * c_out)


def quantize_weight(wt):
    """Symmetric per-output-column int8 quantization: returns (int8 W~,
    f32 column scales) with wt ~= w8 * scale[None, :]."""
    absmax = jnp.maximum(jnp.max(jnp.abs(wt), axis=0), 1e-12)
    scale = (absmax / 127.0).astype(jnp.float32)
    w8 = jnp.clip(jnp.round(wt / scale[None, :]), -127, 127).astype(jnp.int8)
    return w8, scale


def stage_conv_specs(kernel_sizes: Sequence[int], dilations: Sequence[int],
                     fold: int, dense: bool = False):
    """Static per-conv metadata for one stage.

    Returns per stack a list of (k, d, offsets, qs, ps) in execution order
    (conv1 dilated, conv2 undilated, per dilation round), plus the folded-row
    halo H needed so the central `tile` rows of the final stack output are
    exact, and the global q-extent (q_lo, q_hi) for scratch sizing.
    """
    stacks = []
    halos = []
    q_lo = q_hi = 0
    for k in kernel_sizes:
        convs = []
        shrink = 0
        for d in dilations:
            for dd in (d, 1):
                offs, qs, ps = imcol_offsets(k, dd, fold)
                if dense:
                    # full-row taps: one 128-lane block per q in the dense
                    # folded-kernel span (no lane selection; the weight
                    # carries the zeros instead) — ordering matches
                    # fold_conv_kernel's tap axis (tap j <-> q_min + j)
                    qd = range(min(qs), max(qs) + 1)
                    qs, ps = tuple(qd), (0,) * len(qd)
                convs.append((k, dd, offs, qs, ps))
                shrink += max(-min(qs), max(qs))
                q_lo = min(q_lo, min(qs))
                q_hi = max(q_hi, max(qs))
        stacks.append(convs)
        halos.append(shrink)
    halo = (max(halos) + 7) // 8 * 8
    return stacks, halo, (-q_lo, q_hi)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _extract_blocks(x8, qs, ps, c: int, fold: int, use_bitcast: bool = True):
    """Build X~ (width, S*c) from the quantized stream vreg array x8
    (width, fold*c).

    Row offsets come from static circular rolls (two sublane slices + a
    concat — Mosaic on this target lacks sub-32-bit dynamic rotates); the
    wrapped rows are garbage that only lands inside the halo margin the
    stage accounting already discards.  Channel-block selection happens in
    the i32-bitcast domain (no sub-32-bit lane moves exist); interpret mode
    slices the i8 domain directly.
    """
    width = x8.shape[0]
    sub32 = x8.dtype in (jnp.int8, jnp.bfloat16)
    use_bitcast = use_bitcast and sub32

    def roll(v, q):
        if q % width == 0:
            return v
        q = q % width
        return jnp.concatenate([v[q:], v[:q]], axis=0)

    dense = c == x8.shape[1]
    rolled = {}
    blocks = []
    for q, p in zip(qs, ps):
        if q not in rolled:
            r = roll(x8, q)
            if fold > 1 and use_bitcast and not dense:
                r = pltpu.bitcast(r, jnp.int32)  # (width/4, fold*c), lanes=chans
            rolled[q] = r
        rows = rolled[q]
        if fold == 1 or c == x8.shape[1]:
            blocks.append(rows)
        else:
            blocks.append(rows[:, p * c:(p + 1) * c])
    xt = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)
    if fold > 1 and use_bitcast and not dense:
        xt = pltpu.bitcast(xt, x8.dtype)
    return xt


def _stage_kernel(x_ref, *refs, tile, halo, stacks, slope, seq_len, c_lanes,
                  fold, mode, use_bitcast, dense):
    n_convs = sum(len(s) for s in stacks)
    w_refs = refs[0:3 * n_convs:3]
    s_refs = refs[1:3 * n_convs:3]
    b_refs = refs[2:3 * n_convs:3]
    out_ref = refs[3 * n_convs]
    xtile = refs[3 * n_convs + 1]
    sem = refs[3 * n_convs + 2]

    b = pl.program_id(0)
    t = pl.program_id(1)
    width = tile + 2 * halo

    copy = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(t * tile, width), :], xtile, sem)
    copy.start()
    copy.wait()

    x_in = xtile[:].astype(jnp.float32)
    g0 = t * tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, c_lanes), 0) + g0
    in_seq = (rows >= halo) & (rows < halo + seq_len)

    def lrelu(v):
        return jnp.maximum(v, slope * v)

    conv_idx = 0
    acc_out = jnp.zeros((tile, c_lanes), jnp.float32)
    cdim = c_lanes if dense else c_lanes // fold
    for stack in stacks:
        xb = x_in
        for pair in range(len(stack) // 2):
            xt = xb
            for half in range(2):
                _, _, _, qs, ps = stack[2 * pair + half]
                xt = lrelu(xt)
                if mode == "int8":
                    a = jnp.maximum(jnp.max(jnp.abs(xt)), 1e-6)
                    x8 = jnp.clip(jnp.round(xt * (127.0 / a)),
                                  -127, 127).astype(jnp.int8)
                    xm = _extract_blocks(x8, qs, ps, cdim, fold, use_bitcast)
                    y = jax.lax.dot_general(
                        xm, w_refs[conv_idx][:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    y = y.astype(jnp.float32) * (s_refs[conv_idx][:] * (a / 127.0))
                else:
                    x8 = xt.astype(jnp.bfloat16) if mode == "bf16" else xt
                    xm = _extract_blocks(x8, qs, ps, cdim, fold, use_bitcast)
                    y = jax.lax.dot_general(
                        xm, w_refs[conv_idx][:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = y * s_refs[conv_idx][:]
                y = y + b_refs[conv_idx][:]
                xt = jnp.where(in_seq, y, 0.0)
                conv_idx += 1
            xb = xb + xt
        acc_out = acc_out + xb[halo:halo + tile]

    out_ref[0] = (acc_out / len(stacks)).astype(out_ref.dtype)


def fused_imcol_resstacks(x_folded: jnp.ndarray, stack_params: Sequence,
                          fold: int, kernel_sizes=(3, 7, 11),
                          dilations=(1, 3, 5), tile: int = 512,
                          slope: float = 0.1, mode: str = "int8",
                          dense: bool = False, interpret: bool = False):
    """Fused residual stacks over a time-folded input.

    x_folded (B, T', fold*C); stack_params[i] = list over dilation rounds of
    (w1, b1, w2, b2) with UNfolded conv params w (k, C, C), b (C,), exactly
    as FoldedResidualStack consumes (reference ResidualStack semantics:
    ``Layers/ResidualBlock.py:61-80``).  Returns the stack average, shape
    like x_folded.

    mode selects the matmul precision: "int8" (per-output-channel weight +
    per-tile dynamic activation symmetric quantization on the int8 MXU
    path), "bf16" (bf16 matmuls, f32 accumulation — production default,
    ~1e-2 parity), or "f32" (exact; used by parity tests).
    """
    b, t, c_lanes = x_folded.shape
    c = c_lanes // fold
    stacks_meta, halo, _ = stage_conv_specs(kernel_sizes, dilations, fold,
                                            dense=dense)
    t_pad = (t + tile - 1) // tile * tile
    if t_pad != t:
        x_folded = jnp.pad(x_folded, ((0, 0), (0, t_pad - t), (0, 0)))
    width = tile + 2 * halo

    use_bitcast = not interpret  # interpret mode: plain i8 lane slices work

    flat_inputs = []
    for stack_i, k in enumerate(kernel_sizes):
        for dil_i, d in enumerate(dilations):
            w1, b1, w2, b2 = stack_params[stack_i][dil_i]
            for w, bias, dd in ((w1, b1, d), (w2, b2, 1)):
                if dense:
                    from toucan_tpu.kernels.folded_conv import fold_conv_kernel
                    wk = fold_conv_kernel(jnp.asarray(w, jnp.float32), fold, dd)
                    wt = wk.reshape(wk.shape[0] * fold * c, fold * c)
                else:
                    wt = build_imcol_weight(jnp.asarray(w, jnp.float32), fold, dd)
                bias_f = jnp.tile(jnp.asarray(bias, jnp.float32), fold)
                if mode == "int8":
                    w8, scale = quantize_weight(wt)
                    flat_inputs += [w8, scale, bias_f]
                else:
                    wdt = jnp.bfloat16 if mode == "bf16" else jnp.float32
                    flat_inputs += [wt.astype(wdt),
                                    jnp.ones((fold * c,), jnp.float32),
                                    bias_f]

    x_padded = jnp.pad(x_folded, ((0, 0), (halo, halo), (0, 0)))

    n_convs = sum(len(s) for s in stacks_meta)
    kernel = functools.partial(
        _stage_kernel, tile=tile, halo=halo, stacks=stacks_meta, slope=slope,
        seq_len=t, c_lanes=c_lanes, fold=fold, mode=mode,
        use_bitcast=use_bitcast, dense=dense)

    grid = (b, t_pad // tile)
    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * n_convs))
    out_spec = pl.BlockSpec((1, tile, c_lanes), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c_lanes), x_folded.dtype),
        scratch_shapes=[pltpu.VMEM((width, c_lanes), x_folded.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(x_padded, *flat_inputs)[:, :t]
