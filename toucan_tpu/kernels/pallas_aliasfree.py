"""Pallas TPU kernel: fused alias-free SnakeBeta activation.

BigVGAN wraps every nonlinearity in 2x kaiser-sinc resampling
(reference ``Spectrogram_to_Wave/BigVGAN/AMP.py:19-66``): up-FIR -> snake
-> down-FIR.  That is *depthwise* work — two 6-tap scalar FIRs per
direction plus an elementwise activation — i.e. pure VPU math.  The XLA
formulations either run grouped convs (bad lowering at < 128 lanes) or
dense "phase convs" that burn fold*C extra MXU FLOPs just to reach 128
lanes (see BENCH_NOTES.md: 288 of 423 ms).

This kernel keeps a time tile resident in VMEM and computes the whole
up->snake->down sandwich with scalar-weighted shifted adds on the VPU:

  even[t] = sum_q k0[q] x[t+3-q]      odd[t]  = sum_q k1[q] x[t+3-q]
  (the two polyphase branches of the 12-tap upsampler — the 2x-rate
  signal never materializes)
  even,odd <- snake_beta(.)
  z[t] = sum_q kde[q] even[t+3-q] + sum_q kdo[q] odd[t+3-q]

It operates directly on the *time-folded* layout (B, N, f*C) used by the
folded vocoder stages (``kernels/folded_conv.py``): a true-time shift by
``d`` is a static lane rotation by ``(d mod f)*C`` with a one-row carry,
plus a static row roll — all register/VMEM moves, no matmuls, no HBM
round-trips for the intermediate phases.  The halo comes from a second
BlockSpec view of the input offset by one tile, so Mosaic's automatic
pipeline double-buffers the streams (a manual per-program DMA measures
~40% slower at this arithmetic intensity).

Semantics match the zero-padded interior of ``alias_free_snake_folded``;
the caller patches the <= 6 replicate-padded edge samples exactly, as the
XLA path does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # rows; covers the two-level FIR reach (<= 6+1 rows) at any fold


def _kernel(x_ref, nxt_ref, a_ref, ib_ref, out_ref, *, tile, f, c, n_valid,
            taps):
    """taps = (k0, k1, kde, kdo) as static python float tuples (len 7,
    tap q <-> true-time offset 3 - q, matching folded_conv; zeros
    skipped)."""
    k0, k1, kde, kdo = taps
    t = pl.program_id(1)
    width = tile + 2 * _HALO

    io_dtype = x_ref.dtype
    # elementwise math in f32 (Mosaic on this target lacks bf16 sin/compares)
    compute_dtype = jnp.float32
    x = jnp.concatenate([x_ref[0], nxt_ref[0, :2 * _HALO]], axis=0)
    x = x.astype(compute_dtype)
    lanes = x.shape[-1]

    def tshift(v, d):
        """v_true[t + d] in folded layout: static lane rotation (with a
        one-row carry) + static row roll.  Wrap garbage stays inside the
        halo margin."""
        r = d % f
        m = (d - r) // f
        if r:
            v_next = jnp.concatenate([v[1:], v[:1]], axis=0)
            v = jnp.concatenate([v[:, r * c:], v_next[:, :r * c]], axis=1)
        if m % width:
            mm = m % width
            v = jnp.concatenate([v[mm:], v[:mm]], axis=0)
        return v

    # the two up FIRs share the 7 shifted copies of x (offsets -3..3)
    xs = {d: tshift(x, d) for d in range(-3, 4)}

    def fir(vs, k):
        acc = None
        for q, w in enumerate(k):
            if w == 0.0:
                continue
            term = jnp.asarray(w, compute_dtype) * vs[3 - q]
            acc = term if acc is None else acc + term
        return acc

    alpha = a_ref[:].astype(compute_dtype)  # (1, lanes), exp pre-applied
    inv_beta = ib_ref[:].astype(compute_dtype)

    def snake(v):
        from toucan_tpu.nn.alias_free import sin_sq

        return v + inv_beta * sin_sq(v * alpha)

    # conv tails outside the sequence must read as zero before the down
    # FIRs (folded_conv zero-pads each conv independently)
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, lanes), 0) + t * tile
    in_seq = (rows >= _HALO) & (rows < _HALO + n_valid)
    zero = jnp.zeros((), compute_dtype)

    even = jnp.where(in_seq, snake(fir(xs, k0)), zero)
    odd = jnp.where(in_seq, snake(fir(xs, k1)), zero)
    es = {d: tshift(even, d) for d in range(-3, 3)}
    os_ = {d: tshift(odd, d) for d in range(-2, 4)}
    z = fir(es, kde) + fir(os_, kdo)
    out_ref[0] = z[_HALO:_HALO + tile].astype(io_dtype)


@functools.lru_cache(maxsize=None)
def _static_taps():
    from toucan_tpu.nn.alias_free import _phase_filters

    return tuple(tuple(float(v) for v in k) for k in _phase_filters())


def fused_alias_free_snake_interior(x_folded, alpha, beta, f: int,
                                    logscale: bool = True, tile: int = 1024,
                                    interpret: bool = False, eps: float = 1e-9):
    """Zero-padded-interior alias-free SnakeBeta on a time-folded
    (B, N, f*C) sequence — drop-in for the 4-phase-conv interior of
    ``alias_free_snake_folded`` (the caller still patches edges)."""
    b, n, lanes = x_folded.shape
    c = lanes // f
    # the halo is the head of the next block, so tile must cover 2*HALO
    tile = max(2 * _HALO, min(tile, -(-n // 8) * 8))
    n_pad = -(-n // tile) * tile
    # halo rows in front; one extra tile behind so the "next" view exists
    x = jnp.pad(x_folded, ((0, 0), (_HALO, n_pad - n + tile), (0, 0)))

    alpha = alpha.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    a_f = jnp.tile(alpha, f)[None, :].astype(x_folded.dtype)
    ib_f = jnp.tile(1.0 / (beta + eps), f)[None, :].astype(x_folded.dtype)

    kernel = functools.partial(_kernel, tile=tile, f=f, c=c, n_valid=n,
                               taps=_static_taps())
    rep = pl.BlockSpec((1, lanes), lambda bb, tt: (0, 0),
                       memory_space=pltpu.VMEM)
    # the (tile + 2*HALO)-row window = rows [t*tile, ...) of the padded
    # array: block t of the "cur" view plus the head of block t+1
    cur = pl.BlockSpec((1, tile, lanes), lambda bb, tt: (bb, tt, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, tile, lanes), lambda bb, tt: (bb, tt + 1, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile),
        in_specs=[cur, nxt, rep, rep],
        out_specs=pl.BlockSpec((1, tile, lanes), lambda bb, tt: (bb, tt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, lanes), x_folded.dtype),
        cost_estimate=pl.CostEstimate(
            flops=int(56 * b * n_pad * lanes),
            bytes_accessed=int(2 * b * n_pad * lanes * x_folded.dtype.itemsize),
            transcendentals=int(2 * b * n_pad * lanes)),
        interpret=interpret,
    )(x, x, a_f, ib_f)
    return out[:, :n]
