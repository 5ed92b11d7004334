"""Pallas TPU flash attention with Transformer-XL relative position bias.

The conformer's rel-pos attention (reference ``Layers/Attention.py:113-198``)
materializes a (B, H, T, 2T-1) position-score tensor before the rel-shift.
At the 1800-phone input cap — and worse, at the decoder's frame-rate
sequence lengths (tens of thousands of frames for long-form synthesis) —
that tensor dominates memory: (1, 4, 9000, 17999) f32 is already 2.6 GB.

This kernel computes attention in (Bq, Bk) tiles with an online softmax
(flash attention) and evaluates the relative-position term tile-locally:
for a query tile i and key tile j the needed relative embeddings form one
contiguous span of 2·Bq rows of the projected position table, so the tile
bias is one (Bq, d) @ (d, 2Bq) matmul followed by the pad/reshape rel-shift
applied at tile scale.  Memory is O(T·d) instead of O(T²).

Semantics match RelPositionMultiHeadedAttention with a key-padding mask:
scores = ((q+u)·k + rel_shift((q+v)·p)) / sqrt(d); masked keys excluded;
fully-masked (padded) query rows return 0 — exactly what the XLA path's
``jnp.where(mask, attn, 0)`` produces.  Attention dropout is not applied
(use the XLA path when training with attention dropout > 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _tile_rel_shift(s, interpret: bool):
    """(Bq, 2Bq) -> (Bq, Bq); out[i, j] = s[i, Bq-1-i+j].

    On hardware this is a single strided lane rotate (row i rotates by
    Bq-1-i — tpu.DynamicRotate with a per-sublane stride); interpret mode
    falls back to the pad/reshape trick (Mosaic-only primitive).
    """
    bq, w = s.shape
    if not interpret:
        rolled = pltpu.roll(s, bq + 1, axis=1, stride=1, stride_axis=0)
        return rolled[:, :bq]
    s = s[:, :2 * bq - 1]
    s = jnp.pad(s, ((0, 0), (1, 0)))
    s = s.reshape(2 * bq, bq)
    s = s[1:].reshape(bq, 2 * bq - 1)
    return s[:, :bq]


def _flash_kernel(len_ref, qu_ref, qv_ref, k_ref, v_ref, pa_ref, pb_ref,
                  o_ref, acc, m_s, l_s, *, block, t_pad, n_heads, scale,
                  interpret):
    bh = pl.program_id(0)
    jk = pl.program_id(2)
    nk = pl.num_programs(2)
    b = bh // n_heads

    @pl.when(jk == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    qu = qu_ref[0, 0].astype(jnp.float32)
    qv = qv_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    # the rel-embedding span for tile pair (i, j) is the two consecutive
    # block-aligned slices [m*B, (m+2)*B) with m = t_pad/B - 1 - i + j —
    # delivered as two blocked inputs of the same (padded) table
    p = jnp.concatenate([pa_ref[0], pb_ref[0]], axis=0).astype(jnp.float32)

    ac = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bd = jax.lax.dot_general(qv, p, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s = (ac + _tile_rel_shift(bd, interpret)) * scale  # (Bq, Bk)

    # key-padding mask: global key index must be < length(b)
    length = len_ref[b]
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jk * block
    s = jnp.where(kidx < length, s, _NEG_INF)

    m_prev = m_s[...]
    l_prev = l_s[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    # clamp so a fully-masked tile (all -inf) cannot produce NaN via inf-inf
    m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e30)
    alpha = jnp.exp(m_prev - m_new)
    pexp = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(pexp, axis=1, keepdims=True)
    acc[...] = acc[...] * alpha + jax.lax.dot_general(
        pexp, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_s[...] = m_new
    l_s[...] = l_new

    @pl.when(jk == nk - 1)
    def _finalize():
        l = l_s[...]
        out = acc[...] / jnp.maximum(l, 1e-37)
        # fully-masked query rows (padding) -> 0, like the XLA path
        out = jnp.where(l > 0, out, 0.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)


def flash_rel_attention(q_u, q_v, k, v, p, lengths, block: int = 256,
                        interpret: bool = False):
    """Flash attention with Transformer-XL relative position bias.

    q_u, q_v, k, v: (B, H, T, d) — queries with the u/v biases already
    added, keys, values (post projection / head split).
    p: (H, 2T-1, d) projected relative position embeddings (central row
    T-1 = relative offset 0, like RelPositionalEncoding).
    lengths: (B,) int32 valid key/query lengths.
    Returns (B, H, T, d) f32.
    """
    b, h, t, d = q_u.shape
    # Mosaic rejects tiny tiles ("unsupported unaligned shape"); 128 is the
    # smallest known-good query block on this target, so short sequences pad
    # up to one 128-block instead of shrinking the tile.
    block = min(block, max(128, 1 << (t - 1).bit_length()))
    t_pad = (t + block - 1) // block * block
    pad_t = t_pad - t

    def pad3(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad_t), (0, 0)))

    q_u, q_v, k, v = map(pad3, (q_u, q_v, k, v))
    # pad the rel table so every (i, j) span [m*B, (m+2)*B) is in bounds:
    # valid rel indices occupy [pad_t, pad_t + 2t-1) after the left shift
    p_pad = jnp.pad(p, ((0, 0), (pad_t, t_pad + block - t + 1), (0, 0)))

    nb = t_pad // block
    grid = (b * h, nb, nb)
    fourd = lambda bh, i, j: (bh // h, bh % h, i, 0)
    p_idx = lambda off: (lambda bh, i, j: (bh % h, nb - 1 - i + j + off, 0))

    kernel = functools.partial(
        _flash_kernel, block=block, t_pad=t_pad, n_heads=h,
        scale=1.0 / (d ** 0.5), interpret=interpret)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths
            pl.BlockSpec((1, 1, block, d), fourd),  # q_u
            pl.BlockSpec((1, 1, block, d), fourd),  # q_v
            pl.BlockSpec((1, 1, block, d), lambda bh, i, j: (bh // h, bh % h, j, 0)),
            pl.BlockSpec((1, 1, block, d), lambda bh, i, j: (bh // h, bh % h, j, 0)),
            pl.BlockSpec((1, block, d), p_idx(0)),  # rel span, first half
            pl.BlockSpec((1, block, d), p_idx(1)),  # rel span, second half
        ],
        out_specs=pl.BlockSpec((1, 1, block, d), fourd),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, d), jnp.float32),   # acc
            pltpu.VMEM((block, 1), jnp.float32),   # m
            pltpu.VMEM((block, 1), jnp.float32),   # l
        ],
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), q_u, q_v, k, v, p_pad, p_pad)
    return out[:, :, :t]
