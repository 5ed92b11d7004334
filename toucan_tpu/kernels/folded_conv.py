"""Time-folded 1-D convolutions for MXU lane utilization.

The vocoder's late stages run convs with 32-64 channels over very long time
axes.  On TPU the MXU processes 128 output lanes per pass, so a C=32 conv
wastes 75% of the systolic array — profiling shows those stages at 6-25%
utilization while the C>=128 stages hit ~70%.

The fix: fold time into channels ("space-to-depth").  x (B, T, C) becomes
X (B, T/f, f*C), and the conv's kernel w (k, C, C) becomes a block-Toeplitz
kernel W' (k', f*C, f*C) with k' = ceil((k-1)*d + f) / f taps, chosen so
that conv(X, W') is *exactly* unfold(conv(x, w)) — same math, wider lanes.
FLOPs grow by ~(k*d + f)/(k*d) but utilization grows by 128/C.

Folded kernels are built from the original parameters at trace time, so
checkpoints and converters are untouched.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fold_time(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T//f, f*C); channel s*C+c holds x[t*f+s, c]."""
    b, t, c = x.shape
    assert t % f == 0, f"time {t} not divisible by fold {f}"
    return x.reshape(b, t // f, f * c)


def unfold_time(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, t, fc = x.shape
    return x.reshape(b, t * f, fc // f)


@functools.lru_cache(maxsize=None)
def _fold_conv_index_map(k: int, f: int, dilation: int):
    """(kp, f_in_slot, f_out_slot) -> source tap index (k = "no tap")."""
    d = dilation
    pad = (k - 1) // 2 * d
    pos = np.arange(f)[:, None] + d * np.arange(k)[None, :] - pad  # (r, tau)
    q = np.floor_divide(pos, f)
    s = np.mod(pos, f)
    q_min, q_max = int(q.min()), int(q.max())
    kp = q_max - q_min + 1
    idx = np.full((kp, f, f), k, dtype=np.int32)  # k = sentinel (zero tap)
    for r in range(f):
        for tau in range(k):
            idx[q[r, tau] - q_min, s[r, tau], r] = tau
    return idx


def fold_conv_kernel(w: jnp.ndarray, f: int, dilation: int = 1) -> jnp.ndarray:
    """w (k, C_in, C_out) SAME-padded dilated conv -> folded kernel
    (k', f*C_in, f*C_out) for a SAME conv on the folded sequence.

    Derivation: output sample t = f*u + r takes input t + d*tau - pad.  In
    folded coordinates that input lives at block u + q, slot s, where
    q = floor((r + d*tau - pad) / f) and s = (r + d*tau - pad) mod f.  Each
    folded position maps to at most one source tap, so the folded kernel is
    one gather from the zero-extended source kernel (cheap to trace and to
    differentiate).
    """
    k, c_in, c_out = w.shape
    idx = jnp.asarray(_fold_conv_index_map(k, f, dilation))  # (kp, f, f)
    w_ext = jnp.concatenate([w, jnp.zeros((1, c_in, c_out), w.dtype)])
    wp = w_ext[idx]  # (kp, f_in, f_out, C_in, C_out)
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(idx.shape[0], f * c_in, f * c_out)
    return wp


def folded_conv_padding(k: int, f: int, dilation: int = 1):
    """Explicit (lo, hi) padding so the folded conv reproduces SAME."""
    d = dilation
    pad = (k - 1) // 2 * d
    pos = np.arange(f)[:, None] + d * np.arange(k)[None, :] - pad
    q = np.floor_divide(pos, f)
    return (-int(q.min()), int(q.max()))


def folded_conv(x_folded: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                f: int, dilation: int = 1) -> jnp.ndarray:
    """Apply conv w (k, C, C), bias b (C,) to a folded (B, T/f, f*C) input,
    returning the folded (B, T/f, f*C) result."""
    wp = fold_conv_kernel(w, f, dilation)
    lo, hi = folded_conv_padding(w.shape[0], f, dilation)
    out = jax.lax.conv_general_dilated(
        x_folded, wp, window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return out + jnp.tile(b, f)


@functools.lru_cache(maxsize=None)
def _fold_conv_transpose_index_map(k: int, stride: int, padding: int):
    s = stride
    q_all = [(r + padding - m) // s
             for r in range(s) for m in range(k) if (r + padding - m) % s == 0]
    q_min, q_max = min(q_all), max(q_all)
    kp = q_max - q_min + 1
    idx = np.full((kp, s), k, dtype=np.int32)  # k = sentinel (zero tap)
    for r in range(s):
        for m in range(k):
            if (r + padding - m) % s == 0:
                idx[(r + padding - m) // s - q_min, r] = m
    return idx, (-q_min, q_max)


def fold_conv_transpose_kernel(w: jnp.ndarray, stride: int, padding: int):
    """w (k, C_out, C_in) of a stride-``stride`` transposed conv -> kernel
    (k'', C_in, stride*C_out) computing the output directly in time-folded
    layout: Y[u, r*C_out+co] = y[u*stride + r].

    Derivation: y[t] = sum_j x[j] * w[t - j*s + p]; with t = u*s + r and
    q = j - u the tap m = -q*s + r + p must lie in [0, k).  Each (q, r)
    position maps to at most one tap -> one gather builds the kernel.
    """
    k, c_out, c_in = w.shape
    idx, (lo, hi) = _fold_conv_transpose_index_map(k, stride, padding)
    w_ext = jnp.concatenate([w, jnp.zeros((1, c_out, c_in), w.dtype)])
    wp = w_ext[jnp.asarray(idx)]  # (kp, s, C_out, C_in)
    wp = wp.transpose(0, 3, 1, 2).reshape(idx.shape[0], c_in, stride * c_out)
    return wp, (lo, hi)


def folded_conv_transpose(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          stride: int, padding: int) -> jnp.ndarray:
    """(B, T, C_in) -> folded (B, T, stride*C_out); unfold_time(out, stride)
    equals the plain transposed conv (exactly), but the MXU sees
    stride*C_out output lanes instead of C_out."""
    wp, (lo, hi) = fold_conv_transpose_kernel(w, stride, padding)
    out = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return out + jnp.tile(b, stride)


@functools.lru_cache(maxsize=None)
def _packed_fold_conv_transpose_index_map(k: int, stride: int, padding: int,
                                          p: int):
    """Index map for a transposed conv consuming p-packed input rows and
    emitting (p*stride)-packed output rows.

    y[t] = sum_j x[j] * w[t - j*s + pad]; with input j = v*p + a and
    output t = u*p*s + r (a in [0,p), r in [0,p*s)), tap
    m = r - q*p*s - a*s + pad for q = v - u must lie in [0, k).
    """
    s = stride
    entries = []  # (q, a, r, m)
    for r in range(p * s):
        for a in range(p):
            for q in range(-(k // (p * s)) - 2, k // (p * s) + 3):
                m = r - q * p * s - a * s + padding
                if 0 <= m < k:
                    entries.append((q, a, r, m))
    q_min = min(e[0] for e in entries)
    q_max = max(e[0] for e in entries)
    kp = q_max - q_min + 1
    idx = np.full((kp, p, p * s), k, dtype=np.int32)  # k = zero-tap sentinel
    for q, a, r, m in entries:
        idx[q - q_min, a, r] = m
    return idx, (-q_min, q_max)


def packed_fold_conv_transpose_kernel(w: jnp.ndarray, stride: int,
                                      padding: int, p: int):
    """w (k, C_out, C_in) -> kernel (kp, p*C_in, p*stride*C_out) computing
    the transposed conv directly from p-packed input rows into
    (p*stride)-packed output rows: the MXU sees p*stride*C_out lanes
    instead of stride*C_out (the final 64->32 upsampler's 64 lanes land
    on 128 with p=2)."""
    k, c_out, c_in = w.shape
    idx, (lo, hi) = _packed_fold_conv_transpose_index_map(k, stride,
                                                          padding, p)
    w_ext = jnp.concatenate([w, jnp.zeros((1, c_out, c_in), w.dtype)])
    wp = w_ext[jnp.asarray(idx)]  # (kp, p, p*s, C_out, C_in)
    kp = idx.shape[0]
    wp = wp.transpose(0, 1, 4, 2, 3).reshape(kp, p * c_in,
                                             p * stride * c_out)
    return wp, (lo, hi)


def packed_folded_conv_transpose(x_packed: jnp.ndarray, w: jnp.ndarray,
                                 b: jnp.ndarray, stride: int, padding: int,
                                 p: int) -> jnp.ndarray:
    """(B, T/p, p*C_in) -> (B, T/p, p*stride*C_out); unfold_time(out,
    p*stride) equals the plain transposed conv exactly."""
    wp, (lo, hi) = packed_fold_conv_transpose_kernel(w, stride, padding, p)
    out = jax.lax.conv_general_dilated(
        x_packed, wp, window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"))
    return out + jnp.tile(b, p * stride)
