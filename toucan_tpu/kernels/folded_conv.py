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

from functools import partial

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


@partial(jax.jit, static_argnames=("f", "dilation"))
def fold_conv_kernel(w: jnp.ndarray, f: int, dilation: int = 1) -> jnp.ndarray:
    """w (k, C_in, C_out) SAME-padded dilated conv -> folded kernel
    (k', f*C_in, f*C_out) for a SAME conv on the folded sequence.

    Derivation: output sample t = f*u + r takes input t + d*tau - pad.  In
    folded coordinates that input lives at block u + q, slot s, where
    q = floor((r + d*tau - pad) / f) and s = (r + d*tau - pad) mod f.  The
    folded kernel therefore scatters w[tau] into tap q - q_min at input
    slot s, output slot r.
    """
    k, c_in, c_out = w.shape
    d = dilation
    pad = (k - 1) // 2 * d

    pos = np.arange(f)[:, None] + d * np.arange(k)[None, :] - pad  # (r, tau)
    q = np.floor_divide(pos, f)
    s = np.mod(pos, f)
    q_min, q_max = int(q.min()), int(q.max())
    kp = q_max - q_min + 1

    wp = jnp.zeros((kp, f, c_in, f, c_out), dtype=w.dtype)
    for r in range(f):
        for tau in range(k):
            wp = wp.at[q[r, tau] - q_min, s[r, tau], :, r, :].add(w[tau])
    wp = wp.reshape(kp, f * c_in, f * c_out)
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
