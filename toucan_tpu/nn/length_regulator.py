"""Length regulator: phone-level features -> frame-level features.

TPU-first formulation of the reference's per-sequence
``torch.repeat_interleave`` loop (``Layers/LengthRegulator.py:37-61``):
frame j of sample b copies token i(b, j) where i is found from the
cumulative duration boundaries with a vectorized comparison — static output
length ``max_frames``, no host loops, fully jit/pjit-compatible.
"""

import jax
import jax.numpy as jnp


def regulate_durations(ds: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """Apply speed factor and the all-zero fallback of the reference."""
    if alpha != 1.0:
        ds = jnp.round(ds.astype(jnp.float32) * alpha).astype(jnp.int32)
    # rows whose durations are all zero get 1 everywhere (reference edge case)
    all_zero = jnp.sum(ds, axis=1, keepdims=True) == 0
    return jnp.where(all_zero, jnp.ones_like(ds), ds)


def length_regulate(xs: jnp.ndarray, ds: jnp.ndarray, max_frames: int,
                    pad_value: float = 0.0) -> jnp.ndarray:
    """Expand (B, T, D) by durations (B, T) into (B, max_frames, D).

    Frames beyond sum(ds) are filled with ``pad_value``.  The mapping is
    frame j -> token i with cumsum(ds)[i-1] <= j < cumsum(ds)[i], computed
    as a (T, F) boundary comparison + one matmul-like gather.
    """
    ds = ds.astype(jnp.int32)
    ends = jnp.cumsum(ds, axis=1)                      # (B, T)
    frames = jnp.arange(max_frames)                    # (F,)
    # frame j belongs to the first token whose cumulative end exceeds j
    idx = jax.vmap(lambda e: jnp.searchsorted(e, frames, side="right"))(ends)
    idx = jnp.minimum(idx, ds.shape[1] - 1)
    out = jnp.take_along_axis(xs, idx[..., None], axis=1)
    valid = frames[None, :] < ends[:, -1:]             # (B, F)
    return jnp.where(valid[..., None], out, pad_value)
