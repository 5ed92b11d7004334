"""Padding-mask helpers (jnp, static shapes).

Same semantics as the reference helpers (``Utility/utils.py:369-434``) but
shape-static: callers pass the padded max length explicitly so everything
stays jit-compatible.
"""

import jax.numpy as jnp


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True on real positions."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True on padded positions."""
    return ~make_non_pad_mask(lengths, max_len)
