"""Relative positional encodings (Transformer-XL style).

Functional equivalent of the reference ``RelPositionalEncoding``
(``Layers/PositionalEncoding.py:68-131``): for a length-T input it returns
the scaled input and a (1, 2T-1, D) table covering relative offsets
T-1 ... -(T-1).
"""

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def relative_position_encoding(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 2*length-1, d_model) sinusoidal table, offsets length-1 .. -(length-1)."""
    # offset k at row i: k = length - 1 - i
    offsets = np.arange(length - 1, -length, -1, dtype=np.float32)
    inv_freq = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(math.log(10000.0) / d_model))
    angles = np.abs(offsets)[:, None] * inv_freq[None, :]
    pe = np.zeros((offsets.shape[0], d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(np.sign(offsets)[:, None] * angles)
    pe[:, 1::2] = np.cos(angles)
    return jnp.asarray(pe[None], dtype=dtype)


class RelPositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        T = x.shape[-2]
        x = x * math.sqrt(self.d_model)
        pos_emb = relative_position_encoding(T, self.d_model, self.dtype)
        drop = nn.Dropout(self.dropout_rate, deterministic=deterministic)
        return drop(x), drop(pos_emb)
