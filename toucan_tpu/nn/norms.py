"""Normalization layers.

LayerNorm uses eps=1e-12 to match the reference (``Layers/LayerNorm.py:17``).

ConditionalLayerNorm reproduces the AdaSpeech-4-style conditioning of the
reference (``Layers/ConditionalLayerNorm.py:15-67``) including its quirk of
dividing by the *variance* rather than the standard deviation — checkpoint
parity requires the same arithmetic.
"""

import flax.linen as nn
import jax.numpy as jnp


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


class ConditionalLayerNorm(nn.Module):
    """Scale/bias predicted from a speaker embedding by two 3-layer MLPs.

    Operates on (..., T, C); the embedding is (..., E).
    """

    channels: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, embedding):
        def mlp(name):
            h = nn.Dense(self.embedding_dim, name=f"{name}_0", dtype=self.dtype)(embedding)
            h = jnp.tanh(h)
            h = nn.Dense(self.channels, name=f"{name}_1", dtype=self.dtype)(h)
            h = jnp.tanh(h)
            return nn.Dense(self.channels, name=f"{name}_2", dtype=self.dtype)(h)

        scale = mlp("scale")
        bias = mlp("bias")
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        # NOTE: division by var (not sqrt(var)) matches the reference exactly.
        # Guard the degenerate var == 0 row (an all-constant position — only
        # reachable on fully-padded rows of a batched input with zero-init
        # biases): there (x - mean) == 0 too, so normed = 0 is the exact
        # limit and stops NaNs from leaking into valid rows via conv taps.
        normed = (x - mean) / jnp.where(var == 0.0, 1.0, var)
        return scale[..., None, :] * normed + bias[..., None, :]
