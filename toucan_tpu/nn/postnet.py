"""Convolutional PostNet (Tacotron-2 style residual refiner).

Matches the reference (``Layers/PostNet.py:25-74``): 5 conv layers, 256
channels, kernel 5, GroupNorm(32) + tanh on hidden layers, GroupNorm(20) on
the output layer, no biases in convs.  Operates on (B, T, C).
"""

import flax.linen as nn
import jax.numpy as jnp


class PostNet(nn.Module):
    odim: int = 80
    n_layers: int = 5
    n_chans: int = 256
    kernel_size: int = 5
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True, mask=None):
        """mask (B, T, 1): zero padded frames before each conv so batched
        inference matches exact-length (unpadded) execution."""
        drop = nn.Dropout(self.dropout_rate, deterministic=deterministic)
        for i in range(self.n_layers - 1):
            if mask is not None:
                xs = xs * mask
            xs = nn.Conv(self.n_chans, (self.kernel_size,), use_bias=False,
                         dtype=self.dtype, name=f"conv_{i}")(xs)
            xs = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                              name=f"gn_{i}")(xs)
            xs = jnp.tanh(xs)
            xs = drop(xs)
        if mask is not None:
            xs = xs * mask
        xs = nn.Conv(self.odim, (self.kernel_size,), use_bias=False,
                     dtype=self.dtype, name=f"conv_{self.n_layers - 1}")(xs)
        xs = nn.GroupNorm(num_groups=20, epsilon=1e-5, dtype=self.dtype,
                          name=f"gn_{self.n_layers - 1}")(xs)
        return drop(xs)
