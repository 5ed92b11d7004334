"""Duration and variance (pitch/energy) predictors.

Conv stacks with speaker-conditional layer norm, as in the reference
(``Layers/DurationPredictor.py:12-113``, ``Layers/VariancePredictor.py:13-80``).
The duration predictor regresses log(duration+offset); its ``inference``
mode rounds exp(x)-offset and clamps at zero.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from toucan_tpu.nn.norms import ConditionalLayerNorm


class _ConvStack(nn.Module):
    n_layers: int
    n_chans: int
    kernel_size: int
    dropout_rate: float
    utt_embed_dim: Optional[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, utt_embed=None, deterministic=True, input_mask=None):
        for i in range(self.n_layers):
            if input_mask is not None:
                xs = xs * input_mask
            xs = nn.Conv(self.n_chans, (self.kernel_size,), dtype=self.dtype,
                         name=f"conv_{i}")(xs)
            xs = nn.relu(xs)
            if self.utt_embed_dim is not None and utt_embed is not None:
                xs = ConditionalLayerNorm(self.n_chans, self.utt_embed_dim, dtype=self.dtype,
                                          name=f"cln_{i}")(xs, utt_embed)
            else:
                xs = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"ln_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(xs)
        return nn.Dense(1, dtype=self.dtype, name="linear")(xs)


class DurationPredictor(nn.Module):
    n_layers: int = 3
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.2
    offset: float = 1.0
    utt_embed_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, padding_mask=None, utt_embed=None, is_inference=False,
                 deterministic=True, input_mask=None):
        """xs (B, T, D) -> (B, T) log-durations (train) or int durations (infer).

        padding_mask: (B, T) bool, True on padded positions.
        """
        xs = _ConvStack(self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
                        self.utt_embed_dim, dtype=self.dtype, name="stack")(
            xs, utt_embed, deterministic, input_mask)[..., 0]
        if is_inference:
            xs = jnp.maximum(jnp.round(jnp.exp(xs) - self.offset), 0.0).astype(jnp.int32)
        elif padding_mask is not None:
            xs = jnp.where(padding_mask, 0.0, xs)
        return xs


class VariancePredictor(nn.Module):
    n_layers: int = 2
    n_chans: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5
    utt_embed_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, padding_mask=None, utt_embed=None, deterministic=True,
                 input_mask=None):
        """xs (B, T, D) -> (B, T, 1); padding_mask (B, T, 1) True on pads."""
        xs = _ConvStack(self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
                        self.utt_embed_dim, dtype=self.dtype, name="stack")(
            xs, utt_embed, deterministic, input_mask)
        if padding_mask is not None:
            xs = jnp.where(padding_mask, 0.0, xs)
        return xs
