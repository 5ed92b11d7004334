"""Conformer convolution module and position-wise conv feed-forward.

Reference semantics: ``Layers/Convolution.py:10-55`` and
``Layers/MultiLayeredConv1d.py:12-51``.  Everything here operates on
(B, T, C) — the layout ``nn.Conv`` consumes natively, so XLA lowers these
to MXU-friendly convolutions without transposes.

The conformer conv module's BatchNorm intentionally normalizes over padded
frames too (the reference does not mask it); running statistics are kept in
the ``batch_stats`` collection.
"""

import flax.linen as nn
import jax.numpy as jnp


def swish(x):
    return x * nn.sigmoid(x)


class ConformerConvModule(nn.Module):
    channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        """mask (B, T, 1): when given, padded frames are zeroed before the
        depthwise conv so real frames see exactly the zero-padding an
        exact-length (unpadded) run would — needed for batched inference to
        reproduce the reference's single-utterance results bit-for-bit."""
        x = nn.Conv(2 * self.channels, (1,), dtype=self.dtype, name="pointwise_conv1")(x)
        x = nn.glu(x, axis=-1)
        if mask is not None:
            x = x * mask
        x = nn.Conv(self.channels, (self.kernel_size,), feature_group_count=self.channels,
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        x = swish(x)
        return nn.Conv(self.channels, (1,), dtype=self.dtype, name="pointwise_conv2")(x)


class ConvFeedForward(nn.Module):
    """Position-wise feed-forward realized as two 1D convs (k=1 in practice)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 1
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.hidden_channels, (self.kernel_size,), dtype=self.dtype, name="w_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return nn.Conv(self.channels, (self.kernel_size,), dtype=self.dtype, name="w_2")(x)
