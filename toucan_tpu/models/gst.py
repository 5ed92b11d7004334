"""GST-based speaker/style embedding.

Behavioral equivalent of the reference
(``TrainingInterfaces/Spectrogram_to_Embedding/GST.py`` and
``StyleEmbedding.py``): a strided-Conv2d + GRU reference encoder over a
spectrogram cyclically tiled to exactly 812 frames, followed by attention
over 2000 style tokens producing a 64-dim embedding.

TPU-first notes: the tiling loop becomes a modulo gather (static 812-frame
output), and the GRU — tiny, over 4 post-conv timesteps — is a lax.scan
with torch-compatible gate math.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

GST_FRAMES = 812


def tile_to_fixed_frames(spec: jnp.ndarray, length: jnp.ndarray,
                         frames: int = GST_FRAMES) -> jnp.ndarray:
    """(L, 80), true length -> (frames, 80) by cyclic repetition.

    Equals the reference's repeat-doubling loop (StyleEmbedding.py:41-52),
    which tiles the true-length prefix cyclically and cuts at 812.  The
    selection runs as a one-hot matmul — row gathers are pathologically
    slow on TPU.
    """
    idx = jnp.arange(frames) % jnp.maximum(length, 1)
    onehot = jax.nn.one_hot(idx, spec.shape[0], dtype=spec.dtype)
    return jnp.einsum("fl,ld->fd", onehot, spec,
                      precision=jax.lax.Precision.HIGHEST)


class TorchGRU(nn.Module):
    """Multi-layer GRU matching torch.nn.GRU gate semantics (r, z, n)."""

    hidden: int
    layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        """xs (B, T, D) -> final hidden state of last layer (B, hidden)."""
        b = xs.shape[0]
        h_last = None
        for layer in range(self.layers):
            # input projection for all timesteps at once (one MXU matmul);
            # only the recurrent matmul stays inside the scan
            gi_all = nn.Dense(3 * self.hidden, dtype=self.dtype,
                              name=f"w_ih_{layer}")(xs)
            w_hh = self.param(f"w_hh_{layer}_kernel",
                              nn.initializers.lecun_normal(),
                              (self.hidden, 3 * self.hidden), self.dtype)
            b_hh = self.param(f"w_hh_{layer}_bias", nn.initializers.zeros,
                              (3 * self.hidden,), self.dtype)

            def step(h, gi, w_hh=w_hh, b_hh=b_hh):
                gh = h @ w_hh + b_hh
                i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = nn.sigmoid(i_r + h_r)
                z = nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1 - z) * n + z * h
                return h_new, h_new

            h0 = jnp.zeros((b, self.hidden), self.dtype)
            h_last, ys = jax.lax.scan(step, h0, gi_all.transpose(1, 0, 2))
            xs = ys.transpose(1, 0, 2)
        return h_last


class ReferenceEncoder(nn.Module):
    conv_chans: Sequence[int] = (32, 32, 64, 64, 128, 128, 256, 256)
    kernel: int = 3
    stride: int = 2
    gru_units: int = 256
    gru_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speech, train: bool = False):
        """speech (B, L, 80) -> (B, gru_units)."""
        x = speech[..., None]  # (B, L, 80, 1) NHWC
        for i, ch in enumerate(self.conv_chans):
            x = nn.Conv(ch, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"bn_{i}")(x)
            x = nn.relu(x)
        b, t, f, c = x.shape
        # reference flattens (channels, freq) per timestep: (B, T', C*F) with
        # channel-major ordering (it views (B, T', C, F))
        x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        return TorchGRU(self.gru_units, self.gru_layers, dtype=self.dtype, name="gru")(x)


class StyleTokenLayer(nn.Module):
    ref_dim: int = 256
    tokens: int = 2000
    token_dim: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_embs):
        """(B, ref_dim) -> (B, token_dim) via MHA over the token bank."""
        d_k = self.token_dim // self.heads
        gst_embs = self.param("gst_embs", nn.initializers.normal(1.0),
                              (self.tokens, d_k), self.dtype)
        keys = jnp.tanh(gst_embs)  # (tokens, d_k)

        q = nn.Dense(self.token_dim, dtype=self.dtype, name="linear_q")(ref_embs)
        k = nn.Dense(self.token_dim, dtype=self.dtype, name="linear_k")(keys)
        v = nn.Dense(self.token_dim, dtype=self.dtype, name="linear_v")(keys)

        b = q.shape[0]
        q = q.reshape(b, self.heads, d_k)
        k = k.reshape(self.tokens, self.heads, d_k)
        v = v.reshape(self.tokens, self.heads, d_k)
        scores = jnp.einsum("bhd,thd->bht", q, k) / jnp.sqrt(d_k).astype(q.dtype)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bht,thd->bhd", attn, v).reshape(b, self.token_dim)
        return nn.Dense(self.token_dim, dtype=self.dtype, name="linear_out")(out)


class StyleEmbedding(nn.Module):
    """Full GST: tiled spectrogram -> reference encoder -> style tokens."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spectrograms, spectrogram_lengths, return_only_refs=False,
                 train: bool = False):
        """(B, L, 80), (B,) -> (B, 64)."""
        tiled = jax.vmap(tile_to_fixed_frames)(spectrograms, spectrogram_lengths)
        refs = ReferenceEncoder(dtype=self.dtype, name="ref_enc")(tiled, train=train)
        if return_only_refs:
            return refs
        return StyleTokenLayer(dtype=self.dtype, name="stl")(refs)

    @staticmethod
    def token_spread_regularizer(params):
        """Mean pairwise cosine similarity over the token bank — the O(N^2)
        loop at GST.py:80-87 computed as one normalized gram matrix (sum of
        upper off-diagonal entries, like the reference)."""
        embs = params["stl"]["gst_embs"]
        normed = embs / jnp.maximum(jnp.linalg.norm(embs, axis=1, keepdims=True), 1e-8)
        gram = normed @ normed.T
        return jnp.sum(jnp.triu(gram, k=1))
