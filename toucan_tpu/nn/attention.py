"""Multi-head attention with Transformer-XL relative position bias.

Matches the reference semantics (``Layers/Attention.py:16-198``) but the
rel-shift is a direct gather (idx[i, j] = T-1 - i + j) instead of the
pad/reshape trick — identical result, friendlier to XLA.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_INF = jnp.finfo(jnp.float32).min


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _attend(v, scores, mask, dropout, deterministic):
    """scores (B,H,T1,T2), mask (B,1,T2) bool-true-on-real or None."""
    if mask is not None:
        m = mask[:, None, :, :]  # (B,1,1 or T1,T2)
        scores = jnp.where(m, scores, _NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(attn, deterministic=deterministic)
    x = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, mask=None, deterministic=True):
        d_k = self.n_feat // self.n_head
        q = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head)
        k = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head)
        v = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(d_k).astype(q.dtype)
        drop = nn.Dropout(self.dropout_rate)
        x = _attend(v, scores, mask, drop, deterministic)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(x)


def rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T); out[i, j] = x[i, T-1-i+j].

    Pure pad/reshape/slice (the Transformer-XL trick) — a gather here is
    pathologically slow on TPU.
    """
    b, h, t, w = x.shape  # w == 2t - 1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, w + 1, t)
    x = x[:, :, 1:].reshape(b, h, t, w)
    return x[..., :t]


class RelPositionMultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    # O(T*d)-memory pallas flash-attention path (kernels/pallas_attention.py)
    # for long sequences; requires deterministic mode (no attention dropout)
    # and a key-padding (prefix) mask.  None = auto: on for accelerators
    # (2.2x at the serving shapes, BENCH_NOTES.md), off on CPU (interpret
    # mode is slow) — training takes the XLA path anyway via dropout.
    use_flash: bool = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, pos_emb, mask=None, deterministic=True):
        d_k = self.n_feat // self.n_head
        q = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query), self.n_head)
        k = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key), self.n_head)
        v = _split_heads(nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value), self.n_head)
        p = _split_heads(nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype,
                                  name="linear_pos")(pos_emb), self.n_head)  # (1,H,2T-1,d)

        pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                                (self.n_head, d_k), self.dtype)
        pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                                (self.n_head, d_k), self.dtype)

        q_u = q + pos_bias_u[None, :, None, :]
        q_v = q + pos_bias_v[None, :, None, :]

        # the device this trace will actually execute on: honor a
        # jax.default_device(cpu) context (used to keep parameter inits
        # off the TPU relay), not just the process-global default backend
        target = getattr(jax.config, "jax_default_device", None)
        platform = target.platform if target is not None \
            else jax.devices()[0].platform

        use_flash = self.use_flash
        if use_flash is None:
            # auto: accelerators only, and only where the flash kernel beats
            # the XLA rel-shift path (measured crossover ~T=128)
            use_flash = platform != "cpu" and query.shape[1] >= 128
        if use_flash and deterministic:
            from toucan_tpu.kernels.pallas_attention import flash_rel_attention
            t = query.shape[1]
            if mask is None:
                lengths = jnp.full((query.shape[0],), t, jnp.int32)
            else:
                lengths = jnp.sum(mask.reshape(mask.shape[0], -1)[:, -t:]
                                  .astype(jnp.int32), axis=-1)
            o = flash_rel_attention(q_u, q_v, k, v, p[0], lengths,
                                    interpret=platform == "cpu")
            b, h, tt, d = o.shape
            x = o.transpose(0, 2, 1, 3).reshape(b, tt, h * d).astype(query.dtype)
            return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(x)

        matrix_ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)
        matrix_bd = rel_shift(jnp.einsum("bhtd,nhsd->bhts", q_v, p))
        scores = (matrix_ac + matrix_bd) / jnp.sqrt(d_k).astype(q.dtype)

        drop = nn.Dropout(self.dropout_rate)
        x = _attend(v, scores, mask, drop, deterministic)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(x)
