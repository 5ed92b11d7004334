"""Conformer encoder/decoder stack.

Behavioral equivalent of the reference conformer
(``Layers/Conformer.py:17-134``, ``Layers/EncoderLayer.py:39-144``): macaron
FFN halves around rel-pos MHSA and a depthwise conv module, pre-norm
residuals, optional articulatory input embedding, language-embedding offset,
and utterance-embedding integration by concat+projection after the stack.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from toucan_tpu.nn.attention import RelPositionMultiHeadedAttention
from toucan_tpu.nn.convolution import ConformerConvModule, ConvFeedForward
from toucan_tpu.nn.positional import RelPositionalEncoding


def _l2_normalize(x, axis=-1, eps=1e-12):
    # same semantics as torch.nn.functional.normalize
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class ConformerBlock(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    cnn_kernel: int
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    macaron: bool = True
    use_cnn: bool = True
    normalize_before: bool = True
    use_flash_attention: bool = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask=None, deterministic=True, train=False,
                 conv_mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=name)
        drop = nn.Dropout(self.dropout_rate, deterministic=deterministic)
        ff_scale = 0.5 if self.macaron else 1.0

        if self.macaron:
            residual = x
            x = ln("norm_ff_macaron")(x)
            x = residual + ff_scale * drop(
                ConvFeedForward(self.size, self.linear_units, 1, self.dropout_rate,
                                dtype=self.dtype, name="feed_forward_macaron")(x, deterministic))

        residual = x
        x = ln("norm_mha")(x)
        x_att = RelPositionMultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            use_flash=self.use_flash_attention,
            dtype=self.dtype, name="self_attn")(x, x, x, pos_emb, mask, deterministic)
        x = residual + drop(x_att)

        if self.use_cnn:
            residual = x
            x = ln("norm_conv")(x)
            x = residual + drop(
                ConformerConvModule(self.size, self.cnn_kernel, dtype=self.dtype,
                                    name="conv_module")(x, train=train, mask=conv_mask))

        residual = x
        x = ln("norm_ff")(x)
        x = residual + ff_scale * drop(
            ConvFeedForward(self.size, self.linear_units, 1, self.dropout_rate,
                            dtype=self.dtype, name="feed_forward")(x, deterministic))

        if self.use_cnn:
            x = ln("norm_final")(x)
        return x


class ArticulatoryEmbedding(nn.Module):
    """62-dim articulatory vectors -> model dim (Linear-Tanh-Linear)."""

    hidden: int = 100
    out: int = 192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class Conformer(nn.Module):
    attention_dim: int = 192
    attention_heads: int = 4
    linear_units: int = 1536
    num_blocks: int = 6
    cnn_kernel: int = 7
    dropout_rate: float = 0.2
    positional_dropout_rate: float = 0.2
    attention_dropout_rate: float = 0.2
    # O(T*d) pallas flash-attention path (None = auto: accelerators only)
    use_flash_attention: bool = None
    use_input_embedding: bool = False
    input_embedding_hidden: int = 100
    use_output_norm: bool = True
    utt_embed_dim: Optional[int] = None
    lang_embs: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, mask=None, utterance_embedding=None, lang_ids=None,
                 deterministic: bool = True, train: bool = False,
                 conv_mask=None):
        """xs: (B, T, idim); mask: (B, 1, T) non-pad bool or None.

        conv_mask (B, T, 1): see ConformerConvModule — pass at inference to
        make padded batches reproduce exact-length results.
        """
        if self.use_input_embedding:
            xs = ArticulatoryEmbedding(self.input_embedding_hidden, self.attention_dim,
                                       dtype=self.dtype, name="embed")(xs)
        if self.lang_embs is not None and lang_ids is not None:
            lang_table = nn.Embed(self.lang_embs, self.attention_dim, dtype=self.dtype,
                                  name="language_embedding")
            xs = xs + lang_table(lang_ids)  # lang_ids (B, 1) broadcasts over T

        xs, pos_emb = RelPositionalEncoding(self.attention_dim, self.positional_dropout_rate,
                                            dtype=self.dtype, name="pos_enc")(xs, deterministic)

        for i in range(self.num_blocks):
            xs = ConformerBlock(self.attention_dim, self.attention_heads, self.linear_units,
                                self.cnn_kernel, self.dropout_rate, self.attention_dropout_rate,
                                use_flash_attention=self.use_flash_attention,
                                dtype=self.dtype, name=f"block_{i}")(
                xs, pos_emb, mask, deterministic, train, conv_mask)

        if self.use_output_norm:
            xs = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="output_norm")(xs)

        if self.utt_embed_dim is not None and utterance_embedding is not None:
            emb = _l2_normalize(utterance_embedding)
            emb = jnp.broadcast_to(emb[:, None, :], (xs.shape[0], xs.shape[1], emb.shape[-1]))
            xs = nn.Dense(self.attention_dim, dtype=self.dtype, name="hs_emb_projection")(
                jnp.concatenate([xs, emb], axis=-1))
        return xs
