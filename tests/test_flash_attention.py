"""Flash rel-pos attention (kernels/pallas_attention.py) parity tests.

Interpret mode on CPU; the kernel must match the XLA rel-shift path of
RelPositionMultiHeadedAttention (reference ``Layers/Attention.py:113-198``)
exactly on valid rows, including key-padding masking.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.nn.attention import RelPositionMultiHeadedAttention


@pytest.mark.parametrize("t,lengths", [(23, (23, 17)), (8, (8, 3)), (40, (33, 40))])
def test_flash_matches_xla_attention(t, lengths):
    B, F, H = 2, 64, 4
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, t, F))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, 2 * t - 1, F))
    lengths = np.array(lengths)
    mask = jnp.asarray(np.arange(t)[None, None, :] < lengths[:, None, None])

    ref = RelPositionMultiHeadedAttention(H, F, 0.0)
    variables = ref.init(rng, q, q, q, pos, mask=mask)
    y0 = np.asarray(ref.apply(variables, q, q, q, pos, mask=mask))
    fl = RelPositionMultiHeadedAttention(H, F, 0.0, use_flash=True)
    y1 = np.asarray(fl.apply(variables, q, q, q, pos, mask=mask))
    for b in range(B):
        np.testing.assert_allclose(y1[b, :lengths[b]], y0[b, :lengths[b]],
                                   atol=2e-5)


def test_flash_full_model_inference_matches():
    """ToucanTTS.infer with the flash path enabled matches the default."""
    from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig

    kw = dict(adim=32, aheads=2, enc_layers=1, enc_units=64, dec_layers=1,
              dec_units=64, duration_layers=1, pitch_layers=1, energy_layers=1,
              duration_chans=16, pitch_chans=16, energy_chans=16,
              glow_blocks=2, glow_hidden=16, utt_embed_dim=64, lang_embs=100)
    rng = jax.random.PRNGKey(0)
    text = (jax.random.uniform(rng, (1, 9, 62)) > 0.5).astype(jnp.float32)
    base = ToucanTTS(ToucanTTSConfig(**kw))
    variables = base.init(rng, text, jnp.array([9]), 32,
                          utterance_embedding=jnp.zeros((1, 64)),
                          lang_ids=jnp.zeros((1, 1), jnp.int32),
                          method=ToucanTTS.infer)

    def run(model):
        return model.apply(variables, text, jnp.array([9]), 32,
                           utterance_embedding=jnp.zeros((1, 64)),
                           lang_ids=jnp.zeros((1, 1), jnp.int32),
                           glow_noise=jnp.zeros((1, 32, 80)),
                           method=ToucanTTS.infer)

    y0 = run(base)
    y1 = run(ToucanTTS(ToucanTTSConfig(**kw, use_flash_attention=True)))
    mel_len = int(np.asarray(y0[5])[0]) or 2
    np.testing.assert_allclose(np.asarray(y1[1])[0, :mel_len],
                               np.asarray(y0[1])[0, :mel_len], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(y1[2]), np.asarray(y0[2]))
