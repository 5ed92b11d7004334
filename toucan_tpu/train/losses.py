"""ToucanTTS training losses.

Numerically equivalent to the reference ``ToucanTTSLoss``
(``TrainingInterfaces/Text_to_Spectrogram/ToucanTTS/ToucanTTSLoss.py:20-66``),
including its idiosyncrasies: the spectrogram L1 weights normalize per
sample, per mel-dim and per batch; the duration/pitch/energy weights
normalize per sample only (so those losses scale with batch size); and the
variance weights are applied twice (a scalar-times-B factor) exactly as the
reference does.
"""

import jax.numpy as jnp

from toucan_tpu.nn.masks import make_non_pad_mask


def toucan_tts_loss(before_outs, after_outs, gold_spectrograms, spectrogram_lengths,
                    text_lengths, gold_durations, predicted_durations,
                    predicted_pitch, predicted_energy, gold_pitch, gold_energy,
                    duration_log_offset: float = 1.0):
    """Returns (l1_loss, duration_loss, pitch_loss, energy_loss) scalars."""
    b, lmax, odim = gold_spectrograms.shape
    tmax = gold_durations.shape[1]

    l1 = jnp.abs(before_outs - gold_spectrograms)
    if after_outs is not None:
        l1 = l1 + jnp.abs(after_outs - gold_spectrograms)
    dur_sq = (predicted_durations
              - jnp.log(gold_durations.astype(jnp.float32) + duration_log_offset)) ** 2
    pitch_sq = (predicted_pitch - gold_pitch) ** 2
    energy_sq = (predicted_energy - gold_energy) ** 2

    out_mask = make_non_pad_mask(spectrogram_lengths, lmax)[..., None]  # (B, L, 1)
    out_w = out_mask / jnp.sum(out_mask, axis=1, keepdims=True)
    out_w = out_w / (b * odim)
    l1_loss = jnp.sum(jnp.where(out_mask, l1 * out_w, 0.0))

    dur_mask = make_non_pad_mask(text_lengths, tmax)                     # (B, T)
    dur_w = dur_mask / jnp.sum(dur_mask, axis=1, keepdims=True)
    duration_loss = jnp.sum(jnp.where(dur_mask, dur_sq * dur_w, 0.0))

    var_mask = dur_mask[..., None]
    var_w = dur_w[..., None]
    # the reference multiplies the variance weights in twice; the second
    # application turns the scalar into scalar * sum(weights) (= batch size)
    w_total = jnp.sum(jnp.where(var_mask, var_w, 0.0))
    pitch_loss = jnp.sum(jnp.where(var_mask, pitch_sq * var_w, 0.0)) * w_total
    energy_loss = jnp.sum(jnp.where(var_mask, energy_sq * var_w, 0.0)) * w_total

    return l1_loss, duration_loss, pitch_loss, energy_loss
