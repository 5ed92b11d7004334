"""ToucanTTS acoustic model (FastSpeech-2 family, conformer-based).

One flax module covers both the training forward (teacher-forced, returns
spectrograms + prosody predictions + glow NLL) and inference (predicted or
overridden prosody, control knobs, glow sampling) — unlike the reference,
which maintains two diverging copies
(``TrainingInterfaces/.../ToucanTTS/ToucanTTS.py`` and
``InferenceInterfaces/InferenceArchitectures/InferenceToucanTTS.py``).

All shapes are static: callers pass padded buffers and lengths, inference
additionally passes ``max_frames`` for the upsampled length.  Everything is
jit/pjit-compatible; prosody-control knobs are traced scalars so changing a
slider never recompiles.
"""

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.lax import stop_gradient as jax_stop_gradient

from toucan_tpu.frontend.inventory import feature_index
from toucan_tpu.nn.conformer import Conformer, _l2_normalize
from toucan_tpu.nn.glow import Glow
from toucan_tpu.nn.length_regulator import length_regulate, regulate_durations
from toucan_tpu.nn.masks import make_non_pad_mask
from toucan_tpu.nn.postnet import PostNet
from toucan_tpu.nn.predictors import DurationPredictor, VariancePredictor


@dataclass(frozen=True)
class ToucanTTSConfig:
    input_features: int = 62
    mel_channels: int = 80
    adim: int = 192
    aheads: int = 4
    enc_layers: int = 6
    enc_units: int = 1536
    enc_kernel: int = 7
    dec_layers: int = 6
    dec_units: int = 1536
    dec_kernel: int = 31
    dropout: float = 0.2
    duration_layers: int = 3
    duration_chans: int = 256
    duration_kernel: int = 3
    duration_dropout: float = 0.2
    pitch_layers: int = 7
    pitch_chans: int = 256
    pitch_kernel: int = 5
    pitch_dropout: float = 0.5
    energy_layers: int = 2
    energy_chans: int = 256
    energy_kernel: int = 3
    energy_dropout: float = 0.5
    utt_embed_dim: Optional[int] = 64
    lang_embs: Optional[int] = 8000
    glow_blocks: int = 18
    glow_hidden: int = 192
    glow_kernel: int = 5
    glow_layers: int = 4
    glow_sqz: int = 2
    use_postflow: bool = True            # False -> FastSpeech2-style (no glow)
    conditional_predictors: bool = True  # False -> plain LayerNorm predictors
    use_flash_attention: bool = None     # pallas O(T*d) attention; None=auto (TPU on)
    dtype: jnp.dtype = jnp.float32


def fastspeech2_config(**overrides) -> "ToucanTTSConfig":
    """The legacy FastSpeech2 variant used for GST embedding co-training
    (reference: ``FastSpeech2/FastSpeech2.py`` — d=384, 5-layer pitch
    predictor, unconditional predictors, no post-flow)."""
    base = dict(adim=384, enc_units=1536, dec_units=1536, pitch_layers=5,
                use_postflow=False, conditional_predictors=False)
    base.update(overrides)
    return ToucanTTSConfig(**base)


class ToucanTTS(nn.Module):
    config: ToucanTTSConfig = field(default_factory=ToucanTTSConfig)

    def setup(self):
        c = self.config
        self.encoder = Conformer(
            attention_dim=c.adim, attention_heads=c.aheads, linear_units=c.enc_units,
            num_blocks=c.enc_layers, cnn_kernel=c.enc_kernel, dropout_rate=c.dropout,
            positional_dropout_rate=c.dropout, attention_dropout_rate=c.dropout,
            use_input_embedding=True, use_output_norm=True,
            utt_embed_dim=c.utt_embed_dim, lang_embs=c.lang_embs,
            use_flash_attention=getattr(c, "use_flash_attention", None),
            dtype=c.dtype, name="encoder")
        pred_utt_dim = c.utt_embed_dim if c.conditional_predictors else None
        self.duration_predictor = DurationPredictor(
            c.duration_layers, c.duration_chans, c.duration_kernel, c.duration_dropout,
            utt_embed_dim=pred_utt_dim, dtype=c.dtype, name="duration_predictor")
        self.pitch_predictor = VariancePredictor(
            c.pitch_layers, c.pitch_chans, c.pitch_kernel, c.pitch_dropout,
            utt_embed_dim=pred_utt_dim, dtype=c.dtype, name="pitch_predictor")
        self.energy_predictor = VariancePredictor(
            c.energy_layers, c.energy_chans, c.energy_kernel, c.energy_dropout,
            utt_embed_dim=pred_utt_dim, dtype=c.dtype, name="energy_predictor")
        self.pitch_embed = nn.Conv(c.adim, (1,), dtype=c.dtype, name="pitch_embed")
        self.energy_embed = nn.Conv(c.adim, (1,), dtype=c.dtype, name="energy_embed")
        self.decoder = Conformer(
            attention_dim=c.adim, attention_heads=c.aheads, linear_units=c.dec_units,
            num_blocks=c.dec_layers, cnn_kernel=c.dec_kernel, dropout_rate=c.dropout,
            positional_dropout_rate=c.dropout, attention_dropout_rate=c.dropout,
            use_input_embedding=False, use_output_norm=False,
            utt_embed_dim=None, lang_embs=None, dtype=c.dtype, use_flash_attention=getattr(c, "use_flash_attention", None),
            name="decoder")
        self.feat_out = nn.Dense(c.mel_channels, dtype=c.dtype, name="feat_out")
        self.conv_postnet = PostNet(odim=c.mel_channels, dtype=c.dtype, name="conv_postnet")
        if c.use_postflow:
            self.post_flow = Glow(
                in_channels=c.mel_channels, hidden_channels=c.glow_hidden,
                kernel_size=c.glow_kernel, n_blocks=c.glow_blocks, n_layers=c.glow_layers,
                text_condition_channels=c.adim, dtype=c.dtype, name="post_flow")

    # ------------------------------------------------------------- training

    def __call__(self, text, text_lengths, gold_speech, speech_lengths,
                 gold_durations, gold_pitch, gold_energy,
                 utterance_embedding=None, lang_ids=None, run_glow=True,
                 deterministic=True, train=False):
        """Teacher-forced forward.

        text (B, Tmax, 62); gold_speech (B, Lmax, 80); gold_durations (B, Tmax);
        gold_pitch/energy (B, Tmax, 1); utterance_embedding (B, E);
        lang_ids (B, 1) or None.
        Returns (before_outs, after_outs, d_pred, p_pred, e_pred, glow_loss).
        """
        cfg = self.config
        tmax, lmax = text.shape[1], gold_speech.shape[1]
        if utterance_embedding is not None:
            utterance_embedding = _l2_normalize(utterance_embedding)
        text_mask = make_non_pad_mask(text_lengths, tmax)          # (B, T)
        padding_mask = ~text_mask
        encoded = self.encoder(text, text_mask[:, None, :],
                               utterance_embedding=utterance_embedding,
                               lang_ids=lang_ids, deterministic=deterministic,
                               train=train)

        # pitch predictor sees detached encodings (reference: ToucanTTS.py:322)
        pitch_pred = self.pitch_predictor(jax_stop_gradient(encoded),
                                          padding_mask=padding_mask[..., None],
                                          utt_embed=utterance_embedding,
                                          deterministic=deterministic)
        energy_pred = self.energy_predictor(encoded, padding_mask=padding_mask[..., None],
                                            utt_embed=utterance_embedding,
                                            deterministic=deterministic)
        duration_pred = self.duration_predictor(encoded, padding_mask=padding_mask,
                                                utt_embed=utterance_embedding,
                                                deterministic=deterministic)

        enriched = (encoded
                    + self.energy_embed(gold_energy)
                    + self.pitch_embed(gold_pitch))
        upsampled = length_regulate(enriched, gold_durations, lmax)

        speech_mask = make_non_pad_mask(speech_lengths, lmax)       # (B, L)
        decoded = self.decoder(upsampled, speech_mask[:, None, :],
                               deterministic=deterministic, train=train)
        before_outs = self.feat_out(decoded)
        after_outs = before_outs + self.conv_postnet(before_outs, deterministic=deterministic)

        glow_loss = None
        if run_glow and cfg.use_postflow:
            glow_loss = self.post_flow.loss(
                gold_speech,
                jax_stop_gradient(after_outs),
                jax_stop_gradient(upsampled),
                speech_mask[..., None].astype(before_outs.dtype))
        return before_outs, after_outs, duration_pred, pitch_pred, energy_pred, glow_loss

    # ------------------------------------------------------------ inference

    def infer(self, text, text_lengths, max_frames, utterance_embedding=None,
              lang_ids=None, gold_durations=None, gold_pitch=None, gold_energy=None,
              duration_scaling_factor=1.0, pitch_variance_scale=1.0,
              energy_variance_scale=1.0, pause_duration_scaling_factor=1.0,
              glow_noise=None, run_glow=True):
        """Synthesis forward (reference: InferenceToucanTTS.py:183-250).

        Returns (before_outs, after_outs, durations, pitch, energy, mel_lengths)
        with after_outs (B, max_frames, 80); frames past mel_lengths are junk
        that the caller slices off.
        ``glow_noise`` must be (B, max_frames, 80) (callers draw it * 0.8).
        """
        cfg = self.config
        f2i = feature_index()
        tmax = text.shape[1]
        if utterance_embedding is not None:
            utterance_embedding = _l2_normalize(utterance_embedding)
        text_mask = make_non_pad_mask(text_lengths, tmax)
        text_cmask = text_mask[..., None].astype(text.dtype)
        encoded = self.encoder(text, text_mask[:, None, :],
                               utterance_embedding=utterance_embedding,
                               lang_ids=lang_ids, conv_mask=text_cmask)

        pitch = (self.pitch_predictor(encoded, utt_embed=utterance_embedding,
                                      input_mask=text_cmask)
                 if gold_pitch is None else gold_pitch)
        energy = (self.energy_predictor(encoded, utt_embed=utterance_embedding,
                                        input_mask=text_cmask)
                  if gold_energy is None else gold_energy)
        durations = (self.duration_predictor(encoded, utt_embed=utterance_embedding,
                                             is_inference=True, input_mask=text_cmask)
                     if gold_durations is None else gold_durations.astype(jnp.int32))

        # linguistic fixes + control knobs (vectorized)
        voiced = text[..., f2i["voiced"]] == 1
        is_phoneme = text[..., f2i["phoneme"]] == 1
        word_boundary = text[..., f2i["word-boundary"]] == 1
        silence = text[..., f2i["silence"]] == 1

        pitch = jnp.where(voiced[..., None], pitch, 0.0)
        energy = jnp.where(is_phoneme[..., None], energy, 0.0)
        durations = jnp.where(word_boundary, 0, durations)
        durations = jnp.where(
            silence,
            jnp.round(durations.astype(jnp.float32) * pause_duration_scaling_factor).astype(jnp.int32),
            durations)
        durations = jnp.round(durations.astype(jnp.float32) * duration_scaling_factor).astype(jnp.int32)
        durations = jnp.where(text_mask, durations, 0)
        pitch = _scale_variance(pitch, pitch_variance_scale)
        energy = _scale_variance(energy, energy_variance_scale)

        # all-zero fallback mutates the durations that get returned, like the
        # reference's in-place LengthRegulator hack (LengthRegulator.py:52-53)
        durations = regulate_durations(durations)
        durations = jnp.where(text_mask, durations, 0)

        enriched = encoded + self.pitch_embed(pitch) + self.energy_embed(energy)
        upsampled = length_regulate(enriched, durations, max_frames)
        mel_lengths = jnp.sum(durations, axis=1)
        frame_mask = make_non_pad_mask(mel_lengths, max_frames)
        frame_cmask = frame_mask[..., None].astype(enriched.dtype)

        decoded = self.decoder(upsampled, frame_mask[:, None, :], conv_mask=frame_cmask)
        before_outs = self.feat_out(decoded)
        after_outs = before_outs + self.conv_postnet(before_outs, mask=frame_cmask)

        if run_glow and cfg.use_postflow:
            if glow_noise is None:
                glow_noise = jnp.zeros_like(after_outs)
            after_outs = self.post_flow.sample(glow_noise, after_outs, upsampled,
                                               nonpadding=frame_cmask)
            # the flow's time-squeeze drops a trailing odd frame, exactly as
            # the reference's squeeze/unsqueeze truncation does
            mel_lengths = (mel_lengths // self.config.glow_sqz) * self.config.glow_sqz
        return before_outs, after_outs, durations, pitch, energy, mel_lengths


def _scale_variance(seq, scale):
    """Widen/narrow a prosody curve around its nonzero mean.

    Equals the reference ``_scale_variance`` (InferenceToucanTTS.py:333-343);
    at scale==1.0 the curve passes through untouched (including no clamping).
    """
    nonzero = seq != 0.0
    denom = jnp.maximum(jnp.sum(nonzero, axis=(1, 2), keepdims=True), 1)
    avg = jnp.sum(jnp.where(nonzero, seq, 0.0), axis=(1, 2), keepdims=True) / denom
    scaled = (seq - avg) * scale + avg
    scaled = jnp.maximum(scaled, 0.0)
    return jnp.where(jnp.asarray(scale) == 1.0, seq, scaled)


