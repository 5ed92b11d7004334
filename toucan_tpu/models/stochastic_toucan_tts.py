"""StochasticToucanTTS: ToucanTTS with VITS-style stochastic prosody flows.

Behavioral equivalent of the reference
(``StochasticToucanTTS/StochasticToucanTTS.py``): same conformer/glow
skeleton, but duration/pitch/energy come from conditional spline flows
(6/6/3 flows) — forward returns flow NLLs (normalized by mask counts),
inference samples with noise_scale 0.3, pitch is sampled first and folded
into the encodings before energy, then durations, as in the reference.
"""

from dataclasses import field

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.lax import stop_gradient

from toucan_tpu.frontend.inventory import feature_index
from toucan_tpu.models.toucan_tts import ToucanTTSConfig
from toucan_tpu.nn.conformer import Conformer
from toucan_tpu.nn.glow import Glow
from toucan_tpu.nn.length_regulator import length_regulate, regulate_durations
from toucan_tpu.nn.masks import make_non_pad_mask
from toucan_tpu.nn.postnet import PostNet
from toucan_tpu.nn.stochastic_flows import StochasticVariancePredictor


class StochasticToucanTTS(nn.Module):
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
        self.duration_flow = StochasticVariancePredictor(
            c.adim, 5, 0.5, n_flows=6, cond_channels=c.utt_embed_dim,
            dtype=c.dtype, name="duration_flow")
        self.pitch_flow = StochasticVariancePredictor(
            c.adim, 5, 0.5, n_flows=6, cond_channels=c.utt_embed_dim,
            dtype=c.dtype, name="pitch_flow")
        self.energy_flow = StochasticVariancePredictor(
            c.adim, 3, 0.5, n_flows=3, cond_channels=c.utt_embed_dim,
            dtype=c.dtype, name="energy_flow")
        self.pitch_embed = nn.Conv(c.adim, (1,), dtype=c.dtype, name="pitch_embed")
        self.energy_embed = nn.Conv(c.adim, (1,), dtype=c.dtype, name="energy_embed")
        self.decoder = Conformer(
            attention_dim=c.adim, attention_heads=c.aheads, linear_units=c.dec_units,
            num_blocks=c.dec_layers, cnn_kernel=c.dec_kernel, dropout_rate=c.dropout,
            positional_dropout_rate=c.dropout, attention_dropout_rate=c.dropout,
            use_input_embedding=False, use_output_norm=False, dtype=c.dtype,
            use_flash_attention=getattr(c, "use_flash_attention", None),
            name="decoder")
        self.feat_out = nn.Dense(c.mel_channels, dtype=c.dtype, name="feat_out")
        self.conv_postnet = PostNet(odim=c.mel_channels, dtype=c.dtype,
                                    name="conv_postnet")
        self.post_flow = Glow(
            in_channels=c.mel_channels, hidden_channels=c.glow_hidden,
            kernel_size=c.glow_kernel, n_blocks=c.glow_blocks, n_layers=c.glow_layers,
            text_condition_channels=c.adim, dtype=c.dtype, name="post_flow")

    def __call__(self, text, text_lengths, gold_speech, speech_lengths,
                 gold_durations, gold_pitch, gold_energy, utterance_embedding=None,
                 lang_ids=None, run_glow=True, deterministic=True, train=False,
                 flow_rng=None):
        """Training forward.  Returns (before, after, duration_flow_loss,
        pitch_flow_loss, energy_flow_loss, glow_loss)."""
        cfg = self.config
        tmax, lmax = text.shape[1], gold_speech.shape[1]
        if flow_rng is None:
            flow_rng = jax.random.PRNGKey(0)
        r_pitch, r_energy, r_dur = jax.random.split(flow_rng, 3)
        text_mask = make_non_pad_mask(text_lengths, tmax)
        cmask = text_mask[..., None].astype(text.dtype)
        g = utterance_embedding[:, None, :] if utterance_embedding is not None else None

        encoded = self.encoder(text, text_mask[:, None, :],
                               utterance_embedding=utterance_embedding,
                               lang_ids=lang_ids, deterministic=deterministic,
                               train=train)

        # pitch flow: targets exp-scaled where nonzero, mask excludes zeros
        pitch_nonzero = gold_pitch != 0
        pitch_mask = cmask * pitch_nonzero.astype(cmask.dtype)
        scaled_pitch = jnp.where(pitch_nonzero, jnp.exp(gold_pitch), gold_pitch)
        pitch_nll = self.pitch_flow.nll(stop_gradient(encoded), pitch_mask,
                                        scaled_pitch, g=g, rng=r_pitch)
        pitch_loss = jnp.sum(pitch_nll) / jnp.maximum(jnp.sum(pitch_mask), 1.0)
        encoded = encoded + self.pitch_embed(gold_pitch)

        energy_nonzero = gold_energy != 0
        energy_mask = cmask * energy_nonzero.astype(cmask.dtype)
        scaled_energy = jnp.where(energy_nonzero, jnp.exp(gold_energy), gold_energy)
        energy_nll = self.energy_flow.nll(stop_gradient(encoded), energy_mask,
                                          scaled_energy, g=g, rng=r_energy)
        energy_loss = jnp.sum(energy_nll) / jnp.maximum(jnp.sum(energy_mask), 1.0)
        encoded = encoded + self.energy_embed(gold_energy)

        dur_nonzero = (gold_durations != 0)[..., None]
        dur_mask = cmask * dur_nonzero.astype(cmask.dtype)
        dur_targets = gold_durations[..., None].astype(cfg.dtype)
        dur_nll = self.duration_flow.nll(stop_gradient(encoded), dur_mask,
                                         dur_targets, g=g, rng=r_dur)
        duration_loss = jnp.sum(dur_nll) / jnp.maximum(jnp.sum(dur_mask), 1.0)

        upsampled = length_regulate(encoded, gold_durations, lmax)
        speech_mask = make_non_pad_mask(speech_lengths, lmax)
        decoded = self.decoder(upsampled, speech_mask[:, None, :],
                               deterministic=deterministic, train=train)
        before_outs = self.feat_out(decoded)
        after_outs = before_outs + self.conv_postnet(before_outs,
                                                     deterministic=deterministic)
        glow_loss = None
        if run_glow:
            glow_loss = self.post_flow.loss(
                gold_speech, stop_gradient(after_outs), stop_gradient(upsampled),
                speech_mask[..., None].astype(before_outs.dtype))
        return before_outs, after_outs, duration_loss, pitch_loss, energy_loss, glow_loss

    def infer(self, text, text_lengths, max_frames, utterance_embedding=None,
              lang_ids=None, glow_noise=None, run_glow=True, flow_rng=None,
              noise_scale: float = 0.3):
        cfg = self.config
        f2i = feature_index()
        tmax = text.shape[1]
        if flow_rng is None:
            flow_rng = jax.random.PRNGKey(0)
        r_pitch, r_energy, r_dur = jax.random.split(flow_rng, 3)
        text_mask = make_non_pad_mask(text_lengths, tmax)
        cmask = text_mask[..., None].astype(text.dtype)
        g = utterance_embedding[:, None, :] if utterance_embedding is not None else None

        encoded = self.encoder(text, text_mask[:, None, :],
                               utterance_embedding=utterance_embedding,
                               lang_ids=lang_ids, conv_mask=cmask)

        pitch = self.pitch_flow.sample(encoded, cmask, g=g, rng=r_pitch,
                                       noise_scale=noise_scale)
        voiced = text[..., f2i["voiced"]] == 1
        pitch = jnp.where(voiced[..., None], pitch, 0.0)
        encoded = encoded + self.pitch_embed(pitch)

        energy = self.energy_flow.sample(encoded, cmask, g=g, rng=r_energy,
                                         noise_scale=noise_scale)
        encoded = encoded + self.energy_embed(energy)

        log_dur = self.duration_flow.sample(encoded, cmask, g=g, rng=r_dur,
                                            noise_scale=noise_scale)
        durations = jnp.ceil(jnp.exp(log_dur[..., 0])).astype(jnp.int32)
        word_boundary = text[..., f2i["word-boundary"]] == 1
        durations = jnp.where(word_boundary, 0, durations)
        durations = jnp.where(text_mask, durations, 0)
        durations = regulate_durations(durations)
        durations = jnp.where(text_mask, durations, 0)

        upsampled = length_regulate(encoded, durations, max_frames)
        mel_lengths = jnp.sum(durations, axis=1)
        frame_mask = make_non_pad_mask(mel_lengths, max_frames)
        frame_cmask = frame_mask[..., None].astype(encoded.dtype)

        decoded = self.decoder(upsampled, frame_mask[:, None, :],
                               conv_mask=frame_cmask)
        before_outs = self.feat_out(decoded)
        after_outs = before_outs + self.conv_postnet(before_outs, mask=frame_cmask)
        if run_glow:
            if glow_noise is None:
                glow_noise = jnp.zeros_like(after_outs)
            after_outs = self.post_flow.sample(glow_noise, after_outs, upsampled,
                                               nonpadding=frame_cmask)
            mel_lengths = (mel_lengths // cfg.glow_sqz) * cfg.glow_sqz
        return before_outs, after_outs, durations, pitch, energy, mel_lengths
