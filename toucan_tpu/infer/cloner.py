"""Exact prosody cloning (UtteranceCloner equivalent).

Reference behavior (``InferenceInterfaces/UtteranceCloner.py``): from a
reference recording + its transcript, extract per-phone durations (via the
aligner with optional 5-step online fine-tune on that single utterance),
token-averaged pitch and energy, and resynthesize with any target voice;
leading/trailing silence trimmed by the VAD is reconstructed around the
generated audio.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from toucan_tpu.data.extraction import extract_prosody
from toucan_tpu.frontend.audio import AudioPreprocessor, trim_silence
from toucan_tpu.frontend.inventory import feature_index, vectors_to_ctc_ids
from toucan_tpu.frontend.text import TextFrontend
from toucan_tpu.models.aligner import Aligner, alignment_from_logits, ctc_loss


class UtteranceCloner:
    def __init__(self, tts_interface, aligner_variables, language: str = "en"):
        self.tts = tts_interface
        self.aligner_variables = aligner_variables
        self.ap = AudioPreprocessor(input_sr=16000, output_sr=16000, cut_silence=False)
        self.tf = TextFrontend(language=language, use_g2p=tts_interface.use_g2p)

    def _fine_tune_aligner(self, mel, token_ids, steps: int = 5, lr: float = 0.1):
        """A few SGD steps on this single utterance, like the reference's
        on_line_fine_tune (UtteranceCloner.py:75-94)."""
        aligner = Aligner()
        params = self.aligner_variables["params"]
        stats = self.aligner_variables["batch_stats"]
        opt = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(lr))
        opt_state = opt.init(params)
        mel_b = jnp.asarray(mel[None])
        tokens = jnp.asarray(np.asarray(token_ids)[None])
        mel_len = jnp.asarray([mel.shape[0]])
        tok_len = jnp.asarray([len(token_ids)])

        @jax.jit
        def step(params, stats, opt_state):
            def loss_fn(p):
                logits, updates = aligner.apply(
                    {"params": p, "batch_stats": stats}, mel_b, mel_len,
                    train=True, deterministic=True, mutable=["batch_stats"])
                return ctc_loss(logits, mel_len, tokens, tok_len), updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, loss

        for _ in range(steps):
            params, stats, opt_state, _ = step(params, stats, opt_state)
        return {"params": params, "batch_stats": stats}

    def extract_prosody(self, transcript: str, ref_wave, sr: int = 16000,
                        lang: str = "en", on_line_fine_tune: bool = True,
                        input_is_phones: bool = False,
                        pathfinding: str = "MAS"):
        if self.tf.language != lang:
            self.tf = TextFrontend(language=lang, use_g2p=self.tts.use_g2p)
        if self.ap.input_sr != sr:
            self.ap = AudioPreprocessor(input_sr=sr, output_sr=16000, cut_silence=False)
        full_wave = self.ap.audio_to_wave_tensor(ref_wave, normalize=True)
        norm_wave, start, end = trim_silence(full_wave, 16000)
        start_silence = start                      # samples trimmed in front
        end_silence = len(full_wave) - end         # samples trimmed at the back

        text = self.tf.string_to_features(transcript, input_phonemes=input_is_phones)
        mel = self.ap.audio_to_mel_spec_tensor(norm_wave, normalize=False,
                                               explicit_sampling_rate=16000).T  # (T, 80)
        token_ids = vectors_to_ctc_ids(text)

        variables = self.aligner_variables
        if on_line_fine_tune:
            variables = self._fine_tune_aligner(mel, token_ids)

        aligner = Aligner()
        logits = np.asarray(aligner.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(mel[None])))[0]

        f2i = feature_index()
        boundary_indices = [i for i, v in enumerate(text)
                            if v[f2i["word-boundary"]] == 1]
        alignment = alignment_from_logits(logits, token_ids,
                                          method=pathfinding)
        durations, energy, pitch = extract_prosody(
            norm_wave, alignment, text, boundary_indices, n_frames=mel.shape[0])
        return durations, pitch, energy, start_silence, end_silence

    def clone_utterance(self, reference_wave_for_intonation, transcription,
                        reference_wave_for_voice=None, sr: int = 16000,
                        lang: str = "en", filename_of_result=None,
                        input_is_phones: bool = False):
        """Returns a 24 kHz wave with the reference's exact prosody."""
        if reference_wave_for_voice is not None:
            self.tts.set_utterance_embedding(wave=reference_wave_for_voice, sr=sr)
        durations, pitch, energy, sil_start, sil_end = self.extract_prosody(
            transcription, reference_wave_for_intonation, sr=sr, lang=lang,
            input_is_phones=input_is_phones)
        self.tts.set_language(lang)
        # silence timestamps are 16 kHz samples; output runs at 24 kHz
        start_sil = np.zeros(int(sil_start * 1.5), np.float32)
        end_sil = np.zeros(int(sil_end * 1.5), np.float32)
        wave = self.tts(transcription, durations=durations,
                        pitch=pitch, energy=energy, input_is_phones=input_is_phones)
        out = np.concatenate([start_sil, wave, end_sil])
        if filename_of_result is not None:
            from toucan_tpu.infer.interface import _write_wav
            _write_wav(filename_of_result, out, 24000)
        return out

    def biblical_accurate_angel_mode(self, reference_wave_for_intonation,
                                     transcription, list_of_voice_waves,
                                     sr: int = 16000, lang: str = "en",
                                     filename_of_result=None):
        """Average several voices over identical prosody (reference
        UtteranceCloner.py:169-194)."""
        prev_embedding = self.tts.default_utterance_embedding.copy()
        durations, pitch, energy, sil_start, sil_end = self.extract_prosody(
            transcription, reference_wave_for_intonation, sr=sr, lang=lang)
        self.tts.set_language(lang)
        waves = []
        for voice_wave in list_of_voice_waves:
            self.tts.set_utterance_embedding(wave=voice_wave, sr=sr)
            waves.append(self.tts(transcription, durations=durations,
                                  pitch=pitch, energy=energy))
        n = min(len(w) for w in waves)
        mean_wave = np.stack([w[:n] for w in waves]).mean(0)
        out = np.concatenate([np.zeros(int(sil_start * 1.5), np.float32),
                              mean_wave,
                              np.zeros(int(sil_end * 1.5), np.float32)])
        self.tts.default_utterance_embedding = prev_embedding
        if filename_of_result is not None:
            from toucan_tpu.infer.interface import _write_wav
            _write_wav(filename_of_result, out, 24000)
        return out
