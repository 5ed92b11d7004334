"""End-to-end TTS facade: text -> articulatory features -> mel -> wave.

Equivalent of the reference ``InferenceInterfaces/ToucanTTSInterface.py``:
language/accent setters, utterance-embedding setters (from reference audio
through the GST), prosody-control knobs, per-phone prosody overrides, and
``read_to_file`` sentence batching with silence joins.

TPU-first: every model call is jitted with bucketed static shapes (phone
count and mel frames round up to buckets, masks handle the rest), so
repeated synthesis never recompiles; control knobs are traced scalars.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.frontend.audio import AudioPreprocessor
from toucan_tpu.frontend.text import TextFrontend, language_id
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig
from toucan_tpu.models.vocoders import BigVGAN, HiFiGANGenerator

PHONE_BUCKET = 32
FRAMES_PER_PHONE = 16       # static upper bound for the upsampled length
SAMPLES_PER_FRAME = 384     # 24 kHz out / 16 kHz-rate mel frames (hop 256)
SENTENCE_JOIN_SILENCE = 10600


def _round_up(n, m):
    return max(m, int(math.ceil(n / m)) * m)


class ToucanTTSInterface:
    def __init__(self, tts_variables, vocoder_variables, gst_variables,
                 default_embedding=None, config: Optional[ToucanTTSConfig] = None,
                 vocoder="hifigan", language: str = "en",
                 use_g2p: bool = True, seed: int = 0, dtype=None,
                 matmul_precision: str = "default",
                 mesh=None, longform_frames: int = 1024):
        """``vocoder``: "hifigan" | "bigvgan" or a vocoder module instance.
        ``dtype`` (e.g. jnp.bfloat16) overrides the compute dtype of the
        default-constructed acoustic model and vocoder — the serving
        configuration on TPU.

        ``matmul_precision`` is the documented precision policy: "default"
        runs TPU matmuls in the MXU's fast (bf16-input) mode — the serving
        path (~2e-2 mel error vs the f32 torch reference); "float32" forces
        full-precision MXU passes at ~3x matmul cost — the parity path
        (~7e-5 mel error; see BENCH_NOTES.md).  CPU is unaffected (always
        f32-exact).

        ``mesh``: an optional ``jax.sharding.Mesh`` with a 'data' axis.
        When set, syntheses whose frame budget reaches ``longform_frames``
        route the vocoder through ``dist/longform.py``'s time-sharded
        halo-exchange path (BASELINE config 4: long-form audio sharded
        across chips), bit-matching the unsharded wave."""
        import dataclasses

        self.config = config or ToucanTTSConfig()
        if dtype is not None and self.config.dtype != dtype:
            self.config = dataclasses.replace(self.config, dtype=dtype)
        self.model = ToucanTTS(self.config)
        if isinstance(vocoder, str):
            self.vocoder_name = vocoder
            voc_dtype = dtype or jnp.float32
            self.vocoder = (HiFiGANGenerator(dtype=voc_dtype)
                            if vocoder == "hifigan" else BigVGAN(dtype=voc_dtype))
        else:
            self.vocoder_name = type(vocoder).__name__.lower()
            self.vocoder = vocoder
        self.gst = StyleEmbedding()
        self.tts_variables = tts_variables
        self.vocoder_variables = vocoder_variables
        self.gst_variables = gst_variables
        self.use_g2p = use_g2p
        self.matmul_precision = matmul_precision
        self.audio_preprocessor = AudioPreprocessor(input_sr=16000, output_sr=16000,
                                                    cut_silence=True)
        self.set_language(language)
        self.rng = jax.random.PRNGKey(seed)
        if default_embedding is None and self.config.utt_embed_dim is not None:
            default_embedding = np.zeros(self.config.utt_embed_dim, np.float32)
        self.default_utterance_embedding = (
            None if default_embedding is None
            else np.asarray(default_embedding, np.float32))
        self._vocoder_cache = {}   # mel -> wave utility buckets
        self._e2e_cache = {}       # fused text -> wave buckets
        self._acoustic_cache = {}  # text -> mel buckets (longform path)
        self._voc_act_scales = None  # set by quantize_vocoder (int8 serving)
        self.mesh = mesh
        self.longform_frames = longform_frames

    # ------------------------------------------------------------- setters

    def set_language(self, lang: str):
        self.set_phonemizer_language(lang)
        self.set_accent_language(lang)

    def set_phonemizer_language(self, lang: str):
        self.text2phone = TextFrontend(language=lang, use_g2p=self.use_g2p)

    def set_accent_language(self, lang: str):
        self.lang_id = language_id(lang) if self.config.lang_embs is not None else None

    def set_utterance_embedding(self, path_to_reference_audio: str = "",
                                embedding=None, wave=None, sr: int = 16000):
        if embedding is not None:
            self.default_utterance_embedding = np.asarray(embedding, np.float32).reshape(-1)
            return
        if wave is None:
            from toucan_tpu.utils.optional import optional_import
            wave, sr = optional_import("soundfile").read(path_to_reference_audio)
        if sr != self.audio_preprocessor.input_sr:
            self.audio_preprocessor = AudioPreprocessor(input_sr=sr, output_sr=16000,
                                                        cut_silence=True)
        spec = self.audio_preprocessor.audio_to_mel_spec_tensor(wave).T  # (T, 80)
        emb = self.gst.apply(self.gst_variables, jnp.asarray(spec[None]),
                             jnp.asarray([len(spec)]))
        self.default_utterance_embedding = np.asarray(emb[0])

    def quantize_vocoder(self, calibration_mel=None, calibration_text=None):
        """EXPERIMENTAL: switch the vocoder to the int8 fused-stage kernel
        (kernels/pallas_stage.py) with PTQ activation scales calibrated on a
        representative mel.

        As measured on TPU v5e this mode is ~16% SLOWER than the default
        XLA bf16 folded path (BENCH_NOTES.md "int8 stage-kernel campaign":
        the chip's 2.9x int8 MXU rate cannot be realized at the vocoder's
        conv geometry — tap packing costs more in int8 data movement than
        the rate buys).  It is kept because the quality bound is proven
        (3.6e-6 max-abs-err vs exact f32) and the kernel wins on hardware
        with cheaper int8 lane handling; do NOT enable it for production
        serving on v5e-class chips — the default bf16 path is the fast one.

        ``calibration_mel``: (B, T, 80) log-mel; default: one synthesized
        from ``calibration_text`` (or a built-in pangram) through the
        acoustic model, which matches serving statistics exactly.
        """
        import warnings

        warnings.warn("quantize_vocoder is experimental and measured slower "
                      "than the default bf16 path on TPU v5e; see "
                      "BENCH_NOTES.md", stacklevel=2)
        from toucan_tpu.models.vocoders.hifigan import (HiFiGANGenerator,
                                                        calibrate_act_scales)

        if not isinstance(self.vocoder, HiFiGANGenerator):
            raise ValueError("int8 serving mode supports the HiFiGAN/Avocodo "
                             "generator (the production default)")
        if calibration_mel is None:
            text = calibration_text or "~ðə kwˈɪk bɹˈaʊn fˈɑks dʒˈʌmps ˈoʊvəɹ ðə lˈeɪzi dˈɔɡ~#"
            phones = self.text2phone.string_to_features(text, input_phonemes=True)
            n = len(phones)
            n_pad = _round_up(n, PHONE_BUCKET)
            text_arr = np.zeros((1, n_pad, phones.shape[1]), np.float32)
            text_arr[0, :n] = phones
            max_frames = n_pad * FRAMES_PER_PHONE
            self.rng, noise_rng = jax.random.split(self.rng)
            noise = jax.random.normal(noise_rng, (1, max_frames,
                                                  self.config.mel_channels)) * 0.8
            utt = (None if self.default_utterance_embedding is None
                   else jnp.asarray(self.default_utterance_embedding[None]))
            lang = (jnp.asarray([[self.lang_id]], jnp.int32)
                    if self.lang_id is not None else None)
            outs = self.model.apply(
                self.tts_variables, jnp.asarray(text_arr),
                jnp.asarray([n], jnp.int32), max_frames,
                utterance_embedding=utt, lang_ids=lang, glow_noise=noise,
                run_glow=True, method=ToucanTTS.infer)
            calibration_mel = np.asarray(outs[1], np.float32)[:, :int(outs[5][0])]
        scales = calibrate_act_scales(self.vocoder, self.vocoder_variables,
                                      calibration_mel)
        self._voc_act_scales = {k: jnp.asarray(v) for k, v in scales.items()}
        self.vocoder = self.vocoder.clone(stage_mode="int8")
        self._vocoder_cache.clear()
        self._e2e_cache.clear()
        return scales

    # ----------------------------------------------------------- synthesis

    def _voc_apply(self, v, m):
        if self._voc_act_scales is not None:
            return self.vocoder.apply(v, m, act_scales=self._voc_act_scales)
        return self.vocoder.apply(v, m)

    def _vocode(self, mel: np.ndarray) -> np.ndarray:
        """(L, 80) -> (L*384,) 24 kHz wave, bucketed jit."""
        frames = _round_up(len(mel), 64)
        if frames not in self._vocoder_cache:
            precision = self.matmul_precision

            voc_apply = self._voc_apply

            def vocode(v, m):
                with jax.default_matmul_precision(precision):
                    return voc_apply(v, m)

            self._vocoder_cache[frames] = jax.jit(vocode)
        mel_p = np.zeros((1, frames, mel.shape[1]), np.float32)
        mel_p[0, :len(mel)] = mel
        wave = self._vocoder_cache[frames](self.vocoder_variables, jnp.asarray(mel_p))
        return np.asarray(wave)[0, :len(mel) * SAMPLES_PER_FRAME, 0]

    def _e2e_fn(self, n_phones: int, max_frames: int, with_overrides: bool):
        """Fused text -> mel -> wave on device: no host round-trip between
        the acoustic model and the vocoder (the mel transfer + sync dominate
        serving latency on remote/attached accelerators).  Frames past each
        sample's mel length are zero-masked before vocoding — identical
        semantics to the zero-padded `_vocode` path."""
        key = (n_phones, max_frames, with_overrides)
        if key not in self._e2e_cache:
            model = self.model
            precision = self.matmul_precision

            def fn(tts_v, voc_v, text, text_len, utt, lang, noise, knobs,
                   durations=None, pitch=None, energy=None):
                with jax.default_matmul_precision(precision):
                    return _fn(tts_v, voc_v, text, text_len, utt, lang,
                               noise, knobs, durations, pitch, energy)

            def _fn(tts_v, voc_v, text, text_len, utt, lang, noise, knobs,
                    durations=None, pitch=None, energy=None):
                outs = model.apply(
                    tts_v, text, text_len, max_frames,
                    utterance_embedding=utt, lang_ids=lang,
                    gold_durations=durations, gold_pitch=pitch, gold_energy=energy,
                    duration_scaling_factor=knobs[0], pitch_variance_scale=knobs[1],
                    energy_variance_scale=knobs[2],
                    pause_duration_scaling_factor=knobs[3],
                    glow_noise=noise, run_glow=True, method=ToucanTTS.infer)
                _, after, dur, pit, ene, lens = outs
                mask = (jnp.arange(max_frames)[None, :] < lens[:, None])[..., None]
                mel = jnp.where(mask, after.astype(jnp.float32), 0.0)
                wave = self._voc_apply(voc_v, mel)[..., 0]
                return wave, after, dur, pit, ene, lens

            self._e2e_cache[key] = jax.jit(fn)
        return self._e2e_cache[key]

    def _acoustic_fn(self, n_phones: int, max_frames: int, with_overrides: bool):
        """Text -> (mel, prosody) only — the longform path vocodes the mel
        separately through the time-sharded halo-exchange synthesis."""
        key = (n_phones, max_frames, with_overrides)
        if key not in self._acoustic_cache:
            model = self.model
            precision = self.matmul_precision

            def fn(tts_v, text, text_len, utt, lang, noise, knobs,
                   durations=None, pitch=None, energy=None):
                with jax.default_matmul_precision(precision):
                    return model.apply(
                        tts_v, text, text_len, max_frames,
                        utterance_embedding=utt, lang_ids=lang,
                        gold_durations=durations, gold_pitch=pitch,
                        gold_energy=energy,
                        duration_scaling_factor=knobs[0],
                        pitch_variance_scale=knobs[1],
                        energy_variance_scale=knobs[2],
                        pause_duration_scaling_factor=knobs[3],
                        glow_noise=noise, run_glow=True,
                        method=ToucanTTS.infer)

            self._acoustic_cache[key] = jax.jit(fn)
        return self._acoustic_cache[key]

    def precompile(self, phone_buckets=(PHONE_BUCKET, 4 * PHONE_BUCKET),
                   batch_sizes=(1,), with_overrides=False):
        """Warm the jit caches for the given phone buckets and batch sizes so
        serving never pays compile latency on a live request."""
        for b in batch_sizes:
            for n_pad in phone_buckets:
                max_frames = n_pad * FRAMES_PER_PHONE
                text = jnp.zeros((b, n_pad, 62), jnp.float32)
                lens = jnp.full((b,), n_pad, jnp.int32)
                utt = (jnp.zeros((b, self.config.utt_embed_dim), jnp.float32)
                       if self.config.utt_embed_dim is not None else None)
                lang = (jnp.zeros((b, 1), jnp.int32)
                        if self.lang_id is not None else None)
                noise = jnp.zeros((b, max_frames, self.config.mel_channels),
                                  jnp.float32)
                knobs = jnp.ones((4,), jnp.float32)
                fn = self._e2e_fn(n_pad, max_frames, with_overrides)
                kw = {}
                if with_overrides:
                    kw = dict(durations=jnp.ones((b, n_pad), jnp.int32),
                              pitch=jnp.zeros((b, n_pad, 1), jnp.float32),
                              energy=jnp.zeros((b, n_pad, 1), jnp.float32))
                outs = fn(self.tts_variables, self.vocoder_variables, text,
                          lens, utt, lang, noise, knobs, **kw)
                jax.block_until_ready(outs)

    def synthesize_batch(self, texts, input_is_phones=False, languages=None,
                         utterance_embeddings=None, duration_scaling_factor=1.0,
                         pitch_variance_scale=1.0, energy_variance_scale=1.0,
                         pause_duration_scaling_factor=1.0,
                         return_pcm16=False):
        """Batched multi-speaker / multi-lingual synthesis (BASELINE
        config 2): one device invocation for the acoustic model and one for
        the vocoder over the whole batch.

        texts: list of strings.  languages: optional list of language codes
        (per-text phonemizer + accent id; default = the interface language).
        utterance_embeddings: optional (B, utt_dim) array or list of per-text
        speaker embeddings (default = the interface's current embedding).
        Returns a list of 24 kHz waves.  Padded batching is boundary-exact:
        conv masking makes each row equal its exact-length single run (see
        PARITY.md, tests/test_inference_interface.py).
        """
        b = len(texts)
        if languages is None:
            frontends = [self.text2phone] * b
            lang_ids_list = [self.lang_id] * b
        else:
            cache = getattr(self, "_frontend_cache", {})
            self._frontend_cache = cache
            frontends, lang_ids_list = [], []
            for lang in languages:
                if lang not in cache:
                    cache[lang] = TextFrontend(language=lang, use_g2p=self.use_g2p)
                frontends.append(cache[lang])
                lang_ids_list.append(language_id(lang)
                                     if self.config.lang_embs is not None else None)

        phones = [fe.string_to_features(tx, input_phonemes=input_is_phones)
                  for fe, tx in zip(frontends, texts)]
        lengths = np.asarray([len(p) for p in phones], np.int32)
        n_pad = _round_up(int(lengths.max()), PHONE_BUCKET)
        text_arr = np.zeros((b, n_pad, phones[0].shape[1]), np.float32)
        for i, p in enumerate(phones):
            text_arr[i, :len(p)] = p
        max_frames = n_pad * FRAMES_PER_PHONE

        if utterance_embeddings is None:
            utt = (None if self.default_utterance_embedding is None
                   else np.tile(self.default_utterance_embedding[None], (b, 1)))
        else:
            utt = np.asarray(utterance_embeddings, np.float32).reshape(b, -1)
        lang = (jnp.asarray([[l] for l in lang_ids_list], jnp.int32)
                if lang_ids_list[0] is not None else None)

        self.rng, noise_rng = jax.random.split(self.rng)
        noise = jax.random.normal(
            noise_rng, (b, max_frames, self.config.mel_channels)) * 0.8
        knobs = jnp.asarray([duration_scaling_factor, pitch_variance_scale,
                             energy_variance_scale, pause_duration_scaling_factor],
                            jnp.float32)
        fn = self._e2e_fn(n_pad, max_frames, False)
        waves, _, _, _, _, lens = fn(
            self.tts_variables, self.vocoder_variables, jnp.asarray(text_arr),
            jnp.asarray(lengths), jnp.asarray(utt), lang, noise, knobs)
        if return_pcm16:
            # convert on device: a PCM16 fetch moves 4x fewer bytes than f32
            # (matters on remote/attached accelerators; wav output is PCM16
            # anyway)
            waves = jax.jit(lambda w: jnp.round(
                jnp.clip(w, -1.0, 1.0) * 32767.0).astype(jnp.int16))(waves)
        lens = np.asarray(lens)
        waves = np.asarray(waves)
        return [waves[i, :int(lens[i]) * SAMPLES_PER_FRAME] for i in range(b)]

    def plot_synthesis(self, mel, durations, pitch, labels, path=None):
        """Spectrogram + prosody overview plot (reference:
        ``ToucanTTSInterface.py:171-228``): mel image, per-phone duration
        boundaries with phone labels on the x axis, pitch curve overlay.
        Returns the saved filepath."""
        import tempfile

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        mel = np.asarray(mel)
        durations = np.asarray(durations, np.int64)
        pitch = np.asarray(pitch).reshape(-1)
        fig, ax = plt.subplots(figsize=(9, 4))
        ax.imshow(mel.T, origin="lower", aspect="auto", cmap="GnBu",
                  interpolation="nearest")
        bounds = np.cumsum(durations)
        ax.vlines(bounds - 0.5, 0, mel.shape[1] - 1, colors="black",
                  linewidth=0.4, alpha=0.4)
        centers = bounds - durations / 2.0
        n = min(len(centers), len(labels))
        ax.set_xticks(centers[:n])
        ax.set_xticklabels(list(labels)[:n], fontsize=7)
        # per-frame pitch curve (phone-level values expanded by duration),
        # scaled into the lower 40% of the mel axis like the reference plot
        pitch_frames = np.repeat(pitch[:len(durations)], durations)
        if len(pitch_frames) and pitch_frames.max() > 0:
            scaled = pitch_frames / pitch_frames.max() * (mel.shape[1] * 0.4)
            ax.plot(np.arange(len(scaled)), scaled, color="crimson",
                    linewidth=1.2, label="pitch")
            ax.legend(loc="upper right", fontsize=7)
        ax.set_xlim(-0.5, mel.shape[0] - 0.5)
        ax.set_ylabel("mel bin")
        fig.tight_layout()
        if path is None:
            path = tempfile.NamedTemporaryFile(suffix=".png", delete=False).name
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def _dispatch_call(self, text: str, duration_scaling_factor=1.0,
                       pitch_variance_scale=1.0, energy_variance_scale=1.0,
                       pause_duration_scaling_factor=1.0, durations=None,
                       pitch=None, energy=None, input_is_phones=False,
                       glow_noise=None):
        """Enqueue one sentence's fused synthesis and return the device
        futures ``(wave, after, dur, pit, ene, lens)`` plus the phone count
        — no host sync.  JAX async dispatch lets a caller queue several
        sentences before fetching the first (see ``read_to_file``)."""
        phones = self.text2phone.string_to_features(text, input_phonemes=input_is_phones)
        n = len(phones)
        n_pad = _round_up(n, PHONE_BUCKET)
        text_arr = np.zeros((1, n_pad, phones.shape[1]), np.float32)
        text_arr[0, :n] = phones

        if durations is not None:
            max_frames = _round_up(int(np.sum(durations)
                                       * max(duration_scaling_factor, 1.0)) + 2, 64)
        else:
            max_frames = n_pad * FRAMES_PER_PHONE
        with_overrides = durations is not None or pitch is not None or energy is not None

        def pad_override(x, fill=0):
            if x is None:
                return None
            x = np.asarray(x, np.float32)
            out = np.zeros((1, n_pad) + x.shape[1:], np.float32)
            out[0, :n] = x
            return jnp.asarray(out)

        if glow_noise is None:
            self.rng, noise_rng = jax.random.split(self.rng)
            noise = jax.random.normal(noise_rng,
                                      (1, max_frames, self.config.mel_channels)) * 0.8
        else:  # injected z (deterministic synthesis / parity tests)
            glow_noise = np.asarray(glow_noise, np.float32)
            noise = np.zeros((1, max_frames, self.config.mel_channels), np.float32)
            noise[0, :len(glow_noise)] = glow_noise[:max_frames]
            noise = jnp.asarray(noise)
        lang = (jnp.asarray([[self.lang_id]], jnp.int32)
                if self.lang_id is not None else None)
        knobs = jnp.asarray([duration_scaling_factor, pitch_variance_scale,
                             energy_variance_scale, pause_duration_scaling_factor],
                            jnp.float32)

        dur_arr = pad_override(durations)
        if dur_arr is not None:
            dur_arr = dur_arr.astype(jnp.int32)
        utt = (None if self.default_utterance_embedding is None
               else jnp.asarray(self.default_utterance_embedding[None]))

        if self.mesh is not None and max_frames >= self.longform_frames:
            # BASELINE config 4: long-form synthesis — vocode the mel
            # time-sharded across the mesh (dist/longform.py halo exchange)
            from toucan_tpu.dist.longform import synthesize_longform

            afn = self._acoustic_fn(n_pad, max_frames, with_overrides)
            a_outs = afn(self.tts_variables, jnp.asarray(text_arr),
                         jnp.asarray([n], jnp.int32), utt, lang, noise, knobs,
                         durations=dur_arr, pitch=pad_override(pitch),
                         energy=pad_override(energy))
            _, after, dur, pit, ene, lens = a_outs
            mel_len = int(lens[0])
            mel = np.asarray(after, np.float32)[0, :mel_len]
            wave = synthesize_longform(self.vocoder, self.vocoder_variables,
                                       mel, self.mesh)
            return (np.asarray(wave)[None], after, dur, pit, ene, lens), n

        fn = self._e2e_fn(n_pad, max_frames, with_overrides)
        outs = fn(
            self.tts_variables, self.vocoder_variables, jnp.asarray(text_arr),
            jnp.asarray([n], jnp.int32), utt, lang, noise, knobs,
            durations=dur_arr, pitch=pad_override(pitch), energy=pad_override(energy))
        return outs, n

    def __call__(self, text: str, duration_scaling_factor=1.0,
                 pitch_variance_scale=1.0, energy_variance_scale=1.0,
                 pause_duration_scaling_factor=1.0, durations=None, pitch=None,
                 energy=None, input_is_phones=False,
                 return_duration_pitch_energy=False,
                 return_plot_as_filepath=False, glow_noise=None):
        outs, n = self._dispatch_call(
            text, duration_scaling_factor=duration_scaling_factor,
            pitch_variance_scale=pitch_variance_scale,
            energy_variance_scale=energy_variance_scale,
            pause_duration_scaling_factor=pause_duration_scaling_factor,
            durations=durations, pitch=pitch, energy=energy,
            input_is_phones=input_is_phones, glow_noise=glow_noise)
        wave_dev, after, dur, pit, ene, lens = outs

        # fetch only what the caller needs: the wave (trimmed) always; the
        # mel / prosody arrays only for plots or prosody returns
        mel_len = int(lens[0])
        wave = np.asarray(wave_dev)[0, :mel_len * SAMPLES_PER_FRAME]
        if return_duration_pitch_energy:
            return wave, np.asarray(dur)[0, :n], np.asarray(pit)[0, :n, 0], \
                np.asarray(ene)[0, :n, 0]
        if return_plot_as_filepath:
            if input_is_phones:
                labels = self.text2phone.postprocess_phoneme_string(
                    text, for_feature_extraction=False, for_plot_labels=True)
            else:
                labels = self.text2phone.get_phone_string(
                    text, for_plot_labels=True)
            path = self.plot_synthesis(np.asarray(after)[0, :mel_len],
                                       np.asarray(dur)[0, :n],
                                       np.asarray(pit)[0, :n, 0], labels)
            return wave, path
        return wave

    # ----------------------------------------------------------- file I/O

    def read_to_file(self, text_list, file_location, duration_scaling_factor=1.0,
                     pitch_variance_scale=1.0, energy_variance_scale=1.0,
                     silent=True, dur_list=None, pitch_list=None, energy_list=None,
                     increased_compatibility_mode=False, input_is_phones=False):
        import itertools

        silence = np.zeros(SENTENCE_JOIN_SILENCE, np.float32)
        # dispatch-ahead streaming: enqueue every sentence's fused synthesis
        # before fetching the first wave, so host-side G2P/padding for
        # sentence N+1 and the fetch of sentence N overlap device compute
        # (JAX async dispatch; SURVEY §2.10 serving-overlap row)
        inflight = []
        for text, durations, pitch, energy in itertools.zip_longest(
                text_list, dur_list or [], pitch_list or [], energy_list or []):
            if not text or not text.strip():
                continue
            if not silent:
                print(f"Now synthesizing: {text}")
            outs, _n = self._dispatch_call(
                text, durations=durations, pitch=pitch, energy=energy,
                duration_scaling_factor=duration_scaling_factor,
                pitch_variance_scale=pitch_variance_scale,
                energy_variance_scale=energy_variance_scale,
                input_is_phones=input_is_phones)
            inflight.append((outs[0], outs[5]))
        pieces = [silence]
        for wave_dev, lens in inflight:
            wave = np.asarray(wave_dev)[0, :int(lens[0]) * SAMPLES_PER_FRAME]
            pieces += [wave, silence]
        wav = np.concatenate(pieces)
        sr = 24000
        if increased_compatibility_mode:
            wav = np.repeat(wav, 2)  # 48 kHz compatibility export
            sr = 48000
            wav = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
        try:
            from toucan_tpu.utils.optional import optional_import
            optional_import("soundfile").write(
                file=file_location, data=wav, samplerate=sr,
                subtype="PCM_16" if increased_compatibility_mode else None)
        except ImportError:
            _write_wav(file_location, wav, sr)
        return wav


    def read_aloud(self, text, duration_scaling_factor=1.0,
                   pitch_variance_scale=1.0, energy_variance_scale=1.0,
                   blocking=False, increased_compatibility_mode=False,
                   input_is_phones=False, _player=None):
        """Synthesize and play through the host's audio device (reference
        ``ToucanTTSInterface.py:287-296``): pads half a second of trailing
        silence, optionally doubles to 48 kHz PCM16 for picky devices, and
        blocks until playback finishes when asked.  ``_player`` overrides the
        sounddevice module (for tests / headless hosts)."""
        if not text or text.strip() == "":
            return
        player = _player
        if player is None:
            import sounddevice as player  # host audio is inherently optional
        wav = self(text, duration_scaling_factor=duration_scaling_factor,
                   pitch_variance_scale=pitch_variance_scale,
                   energy_variance_scale=energy_variance_scale,
                   input_is_phones=input_is_phones)
        wav = np.concatenate([wav, np.zeros(12000, np.float32)])
        sr = 24000
        if increased_compatibility_mode:
            wav = np.repeat(wav, 2)
            sr = 48000
            wav = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
        player.play(wav, samplerate=sr)
        if blocking:
            player.wait()
        return wav


def _write_wav(path, data, sr):
    """Minimal WAV writer (PCM16) for hosts without soundfile."""
    import wave as wave_mod

    if data.dtype != np.int16:
        data = (np.clip(data, -1, 1) * 32767).astype(np.int16)
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(data.tobytes())
