"""Acoustic↔vocoder pipelined serving (SURVEY §2.10 PP row).

Splits the fused text→wave program into two stage programs — acoustic
(text → masked mel) and vocoder (mel → wave) — and double-buffers a stream
of batches through them:

* **≥2 devices**: the acoustic model's variables live on device A and the
  vocoder's on device B, so XLA executes the two stages on different chips
  concurrently; the mel hop rides the ICI via an async ``device_put``.
  While chip B vocodes batch N, chip A computes batch N+1's mel — steady-
  state throughput approaches the slower stage alone (the vocoder) instead
  of the harmonic mean of both.  This is the reference's CUDA-stream
  overlap design (the torch interface runs both stages on one stream,
  sequentially), rebuilt as placement-driven JAX pipelining.

* **1 device**: a TPU core executes XLA programs serially, so stage
  *compute* cannot overlap — but the stream loop still keeps several
  batches in flight (dispatch N+1 before fetching N's wave), hiding all
  host-side padding/fetch work behind device compute.  Throughput equals
  the two stages' harmonic mean, which the fused single-program path
  already achieves; the honest single-chip ceiling is documented in
  BENCH_NOTES.md (a >harmonic-mean e2e needs a second chip, not a faster
  dispatch).

Reference behavior: ``InferenceInterfaces/ToucanTTSInterface.py:93-135``
(sequential forward through tts then vocoder on one device).
"""

from __future__ import annotations

from collections import deque

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.models.toucan_tts import ToucanTTS


def make_stage_fns(model: ToucanTTS, vocoder, max_frames: int,
                   matmul_precision: str = "default"):
    """Two jitted stage programs sharing the fused path's semantics:
    frames past each sample's mel length are zero-masked before vocoding,
    so stage outputs are bit-identical to the fused single-program path."""

    def acoustic(tts_v, text, text_len, utt, lang, noise, knobs):
        with jax.default_matmul_precision(matmul_precision):
            outs = model.apply(
                tts_v, text, text_len, max_frames,
                utterance_embedding=utt, lang_ids=lang,
                duration_scaling_factor=knobs[0], pitch_variance_scale=knobs[1],
                energy_variance_scale=knobs[2],
                pause_duration_scaling_factor=knobs[3],
                glow_noise=noise, run_glow=True, method=ToucanTTS.infer)
        _, after, _, _, _, lens = outs
        mask = (jnp.arange(max_frames)[None, :] < lens[:, None])[..., None]
        mel = jnp.where(mask, after.astype(jnp.float32), 0.0)
        return mel, lens

    def vocode(voc_v, mel):
        with jax.default_matmul_precision(matmul_precision):
            return vocoder.apply(voc_v, mel)[..., 0]

    return jax.jit(acoustic), jax.jit(vocode)


class PipelinedSynthesizer:
    """Double-buffered two-stage synthesis over a stream of batches.

    ``devices``: defaults to ``jax.devices()``; with ≥2, the acoustic stage
    runs on ``devices[0]`` and the vocoder on ``devices[1]`` (stage
    parallelism); with 1, both run there and the pipeline degrades to
    dispatch-ahead streaming.  ``depth`` bounds in-flight batches.
    """

    def __init__(self, model, tts_variables, vocoder, vocoder_variables,
                 max_frames: int, devices=None, depth: int = 2,
                 matmul_precision: str = "default"):
        devices = list(devices) if devices is not None else jax.devices()
        self.dev_acoustic = devices[0]
        self.dev_vocoder = devices[1] if len(devices) > 1 else devices[0]
        self.two_stage = self.dev_acoustic is not self.dev_vocoder
        self.depth = depth
        self.max_frames = max_frames
        # placement drives execution: jit runs each stage on the device
        # holding its variables, so no per-call device annotation is needed
        self.tts_variables = jax.device_put(tts_variables, self.dev_acoustic)
        self.vocoder_variables = jax.device_put(vocoder_variables,
                                                self.dev_vocoder)
        self.acoustic_fn, self.vocode_fn = make_stage_fns(
            model, vocoder, max_frames, matmul_precision)

    def _dispatch(self, batch):
        """Enqueue both stages for one batch; returns device futures."""
        text, lens, utt, lang, noise, knobs = batch
        put = lambda x: (None if x is None
                         else jax.device_put(x, self.dev_acoustic))
        mel, mel_lens = self.acoustic_fn(self.tts_variables, put(text),
                                         put(lens), put(utt), put(lang),
                                         put(noise), put(knobs))
        if self.two_stage:
            # async ICI hop: the transfer overlaps chip A's next batch
            mel = jax.device_put(mel, self.dev_vocoder)
        wave = self.vocode_fn(self.vocoder_variables, mel)
        return wave, mel_lens

    def synthesize_stream(self, batches, as_numpy: bool = True):
        """Yield ``(wave, mel_lens)`` per input batch, keeping up to
        ``depth`` batches in flight.  ``as_numpy=True`` fetches each wave
        to the host (serving); ``as_numpy=False`` yields device arrays
        after a ready-wait — synthesis throughput without paying the
        host-transfer cost (fetch is the client's concern; use the PCM16
        path to move 4x fewer bytes on remote accelerators).  The caller
        trims each wave to ``mel_lens * samples_per_frame``."""
        def out(pair):
            wave, lens = pair
            if as_numpy:
                return np.asarray(wave), np.asarray(lens)
            jax.block_until_ready(wave)
            return wave, lens

        inflight = deque()
        for batch in batches:
            inflight.append(self._dispatch(batch))
            if len(inflight) > self.depth:
                yield out(inflight.popleft())
        while inflight:
            yield out(inflight.popleft())


# ------------------------------------------------------------------ bench


def bench_pipelined_vs_sequential(on_tpu, dtype, n_batches: int = 8):
    """Measure the two-stage pipelined stream against the fused
    single-program path on the same synthetic batches.  Returns a bench
    fragment dict; on a single-device host the pipelined number documents
    the serial-execution ceiling (= fused) rather than claiming overlap."""
    import time

    from toucan_tpu.models.toucan_tts import ToucanTTSConfig
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    b, tmax, frames = (8, 128, 1024) if on_tpu else (1, 16, 64)
    audio_s = b * frames * 256 / 16000.0

    model = ToucanTTS(ToucanTTSConfig(dtype=dtype))
    vocoder = HiFiGANGenerator(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    text = (jax.random.uniform(rng, (b, tmax, 62)) > 0.5).astype(jnp.float32)
    lens = jnp.full((b,), tmax, jnp.int32)
    utt = jax.random.normal(rng, (b, 64), jnp.float32)
    lang = jnp.zeros((b, 1), jnp.int32)
    noise = jax.random.normal(rng, (b, frames, 80)) * 0.8
    knobs = jnp.ones((4,), jnp.float32)
    tts_vars = jax.jit(
        lambda r, t: model.init(r, t, lens, frames, utterance_embedding=utt,
                                lang_ids=lang, glow_noise=noise,
                                method=ToucanTTS.infer))(rng, text)
    voc_vars = jax.jit(vocoder.init)(rng, jnp.zeros((b, frames, 80), dtype))

    batch = (text, lens, utt, lang, noise, knobs)

    # --- fused sequential baseline: both stages in one program
    def fused(tv, vv, tx):
        outs = model.apply(tv, tx, lens, frames, utterance_embedding=utt,
                           lang_ids=lang, glow_noise=noise,
                           run_glow=True, method=ToucanTTS.infer)
        _, after, _, _, _, mlens = outs
        mask = (jnp.arange(frames)[None, :] < mlens[:, None])[..., None]
        mel = jnp.where(mask, after.astype(jnp.float32), 0.0)
        return vocoder.apply(vv, mel)[..., 0], mlens

    fused_j = jax.jit(fused)

    def run_fused():
        outs = [fused_j(tts_vars, voc_vars, text) for _ in range(n_batches)]
        jax.block_until_ready(outs[-1])
        return outs

    run_fused()  # compile + warm
    t0 = time.perf_counter()
    run_fused()
    fused_s = time.perf_counter() - t0

    # --- pipelined two-stage stream (device-ready per batch; no host
    # fetch — the fused baseline above doesn't fetch either)
    pipe = PipelinedSynthesizer(model, tts_vars, vocoder, voc_vars, frames,
                                depth=2)
    list(pipe.synthesize_stream([batch] * 2))  # compile + warm both stages

    def run_pipe():
        for _ in pipe.synthesize_stream([batch] * n_batches, as_numpy=False):
            pass

    t0 = time.perf_counter()
    run_pipe()
    pipe_s = time.perf_counter() - t0

    out = {
        "e2e_fused_audio_s_per_s": round(n_batches * audio_s / fused_s, 1),
        "e2e_pipelined_audio_s_per_s": round(n_batches * audio_s / pipe_s, 1),
        "e2e_pipelined_two_stage_devices": pipe.two_stage,
    }

    # single-utterance serving latency (BASELINE config 1 is a single
    # sentence): one fused text->wave dispatch at B=1 with a ~16-phone
    # input, measured to host-visible completion (best of 5 after warm)
    b1, t1, f1 = 1, 32, 256
    text1 = (jax.random.uniform(rng, (b1, t1, 62)) > 0.5).astype(jnp.float32)
    lens1 = jnp.full((b1,), 16, jnp.int32)
    utt1 = jax.random.normal(rng, (b1, 64), jnp.float32)
    lang1 = jnp.zeros((b1, 1), jnp.int32)
    noise1 = jax.random.normal(rng, (b1, f1, 80)) * 0.8

    def fused1(tv, vv, tx):
        outs = model.apply(tv, tx, lens1, f1, utterance_embedding=utt1,
                           lang_ids=lang1, glow_noise=noise1,
                           run_glow=True, method=ToucanTTS.infer)
        _, after, _, _, _, mlens = outs
        mask = (jnp.arange(f1)[None, :] < mlens[:, None])[..., None]
        mel = jnp.where(mask, after.astype(jnp.float32), 0.0)
        return vocoder.apply(vv, mel)[..., 0], mlens

    fused1_j = jax.jit(fused1)
    jax.block_until_ready(fused1_j(tts_vars, voc_vars, text1))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fused1_j(tts_vars, voc_vars, text1))
        best = min(best, time.perf_counter() - t0)
    out["single_utterance_latency_ms"] = round(best * 1000, 1)
    return out
