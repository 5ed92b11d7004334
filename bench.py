"""Headline benchmark: audio-seconds synthesized per second per chip.

Runs the HiFiGAN/Avocodo vocoder (the production default) in bf16 on the
available accelerator, mirroring BASELINE.json's north-star metric
(>= 5000 audio-s/s/chip).  Prints the headline JSON line IMMEDIATELY after
the vocoder measurement (flushed), then re-prints the growing result after
every completed extra section, and finally once more as the last line —
the driver parses the tail, so an external kill at ANY point after the
first ~3 minutes still leaves a parseable record (round 3's official
record was empty because the old layout printed only at the very end).

Every heavy extra runs in its OWN SUBPROCESS under a hard wall-clock cap
(``subprocess.run(timeout=...)``), not a between-sections budget check:
a section that hangs in an XLA compile is killed at its cap instead of
eating the driver's whole timeout.  Subprocesses share the persistent
compilation cache (.jax_cache/), so repeat runs are fast.

Timing is honest against async dispatch: K vocoder invocations are chained
data-dependently inside one jit and the measurement spans a host fetch of a
scalar reduction, so queue-and-return runtimes cannot undercount.
"""

import json
import os
import subprocess
import sys
import time

TARGET = 5000.0  # audio-seconds / s / chip (BASELINE.json north star)

# hard wall-clock caps per extra section (seconds).  Round-5 restructure
# (VERDICT r04 #1: the official record never landed the scaling/train
# anchors in 4 rounds): parameter INITS now run on the host CPU backend
# (measured: vocoder GAN init 92 s on CPU vs 671 s compiled through the
# TPU relay), the scaling anchor and the acoustic train step share ONE
# compiled program ("train" section), the on-disk streamed anchor is
# env-gated (TOUCAN_BENCH_STREAMED=1), and int8 (a demoted serving path)
# left the default order.  Worst-case warm wall is now ~15 min for the
# full record.
SECTION_CAPS = {
    "train": 540,           # mesh-sharded acoustic step: scaling anchor +
                            # train throughput from one compile
    "train_vocoder": 480,   # vocoder GAN step, CPU-init + one compile
                            # (~350 s measured warm; the relay executable
                            # fetch dominates, not compute)
    "parity": 600,
    "acoustic": 360,
    "bigvgan": 300,
    "stft": 180,
    "pipelined": 420,
    "int8": 600,  # not in the default order (demoted path)
}
# launch order: the never-landed anchors run FIRST after the headline so
# an external kill costs the least-recorded sections, not the record
SECTION_ORDER = ["train", "train_vocoder", "parity", "acoustic",
                 "bigvgan", "stft", "pipelined"]


def _setup_jax():
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    return on_tpu, dtype


def _timed_chain(fn, variables, x, chain):
    """Best-of-3 wall time of ``chain`` data-dependently linked fn calls,
    measured through a host fetch (async-dispatch-proof)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, m):
        def body(i, carry):
            out = fn(v, carry)
            # fold an epsilon of the output back in: keeps every iteration
            # data-dependent so XLA cannot hoist or elide any of them
            return carry + (1e-12 * jnp.mean(out)).astype(carry.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, m))

    jax.device_get(run(variables, x))  # compile + warm up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(variables, x))
        best = min(best, time.perf_counter() - t0)
    return best / chain


# --------------------------------------------------------------- headline


def _headline():
    import jax
    import jax.numpy as jnp

    from toucan_tpu.models.vocoders import HiFiGANGenerator

    on_tpu, dtype = _setup_jax()
    # 16 kHz-rate mel frames, hop 256 -> 16 ms of audio per frame.
    batch, frames = (8, 960) if on_tpu else (1, 96)
    chain = 20 if on_tpu else 2
    audio_seconds = batch * frames * 256 / 16000.0

    model = HiFiGANGenerator(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    variables = jax.jit(model.init)(rng, mel)

    sec_per_call = _timed_chain(
        lambda v, m: model.apply(v, m), variables, mel, chain)
    return audio_seconds / sec_per_call


# ----------------------------------------------------------from here: extras
# each runs in its own subprocess (python bench.py --section NAME) and
# prints ONE json fragment dict on stdout


def _sec_acoustic():
    """Text->mel inference throughput, expressed as audio-s/s at the model's
    frame capacity (hop 256 @ 16 kHz => 16 ms of audio per produced frame)."""
    import jax
    import jax.numpy as jnp

    from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig

    on_tpu, dtype = _setup_jax()
    model = ToucanTTS(ToucanTTSConfig(dtype=dtype))
    rng = jax.random.PRNGKey(0)
    b, tmax, frames = (8, 128, 1024) if on_tpu else (1, 16, 64)
    text = (jax.random.uniform(rng, (b, tmax, 62)) > 0.5).astype(dtype)
    text_lengths = jnp.full((b,), tmax, jnp.int32)
    utt = jax.random.normal(rng, (b, 64), dtype)
    lang = jnp.zeros((b, 1), jnp.int32)
    noise = (jax.random.normal(rng, (b, frames, 80)) * 0.8).astype(dtype)
    variables = jax.jit(
        lambda r, t: model.init(r, t, text_lengths, frames,
                                utterance_embedding=utt, lang_ids=lang,
                                glow_noise=noise, method=ToucanTTS.infer)
    )(rng, text)

    def fwd(v, t):
        mel = model.apply(v, t, text_lengths, frames,
                          utterance_embedding=utt, lang_ids=lang,
                          glow_noise=noise, method=ToucanTTS.infer)[1]
        # feed a scalar of the mel back into the text input for chaining
        return jnp.mean(mel)[None, None, None]

    sec_per_call = _timed_chain(fwd, variables, text, 8 if on_tpu else 2)
    return {"acoustic_audio_s_per_s":
            round(b * frames * 256 / 16000.0 / sec_per_call, 1)}


def _sec_bigvgan():
    import jax

    from toucan_tpu.models.vocoders import BigVGAN

    on_tpu, dtype = _setup_jax()
    batch, frames = (8, 960) if on_tpu else (1, 96)
    chain = max((20 if on_tpu else 2) // 2, 2)
    audio_seconds = batch * frames * 256 / 16000.0
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    bmodel = BigVGAN(dtype=dtype)
    bvars = jax.jit(bmodel.init)(rng, mel)
    sec = _timed_chain(lambda v, m: bmodel.apply(v, m), bvars, mel, chain)
    return {"bigvgan_audio_s_per_s": round(audio_seconds / sec, 1)}


def _sec_stft():
    """log10-mel front end throughput (reshape framing + MXU matmul DFT)."""
    import jax
    import jax.numpy as jnp

    from toucan_tpu.frontend.audio import log_mel_spectrogram

    on_tpu, _ = _setup_jax()
    b, secs = (8, 30) if on_tpu else (1, 2)
    audio = jax.random.normal(jax.random.PRNGKey(0), (b, secs * 16000),
                              jnp.float32)

    def fwd(_v, a):
        mel = log_mel_spectrogram(a)
        return jnp.mean(mel)[None]

    sec_per_call = _timed_chain(fwd, None, audio, 20 if on_tpu else 2)
    return {"stft_mel_audio_s_per_s": round(b * secs / sec_per_call, 1)}


def _sec_pipelined():
    """End-to-end (acoustic+vocoder) throughput with double-buffered stage
    overlap: while the vocoder consumes mel N, the acoustic model computes
    mel N+1 (SURVEY 2.10 PP row; VERDICT r03 #5).  Reported next to the
    sequential fused path so the overlap win is on-record."""
    from toucan_tpu.infer.pipelined import bench_pipelined_vs_sequential

    on_tpu, dtype = _setup_jax()
    return bench_pipelined_vs_sequential(on_tpu, dtype)


def _train_batch(on_tpu):
    import numpy as np

    import jax.numpy as jnp

    b, tmax = (24, 100) if on_tpu else (2, 8)
    nprng = np.random.RandomState(0)
    durations = nprng.randint(3, 8, size=(b, tmax)).astype(np.int32)
    lmax = int(durations.sum(1).max())
    batch = dict(
        text=jnp.asarray((nprng.rand(b, tmax, 62) > 0.5).astype(np.float32)),
        text_lengths=jnp.full((b,), tmax, jnp.int32),
        gold_speech=jnp.asarray(nprng.randn(b, lmax, 80).astype(np.float32)),
        speech_lengths=jnp.asarray(durations.sum(1).astype(np.int32)),
        gold_durations=jnp.asarray(durations),
        gold_pitch=jnp.asarray(nprng.randn(b, tmax, 1).astype(np.float32)),
        gold_energy=jnp.asarray(nprng.randn(b, tmax, 1).astype(np.float32)),
        lang_ids=jnp.asarray(nprng.randint(0, 90, size=(b, 1))),
    )
    return batch, b, tmax, lmax


def _sec_train():
    """Scaling anchor + acoustic train throughput from ONE compiled
    program (VERDICT r04 #1c): the mesh-sharded full-size ToucanTTS train
    step (fwd+bwd+Adam, glow on) at the reference batch size 24 on a 1x1
    mesh.  ``scaling_bench_1chip`` is the fixed-geometry number the
    >=85%-at-2-hosts target (BASELINE.md) is measured against when a pod
    slice appears — same harness ``dist/scaling_bench.py`` sweeps with.
    Params init on the host CPU backend (the relay-compiled init alone
    cost ~11 min; see scaling_bench.measure)."""
    from toucan_tpu.dist.scaling_bench import measure

    on_tpu, _ = _setup_jax()
    if not on_tpu:
        return {"train_skipped": "cpu (mesh step compile too slow)"}
    b, tmax, lmax = 24, 100, 500  # reference batch, r4 train-bench shapes
    blob = measure(n_data=1, n_model=1, batch_per_device=b, tmax=tmax,
                   lmax=lmax, steps=12, init_on_cpu=True)
    out = {
        "scaling_bench_1chip": blob,
        "acoustic_train_steps_per_s": round(1.0 / blob["step_seconds"], 2),
        "acoustic_train_samples_per_s": blob["utterances_per_second"],
    }
    if os.environ.get("TOUCAN_BENCH_STREAMED", "0") == "1":
        out.update(_sec_train_streamed())
    return out


def _sec_train_streamed():
    """On-disk streamed-input anchor (env-gated: TOUCAN_BENCH_STREAMED=1;
    the honest relay-bound numbers are on record in BENCH_NOTES r4)."""
    import jax
    import jax.numpy as jnp

    from toucan_tpu.models.gst import StyleEmbedding
    from toucan_tpu.models.toucan_tts import ToucanTTSConfig
    from toucan_tpu.train.toucan_train import create_train_state, make_train_step

    on_tpu, dtype = _setup_jax()
    rng = jax.random.PRNGKey(0)
    batch, b, tmax, lmax = _train_batch(on_tpu)
    config = ToucanTTSConfig(dtype=dtype)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)),
                                         jnp.array([20]))
        state, optimizer = create_train_state(rng, config, gst_vars,
                                              batch_shape=(2, tmax, lmax))
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(config, optimizer, run_glow=True)
    try:
        return _streamed_vs_resident(step, state, batch, b, tmax, lmax)
    except Exception as exc:
        return {"streamed_error": str(exc)[:200]}


def _sec_train_vocoder():
    """Vocoder GAN step (G + D, adversarial phase) at the reference segment
    length (12288 samples -> 32 mel frames) and batch size 18.

    Round-5 phase profile through the relay: init compiled on-device 671 s
    vs 92 s on the host CPU backend; the step executable fetch is ~234 s
    (persistent-cache-proof: it is the relay transfer, not the compile);
    the steps themselves run at ~4/s.  So: CPU init, ONE jitted
    per-dispatch step, steps chained through the state dependency."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from toucan_tpu.train.vocoder_train import (
        create_vocoder_train_state, make_vocoder_train_step)

    on_tpu, _ = _setup_jax()
    if not on_tpu:  # the full GAN fwd+bwd graph takes many minutes to
        return {"train_vocoder_skipped": "cpu"}  # compile on CPU
    rng = jax.random.PRNGKey(0)
    nprng = np.random.RandomState(0)
    vb = 18
    with jax.default_device(jax.devices("cpu")[0]):
        state_v, optimizers = create_vocoder_train_state(rng)
    state_v = jax.device_put(state_v, jax.devices()[0])
    vstep = jax.jit(make_vocoder_train_step(optimizers, use_adversarial=True),
                    static_argnums=(2,))
    vbatch = dict(
        gold_wave=jnp.asarray(nprng.randn(vb, 12288, 1).astype(np.float32)),
        mel=jnp.asarray(nprng.randn(vb, 32, 80).astype(np.float32)),
    )

    s, _ = vstep(state_v, vbatch, True)  # compile + warm up
    jax.block_until_ready(jax.tree.leaves(s.g_params)[0])
    n = 15
    t0 = time.perf_counter()
    for _ in range(n):  # data-dependent chain through the state
        s, _ = vstep(s, vbatch, True)
    jax.block_until_ready(jax.tree.leaves(s.g_params)[0])
    dt = (time.perf_counter() - t0) / n
    return {
        "vocoder_train_steps_per_s": round(1.0 / dt, 2),
        "vocoder_train_audio_s_per_s": round(vb * 12288 / 24000 / dt, 1),
    }


def _streamed_vs_resident(step, state, resident_batch, b, tmax, lmax,
                          n_utts=96, n_steps=14):
    """Per-dispatch train-step throughput with (a) a device-resident batch
    and (b) batches streamed from an on-disk cache through the async
    prefetcher (pad + upload of batch N+1 overlaps step N) — the VERDICT
    r02 #4 deliverable: prove the input pipeline keeps the chip fed from
    disk, not just from a synthetic resident array.

    The same jitted step serves both paths (identical padded shapes), so
    the delta isolates input-pipeline overhead."""
    import shutil
    import tempfile

    import numpy as np

    import jax
    import jax.numpy as jnp

    from toucan_tpu.data.prefetch import DevicePrefetcher

    step_j = jax.jit(step)
    key = jax.random.PRNGKey(3)

    # --- on-disk cache of synthetic utterances, fastspeech-cache layout
    cache_dir = tempfile.mkdtemp(prefix="toucan_bench_cache_")
    rnd = np.random.RandomState(1)
    try:
        for i in range(n_utts):
            t = rnd.randint(tmax - 20, tmax + 1)
            durations = rnd.randint(3, 8, size=(t,)).astype(np.int32)
            total = min(int(durations.sum()), lmax)
            np.savez(os.path.join(cache_dir, f"utt_{i:04d}.npz"),
                     text=(rnd.rand(t, 62) > 0.5).astype(np.float32),
                     mel=rnd.randn(total, 80).astype(np.float32),
                     durations=durations,
                     pitch=rnd.randn(t, 1).astype(np.float32),
                     energy=rnd.randn(t, 1).astype(np.float32))

        def batch_indices(n):
            """Lightweight descriptors: the load+pad+upload work happens in
            the prefetcher's parallel workers (like the reference's
            DataLoader worker processes)."""
            order = rnd.permutation(n_utts)
            for s in range(n):
                idx = order[(s * b) % n_utts:][:b]
                if len(idx) < b:
                    idx = np.concatenate([idx, order[:b - len(idx)]])
                yield idx

        def load_pad_upload(idx):
            batch = dict(
                text=np.zeros((b, tmax, 62), np.float32),
                text_lengths=np.zeros((b,), np.int32),
                gold_speech=np.zeros((b, lmax, 80), np.float32),
                speech_lengths=np.zeros((b,), np.int32),
                gold_durations=np.zeros((b, tmax), np.int32),
                gold_pitch=np.zeros((b, tmax, 1), np.float32),
                gold_energy=np.zeros((b, tmax, 1), np.float32),
                lang_ids=np.zeros((b, 1), np.int64),
            )
            for j, ui in enumerate(idx):
                d = np.load(os.path.join(cache_dir, f"utt_{ui:04d}.npz"))
                t = len(d["text"])
                l = len(d["mel"])
                batch["text"][j, :t] = d["text"]
                batch["text_lengths"][j] = t
                batch["gold_speech"][j, :l] = d["mel"]
                batch["speech_lengths"][j] = l
                dur = d["durations"].copy()
                # clamp so durations sum to the stored mel length
                excess = int(dur.sum()) - l
                k = len(dur) - 1
                while excess > 0 and k >= 0:
                    cut = min(excess, int(dur[k]))
                    dur[k] -= cut
                    excess -= cut
                    k -= 1
                batch["gold_durations"][j, :t] = dur
                batch["gold_pitch"][j, :t] = d["pitch"]
                batch["gold_energy"][j, :t] = d["energy"]
            return {k_: jnp.asarray(v) for k_, v in batch.items()}

        # warm-up compile for the per-dispatch shape
        s_warm, _ = step_j(state, resident_batch, key)
        jax.block_until_ready(s_warm.params)

        def timed_run(batch_iter):
            s = state
            t0 = time.perf_counter()
            n = 0
            for bt in batch_iter:
                s, m = step_j(s, bt, key)
                if n == 0:
                    # restart the clock after the first step completes so
                    # prefetch-queue warm-up can't hide in the timing
                    jax.block_until_ready(s.params)
                    t0 = time.perf_counter()
                n += 1
            jax.block_until_ready(s.params)
            return (n - 1) / (time.perf_counter() - t0)

        resident_rate = timed_run([resident_batch] * n_steps)
        pf = DevicePrefetcher(batch_indices(n_steps), load_pad_upload,
                              depth=2, workers=4)
        streamed_rate = timed_run(pf)
        return {
            "acoustic_train_dispatch_steps_per_s": round(resident_rate, 2),
            "acoustic_train_ondisk_steps_per_s": round(streamed_rate, 2),
            "ondisk_vs_resident": round(streamed_rate / resident_rate, 3),
        }
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


def _sec_int8():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from toucan_tpu.models.vocoders import HiFiGANGenerator
    from toucan_tpu.models.vocoders.hifigan import calibrate_act_scales

    on_tpu, dtype = _setup_jax()
    if not on_tpu:
        return {"int8_skipped": "cpu"}
    batch, frames = 8, 960
    chain = 20
    audio_seconds = batch * frames * 256 / 16000.0
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    model = HiFiGANGenerator(dtype=dtype)
    variables = jax.jit(model.init)(rng, mel)

    out = {}
    f32_model = HiFiGANGenerator()
    mel32 = mel.astype(jnp.float32)
    vars32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    scales = calibrate_act_scales(f32_model, variables, mel32[:1])
    scales = {k: jnp.asarray(v) for k, v in scales.items()}
    q_model = HiFiGANGenerator(dtype=dtype, stage_mode="int8")
    sec_q = _timed_chain(
        lambda v, m: q_model.apply(v, m, act_scales=scales),
        variables, mel, chain)
    out["vocoder_int8_audio_s_per_s"] = round(audio_seconds / sec_q, 1)
    # quality: int8 vs exact f32 on the same mel
    w_ref = jax.jit(f32_model.apply)(vars32, mel32[:1])
    w_q = jax.jit(lambda v, m: q_model.apply(
        v, m, act_scales=scales))(variables, mel32[:1])
    out["vocoder_int8_max_abs_err_vs_f32"] = float(
        np.abs(np.asarray(w_q, np.float32)
               - np.asarray(w_ref, np.float32)).max())
    return out


def _sec_parity():
    out = {}
    err = _waveform_parity_max_abs_err()
    if err is not None:
        out["waveform_max_abs_err_vs_torch"] = err
    errs = _mel_parity_max_abs_err()
    if errs is not None:
        out.update(errs)
    return out


def _waveform_parity_max_abs_err():
    """BASELINE correctness metric, measured live: a random-init reference
    HiFiGAN (PyTorch, CPU, f32) vs our generator with converted weights on
    the benchmark device (f32).  Needs /root/reference + torch."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from toucan_tpu.compat.reference_import import (import_reference_module,
                                                    reference_available)
    from toucan_tpu.compat.torch_vocoder import convert_hifigan
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    if not reference_available():
        return None
    _setup_jax()
    torch.manual_seed(0)
    ref_mod = import_reference_module(
        "TrainingInterfaces.Spectrogram_to_Wave.HiFiGAN.HiFiGAN")
    ref = ref_mod.HiFiGANGenerator()
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    mel = np.random.RandomState(0).randn(2, 48, 80).astype(np.float32)
    with torch.no_grad():
        r_wave = ref(torch.tensor(mel.transpose(0, 2, 1)))[0].numpy()[:, 0, :]
    model = HiFiGANGenerator()
    variables = jax.tree.map(jnp.asarray, convert_hifigan(sd))
    wave = jax.jit(lambda v, m: model.apply(v, m, return_intermediates=True)[0]
                   )(variables, jnp.asarray(mel))
    return float(np.abs(np.asarray(wave)[..., 0] - r_wave).max())


def _mel_parity_max_abs_err():
    """Mel max-abs-err vs the reference's production inference architecture
    (InferenceToucanTTS) with converted weights, run on the benchmark device
    with gold prosody (the cloning path — deterministic alignment) and
    injected glow noise."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from toucan_tpu.compat.reference_import import (import_reference_module,
                                                    reference_available)
    from toucan_tpu.compat.torch_toucan import convert_toucan_tts
    from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig

    if not reference_available():
        return None
    _setup_jax()
    small = dict(enc_layers=2, dec_layers=2, pitch_layers=2)
    torch.manual_seed(0)
    train_mod = import_reference_module(
        "TrainingInterfaces.Text_to_Spectrogram.ToucanTTS.ToucanTTS")
    train_ref = train_mod.ToucanTTS(encoder_layers=small["enc_layers"],
                                    decoder_layers=small["dec_layers"],
                                    pitch_predictor_layers=small["pitch_layers"])
    inf_mod = import_reference_module(
        "InferenceInterfaces.InferenceArchitectures.InferenceToucanTTS")
    ref = inf_mod.ToucanTTS(encoder_layers=small["enc_layers"],
                            decoder_layers=small["dec_layers"],
                            pitch_predictor_layers=small["pitch_layers"],
                            weights=train_ref.state_dict())
    sd = {k: v.detach().numpy() for k, v in train_ref.state_dict().items()}

    cfg = ToucanTTSConfig(**small)
    model = ToucanTTS(cfg)
    variables = jax.tree.map(jnp.asarray, convert_toucan_tts(
        sd, enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
        pitch_layers=cfg.pitch_layers, energy_layers=cfg.energy_layers,
        glow_blocks=cfg.glow_blocks, glow_layers=cfg.glow_layers))

    rng = np.random.RandomState(5)
    t = 12
    text = (rng.rand(1, t, 62) > 0.5).astype(np.float32)
    utt = rng.randn(1, 64).astype(np.float32)
    lang = np.array([[4]])
    durations = rng.randint(2, 6, size=(1, t)).astype(np.int64)
    pitch = rng.randn(1, t, 1).astype(np.float32)
    energy = rng.randn(1, t, 1).astype(np.float32)

    with torch.no_grad():
        outs = ref._forward(torch.tensor(text), torch.tensor([t]),
                            utterance_embedding=torch.tensor(utt),
                            lang_ids=torch.tensor(lang),
                            gold_durations=torch.tensor(durations),
                            gold_pitch=torch.tensor(pitch),
                            gold_energy=torch.tensor(energy))
        r_before, r_dur = outs[0], outs[2]
    mel_len = int(r_dur.sum())
    max_frames = mel_len + 8 - (mel_len % 2)

    # before-postflow mel: the well-conditioned parity target.  (The glow
    # *reverse* with random weights compounds exp() couplings to scale
    # ~2000 and is chaotic under reordered-rounding — its parity is proven
    # on CPU in tests/test_toucan_parity.py with atol 3e-3.)
    def run():
        outs = jax.jit(
            lambda v, tx: model.apply(
                v, tx, jnp.asarray([t]), max_frames,
                utterance_embedding=jnp.asarray(utt), lang_ids=jnp.asarray(lang),
                gold_durations=jnp.asarray(durations), gold_pitch=jnp.asarray(pitch),
                gold_energy=jnp.asarray(energy),
                run_glow=False, method=ToucanTTS.infer))(variables, jnp.asarray(text))
        return float(np.abs(np.asarray(outs[0])[0, :mel_len]
                            - r_before.numpy()[:mel_len]).max())

    default_err = run()
    with jax.default_matmul_precision("float32"):
        f32_err = run()
    return {"mel_max_abs_err_vs_torch": default_err,
            "mel_max_abs_err_vs_torch_f32prec": f32_err}


def _sec_scaling():
    # standalone legacy-geometry scaling anchor (B=8/tmax=64/lmax=384,
    # comparable to the BENCH_NOTES r4 number); the DEFAULT record's
    # anchor now comes from the merged "train" section at B=24
    on_tpu, _ = _setup_jax()
    if not on_tpu:
        return {"scaling_skipped": "cpu"}
    from toucan_tpu.dist.scaling_bench import measure

    return {"scaling_bench_1chip_b8": measure(n_data=1, n_model=1,
                                              batch_per_device=8,
                                              init_on_cpu=True)}


SECTIONS = {
    "acoustic": _sec_acoustic,
    "train": _sec_train,
    "train_vocoder": _sec_train_vocoder,
    "bigvgan": _sec_bigvgan,
    "pipelined": _sec_pipelined,
    "stft": _sec_stft,
    "scaling": _sec_scaling,
    "parity": _sec_parity,
    "int8": _sec_int8,
}


def _run_section_subprocess(name, cap):
    """Run one extra section in a child process under a hard timeout;
    return its JSON fragment (or an error/timeout marker)."""
    env = dict(os.environ)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=cap, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return {f"{name}_timeout_s": cap}
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return {f"{name}_error": " | ".join(tail)[:300]}
    for line in reversed((proc.stdout or "").strip().splitlines()):
        try:
            frag = json.loads(line)
            if isinstance(frag, dict):
                return frag
        except ValueError:
            continue
    return {f"{name}_error": "no JSON fragment in section output"}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        name = sys.argv[2]
        print(json.dumps(SECTIONS[name]()), flush=True)
        return

    start = time.time()
    # the early-flushed headline (plus a re-print after every section) is
    # the real protection against external kills; the budget just keeps a
    # fully-cold run from spending an hour compiling before giving up
    budget = float(os.environ.get("TOUCAN_BENCH_BUDGET", "3600"))

    value = _headline()
    result = {
        "metric": "vocoder_audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / TARGET, 3),
    }
    # the headline lands NOW — any later kill still leaves this line
    print(json.dumps(result), flush=True)

    if os.environ.get("TOUCAN_BENCH_EXTRA", "1") != "0":
        extra = result["extra"] = {}
        skip = set()
        if os.environ.get("TOUCAN_BENCH_TRAIN", "1") == "0":
            skip.update(("train", "train_vocoder"))
        if os.environ.get("TOUCAN_BENCH_SCALING", "1") == "0":
            skip.add("scaling")
        section_s = result["section_seconds"] = {}
        for name in SECTION_ORDER:
            if name in skip:
                continue
            remaining = budget - (time.time() - start)
            if remaining < 30:
                extra[f"{name}_skipped_over_budget"] = True
                continue
            cap = min(SECTION_CAPS[name], int(remaining))
            t0 = time.time()
            extra.update(_run_section_subprocess(name, cap))
            section_s[name] = round(time.time() - t0, 1)
            if ("acoustic_audio_s_per_s" in extra
                    and "e2e_audio_s_per_s" not in extra):
                extra["e2e_audio_s_per_s"] = round(
                    1.0 / (1.0 / value + 1.0 / extra["acoustic_audio_s_per_s"]), 1)
            # re-print after every section: the tail is always parseable
            print(json.dumps(result), flush=True)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
