"""Headline benchmark: audio-seconds synthesized per second per chip.

Runs the HiFiGAN/Avocodo vocoder (the production default) on the available
accelerator in bf16, mirroring BASELINE.json's north-star metric
(>= 5000 audio-s/s/chip).  Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


TARGET = 5000.0  # audio-seconds / s / chip (BASELINE.json north star)


def main():
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # 16 kHz-rate mel frames, hop 256 -> each frame is 256/16000 s of audio;
    # output is 24 kHz (384 samples per frame).
    batch, frames = (8, 960) if on_tpu else (1, 96)
    audio_seconds = batch * frames * 256 / 16000.0

    model = HiFiGANGenerator(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    variables = jax.jit(model.init)(rng, mel)

    @jax.jit
    def synthesize(v, m):
        return model.apply(v, m)

    wave = synthesize(variables, mel)
    wave.block_until_ready()  # compile

    n_iters = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iters):
        wave = synthesize(variables, mel)
    wave.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters

    value = audio_seconds / dt
    print(json.dumps({
        "metric": "vocoder_audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
