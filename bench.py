"""Headline benchmark: audio-seconds synthesized per second per chip.

Runs the HiFiGAN/Avocodo vocoder (the production default) in bf16 on the
available accelerator, mirroring BASELINE.json's north-star metric
(>= 5000 audio-s/s/chip).  Prints ONE JSON line.

Timing is honest against async dispatch: K vocoder invocations are chained
data-dependently inside one jit and the measurement spans a host fetch of a
scalar reduction, so queue-and-return runtimes cannot undercount.
"""

import json
import time

import jax
import jax.numpy as jnp


TARGET = 5000.0  # audio-seconds / s / chip (BASELINE.json north star)


def main():
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # 16 kHz-rate mel frames, hop 256 -> 16 ms of audio per frame.
    batch, frames = (8, 960) if on_tpu else (1, 96)
    chain = 20 if on_tpu else 2
    audio_seconds = batch * frames * 256 / 16000.0

    model = HiFiGANGenerator(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (batch, frames, 80), dtype)
    variables = jax.jit(model.init)(rng, mel)

    @jax.jit
    def synthesize_chain(v, m):
        def body(i, carry):
            wave = model.apply(v, carry)
            # fold an epsilon of the output back in: keeps every iteration
            # data-dependent so XLA cannot hoist or elide any of them
            return carry + (1e-12 * jnp.mean(wave)).astype(carry.dtype)

        return jnp.sum(jax.lax.fori_loop(0, chain, body, m))

    jax.device_get(synthesize_chain(variables, mel))  # compile + warm up

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(synthesize_chain(variables, mel))
        best = min(best, time.perf_counter() - t0)
    value = audio_seconds * chain / best

    print(json.dumps({
        "metric": "vocoder_audio_seconds_per_second_per_chip",
        "value": round(value, 1),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(value / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
