"""Scaling-efficiency measurement harness (BASELINE.md target: >=85% at 2
hosts, measured at 1 chip / 1 host / N hosts).

Measures ToucanTTS train-step throughput (utterances/s and mel-frames/s)
over a ('data', 'model') mesh of the available devices.  On a pod slice
the same entry point runs under ``jax.distributed``; on a single chip it
reports the 1-chip baseline; with ``--virtual N`` it validates the scaling
path on N virtual CPU devices (correctness, not wall-clock).

Usage:
    python -m toucan_tpu.dist.scaling_bench [--n_model 1] [--virtual 8]
"""

from __future__ import annotations

import argparse
import json
import time


def measure(n_data=None, n_model=1, batch_per_device=8, tmax=64, lmax=384,
            steps=10, config=None, init_on_cpu=False):
    """``init_on_cpu``: run parameter initialization on the host CPU
    backend and ship only the arrays to the mesh.  Through a TPU relay the
    init *compiles* alone cost ~11 min (measured round 5); CPU init takes
    ~90 s and the resulting throughput numbers are identical."""
    import contextlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from toucan_tpu.dist import batch_sharding, make_mesh, shard_train_state
    from toucan_tpu.models.gst import StyleEmbedding
    from toucan_tpu.models.toucan_tts import ToucanTTSConfig
    from toucan_tpu.train.toucan_train import create_train_state, make_train_step

    n_devices = len(jax.devices())
    if n_data is None:
        n_data = n_devices // n_model
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    batch_size = batch_per_device * n_data

    config = config or ToucanTTSConfig()
    rng = jax.random.PRNGKey(0)
    init_ctx = contextlib.nullcontext()
    if init_on_cpu:
        try:
            init_ctx = jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            pass  # no CPU backend registered: init on the default device
    with init_ctx:
        gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)),
                                         jnp.array([20]))
        state, optimizer = create_train_state(rng, config, gst_vars,
                                              batch_shape=(2, tmax, lmax))
    step_fn = make_train_step(config, optimizer, run_glow=True)

    rnd = np.random.RandomState(0)
    durations = np.zeros((batch_size, tmax), np.int32)
    durations[:, :] = lmax // tmax
    batch = dict(
        text=(rnd.rand(batch_size, tmax, 62) > 0.5).astype(np.float32),
        text_lengths=np.full((batch_size,), tmax, np.int32),
        gold_speech=rnd.randn(batch_size, lmax, 80).astype(np.float32),
        speech_lengths=np.full((batch_size,), lmax, np.int32),
        gold_durations=durations,
        gold_pitch=rnd.rand(batch_size, tmax, 1).astype(np.float32),
        gold_energy=rnd.rand(batch_size, tmax, 1).astype(np.float32),
        lang_ids=rnd.randint(0, 100, size=(batch_size, 1)),
    )

    state_sh = shard_train_state(state, mesh)
    data_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    step = jax.jit(step_fn,
                   in_shardings=(state_sh, {k: data_sh for k in batch}, rep),
                   out_shardings=(state_sh, rep))
    state_dev = jax.device_put(state, state_sh)
    batch_dev = {k: jax.device_put(jnp.asarray(v), data_sh)
                 for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    state_dev, metrics = step(state_dev, batch_dev, key)  # compile
    jax.device_get(metrics["total_loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state_dev, metrics = step(state_dev, batch_dev, key)
    jax.device_get(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / steps

    return {
        "devices": n_devices,
        "mesh": f"{n_data}x{n_model}",
        "batch_size": batch_size,
        "step_seconds": round(dt, 4),
        "utterances_per_second": round(batch_size / dt, 2),
        "mel_frames_per_second": round(batch_size * lmax / dt, 1),
        "per_device_utterances_per_second": round(batch_size / dt / n_devices, 2),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_model", type=int, default=1)
    parser.add_argument("--n_data", type=int, default=None)
    parser.add_argument("--batch_per_device", type=int, default=8)
    parser.add_argument("--virtual", type=int, default=0,
                        help="use N virtual CPU devices (validation mode)")
    parser.add_argument("--sweep", action="store_true",
                        help="measure 1 device and all devices; report efficiency")
    args = parser.parse_args(argv)

    if args.virtual:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    if args.sweep and len(jax.devices()) > 1:
        single = measure(n_data=1, n_model=1,
                         batch_per_device=args.batch_per_device)
        full = measure(n_data=None, n_model=args.n_model,
                       batch_per_device=args.batch_per_device)
        eff = (full["per_device_utterances_per_second"]
               / single["per_device_utterances_per_second"])
        print(json.dumps({"single_device": single, "all_devices": full,
                          "scaling_efficiency": round(eff, 3)}))
    else:
        print(json.dumps(measure(n_data=args.n_data, n_model=args.n_model,
                                 batch_per_device=args.batch_per_device)))


if __name__ == "__main__":
    main()
