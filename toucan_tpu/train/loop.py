"""ToucanTTS training loops (mono + meta) and the loop arbiter.

Mirrors the reference loops
(``toucantts_train_loop.py``, ``toucantts_meta_train_loop.py``,
``toucantts_train_loop_arbiter.py``): default hyperparameters lr=1e-3,
warmup 8k, 80k steps mono / 160k meta, batch 24, glow joins after
``postnet_start_steps``; per-epoch checkpoint + keep-5 + SWA(best of last
2) with live reload after 3x postnet_start_steps; ``--resume`` picks the
highest checkpoint, ``--finetune`` loads weights only.

Distribution: if a mesh is passed, the step is pjit-sharded (batch over
'data', optional TP over 'model') — the meta sampler then feeds per-host
shards of the global batch.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from toucan_tpu.data.batching import BatchSampler, MetaBatchSampler
from toucan_tpu.models.toucan_tts import ToucanTTSConfig
from toucan_tpu.train import checkpointing
from toucan_tpu.train.toucan_train import create_train_state, make_train_step


def train_loop(datasets, gst_variables, save_directory: str,
               config: Optional[ToucanTTSConfig] = None, batch_size: int = 24,
               lr: float = 1e-3, warmup_steps: int = 8000, steps: int = 80_000,
               postnet_start_steps: int = 9000, use_discriminator: bool = False,
               resume: bool = False, path_to_checkpoint: Optional[str] = None,
               fine_tune: bool = False, mesh=None, seed: int = 131714,
               steps_per_checkpoint: Optional[int] = None, log_every: int = 50,
               callbacks=(), prefetch: int = 2):
    """Arbiter semantics: one dataset -> mono loop; several -> meta loop."""
    config = config or ToucanTTSConfig()
    # a dataset is a sequence of datapoint dicts; a list of datasets is meta
    if not isinstance(datasets, (list, tuple)) or (
            len(datasets) > 0 and isinstance(datasets[0], dict)):
        datasets = [datasets]
    is_meta = len(datasets) > 1

    rng = jax.random.PRNGKey(seed)
    state, optimizer = create_train_state(
        rng, config, gst_variables, lr=lr, warmup_steps=warmup_steps,
        max_steps=steps, use_discriminator=use_discriminator)

    if resume:
        path_to_checkpoint = checkpointing.get_most_recent_checkpoint(save_directory)
    if path_to_checkpoint is not None:
        loaded = checkpointing.load_checkpoint(path_to_checkpoint, state)
        if fine_tune:
            state = state.replace(params=loaded.params,
                                  batch_stats=loaded.batch_stats,
                                  buffers=loaded.buffers)
        else:
            state = loaded

    steps_fns = {}

    def get_step_fn(run_glow: bool):
        if run_glow not in steps_fns:
            fn = make_train_step(config, optimizer, run_glow=run_glow,
                                 use_discriminator=use_discriminator)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                from toucan_tpu.dist import batch_sharding, shard_train_state
                state_sh = shard_train_state(state, mesh)
                data_sh = batch_sharding(mesh)
                rep = NamedSharding(mesh, P())
                batch_keys = ["text", "text_lengths", "gold_speech",
                              "speech_lengths", "gold_durations", "gold_pitch",
                              "gold_energy", "lang_ids"]
                fn = jax.jit(fn,
                             in_shardings=(state_sh, {k: data_sh for k in batch_keys},
                                           rep),
                             out_shardings=(state_sh, rep))
            else:
                fn = jax.jit(fn)
            steps_fns[run_glow] = fn
        return steps_fns[run_glow]

    # multi-host: each process samples its own 1/Nth of the global batch
    # (distinct seed) and pads to dataset-wide fixed shapes so the per-host
    # slices assemble into one consistent global array
    n_proc = jax.process_count()
    local_bs, pad_to = batch_size, None
    if n_proc > 1:
        assert mesh is not None, "multi-process training needs a mesh"
        assert batch_size % n_proc == 0, \
            f"global batch {batch_size} must divide over {n_proc} processes"
        local_bs = batch_size // n_proc
        seed = seed + 7919 * jax.process_index()
        from toucan_tpu.data.batching import _ceil_to
        tmax = max(len(d["text"]) for ds in datasets for d in ds)
        lmax = max(len(d["mel"]) for ds in datasets for d in ds)
        pad_to = (_ceil_to(tmax, 32), _ceil_to(lmax, 64))

    if is_meta:
        sampler = MetaBatchSampler(datasets, local_bs, seed=seed, pad_to=pad_to)
        steps_per_ckpt = steps_per_checkpoint or 1000
    else:
        sampler = BatchSampler(datasets[0], local_bs, seed=seed, pad_to=pad_to)
        steps_per_ckpt = steps_per_checkpoint or max(len(sampler), 1)

    step_rng = jax.random.PRNGKey(seed + 1)
    start = time.time()
    history = []
    from toucan_tpu.data.prefetch import prefetch_to_device
    while True:
        epoch_batches = (sampler.sample_batch() for _ in range(steps_per_ckpt)) \
            if is_meta else iter(sampler)
        # sampling + padding + upload of batch N+1 overlap step N (the
        # reference's DataLoader-workers role, toucantts_train_loop.py:68-76)
        for batch_dev in prefetch_to_device(epoch_batches, mesh=mesh,
                                            depth=prefetch):
            step_count = int(state.step)
            run_glow = step_count > postnet_start_steps or fine_tune
            step_fn = get_step_fn(run_glow)
            state, metrics = step_fn(state, batch_dev, step_rng)
            if step_count % log_every == 0:
                history.append({k: float(v) for k, v in metrics.items()})
                for cb in callbacks:
                    cb(step_count, history[-1])

        # epoch / checkpoint-interval boundary.  Multi-process state is not
        # fully host-addressable -> orbax sharded IO; single-process keeps
        # the light msgpack path.
        step_count = int(state.step)
        if n_proc > 1:
            from toucan_tpu.train.sharded_checkpointing import (
                save_sharded_checkpoint, swa_average)
            save_sharded_checkpoint(save_directory, state, step_count)
            if step_count > 3 * postnet_start_steps:
                state = swa_average(save_directory, state, n=2)
        else:
            checkpointing.save_checkpoint(save_directory, state, step_count)
            if step_count > 3 * postnet_start_steps:
                state = checkpointing.swa_update(save_directory, state, n=2)
        print(f"steps: {step_count}  elapsed: {round((time.time()-start)/60)} min")
        if step_count > steps:
            return state, history
