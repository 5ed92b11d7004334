"""Training recipes (``TrainingInterfaces/TrainingPipelines/`` equivalents).

Each pipeline mirrors its reference counterpart's wiring and default
hyperparameters: corpus recipes feed ``prepare_fastspeech_corpus``, then
the loop arbiter trains mono or meta; vocoder pipelines build wave/mel
pair datasets and run the GAN loop; the aligner pipeline pretrains on a
multilingual pool.
"""

from __future__ import annotations

import os
from typing import Optional

from toucan_tpu.data import corpus_recipes
from toucan_tpu.data.corpus import prepare_fastspeech_corpus

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")


def _mesh(n_data, n_model):
    if (n_data, n_model) == (None, 1):
        return None
    from toucan_tpu.dist import make_mesh
    return make_mesh(n_data=n_data, n_model=n_model)


def _load_gst_variables():
    """Frozen style-embedding variables for TTS training (the reference
    loads ``Models/Embedding/embedding_function.pt``)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from toucan_tpu.models.gst import StyleEmbedding

    path = os.path.join(MODELS_DIR, "Embedding", "embedding_function.msgpack")
    gst = StyleEmbedding()
    variables = gst.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 80)),
                         jnp.array([20]))
    if os.path.exists(path):
        with open(path, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
    else:
        print(f"warning: no embedding function at {path}; using random init")
    return variables


def _aligner_train_fn(datapoints, steps, mesh=None, batch_size=None,
                      pad_to=None):
    """Aligner fine-tune/pretrain loop.  With a mesh, the step is DP-sharded
    over 'data' and multi-host processes each sample their 1/Nth of the
    global batch (fixed ``pad_to`` shapes keep per-host slices consistent)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from toucan_tpu.train.aligner_train import (create_aligner_train_state,
                                                make_aligner_train_step,
                                                make_sharded_aligner_step)
    from toucan_tpu.data.batching import _ceil_to
    from toucan_tpu.frontend.inventory import vectors_to_ctc_ids

    state, opt = create_aligner_train_state(jax.random.PRNGKey(0))
    n_proc = jax.process_count()
    if batch_size is None:
        # round the default up to a process multiple so tiny corpora (e.g.
        # 7 datapoints on 2 hosts) degrade gracefully instead of asserting;
        # sampling with replacement makes batch > corpus harmless
        batch_size = max(n_proc, min(8, len(datapoints)) // n_proc * n_proc)
    seed = 0
    if mesh is not None:
        step, state_sh = make_sharded_aligner_step(state, opt, mesh)
        state = jax.device_put(state, state_sh)
        if n_proc > 1:
            # every host must hold the SAME datapoint list (the corpus
            # cache is shared); pad_to keeps per-host shapes consistent
            assert batch_size % n_proc == 0, \
                f"aligner batch_size {batch_size} not divisible by " \
                f"{n_proc} processes"
            batch_size //= n_proc
            seed = 7919 * jax.process_index()
            pad_to = pad_to or (
                _ceil_to(max(len(vectors_to_ctc_ids(np.asarray(d["text"])))
                             for d in datapoints), 8),
                _ceil_to(max(len(d["mel"]) for d in datapoints), 64))
    else:
        step = jax.jit(make_aligner_train_step(opt))
    rng = np.random.RandomState(seed)
    for s in range(steps):
        chosen = [datapoints[i] for i in rng.choice(len(datapoints), batch_size)]
        tokens = [vectors_to_ctc_ids(np.asarray(d["text"])) for d in chosen]
        tmax = pad_to[0] if pad_to else _ceil_to(max(len(t) for t in tokens), 8)
        lmax = pad_to[1] if pad_to else _ceil_to(
            max(len(d["mel"]) for d in chosen), 64)
        batch = dict(
            mel=np.zeros((batch_size, lmax, 80), np.float32),
            mel_lengths=np.asarray([len(d["mel"]) for d in chosen], np.int32),
            tokens=np.zeros((batch_size, tmax), np.int32),
            token_lengths=np.asarray([len(t) for t in tokens], np.int32),
            speaker_embeddings=np.stack([d.get("speaker_embedding",
                                               np.zeros(192, np.float32))
                                         for d in chosen]),
        )
        for i, d in enumerate(chosen):
            batch["mel"][i, :len(d["mel"])] = d["mel"]
            batch["tokens"][i, :len(tokens[i])] = tokens[i]
        if mesh is not None:
            from toucan_tpu.dist import make_global_batch
            batch_dev = make_global_batch(batch, mesh)
        else:
            batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
        state, _ = step(state, batch_dev, jax.random.PRNGKey(s))
    return {"params": jax.device_get(state.asr_params),
            "batch_stats": jax.device_get(state.asr_batch_stats)}


def _prepare_recipe(spec, use_g2p=True):
    """``spec`` is a recipe name, or ``(name, lang_override)``, or
    ``(name, lang_override, ctc_selection)``."""
    name, lang, ctc_selection = spec, None, True
    if isinstance(spec, tuple):
        name, lang = spec[0], spec[1]
        if len(spec) > 2:
            ctc_selection = spec[2]
    lang = lang or corpus_recipes.recipe_language(name)
    mapping = corpus_recipes.build_path_to_transcript_dict(name)
    return prepare_fastspeech_corpus(
        mapping, os.path.join("Corpora", name), lang,
        aligner_train_fn=_aligner_train_fn, use_g2p=use_g2p,
        ctc_selection=ctc_selection)


def _tts_pipeline(recipe_names, save_name, steps=80_000, batch_size=24,
                  postnet_start_steps=9000, lr=1e-3, warmup_steps=8000,
                  use_discriminator=True, stochastic=False,
                  resume_checkpoint=None, resume=False, finetune=False,
                  model_dir=None, use_wandb=False, n_data=None, n_model=1,
                  seed=131714, use_g2p=True, config=None, **_):
    """``recipe_names``: flat list of recipe specs (one dataset each), or a
    list of lists — each inner list becomes ONE concatenated per-language
    dataset for the meta loop (``ToucanTTS_MetaCheckpoint.py:180-193``)."""
    from toucan_tpu.train.loop import train_loop

    save_dir = model_dir or os.path.join(MODELS_DIR, save_name)
    datasets = []
    for entry in recipe_names:
        if isinstance(entry, list):  # per-language group -> ConcatDataset
            group = []
            for spec in entry:
                group += _prepare_recipe(spec, use_g2p=use_g2p)
            datasets.append(group)
        else:
            datasets.append(_prepare_recipe(entry, use_g2p=use_g2p))
    gst_variables = _load_gst_variables()
    return train_loop(datasets if len(datasets) > 1 else datasets[0],
                      gst_variables, save_dir, config=config,
                      batch_size=batch_size, lr=lr,
                      warmup_steps=warmup_steps, steps=steps,
                      postnet_start_steps=postnet_start_steps,
                      use_discriminator=use_discriminator, resume=resume,
                      path_to_checkpoint=resume_checkpoint, fine_tune=finetune,
                      mesh=_mesh(n_data, n_model), seed=seed)


def nancy_pipeline(**kw):
    return _tts_pipeline(["nancy"], "ToucanTTS_Nancy", **kw)


def stochastic_nancy_pipeline(**kw):
    # the stochastic variant reuses the same data pipeline; its train loop
    # variant is selected through the model class
    return _tts_pipeline(["nancy"], "StochasticToucanTTS_Nancy", **kw)


def integration_test_pipeline(**kw):
    kw.setdefault("steps", 2000)
    kw.setdefault("batch_size", 8)
    kw.setdefault("warmup_steps", 500)
    kw.setdefault("postnet_start_steps", 200)
    return _tts_pipeline(["integration_test"], "ToucanTTS_IntegrationTest", **kw)


def meta_pipeline(**kw):
    """Massively multilingual checkpoint: the reference's 14 per-language
    ConcatDataset groups over 33 corpora (``ToucanTTS_MetaCheckpoint.py:47-193``),
    incl. the non-Latin G2P languages (cmn via aishell3/css10, vi via VietTTS)
    and Brazilian Portuguese."""
    kw.setdefault("steps", 160_000)
    groups = [
        ["nancy", "ljspeech", "libritts_all_clean", "vctk", "nvidia_hifitts",
         ("RAVDESS", None, False), "ESDS"],                       # en
        ["karlsson", "eva", "hokus", "bernd", "hui_others", "thorsten"],  # de
        ["css10el"],                                              # el
        ["spanish_blizzard_train", "css10es", "mls_spanish"],     # es
        ["css10fi"],                                              # fi
        ["css10ru"],                                              # ru
        ["css10hu"],                                              # hu
        ["css10nl", "mls_dutch"],                                 # nl
        ["siwis_subset", "blizzard2023_ad_silence_removed",
         "blizzard2023_neb_e_silence_removed",
         "blizzard2023_neb_silence_removed", "mls_french"],       # fr
        [("mls_portuguese", "pt-br")],                            # pt-br
        ["mls_polish"],                                           # pl
        ["mls_italian"],                                          # it
        ["css10cmn", "aishell3"],                                 # cmn
        ["vietTTS"],                                              # vi
    ]
    return _tts_pipeline(groups, "ToucanTTS_Meta", **kw)


def fs_embedding_integration_test_pipeline(resume_checkpoint=None, resume=False,
                                           finetune=False, model_dir=None,
                                           use_wandb=False, steps=2000,
                                           batch_size=8, warmup_steps=500,
                                           lr=1e-3, n_data=None, n_model=1,
                                           seed=131714, use_g2p=True,
                                           config=None, **_):
    """``fs_it``: embedding-function integration test — co-trains FastSpeech2
    with the GST style embedding on the 500-sample Nancy subset
    (``FastSpeech2Embedding_IntegrationTest.py:44-57``)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from toucan_tpu.data.batching import BatchSampler
    from toucan_tpu.train.embedding_train import (create_embedding_train_state,
                                                  make_embedding_train_step)

    save_dir = model_dir or os.path.join(MODELS_DIR, "FastSpeech2_IntegrationTest")
    dataset = _prepare_recipe("integration_test", use_g2p=use_g2p)
    state, optimizer, config = create_embedding_train_state(
        jax.random.PRNGKey(seed), config=config, lr=lr,
        warmup_steps=warmup_steps)
    step = jax.jit(make_embedding_train_step(config, optimizer))
    sampler = BatchSampler(dataset, batch_size=batch_size, seed=seed)
    rng = jax.random.PRNGKey(seed)
    while int(state.step) < steps:
        for batch in sampler:
            rng, sub = jax.random.split(rng)
            state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                            sub)
            if int(state.step) >= steps:
                break
    os.makedirs(save_dir, exist_ok=True)
    gst_vars = {"params": state.params["gst"],
                "batch_stats": state.batch_stats["gst"]}
    with open(os.path.join(save_dir, "embedding_function.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(gst_vars))
    return gst_vars


def finetuning_example(**kw):
    kw.setdefault("steps", 5000)
    kw.setdefault("lr", 1e-5)
    kw.setdefault("finetune", True)
    return _tts_pipeline(["integration_test"], "ToucanTTS_FineTuningExample", **kw)


def aligner_pipeline(resume_checkpoint=None, resume=False, finetune=False,
                     model_dir=None, steps=500_000, n_data=None, n_model=1,
                     seed=131714, **_):
    from toucan_tpu.data.corpus import build_aligner_cache
    datapoints = []
    for name in ["nancy", "ljspeech", "thorsten", "css10fr", "css10es"]:
        try:
            mapping = corpus_recipes.build_path_to_transcript_dict(name)
        except FileNotFoundError:
            continue
        lang = corpus_recipes.recipe_language(name)
        datapoints += build_aligner_cache(mapping, os.path.join("Corpora", name),
                                          lang)
    variables = _aligner_train_fn(datapoints, steps, mesh=_mesh(n_data, n_model))
    save_dir = model_dir or os.path.join(MODELS_DIR, "Aligner")
    os.makedirs(save_dir, exist_ok=True)
    from flax import serialization
    with open(os.path.join(save_dir, "aligner.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))
    return variables


def embedding_pipeline(model_dir=None, steps=100_000, n_data=None, n_model=1,
                       seed=131714, **_):
    import jax
    import jax.numpy as jnp
    from toucan_tpu.train.embedding_train import (create_embedding_train_state,
                                                  make_embedding_train_step)
    from toucan_tpu.data.batching import BatchSampler
    state, optimizer, config = create_embedding_train_state(jax.random.PRNGKey(seed))
    step = jax.jit(make_embedding_train_step(config, optimizer))
    datasets = []
    for name in ["nancy", "libritts"]:
        try:
            mapping = corpus_recipes.build_path_to_transcript_dict(name)
        except FileNotFoundError:
            continue
        lang = corpus_recipes.recipe_language(name)
        datasets += prepare_fastspeech_corpus(mapping, os.path.join("Corpora", name),
                                              lang, aligner_train_fn=_aligner_train_fn)
    sampler = BatchSampler(datasets, batch_size=16, seed=seed)
    rng = jax.random.PRNGKey(seed)
    while int(state.step) < steps:
        for batch in sampler:
            state, _ = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)
            if int(state.step) >= steps:
                break
    save_dir = model_dir or os.path.join(MODELS_DIR, "Embedding")
    os.makedirs(save_dir, exist_ok=True)
    from flax import serialization
    gst_vars = {"params": state.params["gst"], "batch_stats": state.batch_stats["gst"]}
    with open(os.path.join(save_dir, "embedding_function.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(gst_vars))
    return gst_vars


def _vocoder_pipeline(model_name, generator, steps=1_500_000, batch_size=18,
                      generator_warmup=30_000, model_dir=None, seed=131714,
                      n_data=None, n_model=1, **_):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from toucan_tpu.data.corpus import read_wave
    from toucan_tpu.data.vocoder_data import VocoderDataset
    from toucan_tpu.train import checkpointing
    from toucan_tpu.train.vocoder_train import (create_vocoder_train_state,
                                                make_sharded_vocoder_steps,
                                                make_vocoder_train_step)

    paths = []
    for name in ["nancy", "ljspeech", "libritts"]:
        try:
            paths += list(corpus_recipes.build_path_to_transcript_dict(name))
        except FileNotFoundError:
            continue
    # multi-host: every process loads its own 1/Nth of the global batch
    # (distinct sampling seed), mirroring the acoustic loop's scheme
    n_proc = jax.process_count()
    local_bs = batch_size
    if n_proc > 1:
        assert batch_size % n_proc == 0, \
            f"global batch {batch_size} must divide over {n_proc} processes"
        local_bs = batch_size // n_proc
        seed = seed + 7919 * jax.process_index()
    dataset = VocoderDataset(paths, seed=seed)
    rng = jax.random.PRNGKey(seed)
    state, opts = create_vocoder_train_state(rng, generator=generator)
    mesh = _mesh(n_data, n_model)
    if mesh is not None:
        from toucan_tpu.dist import make_global_batch
        _warm, adv_step, state_sh = make_sharded_vocoder_steps(
            state, opts, mesh, generator=generator)
        warm_step = lambda s, b, _u: _warm(s, b)
        state = jax.device_put(state, state_sh)
        to_device = lambda b: make_global_batch(b, mesh)
    else:
        warm_step = jax.jit(make_vocoder_train_step(opts, generator=generator,
                                                    use_adversarial=False),
                            static_argnums=2)
        adv_step = jax.jit(make_vocoder_train_step(opts, generator=generator,
                                                   use_adversarial=True),
                           static_argnums=2)
        to_device = lambda b: {k: jnp.asarray(v) for k, v in b.items()}
    save_dir = model_dir or os.path.join(MODELS_DIR, model_name)
    # wave loading/segmenting for batch N+1 overlaps step N (the reference's
    # DataLoader-worker role); see data/prefetch.py
    from toucan_tpu.data.prefetch import DevicePrefetcher

    def sample_forever():
        while True:
            yield dataset.sample_batch(local_bs)

    prefetcher = DevicePrefetcher(sample_forever(), to_device, depth=2)
    try:
        for batch in prefetcher:
            s = int(state.step)
            if s >= steps:
                break
            if s <= generator_warmup + 100:
                state, metrics = warm_step(state, batch, False)
            else:
                state, metrics = adv_step(state, batch, s % 3 == 0)
            if s % 5000 == 0:
                if n_proc > 1:
                    from toucan_tpu.train.sharded_checkpointing import (
                        save_sharded_checkpoint)
                    save_sharded_checkpoint(save_dir, state, s)
                else:
                    checkpointing.save_checkpoint(save_dir, state, s)
    finally:
        prefetcher.close()
    return state


def avocodo_pipeline(**kw):
    from toucan_tpu.models.vocoders import HiFiGANGenerator
    return _vocoder_pipeline("Avocodo", HiFiGANGenerator(), **kw)


def bigvgan_pipeline(**kw):
    from toucan_tpu.models.vocoders import BigVGAN
    return _vocoder_pipeline("BigVGAN", BigVGAN(), **kw)
