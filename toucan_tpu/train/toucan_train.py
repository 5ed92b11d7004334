"""ToucanTTS training step (single- and multi-chip via pjit shardings).

Mirrors the reference mono train loop semantics
(``toucantts_train_loop.py:37-264``): frozen GST computes the per-utterance
style embedding, losses are summed with per-component NaN guards, the glow
joins after a warmup gate, an optional spectrogram discriminator adds
LSGAN + feature-matching signals (one shared optimizer, as in the
reference), gradients are clipped to global-norm 1.0, and Adam follows the
Toucan warmup schedule.
"""

from dataclasses import field
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from toucan_tpu.models.discriminator import SpectrogramDiscriminator, random_windows
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig
from toucan_tpu.train.losses import toucan_tts_loss
from toucan_tpu.train.schedules import toucan_warmup_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any            # {"tts": ..., "disc": ...?}
    batch_stats: Any
    buffers: Any
    opt_state: Any
    gst_variables: Any     # frozen style-embedding variables


def _nan_guard(x):
    return jnp.where(jnp.isnan(x), 0.0, x)


def make_optimizer(lr=1e-3, warmup_steps=8000, max_steps=80000, clip=1.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adam(toucan_warmup_schedule(lr, warmup_steps, max_steps)),
    )


def create_train_state(rng, config: ToucanTTSConfig, gst_variables,
                       batch_shape=(2, 8, 24), lr=1e-3, warmup_steps=8000,
                       max_steps=80000, use_discriminator=False):
    """batch_shape = (B, Tmax, Lmax) used only for shape-driven init."""
    b, tmax, lmax = batch_shape
    model = ToucanTTS(config)
    dummy = dict(
        text=jnp.zeros((b, tmax, config.input_features)),
        text_lengths=jnp.full((b,), tmax, jnp.int32),
        gold_speech=jnp.zeros((b, lmax, config.mel_channels)),
        speech_lengths=jnp.full((b,), lmax, jnp.int32),
        gold_durations=jnp.ones((b, tmax), jnp.int32),
        gold_pitch=jnp.zeros((b, tmax, 1)),
        gold_energy=jnp.zeros((b, tmax, 1)),
    )
    variables = model.init(rng, dummy["text"], dummy["text_lengths"],
                           dummy["gold_speech"], dummy["speech_lengths"],
                           dummy["gold_durations"], dummy["gold_pitch"],
                           dummy["gold_energy"],
                           utterance_embedding=jnp.zeros((b, config.utt_embed_dim)),
                           lang_ids=jnp.zeros((b, 1), jnp.int32))
    params = {"tts": variables["params"]}
    if use_discriminator:
        disc = SpectrogramDiscriminator()
        disc_vars = disc.init(rng, jnp.zeros((b, 100, 80, 1)))
        params["disc"] = disc_vars["params"]
    optimizer = make_optimizer(lr, warmup_steps, max_steps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        buffers=variables.get("buffers", {}),
        opt_state=optimizer.init(params),
        gst_variables=gst_variables,
    ), optimizer


def make_train_step(config: ToucanTTSConfig, optimizer, run_glow: bool = True,
                    use_discriminator: bool = False):
    """Returns a jittable (state, batch, rng) -> (state, metrics)."""
    model = ToucanTTS(config)
    disc = SpectrogramDiscriminator()
    gst = StyleEmbedding()

    def loss_fn(params, state, batch, rng):
        drop_rng, win_rng = jax.random.split(rng)
        style_emb = gst.apply(state.gst_variables, batch["gold_speech"],
                              batch["speech_lengths"])
        style_emb = jax.lax.stop_gradient(style_emb)

        outs, updates = model.apply(
            {"params": params["tts"], "batch_stats": state.batch_stats,
             "buffers": state.buffers},
            batch["text"], batch["text_lengths"], batch["gold_speech"],
            batch["speech_lengths"], batch["gold_durations"], batch["gold_pitch"],
            batch["gold_energy"], utterance_embedding=style_emb,
            lang_ids=batch["lang_ids"], run_glow=run_glow,
            deterministic=False, train=True,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"])
        before, after, d_pred, p_pred, e_pred, glow_loss = outs

        l1, dl, pl, el = toucan_tts_loss(
            before, after, batch["gold_speech"], batch["speech_lengths"],
            batch["text_lengths"], batch["gold_durations"], d_pred, p_pred, e_pred,
            batch["gold_pitch"], batch["gold_energy"])

        total = _nan_guard(l1) + _nan_guard(dl) + _nan_guard(pl) + _nan_guard(el)
        metrics = {"l1_loss": l1, "duration_loss": dl, "pitch_loss": pl,
                   "energy_loss": el}
        if run_glow and glow_loss is not None:
            total = total + _nan_guard(glow_loss)
            metrics["glow_loss"] = glow_loss

        if use_discriminator:
            fake_w, real_w = random_windows(win_rng, after, batch["gold_speech"],
                                            batch["speech_lengths"])
            # generator feedback: critic frozen (reference freezes requires_grad)
            frozen_disc = jax.lax.stop_gradient(params["disc"])
            gen_loss = disc.apply({"params": frozen_disc}, fake_w, real_w,
                                  method=SpectrogramDiscriminator.generator_feedback)
            # critic update: fake detached inside discriminator_loss
            crit_loss = disc.apply({"params": params["disc"]}, fake_w, real_w,
                                   method=SpectrogramDiscriminator.discriminator_loss)
            total = total + _nan_guard(gen_loss) + _nan_guard(crit_loss)
            metrics["generator_loss"] = gen_loss
            metrics["discriminator_loss"] = crit_loss

        metrics["total_loss"] = total
        return total, (updates["batch_stats"], metrics)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats,
                             opt_state=new_opt_state), metrics

    return train_step
