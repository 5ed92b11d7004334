"""GST embedding training: co-train with FastSpeech2 + fine-tune to tasks.

Mirrors ``Spectrogram_to_Embedding/embedding_function_train_loop.py`` (one
shared Adam over TTS + embedding params, noam warmup, a separate per-epoch
token-spread regularization step below 80k steps) and
``finetune_embeddings_to_tasks.py`` (triplet + barlow twins over sampled
same-label / different-label spectrogram triplets).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTS, fastspeech2_config
from toucan_tpu.train.diverse_losses import barlow_twins_loss, triplet_loss
from toucan_tpu.train.losses import toucan_tts_loss
from toucan_tpu.train.schedules import noam_warmup_schedule


class EmbeddingTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any            # {"tts": ..., "gst": ...}
    batch_stats: Any       # {"tts": ..., "gst": ...}
    opt_state: Any


def create_embedding_train_state(rng, config=None, lr=1e-3, warmup_steps=8000,
                                 batch_shape=(2, 8, 24)):
    config = config or fastspeech2_config()
    b, tmax, lmax = batch_shape
    tts = ToucanTTS(config)
    gst = StyleEmbedding()
    tts_vars = tts.init(rng, jnp.zeros((b, tmax, 62)), jnp.full((b,), tmax, jnp.int32),
                        jnp.zeros((b, lmax, 80)), jnp.full((b,), lmax, jnp.int32),
                        jnp.ones((b, tmax), jnp.int32), jnp.zeros((b, tmax, 1)),
                        jnp.zeros((b, tmax, 1)),
                        utterance_embedding=jnp.zeros((b, config.utt_embed_dim)),
                        lang_ids=jnp.zeros((b, 1), jnp.int32), run_glow=False)
    gst_vars = gst.init(rng, jnp.zeros((b, 20, 80)), jnp.full((b,), 20, jnp.int32))
    params = {"tts": tts_vars["params"], "gst": gst_vars["params"]}
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adam(noam_warmup_schedule(lr, warmup_steps)))
    return EmbeddingTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"tts": tts_vars.get("batch_stats", {}),
                     "gst": gst_vars.get("batch_stats", {})},
        opt_state=optimizer.init(params),
    ), optimizer, config


def make_embedding_train_step(config, optimizer):
    tts = ToucanTTS(config)
    gst = StyleEmbedding()

    def loss_fn(params, state, batch, rng):
        style_emb, gst_updates = gst.apply(
            {"params": params["gst"], "batch_stats": state.batch_stats["gst"]},
            batch["gold_speech"], batch["speech_lengths"], train=True,
            mutable=["batch_stats"])
        outs, tts_updates = tts.apply(
            {"params": params["tts"], "batch_stats": state.batch_stats["tts"]},
            batch["text"], batch["text_lengths"], batch["gold_speech"],
            batch["speech_lengths"], batch["gold_durations"], batch["gold_pitch"],
            batch["gold_energy"], utterance_embedding=style_emb,
            lang_ids=batch.get("lang_ids"), run_glow=False,
            deterministic=False, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        before, after, d_pred, p_pred, e_pred, _ = outs
        l1, dl, pl, el = toucan_tts_loss(
            before, after, batch["gold_speech"], batch["speech_lengths"],
            batch["text_lengths"], batch["gold_durations"], d_pred, p_pred, e_pred,
            batch["gold_pitch"], batch["gold_energy"])
        total = l1 + dl + pl + el
        new_stats = {"tts": tts_updates["batch_stats"],
                     "gst": gst_updates["batch_stats"]}
        return total, (new_stats, {"total_loss": total, "l1_loss": l1})

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params, updates),
                             batch_stats=new_stats, opt_state=opt_state), metrics

    return train_step


def make_spread_regularization_step(optimizer):
    """The per-epoch token-spread step (below 80k steps in the reference)."""

    def reg_step(state):
        def loss_fn(params):
            return StyleEmbedding.token_spread_regularizer(params["gst"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        return state.replace(params=optax.apply_updates(state.params, updates),
                             opt_state=opt_state), loss

    return jax.jit(reg_step)


# ------------------------------------------------------- task fine-tuning

def make_finetune_step(optimizer, barlow_weight: float = 0.1):
    """Triplet + barlow-twins fine-tuning of the embedding function over
    (anchor, positive, negative) spectrogram triplets
    (``finetune_embeddings_to_tasks.py:304-384``)."""
    gst = StyleEmbedding()

    def loss_fn(params, batch_stats, batch):
        def embed(spec, lens):
            emb, _ = gst.apply({"params": params, "batch_stats": batch_stats},
                               spec, lens, train=True, mutable=["batch_stats"])
            return emb

        anchor = embed(batch["anchor"], batch["anchor_lengths"])
        positive = embed(batch["positive"], batch["positive_lengths"])
        negative = embed(batch["negative"], batch["negative_lengths"])
        tl = triplet_loss(anchor, positive, negative)
        bt = barlow_twins_loss(anchor, positive)
        return tl + barlow_weight * bt, {"triplet": tl, "barlow": bt}

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    return step
