"""Aligner training step (CTC + TinyTTS reconstruction).

Mirrors ``autoaligner_train_loop.py:24-148``: RAdam(1e-4) for both the
aligner and the auxiliary reconstruction decoder, loss = CTC +
min(5, step/2000) * reconstruction, grad-clip 1.0 on each net.
"""

from typing import Any

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax

from toucan_tpu.models.aligner import Aligner, LSTMDirection, ctc_loss
from toucan_tpu.nn.masks import make_non_pad_mask


class TinyTTS(nn.Module):
    """Spectrogram-reconstruction decoder sharpening the CTC states
    (reference: ``AutoAligner/TinyTTS.py:9-36``)."""

    n_mels: int = 80
    num_symbols: int = 145
    speaker_embedding_dim: int = 192
    lstm_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lens, ys):
        """x (B, T, num_symbols + spk_dim); returns weighted L1+L2 loss."""
        x = nn.Dense(self.lstm_dim, dtype=self.dtype, name="in_proj")(x)
        for i in (1, 2):
            fwd = LSTMDirection(self.lstm_dim, dtype=self.dtype,
                                name=f"rnn{i}_fwd")(x, lens)
            bwd = LSTMDirection(self.lstm_dim, reverse=True, dtype=self.dtype,
                                name=f"rnn{i}_bwd")(x, lens)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        x = nn.Dense(self.n_mels, dtype=self.dtype, name="out_proj")(x)

        mask = make_non_pad_mask(lens, ys.shape[1])[..., None]
        weights = mask / jnp.sum(mask, axis=1, keepdims=True)
        weights = weights / (ys.shape[0] * ys.shape[2])
        err = jnp.abs(x - ys) + (x - ys) ** 2
        return jnp.sum(jnp.where(mask, err * weights, 0.0))


class AlignerTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    asr_params: Any
    asr_batch_stats: Any
    asr_opt_state: Any
    tts_params: Any
    tts_opt_state: Any


def _l2_normalize(x, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def create_aligner_train_state(rng, lr=1e-4, spk_dim=192):
    asr = Aligner()
    tts = TinyTTS(speaker_embedding_dim=spk_dim)
    mel = jnp.zeros((2, 16, 80))
    lens = jnp.array([16, 12])
    asr_vars = asr.init(rng, mel, lens)
    tts_vars = tts.init(rng, jnp.zeros((2, 16, 145 + spk_dim)), lens, mel)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.radam(lr))
    return AlignerTrainState(
        step=jnp.zeros((), jnp.int32),
        asr_params=asr_vars["params"],
        asr_batch_stats=asr_vars["batch_stats"],
        asr_opt_state=opt.init(asr_vars["params"]),
        tts_params=tts_vars["params"],
        tts_opt_state=opt.init(tts_vars["params"]),
    ), opt


def make_aligner_train_step(optimizer, use_reconstruction: bool = True,
                            spk_dim: int = 192):
    asr = Aligner()
    tts = TinyTTS(speaker_embedding_dim=spk_dim)

    def loss_fn(asr_params, tts_params, state, batch, rng):
        logits, updates = asr.apply(
            {"params": asr_params, "batch_stats": state.asr_batch_stats},
            batch["mel"], batch["mel_lengths"], train=True, deterministic=False,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        loss = ctc_loss(logits, batch["mel_lengths"], batch["tokens"],
                        batch["token_lengths"])
        metrics = {"ctc_loss": loss}
        if use_reconstruction:
            spk = _l2_normalize(batch["speaker_embeddings"])
            spk = jnp.broadcast_to(spk[:, None, :],
                                   (logits.shape[0], logits.shape[1], spk.shape[-1]))
            tts_lambda = jnp.minimum(5.0, state.step / 2000.0)
            recon = tts.apply({"params": tts_params},
                              jnp.concatenate([logits, spk], axis=-1),
                              batch["mel_lengths"], batch["mel"])
            metrics["reconstruction_loss"] = recon
            loss = loss + tts_lambda * recon
        metrics["total_loss"] = loss
        return loss, (updates["batch_stats"], metrics)

    def train_step(state: AlignerTrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (asr_grads, tts_grads), (new_stats, metrics) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.asr_params, state.tts_params, state, batch, rng)
        asr_updates, asr_opt = optimizer.update(asr_grads, state.asr_opt_state,
                                                state.asr_params)
        tts_updates, tts_opt = optimizer.update(tts_grads, state.tts_opt_state,
                                                state.tts_params)
        return state.replace(
            step=state.step + 1,
            asr_params=optax.apply_updates(state.asr_params, asr_updates),
            asr_batch_stats=new_stats,
            asr_opt_state=asr_opt,
            tts_params=optax.apply_updates(state.tts_params, tts_updates),
            tts_opt_state=tts_opt,
        ), metrics

    return train_step


def make_sharded_aligner_step(state, optimizer, mesh, **step_kwargs):
    """Mesh-sharded aligner train step: pure DP (utterance batch over
    'data', params replicated — BASELINE config 5's "aligner loop
    data-parallel across a pod slice"; the reference's loop is single-GPU,
    ``autoaligner_train_loop.py:24-148``).

    Returns ``(step, state_sh)``; put the state on the mesh with
    ``jax.device_put(state, state_sh)`` and feed batches through
    ``dist.make_global_batch``.  BatchNorm statistics and the CTC/recon
    means reduce over the global batch (XLA inserts the collectives), so
    the step is numerically the single-device step at global batch size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from toucan_tpu.dist import batch_sharding, shard_aligner_train_state

    state_sh = shard_aligner_train_state(state, mesh)
    data_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    batch_keys = ["mel", "mel_lengths", "tokens", "token_lengths",
                  "speaker_embeddings"]
    base = make_aligner_train_step(optimizer, **step_kwargs)
    step = jax.jit(base,
                   in_shardings=(state_sh, {k: data_sh for k in batch_keys},
                                 rep),
                   out_shardings=(state_sh, rep))
    return step, state_sh
