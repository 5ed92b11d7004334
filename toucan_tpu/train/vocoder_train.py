"""Vocoder (GAN) training: losses and train steps.

Mirrors ``hifigan_train_loop.py:19-182``: generator loss = 45*mel-L1 (on a
24 kHz 100-mel log spectrogram, fft 1536 hop 384 fmin 80) + 2*adversarial +
2*feature-matching after a 30k-step generator warmup; the discriminator
updates every ``generator_steps_per_discriminator_step``-th step; RAdam
with betas (0.5, 0.9), MultiStepLR halving at 500k/1M/1.2M/1.4M; grad-clip
10.0 on both nets.
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from toucan_tpu.frontend.audio import amplitude_spectrogram, mel_filterbank
from toucan_tpu.models.vocoders import HiFiGANGenerator
from toucan_tpu.models.vocoders.discriminators import AvocodoJointDiscriminator


# ------------------------------------------------------------------ losses

def mel_spectrogram_24k(wave, fs=24000, fft_size=1536, hop=384, num_mels=100,
                        fmin=80.0, fmax=None, eps=1e-10):
    """(B, T) wave -> (B, frames, num_mels) log10-mel, MelSpectrogramLoss
    parameters (``MelSpectrogramLoss.py:104-117``)."""
    fmax = fmax or fs / 2
    amp = amplitude_spectrogram(wave, fft_size, hop)
    basis = jnp.asarray(mel_filterbank(fs, fft_size, num_mels, fmin, fmax))
    # reference takes sqrt(clamp(power, eps)) then matmul then clamp+log10
    amp = jnp.sqrt(jnp.maximum(amp ** 2, eps))
    mel = jnp.einsum("...tf,mf->...tm", amp, basis)
    return jnp.log10(jnp.maximum(mel, eps))


def mel_loss(pred_wave, gold_wave):
    """L1 between log-mel spectrograms of predicted and gold 24 kHz waves."""
    return jnp.mean(jnp.abs(mel_spectrogram_24k(pred_wave)
                            - mel_spectrogram_24k(gold_wave)))


def generator_adversarial_loss(d_outs):
    """MSE-to-one on each discriminator's final score, averaged."""
    loss = 0.0
    for outs in d_outs:
        score = outs[-1]
        loss = loss + jnp.mean((score - 1.0) ** 2)
    return loss / len(d_outs)


def discriminator_adversarial_loss(d_outs_fake, d_outs_real):
    real, fake = 0.0, 0.0
    for outs_f, outs_r in zip(d_outs_fake, d_outs_real):
        fake = fake + jnp.mean(outs_f[-1] ** 2)
        real = real + jnp.mean((outs_r[-1] - 1.0) ** 2)
    n = len(d_outs_fake)
    return real / n + fake / n


def feature_matching_loss(d_outs_fake, d_outs_real):
    """L1 over feature maps (final score excluded), averaged per layer."""
    total = 0.0
    for outs_f, outs_r in zip(d_outs_fake, d_outs_real):
        per_disc = 0.0
        feats_f, feats_r = outs_f[:-1], outs_r[:-1]
        for f, r in zip(feats_f, feats_r):
            per_disc = per_disc + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
        total = total + per_disc / max(len(feats_f), 1)
    return total


# --------------------------------------------------------------- optimizer

def vocoder_schedule(base_lr):
    """MultiStepLR gamma=0.5 at 500k/1M/1.2M/1.4M steps."""
    def schedule(step):
        factor = (0.5 ** (step >= 500_000).astype(jnp.float32)
                  * 0.5 ** (step >= 1_000_000).astype(jnp.float32)
                  * 0.5 ** (step >= 1_200_000).astype(jnp.float32)
                  * 0.5 ** (step >= 1_400_000).astype(jnp.float32))
        return base_lr * factor
    return schedule


def make_vocoder_optimizers(g_lr=1e-3, d_lr=5e-4, clip=10.0):
    def radam(base_lr):
        return optax.chain(optax.clip_by_global_norm(clip),
                           optax.radam(vocoder_schedule(base_lr), b1=0.5, b2=0.9))
    return radam(g_lr), radam(d_lr)


class VocoderTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_opt_state: Any
    d_params: Any
    d_opt_state: Any


def create_vocoder_train_state(rng, generator=None, discriminator=None,
                               g_lr=1e-3, d_lr=5e-4, segment_frames: int = 32):
    generator = generator or HiFiGANGenerator()
    disc = discriminator or AvocodoJointDiscriminator()
    mel = jnp.zeros((1, segment_frames, 80))
    g_vars = generator.init(rng, mel, return_intermediates=True)
    wave = jnp.zeros((1, segment_frames * 384, 1))
    d_vars = disc.init(rng, wave, wave[:, ::2], wave[:, ::8])
    g_opt, d_opt = make_vocoder_optimizers(g_lr, d_lr)
    return VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_opt_state=g_opt.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_opt_state=d_opt.init(d_vars["params"]),
    ), (g_opt, d_opt)


def make_vocoder_train_step(optimizers, generator=None, discriminator=None,
                            use_adversarial: bool = True,
                            mel_weight: float = 45.0, adv_weight: float = 2.0,
                            fm_weight: float = 2.0):
    """Returns (state, batch) -> (state, metrics).

    batch: {"gold_wave": (B, T, 1), "mel": (B, frames, 80)}.
    ``use_adversarial`` is static — the warmup phase compiles separately,
    like the reference's step-gated branches.
    """
    generator = generator or HiFiGANGenerator()
    disc = discriminator or AvocodoJointDiscriminator()
    g_opt, d_opt = optimizers

    def g_loss_fn(g_params, d_params, batch):
        wave, up2, up1 = generator.apply({"params": g_params}, batch["mel"],
                                         return_intermediates=True)
        m_loss = mel_loss(wave[..., 0], batch["gold_wave"][..., 0])
        total = mel_weight * m_loss
        metrics = {"mel_loss": m_loss}
        if use_adversarial:
            frozen = jax.lax.stop_gradient(d_params)
            d_fake = disc.apply({"params": frozen}, wave, up2, up1)
            d_real = disc.apply({"params": frozen}, batch["gold_wave"])
            adv = generator_adversarial_loss(d_fake)
            fm = feature_matching_loss(d_fake, d_real)
            total = total + adv_weight * adv + fm_weight * fm
            metrics.update(adversarial_loss=adv, feature_matching_loss=fm)
        metrics["generator_total"] = total
        return total, (metrics, (wave, up2, up1))

    def d_loss_fn(d_params, fake_pack, gold_wave):
        wave, up2, up1 = jax.lax.stop_gradient(fake_pack)
        d_fake = disc.apply({"params": d_params}, wave, up2, up1)
        d_real = disc.apply({"params": d_params}, gold_wave)
        return discriminator_adversarial_loss(d_fake, d_real)

    def train_step(state: VocoderTrainState, batch, update_discriminator: bool):
        (g_grads, (metrics, fake_pack)) = jax.grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, batch)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        d_params, d_opt_state = state.d_params, state.d_opt_state
        if use_adversarial and update_discriminator:
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                state.d_params, fake_pack, batch["gold_wave"])
            d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state,
                                                  state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics["discriminator_loss"] = d_loss

        return state.replace(step=state.step + 1, g_params=g_params,
                             g_opt_state=g_opt_state, d_params=d_params,
                             d_opt_state=d_opt_state), metrics

    return train_step


def make_sharded_vocoder_steps(state, optimizers, mesh, generator=None,
                               discriminator=None, **step_kwargs):
    """Mesh-sharded GAN train steps (DP batch over 'data' + TP channel
    sharding on the wide generator stages, dist/mesh.py::_TP_RULES).

    The reference's vocoder loop is single-GPU
    (``hifigan_train_loop.py:19-182``); this is the data-parallel variant
    BASELINE config 5 requires.  Returns ``(warm_step, adv_step, state_sh)``:
    ``warm_step(state, batch)`` is the mel-only warmup phase,
    ``adv_step(state, batch, update_discriminator)`` the adversarial phase
    (``update_discriminator`` selects between two compiled variants, exactly
    like the reference's every-3rd-step cadence).  Put the state on the mesh
    with ``jax.device_put(state, state_sh)`` and feed batches through
    ``dist.make_global_batch``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from toucan_tpu.dist import batch_sharding, shard_vocoder_train_state

    state_sh = shard_vocoder_train_state(state, mesh)
    data_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    batch_sh = {"gold_wave": data_sh, "mel": data_sh}

    def compile_variant(adversarial, update_disc):
        base = make_vocoder_train_step(optimizers, generator, discriminator,
                                       use_adversarial=adversarial,
                                       **step_kwargs)
        return jax.jit(lambda s, b: base(s, b, update_disc),
                       in_shardings=(state_sh, batch_sh),
                       out_shardings=(state_sh, rep))

    warm = compile_variant(False, False)
    adv = {False: compile_variant(True, False), True: compile_variant(True, True)}

    def warm_step(state, batch):
        return warm(state, batch)

    def adv_step(state, batch, update_discriminator: bool):
        return adv[bool(update_discriminator)](state, batch)

    return warm_step, adv_step, state_sh
