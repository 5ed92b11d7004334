"""Training step + multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from toucan_tpu.dist import batch_sharding, make_mesh, shard_train_state
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTSConfig
from toucan_tpu.train.toucan_train import create_train_state, make_train_step

TINY = ToucanTTSConfig(adim=32, aheads=2, enc_layers=1, enc_units=64, dec_layers=1,
                       dec_units=64, duration_layers=1, pitch_layers=1,
                       energy_layers=1, duration_chans=16, pitch_chans=16,
                       energy_chans=16, glow_blocks=2, glow_hidden=16,
                       utt_embed_dim=64, lang_embs=100)


def tiny_batch(b=8, tmax=6, lmax=16, seed=0):
    rng = np.random.RandomState(seed)
    durations = rng.randint(1, 3, size=(b, tmax)).astype(np.int32)
    text_lengths = np.full((b,), tmax, np.int32)
    text_lengths[0] = tmax - 2
    for i, tl in enumerate(text_lengths):
        durations[i, tl:] = 0
    speech_lengths = durations.sum(1).astype(np.int32)
    lmax = int(speech_lengths.max())
    return dict(
        text=(rng.rand(b, tmax, 62) > 0.5).astype(np.float32),
        text_lengths=text_lengths,
        gold_speech=rng.randn(b, lmax, 80).astype(np.float32),
        speech_lengths=speech_lengths,
        gold_durations=durations,
        gold_pitch=rng.randn(b, tmax, 1).astype(np.float32),
        gold_energy=rng.randn(b, tmax, 1).astype(np.float32),
        lang_ids=rng.randint(0, 90, size=(b, 1)),
    )


def make_tiny_state(use_discriminator=False):
    rng = jax.random.PRNGKey(0)
    gst = StyleEmbedding()
    gst_vars = gst.init(rng, jnp.zeros((1, 20, 80)), jnp.array([20]))
    return create_train_state(rng, TINY, gst_vars, batch_shape=(2, 6, 16),
                              use_discriminator=use_discriminator)


def test_train_step_single_device():
    state, optimizer = make_tiny_state(use_discriminator=True)
    step = jax.jit(make_train_step(TINY, optimizer, run_glow=True,
                                   use_discriminator=True))
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # params actually changed
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.params["tts"], state2.params["tts"]))
    assert delta > 0


def test_train_step_multichip():
    """DP x TP on a 4x2 virtual mesh; XLA inserts the collectives."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=4, n_model=2)
    state, optimizer = make_tiny_state()
    step_fn = make_train_step(TINY, optimizer, run_glow=True)

    state_sh = shard_train_state(state, mesh)
    data_sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())

    batch = tiny_batch()
    batch_shardings = {k: data_sh for k in batch}
    step = jax.jit(step_fn,
                   in_shardings=(state_sh, batch_shardings, rep),
                   out_shardings=(state_sh, rep))
    state_dev = jax.device_put(state, state_sh)
    batch_dev = {k: jax.device_put(jnp.asarray(v), data_sh) for k, v in batch.items()}
    new_state, metrics = step(state_dev, batch_dev, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

    # verify the FFN kernel is genuinely sharded over the model axis
    k = new_state.params["tts"]["encoder"]["block_0"]["feed_forward"]["w_1"]["kernel"]
    assert k.sharding.spec == P(None, None, "model")
    # and that results match the single-device step numerically
    state1, _ = make_tiny_state()
    step1 = jax.jit(make_train_step(TINY, optimizer, run_glow=True))
    ref_state, ref_metrics = step1(state1, {k2: jnp.asarray(v) for k2, v in batch.items()},
                                   jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["l1_loss"]), float(ref_metrics["l1_loss"]),
                               rtol=2e-4)


def _tiny_vocoder_batch(b=4, frames=8, seed=0):
    rnd = np.random.RandomState(seed)
    return dict(
        gold_wave=rnd.randn(b, frames * 384, 1).astype(np.float32) * 0.1,
        mel=rnd.randn(b, frames, 80).astype(np.float32),
    )


def test_vocoder_train_step_multichip():
    """Vocoder GAN step DP x TP on a 4x2 mesh (VERDICT r02 #2/#6): generator
    channels shard over 'model', batch over 'data'; one adversarial step with
    a discriminator update matches the single-device step numerically."""
    from toucan_tpu.models.vocoders import HiFiGANGenerator
    from toucan_tpu.models.vocoders.discriminators import AvocodoJointDiscriminator
    from toucan_tpu.train.vocoder_train import (
        create_vocoder_train_state, make_sharded_vocoder_steps,
        make_vocoder_train_step)

    mesh = make_mesh(n_data=4, n_model=2)
    rng = jax.random.PRNGKey(0)
    gen = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(3,),
                       resblock_dilations=((1, 3),))
    disc = AvocodoJointDiscriminator(channel_scale=0.05)
    state, opts = create_vocoder_train_state(rng, generator=gen,
                                             discriminator=disc,
                                             segment_frames=8)
    warm_step, adv_step, state_sh = make_sharded_vocoder_steps(
        state, opts, mesh, generator=gen, discriminator=disc)
    batch = _tiny_vocoder_batch()
    from toucan_tpu.dist import make_global_batch
    state_dev = jax.device_put(state, state_sh)
    batch_dev = jax.device_put(make_global_batch(batch, mesh),
                               {k: batch_sharding(mesh) for k in batch})
    state_dev, _ = warm_step(state_dev, batch_dev)
    state_dev, metrics = adv_step(state_dev, batch_dev, True)
    assert int(state_dev.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # generator early-stage kernels genuinely sharded over 'model'
    from jax.sharding import PartitionSpec
    k0 = state_dev.g_params["block_0_0"]["conv1_0"]["kernel"]
    assert k0.sharding.spec == PartitionSpec(None, None, "model")

    # numerics vs the single-device step (same two steps)
    state1, opts1 = create_vocoder_train_state(rng, generator=gen,
                                               discriminator=disc,
                                               segment_frames=8)
    warm1 = jax.jit(make_vocoder_train_step(opts1, generator=gen,
                                            discriminator=disc,
                                            use_adversarial=False),
                    static_argnums=2)
    adv1 = jax.jit(make_vocoder_train_step(opts1, generator=gen,
                                           discriminator=disc,
                                           use_adversarial=True),
                   static_argnums=2)
    b1 = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, _ = warm1(state1, b1, False)
    state1, ref_metrics = adv1(state1, b1, True)
    np.testing.assert_allclose(float(metrics["generator_total"]),
                               float(ref_metrics["generator_total"]), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["discriminator_loss"]),
                               float(ref_metrics["discriminator_loss"]),
                               rtol=2e-4)


def test_aligner_train_step_multichip():
    """Aligner CTC+recon step DP over an 8-device mesh matches the
    single-device step (BatchNorm stats and loss means reduce globally)."""
    from toucan_tpu.train.aligner_train import (
        create_aligner_train_state, make_aligner_train_step,
        make_sharded_aligner_step)

    mesh = make_mesh(n_data=8, n_model=1)
    rng = jax.random.PRNGKey(0)
    rnd = np.random.RandomState(0)
    b, lmax, tmax = 8, 32, 8
    mel_lengths = rnd.randint(16, lmax + 1, size=(b,)).astype(np.int32)
    token_lengths = rnd.randint(3, tmax + 1, size=(b,)).astype(np.int32)
    batch = dict(
        mel=rnd.randn(b, lmax, 80).astype(np.float32),
        mel_lengths=mel_lengths,
        tokens=rnd.randint(0, 140, size=(b, tmax)).astype(np.int32),
        token_lengths=token_lengths,
        speaker_embeddings=rnd.randn(b, 192).astype(np.float32),
    )

    state, opt = create_aligner_train_state(rng)
    step, state_sh = make_sharded_aligner_step(state, opt, mesh)
    from toucan_tpu.dist import make_global_batch
    state_dev = jax.device_put(state, state_sh)
    state_dev, metrics = step(state_dev, make_global_batch(batch, mesh),
                              jax.random.PRNGKey(1))
    assert int(state_dev.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))

    state1, opt1 = create_aligner_train_state(rng)
    step1 = jax.jit(make_aligner_train_step(opt1))
    _, ref_metrics = step1(state1, {k: jnp.asarray(v) for k, v in batch.items()},
                           jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["ctc_loss"]),
                               float(ref_metrics["ctc_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(ref_metrics["total_loss"]), rtol=2e-4)
