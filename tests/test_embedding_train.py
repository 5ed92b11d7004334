import numpy as np

import jax
import jax.numpy as jnp
import optax

from toucan_tpu.models.toucan_tts import ToucanTTSConfig, fastspeech2_config
from toucan_tpu.train.diverse_losses import barlow_twins_loss, ssim, triplet_loss
from toucan_tpu.train.embedding_train import (
    create_embedding_train_state,
    make_embedding_train_step,
    make_finetune_step,
    make_spread_regularization_step,
)

TINY_FS2 = fastspeech2_config(adim=32, aheads=2, enc_layers=1, enc_units=64,
                              dec_layers=1, dec_units=64, duration_layers=1,
                              pitch_layers=1, energy_layers=1, duration_chans=16,
                              pitch_chans=16, energy_chans=16, utt_embed_dim=64,
                              lang_embs=50)


def test_fastspeech2_config_has_no_postflow():
    assert not TINY_FS2.use_postflow and not TINY_FS2.conditional_predictors


def test_embedding_cotrain_step(tmp_path):
    rng = jax.random.PRNGKey(0)
    state, optimizer, config = create_embedding_train_state(
        rng, config=TINY_FS2, batch_shape=(2, 6, 14))
    step = jax.jit(make_embedding_train_step(config, optimizer))
    rnd = np.random.RandomState(0)
    b, t = 2, 6
    durations = rnd.randint(1, 3, size=(b, t)).astype(np.int32)
    lmax = int(durations.sum(1).max())
    batch = dict(
        text=jnp.asarray((rnd.rand(b, t, 62) > 0.5).astype(np.float32)),
        text_lengths=jnp.full((b,), t, jnp.int32),
        gold_speech=jnp.asarray(rnd.randn(b, lmax, 80).astype(np.float32)),
        speech_lengths=jnp.asarray(durations.sum(1)),
        gold_durations=jnp.asarray(durations),
        gold_pitch=jnp.asarray(rnd.rand(b, t, 1).astype(np.float32)),
        gold_energy=jnp.asarray(rnd.rand(b, t, 1).astype(np.float32)),
        lang_ids=jnp.asarray(rnd.randint(0, 40, size=(b, 1))),
    )
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # gst params received gradient signal through the TTS loss
    delta = jax.tree.reduce(lambda a, b: a + b,
                            jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                                         state.params["gst"], state2.params["gst"]))
    assert delta > 0

    reg_step = make_spread_regularization_step(optimizer)
    state3, reg_loss = reg_step(state2)
    assert np.isfinite(float(reg_loss))


def test_finetune_step():
    rng = jax.random.PRNGKey(0)
    from toucan_tpu.models.gst import StyleEmbedding
    gst = StyleEmbedding()
    variables = gst.init(rng, jnp.zeros((2, 20, 80)), jnp.array([20, 20]))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(variables["params"])
    step = make_finetune_step(optimizer)
    rnd = np.random.RandomState(0)
    batch = {f"{k}": jnp.asarray(rnd.randn(2, 30, 80).astype(np.float32))
             for k in ["anchor", "positive", "negative"]}
    batch.update({f"{k}_lengths": jnp.array([30, 25]) for k in
                  ["anchor", "positive", "negative"]})
    params, opt_state, metrics = step(variables["params"], variables["batch_stats"],
                                      opt_state, batch)
    assert np.isfinite(float(metrics["triplet"]))
    assert np.isfinite(float(metrics["barlow"]))


def test_diverse_losses_behave():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    assert float(triplet_loss(a, a, a + 10)) == 0.0  # easy triplet satisfied
    assert float(triplet_loss(a, a + 10, a)) > 0.0
    assert float(barlow_twins_loss(a, a)) < float(barlow_twins_loss(
        a, jnp.asarray(rng.randn(8, 16).astype(np.float32))))
    img = jnp.asarray(rng.rand(2, 32, 32).astype(np.float32))
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    assert float(ssim(img, 1 - img)) < 0.5
