"""Assembled StochasticToucanTTS smoke tests (submodule parity is covered in
test_stochastic_parity.py; conformer/glow parity in test_toucan_parity.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.models.stochastic_toucan_tts import StochasticToucanTTS
from toucan_tpu.models.toucan_tts import ToucanTTSConfig

TINY = ToucanTTSConfig(adim=32, aheads=2, enc_layers=1, enc_units=64, dec_layers=1,
                       dec_units=64, glow_blocks=2, glow_hidden=16,
                       utt_embed_dim=32, lang_embs=50)


def _batch(b=2, t=6, seed=0):
    rng = np.random.RandomState(seed)
    durations = rng.randint(1, 4, size=(b, t)).astype(np.int32)
    lens = np.full((b,), t, np.int32)
    lens[0] = t - 2
    for i, tl in enumerate(lens):
        durations[i, tl:] = 0
    lmax = int(durations.sum(1).max())
    return dict(
        text=(rng.rand(b, t, 62) > 0.5).astype(np.float32),
        text_lengths=lens,
        gold_speech=rng.randn(b, lmax, 80).astype(np.float32),
        speech_lengths=durations.sum(1).astype(np.int32),
        gold_durations=durations,
        gold_pitch=np.abs(rng.randn(b, t, 1)).astype(np.float32),
        gold_energy=np.abs(rng.randn(b, t, 1)).astype(np.float32),
        utt=rng.randn(b, 32).astype(np.float32),
        lang=rng.randint(0, 40, size=(b, 1)),
    )


def test_train_forward_losses_finite():
    model = StochasticToucanTTS(TINY)
    d = _batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.asarray(d["text"]), jnp.asarray(d["text_lengths"]),
                           jnp.asarray(d["gold_speech"]), jnp.asarray(d["speech_lengths"]),
                           jnp.asarray(d["gold_durations"]), jnp.asarray(d["gold_pitch"]),
                           jnp.asarray(d["gold_energy"]),
                           utterance_embedding=jnp.asarray(d["utt"]),
                           lang_ids=jnp.asarray(d["lang"]), flow_rng=rng)
    before, after, dl, pl, el, gl = model.apply(
        variables, jnp.asarray(d["text"]), jnp.asarray(d["text_lengths"]),
        jnp.asarray(d["gold_speech"]), jnp.asarray(d["speech_lengths"]),
        jnp.asarray(d["gold_durations"]), jnp.asarray(d["gold_pitch"]),
        jnp.asarray(d["gold_energy"]), utterance_embedding=jnp.asarray(d["utt"]),
        lang_ids=jnp.asarray(d["lang"]), flow_rng=jax.random.PRNGKey(1))
    assert before.shape == after.shape == d["gold_speech"].shape
    for name, v in [("dur", dl), ("pitch", pl), ("energy", el), ("glow", gl)]:
        assert np.isfinite(float(v)), name

    # gradients flow through everything
    def loss_fn(params):
        outs = model.apply(
            {**variables, "params": params}, jnp.asarray(d["text"]),
            jnp.asarray(d["text_lengths"]), jnp.asarray(d["gold_speech"]),
            jnp.asarray(d["speech_lengths"]), jnp.asarray(d["gold_durations"]),
            jnp.asarray(d["gold_pitch"]), jnp.asarray(d["gold_energy"]),
            utterance_embedding=jnp.asarray(d["utt"]),
            lang_ids=jnp.asarray(d["lang"]), flow_rng=jax.random.PRNGKey(1))
        return outs[2] + outs[3] + outs[4] + outs[5] + jnp.mean(jnp.abs(outs[1]))

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = jax.tree.reduce(lambda a, b: a + b,
                            jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_inference_shapes():
    model = StochasticToucanTTS(TINY)
    d = _batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.asarray(d["text"]), jnp.asarray(d["text_lengths"]),
                           jnp.asarray(d["gold_speech"]), jnp.asarray(d["speech_lengths"]),
                           jnp.asarray(d["gold_durations"]), jnp.asarray(d["gold_pitch"]),
                           jnp.asarray(d["gold_energy"]),
                           utterance_embedding=jnp.asarray(d["utt"]),
                           lang_ids=jnp.asarray(d["lang"]), flow_rng=rng)
    max_frames = 64
    before, after, dur, pit, ene, lens = model.apply(
        variables, jnp.asarray(d["text"]), jnp.asarray(d["text_lengths"]), max_frames,
        utterance_embedding=jnp.asarray(d["utt"]), lang_ids=jnp.asarray(d["lang"]),
        flow_rng=jax.random.PRNGKey(3), method=StochasticToucanTTS.infer)
    assert after.shape == (2, max_frames, 80)
    assert (np.asarray(dur) >= 0).all()
    assert int(lens[0]) % 2 == 0
    assert np.isfinite(np.asarray(after)).all()
