import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.train.aligner_train import (
    create_aligner_train_state,
    make_aligner_train_step,
)


def test_aligner_train_step_runs_and_learns():
    rng = jax.random.PRNGKey(0)
    state, opt = create_aligner_train_state(rng)
    step = jax.jit(make_aligner_train_step(opt))

    rnd = np.random.RandomState(0)
    b, t, s = 2, 24, 6
    batch = dict(
        mel=jnp.asarray(rnd.randn(b, t, 80), jnp.float32),
        mel_lengths=jnp.array([24, 18]),
        tokens=jnp.asarray(rnd.randint(0, 100, size=(b, s))),
        token_lengths=jnp.array([6, 4]),
        speaker_embeddings=jnp.asarray(rnd.randn(b, 192), jnp.float32),
    )
    state0 = state
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total_loss"]))
        assert np.isfinite(float(metrics["ctc_loss"]))
        assert np.isfinite(float(metrics["reconstruction_loss"]))
    assert int(state.step) == 3
    # both nets actually received updates (RAdam warmup makes them tiny)
    for old, new in [(state0.asr_params, state.asr_params),
                     (state0.tts_params, state.tts_params)]:
        delta = jax.tree.reduce(lambda a, b: a + b,
                                jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                                             old, new))
        assert delta > 0
