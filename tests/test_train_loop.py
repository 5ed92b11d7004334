"""Integration test of the training loop: tiny corpus, a few steps, with
checkpointing, resume, and SWA — the jit-scale analog of the reference's
``tt_it`` integration pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.train import checkpointing
from toucan_tpu.train.loop import train_loop
from tests.test_train_dist import TINY


def synthetic_dataset(n=12, seed=0, lang_id=12):
    rng = np.random.RandomState(seed)
    data = []
    for _ in range(n):
        t = rng.randint(4, 8)
        durations = rng.randint(1, 4, size=t)
        l = int(durations.sum())
        data.append(dict(
            text=(rng.rand(t, 62) > 0.5).astype(np.float32),
            mel=rng.randn(l, 80).astype(np.float32),
            durations=durations,
            pitch=rng.rand(t, 1).astype(np.float32),
            energy=rng.rand(t, 1).astype(np.float32),
            lang_id=lang_id,
        ))
    return data


def _gst_vars():
    return StyleEmbedding().init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 20, 80)), jnp.array([20]))


def test_mono_loop_with_checkpoint_resume_and_swa(tmp_path):
    data = synthetic_dataset()
    gst_vars = _gst_vars()
    save_dir = str(tmp_path / "run")
    state, history = train_loop(
        data, gst_vars, save_dir, config=TINY, batch_size=4, steps=6,
        postnet_start_steps=1, warmup_steps=2, log_every=1)
    assert int(state.step) > 6
    assert all(np.isfinite(h["total_loss"]) for h in history)
    assert checkpointing.get_most_recent_checkpoint(save_dir) is not None
    # SWA produced a best checkpoint once past 3x postnet_start_steps
    import os
    assert os.path.exists(os.path.join(save_dir, "best.msgpack"))

    # resume continues from the stored step
    state2, _ = train_loop(
        data, gst_vars, save_dir, config=TINY, batch_size=4, steps=int(state.step) + 3,
        postnet_start_steps=1, warmup_steps=2, resume=True, log_every=1)
    assert int(state2.step) > int(state.step)


def test_meta_loop_runs(tmp_path):
    langs = [synthetic_dataset(6, seed=i, lang_id=i + 1) for i in range(3)]
    gst_vars = _gst_vars()
    state, history = train_loop(
        langs, gst_vars, str(tmp_path / "meta"), config=TINY, batch_size=4,
        steps=4, postnet_start_steps=1, warmup_steps=2,
        steps_per_checkpoint=3, log_every=1)
    assert int(state.step) > 4
    assert all(np.isfinite(h["total_loss"]) for h in history)
