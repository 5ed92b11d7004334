"""Orbax sharded checkpointing on a virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.dist.mesh import make_mesh, shard_train_state
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTSConfig
from toucan_tpu.train.toucan_train import create_train_state
from toucan_tpu.train.sharded_checkpointing import (
    latest_sharded_step,
    restore_sharded_checkpoint,
    save_sharded_checkpoint,
    swa_average,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

TINY = ToucanTTSConfig(adim=16, aheads=2, enc_layers=1, enc_units=64,
                       dec_layers=1, dec_units=64, duration_layers=1,
                       pitch_layers=1, energy_layers=1, duration_chans=16,
                       pitch_chans=16, energy_chans=16, glow_blocks=2,
                       glow_hidden=16, utt_embed_dim=64, lang_embs=100)


def _sharded_state(seed=0):
    rng = jax.random.PRNGKey(seed)
    gst_vars = StyleEmbedding().init(rng, jnp.zeros((1, 20, 80)),
                                     jnp.array([20]))
    state, _ = create_train_state(rng, TINY, gst_vars, batch_shape=(2, 6, 16))
    mesh = make_mesh(4, 2)
    shardings = shard_train_state(state, mesh)
    return jax.device_put(state, shardings)


def test_save_restore_roundtrip_preserves_shardings(tmp_path):
    state = _sharded_state(3)
    save_sharded_checkpoint(str(tmp_path), state, step=3)
    assert latest_sharded_step(str(tmp_path)) == 3

    restored = restore_sharded_checkpoint(str(tmp_path), state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if isinstance(a, jax.Array) and a.ndim:
            assert b.sharding.is_equivalent_to(a.sharding, a.ndim), (
                a.sharding, b.sharding)


def test_swa_average(tmp_path):
    s1 = _sharded_state(1)
    s2 = _sharded_state(2)
    save_sharded_checkpoint(str(tmp_path), s1, step=1)
    save_sharded_checkpoint(str(tmp_path), s2, step=2)
    avg = swa_average(str(tmp_path), s2, n=2)

    k = lambda s: np.asarray(jax.tree.leaves(s.params)[0])
    np.testing.assert_allclose(k(avg), 0.5 * (k(s1) + k(s2)), atol=1e-6)
    assert int(avg.step) == int(s2.step)
    # non-param floats (opt state) come from the newest checkpoint
    o = lambda s: jax.tree.leaves(s.opt_state)
    for a, b in zip(o(avg), o(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
