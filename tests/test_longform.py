"""Time-sharded long-form vocoder synthesis vs unsharded (8-dev CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.dist import make_mesh
from toucan_tpu.dist.longform import synthesize_longform
from toucan_tpu.models.vocoders import HiFiGANGenerator


def test_sharded_longform_matches_unsharded():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=8, n_model=1)
    vocoder = HiFiGANGenerator(channels=32)
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(0).randn(512, 80).astype(np.float32)
    variables = vocoder.init(rng, jnp.asarray(mel[None, :16]))

    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_sharded_longform_ragged_length():
    mesh = make_mesh(n_data=8, n_model=1)
    vocoder = HiFiGANGenerator(channels=32)
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(1).randn(500, 80).astype(np.float32)  # not /8
    variables = vocoder.init(rng, jnp.asarray(mel[None, :16]))
    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    assert len(got) == 500 * 384
    np.testing.assert_allclose(got, expect, atol=2e-5)
