"""Time-sharded long-form vocoder synthesis vs unsharded (8-dev CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.dist import make_mesh
from toucan_tpu.dist.longform import synthesize_longform
from toucan_tpu.models.vocoders import BigVGAN, HiFiGANGenerator


def _randomize_biases(variables, seed=7):
    """Give every bias a nonzero value: with the default zero-init biases a
    wrong global-edge halo is invisible (zeros propagate like conv padding),
    which is exactly the failure mode trained checkpoints would hit."""
    rng = np.random.RandomState(seed)

    def visit(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if "bias" in name:
            return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32) * 0.1)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, variables)


def test_sharded_longform_matches_unsharded():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=8, n_model=1)
    vocoder = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(11,),
                               resblock_dilations=((1, 3, 5),))
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(0).randn(320, 80).astype(np.float32)
    variables = _randomize_biases(vocoder.init(rng, jnp.asarray(mel[None, :16])))

    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_sharded_longform_ragged_length():
    mesh = make_mesh(n_data=8, n_model=1)
    vocoder = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(11,),
                               resblock_dilations=((1, 3, 5),))
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(1).randn(323, 80).astype(np.float32)  # not /8
    variables = _randomize_biases(vocoder.init(rng, jnp.asarray(mel[None, :16])))
    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    assert len(got) == 323 * 384
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_sharded_longform_bigvgan():
    """BASELINE config 4 verbatim: BigVGAN (replicate-padded alias-free
    resamplers — edge semantics differ from conv zero-padding) sharded over
    the time axis must match the unsharded synthesis."""
    mesh = make_mesh(n_data=4, n_model=1,  # CPU-compile bound: 4 shards,
                     devices=jax.devices()[:4])  # one resblock per stage
    # use_folding=False: the tiny-channel deep-fold graphs compile
    # pathologically slowly on the CPU backend under shard_map; the edge
    # semantics being tested (replicate-padded resamplers) are identical in
    # both paths, and folded-vs-plain parity is covered by
    # tests/test_bigvgan_folded.py.
    vocoder = BigVGAN(channels=32, resblock_kernel_sizes=(3,),
                      resblock_dilations=((1, 3, 5),), use_folding=False)
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(2).randn(256, 80).astype(np.float32)
    variables = _randomize_biases(vocoder.init(rng, jnp.asarray(mel[None, :16])))
    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_sharded_longform_short_input_unsharded_fallback():
    mesh = make_mesh(n_data=8, n_model=1)
    vocoder = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(11,),
                               resblock_dilations=((1, 3, 5),))
    rng = jax.random.PRNGKey(0)
    mel = np.random.RandomState(3).randn(100, 80).astype(np.float32)
    variables = _randomize_biases(vocoder.init(rng, jnp.asarray(mel[None, :16])))
    expect = np.asarray(vocoder.apply(variables, jnp.asarray(mel[None])))[0, :, 0]
    got = synthesize_longform(vocoder, variables, mel, mesh)
    np.testing.assert_allclose(got, expect, atol=0)
