"""Folded BigVGAN: shifted-add resamplers + time-folded AMP stages.

The folded path re-expresses every dense conv of the <128-channel stages as
a block-Toeplitz conv on >=128 MXU lanes (kernels/folded_conv.py) and swaps
the grouped-conv alias-free FIRs for scalar-weighted shifted adds
(nn/alias_free.py).  Both transformations are exact, so the folded model
must match the plain one to float rounding on the same parameters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.models.vocoders import BigVGAN
from toucan_tpu.kernels.folded_conv import fold_time, unfold_time
from toucan_tpu.nn.alias_free import (
    alias_free_snake,
    alias_free_snake_dw,
    alias_free_snake_folded,
    alias_free_snake_shifted,
    downsample2,
    downsample2_shifted,
    upsample2,
    upsample2_shifted,
)


@pytest.mark.parametrize("t", [8, 30, 100])
def test_shifted_add_resamplers_exact(t):
    rng = np.random.default_rng(t)
    x = jnp.asarray(rng.standard_normal((2, t, 5)).astype(np.float32))
    up_conv, up_sh = upsample2(x), upsample2_shifted(x)
    assert up_conv.shape == up_sh.shape == (2, 2 * t, 5)
    np.testing.assert_allclose(np.asarray(up_sh), np.asarray(up_conv), atol=2e-6)
    dn_conv, dn_sh = downsample2(up_conv), downsample2_shifted(up_conv)
    assert dn_conv.shape == dn_sh.shape == (2, t, 5)
    np.testing.assert_allclose(np.asarray(dn_sh), np.asarray(dn_conv), atol=2e-6)


def test_alias_free_snake_shifted_matches_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 48, 7)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(7).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(7).astype(np.float32) * 0.1)
    a = alias_free_snake(x, alpha, beta)
    b = alias_free_snake_shifted(x, alpha, beta)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parametrize("t,f", [(64, 2), (64, 4), (40, 8), (16, 4)])
def test_alias_free_snake_folded_exact_incl_edges(t, f):
    """MXU phase-conv path + edge patch == replicate-padded reference,
    at every sample including the boundaries."""
    rng = np.random.default_rng(t * 10 + f)
    c = 8
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ref = alias_free_snake(x, alpha, beta)
    got = unfold_time(alias_free_snake_folded(fold_time(x, f), alpha, beta, f), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("t,f", [(64, 4), (64, 2), (64, 1), (40, 8), (16, 4)])
def test_alias_free_snake_pallas_exact_incl_edges(t, f):
    """Fused VPU pallas kernel (interpret mode) + edge patch == reference."""
    rng = np.random.default_rng(t * 100 + f)
    c = 8
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ref = alias_free_snake(x, alpha, beta)
    got = unfold_time(
        alias_free_snake_folded(fold_time(x, f), alpha, beta, f,
                                pallas=True, pallas_interpret=True), f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bigvgan_pallas_act_matches_plain():
    mel = jnp.asarray(np.random.RandomState(1).randn(1, 8, 80).astype(np.float32))
    plain = BigVGAN(use_folding=False)
    fast = BigVGAN(pallas_act=True, pallas_interpret=True)
    variables = plain.init(jax.random.PRNGKey(0), mel)
    ref = plain.apply(variables, mel)
    got = fast.apply(variables, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("t", [64, 30])
def test_alias_free_snake_dw_exact_incl_edges(t):
    rng = np.random.default_rng(t)
    c = 8
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1)
    ref = alias_free_snake(x, alpha, beta)
    got = alias_free_snake_dw(x, alpha, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bigvgan_folded_matches_plain():
    """Same params, folded vs plain execution, both with taps."""
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 10, 80).astype(np.float32))
    plain = BigVGAN(use_folding=False, shifted_resample=False)
    variables = jax.jit(lambda r, m: plain.init(r, m, return_intermediates=True))(
        jax.random.PRNGKey(0), mel)
    # nontrivial snake params so the activation path is exercised
    rng = np.random.default_rng(1)
    variables = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32) * 0.1)
        if "alpha" in str(p) or "beta" in str(p) else v, variables)

    w0, x2_0, x1_0 = plain.apply(variables, mel, return_intermediates=True)
    folded = BigVGAN(use_folding=True, shifted_resample=True)
    w1, x2_1, x1_1 = folded.apply(variables, mel, return_intermediates=True)

    assert w0.shape == w1.shape == (1, 10 * 384, 1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x1_1), np.asarray(x1_0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x2_1), np.asarray(x2_0), atol=2e-5)


def test_bigvgan_inference_skips_taps():
    """Without return_intermediates no tap params are created or needed."""
    mel = jnp.zeros((1, 10, 80), jnp.float32)
    model = BigVGAN()
    variables = model.init(jax.random.PRNGKey(0), mel)
    assert "out_proj_x1" not in variables["params"]
    wave = model.apply(variables, mel)
    assert wave.shape == (1, 10 * 384, 1)
