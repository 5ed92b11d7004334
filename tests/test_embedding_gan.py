import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.models.embedding_gan import (
    GanWrapper,
    ResNetD,
    ResNetG,
    create_wgan_qc_state,
    make_wgan_qc_train_step,
    solve_ot_lp,
)


def test_resnet_shapes():
    rng = jax.random.PRNGKey(0)
    g = ResNetG()
    z = jnp.zeros((3, 32))
    g_vars = g.init(rng, z)
    out = g.apply(g_vars, z)
    assert out.shape == (3, 64)
    d = ResNetD()
    d_vars = d.init(rng, out)
    score = d.apply(d_vars, out)
    assert score.shape == (3, 1)


def test_ot_lp_solution_properties():
    rng = np.random.RandomState(0)
    b = 6
    real = rng.randn(b, 4)
    fake = rng.randn(b, 4)
    dist = 0.5 * ((real[:, None] - fake[None]) ** 2).sum(-1) / 4
    potentials, plan = solve_ot_lp(dist)
    # zero-mean normalization like the reference offset
    assert abs(potentials.sum()) < 1e-6
    # dual feasibility: x_r[i] - x_f[j] <= d[i, j]
    xr, xf = potentials[:b], potentials[b:]
    assert (xr[:, None] - xf[None, :] <= dist + 1e-6).all()
    # the plan maps every fake sample to some real sample
    assert plan.shape == (b, b)
    assert (plan.sum(0) > 0).all()


def test_wgan_qc_training_step_runs():
    rng = jax.random.PRNGKey(0)
    state, g, d, g_opt, d_opt = create_wgan_qc_state(rng)
    step = make_wgan_qc_train_step(g, d, g_opt, d_opt)
    real = np.random.RandomState(0).randn(6, 64).astype(np.float32)
    state2, losses = step(state, real, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    for k, v in losses.items():
        assert np.isfinite(v), k


def test_gan_wrapper_sliders():
    rng = jax.random.PRNGKey(0)
    g = ResNetG()
    g_vars = g.init(rng, jnp.zeros((2, 32)))
    wrapper = GanWrapper(g_vars, g, num_latents=10, num_pca_samples=256)
    e0 = wrapper.modify_embed(np.zeros(6, np.float32))
    e1 = wrapper.modify_embed(np.array([3.0, 0, 0, 0, 0, 0], np.float32))
    assert e0.shape == (64,)
    assert not np.allclose(e0, e1)
    wrapper.set_latent(3)
    e2 = wrapper.modify_embed(np.zeros(6, np.float32))
    assert not np.allclose(e0, e2)
