"""Fused pallas residual-stack kernel vs the XLA folded path (interpret
mode on CPU; the same kernel compiles for TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.kernels.folded_conv import fold_time, unfold_time
from toucan_tpu.kernels.pallas_resstack import fused_folded_resstacks
from toucan_tpu.models.vocoders.hifigan import ResidualStack


def _make_params(rng, kernel_sizes, dilations, c):
    params = []
    for ks in kernel_sizes:
        stack = []
        for d in dilations:
            w1 = rng.randn(ks, c, c).astype(np.float32) * 0.05
            b1 = rng.randn(c).astype(np.float32) * 0.05
            w2 = rng.randn(ks, c, c).astype(np.float32) * 0.05
            b2 = rng.randn(c).astype(np.float32) * 0.05
            stack.append((jnp.asarray(w1), jnp.asarray(b1),
                          jnp.asarray(w2), jnp.asarray(b2)))
        params.append(stack)
    return params


def _reference(x, params, kernel_sizes, dilations, slope=0.1):
    """Plain (unfolded) residual stacks averaged, via the flax module."""
    outs = []
    for stack_i, ks in enumerate(kernel_sizes):
        mod = ResidualStack(x.shape[-1], ks, dilations, slope)
        variables = {"params": {}}
        for i, (w1, b1, w2, b2) in enumerate(params[stack_i]):
            variables["params"][f"conv1_{i}"] = {"kernel": w1, "bias": b1}
            variables["params"][f"conv2_{i}"] = {"kernel": w2, "bias": b2}
        outs.append(mod.apply(variables, x))
    return sum(outs) / len(outs)


def test_fused_resstacks_match_reference():
    rng = np.random.RandomState(0)
    c, fold = 8, 4
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    params = _make_params(rng, kernel_sizes, dilations, c)
    x = jnp.asarray(rng.randn(2, 256, c).astype(np.float32) * 0.3)

    expect = _reference(x, params, kernel_sizes, dilations)
    fused = fused_folded_resstacks(fold_time(x, fold), params, fold,
                                   kernel_sizes, dilations, tile=64,
                                   interpret=True)
    got = unfold_time(fused, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-4, rtol=2e-3)


def test_fused_resstacks_multi_tile_consistent():
    """Tile boundaries must be seamless."""
    rng = np.random.RandomState(1)
    c, fold = 4, 2
    kernel_sizes, dilations = (3, 7), (1, 3)
    params = _make_params(rng, kernel_sizes, dilations, c)
    x = jnp.asarray(rng.randn(1, 512, c).astype(np.float32) * 0.3)
    one_tile = fused_folded_resstacks(fold_time(x, fold), params, fold,
                                      kernel_sizes, dilations, tile=256,
                                      interpret=True)
    many_tiles = fused_folded_resstacks(fold_time(x, fold), params, fold,
                                        kernel_sizes, dilations, tile=32,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(one_tile), np.asarray(many_tiles),
                               atol=1e-5)
