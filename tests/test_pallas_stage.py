"""v4 scratch-staged fused-stage kernel (kernels/pallas_stage.py):
f32 mode must equal the XLA folded path exactly; int8 mode is bounded PTQ."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toucan_tpu.kernels.folded_conv import fold_time, unfold_time
from toucan_tpu.kernels.pallas_stage import (
    calibrate_stage_scales,
    fused_stage_resstacks,
    stage_meta,
)


def _make_params(rng, c, kernel_sizes, dilations, scale=0.3):
    params = []
    for k in kernel_sizes:
        stack = []
        for _ in dilations:
            stack.append(tuple(
                jnp.asarray(a, jnp.float32) for a in (
                    rng.randn(k, c, c) * scale / np.sqrt(k * c),
                    rng.randn(c) * 0.01,
                    rng.randn(k, c, c) * scale / np.sqrt(k * c),
                    rng.randn(c) * 0.01,
                )))
        params.append(stack)
    return params


def _xla_reference(x_folded, params, fold, kernel_sizes, dilations, slope=0.1):
    from toucan_tpu.kernels.folded_conv import folded_conv

    def lrelu(v):
        return jnp.where(v >= 0, v, slope * v)

    acc = 0.0
    for stack_i, k in enumerate(kernel_sizes):
        xb = x_folded
        for dil_i, d in enumerate(dilations):
            w1, b1, w2, b2 = params[stack_i][dil_i]
            h = folded_conv(lrelu(xb), w1, b1, fold, d)
            xb = xb + folded_conv(lrelu(h), w2, b2, fold, 1)
        acc = acc + xb
    return acc / len(kernel_sizes)


@pytest.mark.parametrize("fold,c", [(2, 64), (4, 32), (1, 128)])
def test_f32_mode_matches_xla_folded_path(fold, c):
    rng = np.random.RandomState(0)
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    params = _make_params(rng, c, kernel_sizes, dilations)
    t = 256
    x = jnp.asarray(rng.randn(2, t, fold * c).astype(np.float32))

    expect = _xla_reference(x, params, fold, kernel_sizes, dilations)
    got = fused_stage_resstacks(x, params, fold, kernel_sizes, dilations,
                                tile=128, mode="f32",
                                stream_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("pack", ["concat", "scratch"])
def test_f32_mode_tap_pack_variants(pack):
    rng = np.random.RandomState(1)
    kernel_sizes, dilations = (3, 7), (1, 3)
    params = _make_params(rng, 64, kernel_sizes, dilations)
    x = jnp.asarray(rng.randn(1, 128, 128).astype(np.float32))
    expect = _xla_reference(x, params, 2, kernel_sizes, dilations)
    got = fused_stage_resstacks(x, params, 2, kernel_sizes, dilations,
                                tile=64, mode="f32", stream_dtype=jnp.float32,
                                tap_pack=pack, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_sequence_edges_exact_across_tiles():
    """Tile boundaries and sequence edges must be exact (halo recompute +
    masked quantized stream)."""
    rng = np.random.RandomState(2)
    kernel_sizes, dilations = (3, 11), (1, 5)
    params = _make_params(rng, 32, kernel_sizes, dilations)
    # t NOT a multiple of the tile: exercises padding + in_seq masking
    t = 130
    x = jnp.asarray(rng.randn(1, t, 128).astype(np.float32))
    expect = _xla_reference(x, params, 4, kernel_sizes, dilations)
    got = fused_stage_resstacks(x, params, 4, kernel_sizes, dilations,
                                tile=64, mode="f32", stream_dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_int8_static_scales_bounded_error():
    rng = np.random.RandomState(3)
    kernel_sizes, dilations = (3, 7, 11), (1, 3, 5)
    params = _make_params(rng, 64, kernel_sizes, dilations)
    x = jnp.asarray(rng.randn(1, 256, 128).astype(np.float32))

    scales = calibrate_stage_scales(x, params, 2, kernel_sizes, dilations)
    assert scales.shape == (18,) and bool(jnp.all(scales > 0))

    expect = np.asarray(_xla_reference(x, params, 2, kernel_sizes, dilations))
    got = np.asarray(fused_stage_resstacks(
        x, params, 2, kernel_sizes, dilations, act_scales=scales,
        tile=128, mode="int8", interpret=True))
    err = np.abs(got - expect)
    rel = err.max() / (np.abs(expect).max() + 1e-9)
    # PTQ with per-column weight scales + static act scales: a few percent
    assert rel < 0.06, rel
    # signal-to-quantization-noise should be healthy
    snr = 10 * np.log10((expect ** 2).mean() / ((got - expect) ** 2).mean())
    assert snr > 25, snr


def test_int8_requires_scales():
    rng = np.random.RandomState(4)
    params = _make_params(rng, 64, (3,), (1,))
    x = jnp.zeros((1, 64, 128), jnp.float32)
    with pytest.raises(ValueError, match="act_scales"):
        fused_stage_resstacks(x, params, 2, (3,), (1,), mode="int8",
                              interpret=True)


def test_stage_meta_margins():
    convs, halo, m_lo, m_hi = stage_meta((3, 7, 11), (1, 3, 5), 4)
    assert len(convs) == 3 and all(len(s) == 6 for s in convs)
    assert halo % 8 == 0 and halo >= 16
    # the largest shift is k=11, d=5 on fold 4: q spans -25/4 .. 28/4 -> 7
    assert m_lo == 7 and m_hi == 7


def test_generator_stage_mode_f32_matches_default():
    """HiFiGANGenerator(stage_mode="f32") is numerically the default
    generator (all four stages eligible: 256, 128, 2x64, 4x32 lanes)."""
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    rng = jax.random.PRNGKey(0)
    base = HiFiGANGenerator(channels=256)
    mel = jax.random.normal(rng, (1, 32, 80))
    variables = base.init(rng, mel)
    expect = base.apply(variables, mel)
    got = base.clone(stage_mode="f32", stage_tile=64).apply(variables, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               atol=2e-5, rtol=1e-4)


def test_generator_int8_serving_mode():
    """Full int8 serving path: calibrate -> stage_mode="int8" -> bounded
    waveform error vs the exact path."""
    from toucan_tpu.models.vocoders import HiFiGANGenerator
    from toucan_tpu.models.vocoders.hifigan import calibrate_act_scales

    rng = jax.random.PRNGKey(1)
    base = HiFiGANGenerator(channels=256)
    mel = jax.random.normal(rng, (1, 32, 80))
    variables = base.init(rng, mel)
    scales = calibrate_act_scales(base, variables, mel)
    assert set(scales) == {0, 1, 2, 3}
    assert all(v.shape == (18,) for v in scales.values())

    expect = np.asarray(base.apply(variables, mel))[..., 0]
    q = base.clone(stage_mode="int8", stage_tile=64)
    got = np.asarray(q.apply(variables, mel, act_scales=scales))[..., 0]
    # tanh-compressed output: absolute error bound is meaningful
    assert np.abs(got - expect).max() < 0.05, np.abs(got - expect).max()
    snr = 10 * np.log10((expect ** 2).mean()
                        / ((got - expect) ** 2).mean() + 1e-12)
    assert snr > 20, snr


def test_calibrate_with_bf16_serving_params():
    """Serving checkpoints hold bf16 params (the generator stores params in
    its compute dtype); calibration must still run its exact pass in f32
    (folded_conv calls lax.conv directly, which rejects mixed dtypes)."""
    from toucan_tpu.models.vocoders import HiFiGANGenerator
    from toucan_tpu.models.vocoders.hifigan import calibrate_act_scales

    rng = jax.random.PRNGKey(2)
    bf16 = HiFiGANGenerator(channels=256, dtype=jnp.bfloat16)
    mel = jax.random.normal(rng, (1, 32, 80), jnp.bfloat16)
    variables = bf16.init(rng, mel)
    assert variables["params"]["upsample_0_kernel"].dtype == jnp.bfloat16

    scales = calibrate_act_scales(HiFiGANGenerator(channels=256), variables,
                                  mel.astype(jnp.float32))
    assert set(scales) == {0, 1, 2, 3}
    assert all(np.isfinite(np.asarray(v)).all() and (np.asarray(v) > 0).all()
               for v in scales.values())

    q = bf16.clone(stage_mode="int8", stage_tile=64)
    wave = np.asarray(q.apply(variables, mel, act_scales=scales), np.float32)
    assert np.isfinite(wave).all() and np.abs(wave).max() <= 1.0
