"""Parity tests for the im2col fused residual-stack kernel
(kernels/pallas_imcol.py) and the folded output conv.

The f32 kernel path must match plain XLA dilated convs exactly (same math
as the reference ResidualStack, ``Layers/ResidualBlock.py:35-98``); the
int8 path is approximate by design and only sanity-checked for SNR.
Interpret mode runs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toucan_tpu.kernels.folded_conv import fold_time, unfold_time
from toucan_tpu.kernels.pallas_imcol import (
    build_imcol_weight,
    fused_imcol_resstacks,
    imcol_offsets,
)

KS = (3, 7, 11)
DILS = (1, 3, 5)


def conv1d(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1,), "SAME", rhs_dilation=(d,),
        dimension_numbers=("NHC", "HIO", "NHC"))


def ref_stacks(x, params, slope=0.1):
    outs = []
    for si, _ in enumerate(KS):
        xb = x
        for di, d in enumerate(DILS):
            w1, b1, w2, b2 = params[si][di]
            xt = jnp.maximum(xb, slope * xb)
            xt = conv1d(xt, w1, d) + b1
            xt = jnp.maximum(xt, slope * xt)
            xt = conv1d(xt, w2, 1) + b2
            xb = xb + xt
        outs.append(xb)
    return sum(outs) / len(outs)


def make_params(rng, c):
    params = []
    for k in KS:
        ds = []
        for _ in DILS:
            ds.append(tuple(jnp.asarray(a) for a in (
                0.3 * rng.randn(k, c, c).astype(np.float32),
                0.1 * rng.randn(c).astype(np.float32),
                0.3 * rng.randn(k, c, c).astype(np.float32),
                0.1 * rng.randn(c).astype(np.float32))))
        params.append(ds)
    return params


@pytest.mark.parametrize("k", KS)
@pytest.mark.parametrize("d", DILS)
@pytest.mark.parametrize("f", (1, 2, 4))
def test_imcol_weight_builder(k, d, f):
    rng = np.random.RandomState(k * 100 + d * 10 + f)
    c = 8
    w = rng.randn(k, c, c).astype(np.float32)
    x = rng.randn(1, 16 * f, c).astype(np.float32)
    y_ref = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), d))
    offs, _, _ = imcol_offsets(k, d, f)
    wt = np.asarray(build_imcol_weight(jnp.asarray(w), f, d))
    t = x.shape[1]
    tp = t // f
    xpad = np.pad(x[0], ((64, 64), (0, 0)))
    xm = np.stack([xpad[64 + np.arange(tp) * f + o] for o in offs],
                  axis=1).reshape(tp, len(offs) * c)
    y = (xm @ wt).reshape(t, c)
    np.testing.assert_allclose(y, y_ref[0], atol=2e-4)


@pytest.mark.parametrize("fold", (1, 2, 4))
@pytest.mark.parametrize("dense", (False, True))
def test_fused_f32_matches_reference(fold, dense):
    rng = np.random.RandomState(0)
    b, c, t = 2, 16, 4 * 64
    x = rng.randn(b, t, c).astype(np.float32)
    params = make_params(rng, c)
    y_ref = np.asarray(ref_stacks(jnp.asarray(x), params))
    xf = fold_time(jnp.asarray(x), fold)
    yk = fused_imcol_resstacks(xf, params, fold, tile=32, mode="f32",
                               dense=dense, interpret=True)
    yk = np.asarray(unfold_time(yk, fold))
    err = np.abs(yk - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-4, err


def test_fused_handles_nondivisible_tile():
    rng = np.random.RandomState(1)
    b, c, t, fold = 1, 16, 4 * 40, 4  # T' = 40, not a multiple of tile
    x = rng.randn(b, t, c).astype(np.float32)
    params = make_params(rng, c)
    y_ref = np.asarray(ref_stacks(jnp.asarray(x), params))
    yk = fused_imcol_resstacks(fold_time(jnp.asarray(x), fold), params, fold,
                               tile=32, mode="f32", interpret=True)
    yk = np.asarray(unfold_time(yk, fold))
    err = np.abs(yk - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-4, err


def test_fused_int8_snr():
    rng = np.random.RandomState(2)
    b, c, t, fold = 2, 16, 4 * 64, 4
    x = rng.randn(b, t, c).astype(np.float32)
    params = make_params(rng, c)
    y_ref = np.asarray(ref_stacks(jnp.asarray(x), params))
    yk = fused_imcol_resstacks(fold_time(jnp.asarray(x), fold), params, fold,
                               tile=32, mode="int8", interpret=True)
    yk = np.asarray(unfold_time(yk, fold))
    snr = 10 * np.log10((y_ref ** 2).mean() / ((yk - y_ref) ** 2).mean())
    assert snr > 20, snr


def test_generator_imcol_and_folded_outconv_match_plain():
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 16, 80), jnp.float32)
    plain = HiFiGANGenerator(use_folding=False)
    v = plain.init(rng, mel)
    y0 = plain.apply(v, mel)
    # default path (folded convs + folded output conv)
    y1 = HiFiGANGenerator().apply(v, mel)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    # imcol f32 kernel path (interpret on CPU)
    y2 = HiFiGANGenerator(imcol_mode="f32").apply(v, mel)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0), atol=1e-5)
