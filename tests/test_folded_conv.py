import numpy as np

import jax
import jax.numpy as jnp

from toucan_tpu.kernels.folded_conv import fold_time, folded_conv, unfold_time


def _reference_conv(x, w, b, dilation):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC")) + b


def test_folded_conv_exact():
    rng = np.random.RandomState(0)
    for (k, c, f, d) in [(3, 32, 4, 1), (3, 32, 4, 3), (3, 32, 4, 5),
                         (7, 32, 4, 5), (11, 32, 4, 1), (11, 64, 2, 5),
                         (5, 16, 8, 3)]:
        x = jnp.asarray(rng.randn(2, 48, c).astype(np.float32))
        w = jnp.asarray(rng.randn(k, c, c).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(c).astype(np.float32))
        expect = _reference_conv(x, w, b, d)
        got = unfold_time(folded_conv(fold_time(x, f), w, b, f, d), f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-4, err_msg=f"k={k} c={c} f={f} d={d}")


def test_folded_conv_transpose_exact():
    from toucan_tpu.kernels.folded_conv import folded_conv_transpose
    from toucan_tpu.models.vocoders.hifigan import conv_transpose_1d
    rng = np.random.RandomState(0)
    for (k, s, cin, cout) in [(16, 8, 24, 12), (12, 6, 16, 8), (8, 4, 8, 8),
                              (4, 2, 6, 3)]:
        pad = (k - s) // 2
        x = jnp.asarray(rng.randn(2, 10, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cout, cin).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        expect = conv_transpose_1d(x, w, s, pad) + b
        folded = folded_conv_transpose(x, w, b, s, pad)
        got = unfold_time(folded, s)
        assert got.shape == expect.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-4, err_msg=f"k={k} s={s}")


def test_fold_roundtrip():
    x = jnp.arange(2 * 12 * 3, dtype=jnp.float32).reshape(2, 12, 3)
    np.testing.assert_array_equal(np.asarray(unfold_time(fold_time(x, 4), 4)),
                                  np.asarray(x))


def test_packed_fold_conv_transpose_exact():
    """packed_folded_conv_transpose (p input rows -> p*stride-packed
    output rows) is exact vs the plain transposed conv."""
    import numpy as np

    import jax.numpy as jnp

    from toucan_tpu.kernels.folded_conv import (fold_time,
                                                packed_folded_conv_transpose,
                                                unfold_time)
    from toucan_tpu.models.vocoders.hifigan import conv_transpose_1d

    rng = np.random.RandomState(0)
    for (k, s, p, cin, cout, t) in [(4, 2, 2, 64, 32, 48),
                                    (8, 4, 2, 16, 8, 24),
                                    (16, 8, 2, 12, 6, 16),
                                    (4, 2, 4, 32, 16, 64)]:
        x = jnp.asarray(rng.randn(2, t, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, cout, cin).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = conv_transpose_1d(x, w, s, (k - s) // 2) + b
        got = unfold_time(
            packed_folded_conv_transpose(fold_time(x, p), w, b, s,
                                         (k - s) // 2, p), p * s)
        assert float(jnp.abs(ref - got).max()) < 1e-5, (k, s, p)
