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


def test_fold_roundtrip():
    x = jnp.arange(2 * 12 * 3, dtype=jnp.float32).reshape(2, 12, 3)
    np.testing.assert_array_equal(np.asarray(unfold_time(fold_time(x, 4), 4)),
                                  np.asarray(x))
