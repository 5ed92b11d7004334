import numpy as np

import jax

from tests.test_train_dist import TINY
from toucan_tpu.dist.scaling_bench import measure


def test_scaling_measure_on_virtual_mesh():
    assert len(jax.devices()) == 8
    result = measure(n_data=4, n_model=2, batch_per_device=2, tmax=8, lmax=16,
                     steps=2, config=TINY)
    assert result["mesh"] == "4x2"
    assert result["batch_size"] == 8
    assert result["utterances_per_second"] > 0
    assert np.isfinite(result["step_seconds"])
