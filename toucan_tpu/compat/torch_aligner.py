"""Convert reference Aligner checkpoints (``aligner.pt`` -> ``asr_model``)."""

import numpy as np

from toucan_tpu.compat.torch_toucan import _t_linear


def convert_aligner(sd: dict, conv_layers=5):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, stats = {}, {}
    for i in range(conv_layers):
        tkey = f"convs.{2 * i}"  # dropouts sit at odd indices
        params[f"conv_{i}"] = {
            "conv": {"kernel": np.transpose(sd[f"{tkey}.conv.weight"], (2, 1, 0))},
            "bn": {"scale": sd[f"{tkey}.bnorm.weight"], "bias": sd[f"{tkey}.bnorm.bias"]},
        }
        stats[f"conv_{i}"] = {"bn": {"mean": sd[f"{tkey}.bnorm.running_mean"],
                                     "var": sd[f"{tkey}.bnorm.running_var"]}}
    for name, suffix in [("lstm_fwd", ""), ("lstm_bwd", "_reverse")]:
        params[name] = {
            "w_ih": {"kernel": sd[f"rnn.weight_ih_l0{suffix}"].T,
                     "bias": sd[f"rnn.bias_ih_l0{suffix}"]},
            "w_hh_kernel": sd[f"rnn.weight_hh_l0{suffix}"].T,
            "w_hh_bias": sd[f"rnn.bias_hh_l0{suffix}"],
        }
    params["proj"] = _t_linear(sd, "proj")
    return {"params": params, "batch_stats": stats}
