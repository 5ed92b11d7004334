"""Convert reference StyleEmbedding (GST) checkpoints to toucan-tpu variables.

Reference layout (``Spectrogram_to_Embedding/StyleEmbedding.py``): the
checkpoint's ``style_emb_func`` dict has keys under ``gst.`` — the
reference encoder's Sequential places convs at indices 3i and batch norms
at 3i+1; the GRU uses torch's fused gate weights; the style-token MHA is a
standard 4-linear attention.
"""

import numpy as np

from toucan_tpu.compat.torch_toucan import _t_linear


def convert_style_embedding(sd: dict, conv_layers=8, gru_layers=2):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    ref_enc, ref_stats = {}, {}
    for i in range(conv_layers):
        w = sd[f"gst.ref_enc.convs.{3 * i}.weight"]  # (out, in, kh, kw)
        ref_enc[f"conv_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        ref_enc[f"bn_{i}"] = {"scale": sd[f"gst.ref_enc.convs.{3 * i + 1}.weight"],
                              "bias": sd[f"gst.ref_enc.convs.{3 * i + 1}.bias"]}
        ref_stats[f"bn_{i}"] = {"mean": sd[f"gst.ref_enc.convs.{3 * i + 1}.running_mean"],
                                "var": sd[f"gst.ref_enc.convs.{3 * i + 1}.running_var"]}
    gru = {}
    for layer in range(gru_layers):
        gru[f"w_ih_{layer}"] = {"kernel": sd[f"gst.ref_enc.gst.weight_ih_l{layer}"].T,
                                "bias": sd[f"gst.ref_enc.gst.bias_ih_l{layer}"]}
        gru[f"w_hh_{layer}_kernel"] = sd[f"gst.ref_enc.gst.weight_hh_l{layer}"].T
        gru[f"w_hh_{layer}_bias"] = sd[f"gst.ref_enc.gst.bias_hh_l{layer}"]
    ref_enc["gru"] = gru

    stl = {"gst_embs": sd["gst.stl.gst_embs"]}
    for name in ["linear_q", "linear_k", "linear_v", "linear_out"]:
        stl[name] = _t_linear(sd, f"gst.stl.mha.{name}")

    return {"params": {"ref_enc": ref_enc, "stl": stl},
            "batch_stats": {"ref_enc": ref_stats}}
