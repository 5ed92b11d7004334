"""Convert reference StochasticVariancePredictor / StochasticToucanTTS
checkpoints to toucan-tpu variables."""

import numpy as np

from toucan_tpu.compat.torch_toucan import _t_conv, _t_conformer, _t_linear, _conv_w


def _dds_conv(sd, key, n_layers=3):
    out = {}
    for i in range(n_layers):
        out[f"sep_{i}"] = {"kernel": _conv_w(sd[f"{key}.convs_sep.{i}.weight"]),
                           "bias": sd[f"{key}.convs_sep.{i}.bias"]}
        out[f"pw_{i}"] = {"kernel": _conv_w(sd[f"{key}.convs_1x1.{i}.weight"]),
                          "bias": sd[f"{key}.convs_1x1.{i}.bias"]}
        out[f"norm1_{i}"] = {"ln": {"scale": sd[f"{key}.norms_1.{i}.gamma"],
                                    "bias": sd[f"{key}.norms_1.{i}.beta"]}}
        out[f"norm2_{i}"] = {"ln": {"scale": sd[f"{key}.norms_2.{i}.gamma"],
                                    "bias": sd[f"{key}.norms_2.{i}.beta"]}}
    return out


def _conv_flow(sd, key):
    return {
        "pre": _t_conv(sd, f"{key}.pre"),
        "convs": _dds_conv(sd, f"{key}.convs"),
        "proj": _t_conv(sd, f"{key}.proj"),
    }


def _affine(sd, key):
    return {"m": sd[f"{key}.m"].reshape(-1), "logs": sd[f"{key}.logs"].reshape(-1)}


def convert_stochastic_predictor(sd: dict, prefix: str = "", n_flows=4,
                                 n_post_flows=4, has_cond=True):
    p = lambda k: f"{prefix}{k}" if prefix else k
    out = {
        "pre": _t_conv(sd, p("pre")),
        "proj": _t_conv(sd, p("proj")),
        "convs": _dds_conv(sd, p("convs")),
        "post_pre": _t_conv(sd, p("post_pre")),
        "post_proj": _t_conv(sd, p("post_proj")),
        "post_convs": _dds_conv(sd, p("post_convs")),
        "affine": _affine(sd, p("flows.0")),
        "post_affine": _affine(sd, p("post_flows.0")),
    }
    if has_cond and f"{p('cond')}.weight" in sd:
        out["cond"] = _t_conv(sd, p("cond"))
    for i in range(n_flows):
        out[f"flow_{i}"] = _conv_flow(sd, p(f"flows.{2 * i + 1}"))
    for i in range(n_post_flows):
        out[f"post_flow_{i}"] = _conv_flow(sd, p(f"post_flows.{2 * i + 1}"))
    return {"params": out}


def convert_stochastic_toucan_tts(sd: dict, enc_layers=6, dec_layers=6,
                                  glow_blocks=18, glow_layers=4,
                                  share_wn_layers=4, postnet_layers=5):
    """Full StochasticToucanTTS state_dict -> variables."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, batch_stats, buffers = {}, {}, {}
    params["encoder"], batch_stats["encoder"] = _t_conformer(
        sd, "encoder", enc_layers, has_embed=True, has_lang=True, has_utt=True,
        has_output_norm=True)
    params["decoder"], batch_stats["decoder"] = _t_conformer(
        sd, "decoder", dec_layers, has_embed=False, has_lang=False, has_utt=False,
        has_output_norm=False)
    for flow_name, n_flows in [("duration_flow", 6), ("pitch_flow", 6),
                               ("energy_flow", 3)]:
        params[flow_name] = convert_stochastic_predictor(
            sd, prefix=f"{flow_name}.", n_flows=n_flows)["params"]
    params["pitch_embed"] = _t_conv(sd, "pitch_embed.0")
    params["energy_embed"] = _t_conv(sd, "energy_embed.0")
    params["feat_out"] = _t_linear(sd, "feat_out")

    # postnet + glow share structure with the deterministic model
    postnet = {}
    for i in range(postnet_layers):
        postnet[f"conv_{i}"] = {"kernel": _conv_w(sd[f"conv_postnet.postnet.{i}.0.weight"])}
        postnet[f"gn_{i}"] = {"scale": sd[f"conv_postnet.postnet.{i}.1.weight"],
                              "bias": sd[f"conv_postnet.postnet.{i}.1.bias"]}
    params["conv_postnet"] = postnet

    from toucan_tpu.compat.torch_toucan import _t_conv_wn, _t_wn_core
    glow_p, glow_b = {}, {}
    glow_p["g_proj"] = _t_conv(sd, "post_flow.g_proj")
    for b in range(glow_blocks):
        base = f"post_flow.flows.{3 * b}"
        glow_p[f"actnorm_{b}"] = {"logs": sd[f"{base}.logs"].reshape(-1),
                                  "bias": sd[f"{base}.bias"].reshape(-1)}
        base = f"post_flow.flows.{3 * b + 1}"
        glow_p[f"invconv_{b}"] = {"l": sd[f"{base}.l"], "log_s": sd[f"{base}.log_s"],
                                  "u": sd[f"{base}.u"]}
        glow_b[f"invconv_{b}"] = {"p": sd[f"{base}.p"], "sign_s": sd[f"{base}.sign_s"]}
        base = f"post_flow.flows.{3 * b + 2}"
        glow_p[f"coupling_{b}"] = {
            "start": _t_conv_wn(sd, f"{base}.start"),
            "end": _t_conv(sd, f"{base}.end"),
            "cond_layer": _t_conv_wn(sd, f"{base}.wn.cond_layer"),
        }
        if b % share_wn_layers == 0:
            glow_p[f"wn_core_{b // share_wn_layers}"] = _t_wn_core(
                sd, f"{base}.wn", glow_layers)
    params["post_flow"] = glow_p
    buffers["post_flow"] = glow_b
    return {"params": params, "batch_stats": batch_stats, "buffers": buffers}
