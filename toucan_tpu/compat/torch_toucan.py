"""Convert reference (PyTorch) ToucanTTS checkpoints to toucan-tpu variables.

Works on a plain ``state_dict`` mapping of numpy arrays, so torch is only
needed by callers who load ``.pt`` files.  Handles:

* layout transposition (torch conv (out, in, k) -> flax (k, in, out);
  torch linear (out, in) -> flax (in, out))
* weight-norm folding for the Glow WaveNet layers
  (reference ``store_inverse_all``/``remove_weight_norm`` equivalent)
* BatchNorm running stats -> ``batch_stats`` collection
* InvConvNear LU buffers -> ``buffers`` collection
"""

from __future__ import annotations

import numpy as np


def _t_linear(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _t_linear_nobias(sd, key):
    return {"kernel": sd[f"{key}.weight"].T}


def _conv_w(w):
    """torch (out, in, k) -> flax (k, in, out)."""
    return np.transpose(w, (2, 1, 0))


def _t_conv(sd, key, bias=True):
    out = {"kernel": _conv_w(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _fold_weight_norm(sd, key):
    """Return the effective conv weight for a (possibly) weight-normed layer."""
    if f"{key}.weight" in sd:
        return sd[f"{key}.weight"]
    g = sd[f"{key}.weight_g"]  # (out, 1, 1)
    v = sd[f"{key}.weight_v"]
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


def _t_conv_wn(sd, key):
    return {"kernel": _conv_w(_fold_weight_norm(sd, key)), "bias": sd[f"{key}.bias"]}


def _t_layernorm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _t_cln(sd, key):
    out = {}
    for ours, theirs in [("scale", "W_scale"), ("bias", "W_bias")]:
        for i, j in enumerate([0, 2, 4]):
            out[f"{ours}_{i}"] = _t_linear(sd, f"{key}.{theirs}.{j}")
    return out


def _t_conv_stack(sd, key, n_layers, conditional):
    """Duration/variance predictor conv stack -> our _ConvStack params."""
    stack = {}
    for i in range(n_layers):
        stack[f"conv_{i}"] = _t_conv(sd, f"{key}.conv.{i}.0")
        if conditional:
            stack[f"cln_{i}"] = _t_cln(sd, f"{key}.norms.{i}")
        else:
            stack[f"ln_{i}"] = _t_layernorm(sd, f"{key}.norms.{i}")
    stack["linear"] = _t_linear(sd, f"{key}.linear")
    return {"stack": stack}


def _t_conformer_block(sd, key, macaron=True, use_cnn=True):
    p = {
        "norm_ff": _t_layernorm(sd, f"{key}.norm_ff"),
        "norm_mha": _t_layernorm(sd, f"{key}.norm_mha"),
        "feed_forward": {
            "w_1": _t_conv(sd, f"{key}.feed_forward.w_1"),
            "w_2": _t_conv(sd, f"{key}.feed_forward.w_2"),
        },
        "self_attn": {
            "linear_q": _t_linear(sd, f"{key}.self_attn.linear_q"),
            "linear_k": _t_linear(sd, f"{key}.self_attn.linear_k"),
            "linear_v": _t_linear(sd, f"{key}.self_attn.linear_v"),
            "linear_out": _t_linear(sd, f"{key}.self_attn.linear_out"),
            "linear_pos": _t_linear_nobias(sd, f"{key}.self_attn.linear_pos"),
            "pos_bias_u": sd[f"{key}.self_attn.pos_bias_u"],
            "pos_bias_v": sd[f"{key}.self_attn.pos_bias_v"],
        },
    }
    if macaron:
        p["norm_ff_macaron"] = _t_layernorm(sd, f"{key}.norm_ff_macaron")
        p["feed_forward_macaron"] = {
            "w_1": _t_conv(sd, f"{key}.feed_forward_macaron.w_1"),
            "w_2": _t_conv(sd, f"{key}.feed_forward_macaron.w_2"),
        }
    if use_cnn:
        p["norm_conv"] = _t_layernorm(sd, f"{key}.norm_conv")
        p["norm_final"] = _t_layernorm(sd, f"{key}.norm_final")
        p["conv_module"] = {
            "pointwise_conv1": _t_conv(sd, f"{key}.conv_module.pointwise_conv1"),
            "depthwise_conv": _t_conv(sd, f"{key}.conv_module.depthwise_conv"),
            "pointwise_conv2": _t_conv(sd, f"{key}.conv_module.pointwise_conv2"),
            "norm": {"scale": sd[f"{key}.conv_module.norm.weight"],
                     "bias": sd[f"{key}.conv_module.norm.bias"]},
        }
    return p


def _t_conformer_block_stats(sd, key):
    return {"conv_module": {"norm": {"mean": sd[f"{key}.conv_module.norm.running_mean"],
                                     "var": sd[f"{key}.conv_module.norm.running_var"]}}}


def _t_conformer(sd, key, num_blocks, has_embed, has_lang, has_utt, has_output_norm):
    p = {}
    if has_embed:
        p["embed"] = {"fc1": _t_linear(sd, f"{key}.embed.0"),
                      "fc2": _t_linear(sd, f"{key}.embed.2")}
    if has_lang and f"{key}.language_embedding.weight" in sd:
        p["language_embedding"] = {"embedding": sd[f"{key}.language_embedding.weight"]}
    for i in range(num_blocks):
        p[f"block_{i}"] = _t_conformer_block(sd, f"{key}.encoders.{i}")
    if has_output_norm:
        p["output_norm"] = _t_layernorm(sd, f"{key}.output_norm")
    if has_utt and f"{key}.hs_emb_projection.weight" in sd:
        p["hs_emb_projection"] = _t_linear(sd, f"{key}.hs_emb_projection")
    stats = {f"block_{i}": _t_conformer_block_stats(sd, f"{key}.encoders.{i}")
             for i in range(num_blocks)}
    return p, stats


def _t_wn_core(sd, key, n_layers):
    core = {}
    for i in range(n_layers):
        core[f"in_{i}"] = _t_conv_wn(sd, f"{key}.in_layers.{i}")
        core[f"res_skip_{i}"] = _t_conv_wn(sd, f"{key}.res_skip_layers.{i}")
    return core


def convert_toucan_tts(sd: dict, enc_layers=6, dec_layers=6, duration_layers=3,
                       pitch_layers=7, energy_layers=2, glow_blocks=18, glow_layers=4,
                       share_wn_layers=4, conditional=True, postnet_layers=5):
    """state_dict (numpy arrays) -> {"params": ..., "batch_stats": ..., "buffers": ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params, batch_stats, buffers = {}, {}, {}

    params["encoder"], batch_stats["encoder"] = _t_conformer(
        sd, "encoder", enc_layers, has_embed=True, has_lang=True, has_utt=True,
        has_output_norm=True)
    params["decoder"], batch_stats["decoder"] = _t_conformer(
        sd, "decoder", dec_layers, has_embed=False, has_lang=False, has_utt=False,
        has_output_norm=False)

    params["duration_predictor"] = _t_conv_stack(sd, "duration_predictor",
                                                 duration_layers, conditional)
    params["pitch_predictor"] = _t_conv_stack(sd, "pitch_predictor",
                                              pitch_layers, conditional)
    params["energy_predictor"] = _t_conv_stack(sd, "energy_predictor",
                                               energy_layers, conditional)
    params["pitch_embed"] = _t_conv(sd, "pitch_embed.0")
    params["energy_embed"] = _t_conv(sd, "energy_embed.0")
    params["feat_out"] = _t_linear(sd, "feat_out")

    postnet = {}
    for i in range(postnet_layers):
        postnet[f"conv_{i}"] = {"kernel": _conv_w(sd[f"conv_postnet.postnet.{i}.0.weight"])}
        postnet[f"gn_{i}"] = {"scale": sd[f"conv_postnet.postnet.{i}.1.weight"],
                              "bias": sd[f"conv_postnet.postnet.{i}.1.bias"]}
    params["conv_postnet"] = postnet

    if glow_blocks == 0:  # FastSpeech2-style checkpoint without a PostFlow
        return {"params": params, "batch_stats": batch_stats,
                "buffers": buffers}

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
