"""Convert the reference embedding-WGAN generator checkpoint to flax.

The reference GUI's artificial voices come from a trained WGAN-QC ResNet
generator (``InferenceInterfaces/Controllability/wgan/resnet_1.py:8-81``),
stored in ``embedding_gan.pt`` as ``{"model_parameters": ...,
"generator_state_dict": ..., "critic_state_dict": ..., "dataset_mean": ...,
"dataset_std": ...}`` (``GAN.py:31-39``).  This module maps the torch state
dict onto :class:`toucan_tpu.models.embedding_gan.ResNetG` exactly
(weight-layout transposes only, no renormalization).
"""

from __future__ import annotations

import math

import numpy as np


def _conv(w):
    # torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):
    # torch Linear (out, in) -> flax (in, out)
    return np.transpose(w, (1, 0))


def _bn(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _resnet_block(sd, prefix):
    params, stats = {}, {}
    params["conv_0"] = {"kernel": _conv(sd[f"{prefix}.conv_0.weight"])}
    if f"{prefix}.conv_0.bias" in sd:
        params["conv_0"]["bias"] = sd[f"{prefix}.conv_0.bias"]
    params["conv_1"] = {"kernel": _conv(sd[f"{prefix}.conv_1.weight"])}
    if f"{prefix}.conv_1.bias" in sd:
        params["conv_1"]["bias"] = sd[f"{prefix}.conv_1.bias"]
    if f"{prefix}.conv_s.weight" in sd:
        params["conv_s"] = {"kernel": _conv(sd[f"{prefix}.conv_s.weight"])}
    for torch_bn, flax_bn in [("bn2d_0", "bn_0"), ("bn2d_1", "bn_1"),
                              ("bn2d_s", "bn_s")]:
        if f"{prefix}.{torch_bn}.weight" in sd:
            p, s = _bn(sd, f"{prefix}.{torch_bn}")
            params[flax_bn] = p
            stats[flax_bn] = s
    return params, stats


def convert_resnet_g(sd: dict, size: int = 4) -> dict:
    """torch ``ResNet_G.state_dict()`` (numpy values) -> flax variables for
    :class:`ResNetG`.  ``size`` is the checkpoint's image side length
    (``model_parameters['size']``); it determines the block count."""
    nlayers = int(math.log2(size / 4))
    params = {
        "fc": {"kernel": _dense(sd["fc.weight"]), "bias": sd["fc.bias"]},
        "conv_img": {"kernel": _conv(sd["conv_img.weight"]),
                     "bias": sd["conv_img.bias"]},
        "fc_out": {"kernel": _dense(sd["fc_out.weight"]),
                   "bias": sd["fc_out.bias"]},
    }
    batch_stats = {}
    if "bn1d.weight" in sd:
        p, s = _bn(sd, "bn1d")
        params["bn1d"] = p
        batch_stats["bn1d"] = s
    # torch Sequential interleaves Upsample (no params) after each of the
    # first ``nlayers`` blocks: ResNetBlock indices 0, 2, ..., then the two
    # final blocks at 2*nlayers and 2*nlayers + 1 (resnet_1.py:31-46)
    torch_indices = [2 * k for k in range(nlayers)] + [2 * nlayers,
                                                       2 * nlayers + 1]
    for our_idx, torch_idx in enumerate(torch_indices):
        p, s = _resnet_block(sd, f"resnet.{torch_idx}")
        params[f"block_{our_idx}"] = p
        if s:
            batch_stats[f"block_{our_idx}"] = s
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables
