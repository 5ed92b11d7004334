"""Convert reference vocoder checkpoints (HiFiGAN/Avocodo, BigVGAN) to
toucan-tpu parameters, folding weight norm.

Reference layouts:
  HiFiGAN   ``.../HiFiGAN/HiFiGAN.py`` — every conv weight-normed; upsample
            stages are Sequential(LeakyReLU, ConvTranspose1d) so the conv
            lives at index 1; residual stacks at ``blocks.{i*3+j}``.
  BigVGAN   ``.../BigVGAN/BigVGAN.py`` — conv_pre/ups/AMP convs/conv_post
            weight-normed, Avocodo taps plain; SnakeBeta alpha/beta live in
            ``resblocks.N.activations.M.act``.
"""

import numpy as np

from toucan_tpu.compat.torch_toucan import _conv_w, _fold_weight_norm


def _conv(sd, key):
    return {"kernel": _conv_w(_fold_weight_norm(sd, key)), "bias": sd[f"{key}.bias"]}


def convert_hifigan(sd: dict, n_up=4, n_blocks=3, n_dil=3):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {"input_conv": _conv(sd, "input_conv")}
    for i in range(n_up):
        w = _fold_weight_norm(sd, f"upsamples.{i}.1")  # (in, out, k)
        p[f"upsample_{i}_kernel"] = np.transpose(w, (2, 1, 0))  # (k, out, in)
        p[f"upsample_{i}_bias"] = sd[f"upsamples.{i}.1.bias"]
        for j in range(n_blocks):
            blk = {}
            for d in range(n_dil):
                blk[f"conv1_{d}"] = _conv(sd, f"blocks.{i * n_blocks + j}.convs1.{d}.1")
                blk[f"conv2_{d}"] = _conv(sd, f"blocks.{i * n_blocks + j}.convs2.{d}.1")
            p[f"block_{i}_{j}"] = blk
    p["out_proj_x1"] = _conv(sd, "out_proj_x1")
    p["out_proj_x2"] = _conv(sd, "out_proj_x2")
    p["output_conv"] = _conv(sd, "output_conv.1")
    return {"params": p}


def convert_bigvgan(sd: dict, n_up=4, n_blocks=3, n_dil=3):
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p = {"conv_pre": _conv(sd, "conv_pre")}
    for i in range(n_up):
        w = _fold_weight_norm(sd, f"ups.{i}.0")
        p[f"up_{i}_kernel"] = np.transpose(w, (2, 1, 0))
        p[f"up_{i}_bias"] = sd[f"ups.{i}.0.bias"]
        for j in range(n_blocks):
            base = f"resblocks.{i * n_blocks + j}"
            blk = {}
            for d in range(n_dil):
                blk[f"conv1_{d}"] = _conv(sd, f"{base}.convs1.{d}")
                blk[f"conv2_{d}"] = _conv(sd, f"{base}.convs2.{d}")
                blk[f"alpha_{2 * d}"] = sd[f"{base}.activations.{2 * d}.act.alpha"]
                blk[f"beta_{2 * d}"] = sd[f"{base}.activations.{2 * d}.act.beta"]
                blk[f"alpha_{2 * d + 1}"] = sd[f"{base}.activations.{2 * d + 1}.act.alpha"]
                blk[f"beta_{2 * d + 1}"] = sd[f"{base}.activations.{2 * d + 1}.act.beta"]
            p[f"amp_{i}_{j}"] = blk
    p["post_alpha"] = sd["activation_post.act.alpha"]
    p["post_beta"] = sd["activation_post.act.beta"]
    p["conv_post"] = _conv(sd, "conv_post")
    p["out_proj_x1"] = _conv(sd, "out_proj_x1")
    p["out_proj_x2"] = _conv(sd, "out_proj_x2")
    return {"params": p}
