"""Load reference PyTorch checkpoint files into toucan-tpu variables.

Covers the checkpoint formats of the reference release
(``run_model_downloader.py``): ToucanTTS ``best.pt`` ({"model": ...,
"default_emb": ...}), vocoder ``best.pt`` ({"generator": ...}), aligner
``aligner.pt`` ({"asr_model": ...}), embedding ``embedding_function.pt``
({"style_emb_func": ...}), and the embedding GAN
({"generator_state_dict": ...}).  torch is imported lazily and only needed
when actually reading ``.pt`` files.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_numpy_state_dict(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _torch_load(path):
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _layer_count(sd, pattern) -> int:
    """Number of indexed sub-modules matching ``pattern`` (one ``(\\d+)``
    group), e.g. ``encoder.encoders.(\\d+).`` -> layer count."""
    import re

    rx = re.compile(pattern)
    best = -1
    for k in sd:
        m = rx.match(k)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def sniff_toucan_config(sd) -> "ToucanTTSConfig":
    """Detect the checkpoint architecture from its keys and shapes.

    Covers the reference's 3-way fallback (``ToucanTTSInterface.py:56-63``:
    multilingual-multispeaker -> multispeaker-only (``lang_embs=None``) ->
    single-speaker (``utt_embed_dim=None``, plain-LayerNorm predictors))
    plus the full layer/width geometry (conformer depth, predictor stacks,
    glow depth), so any checkpoint size loads without hand-typed configs.
    """
    from toucan_tpu.models.toucan_tts import ToucanTTSConfig

    kw = {}
    if "feat_out.weight" in sd:  # Linear(adim -> mel)
        kw["adim"] = int(sd["feat_out.weight"].shape[1])
        kw["mel_channels"] = int(sd["feat_out.weight"].shape[0])
    if "encoder.encoders.0.self_attn.pos_bias_u" in sd:
        kw["aheads"] = int(sd["encoder.encoders.0.self_attn.pos_bias_u"].shape[0])
    for side in ("enc", "dec"):
        prefix = "encoder" if side == "enc" else "decoder"
        n = _layer_count(sd, rf"{prefix}\.encoders\.(\d+)\.")
        if n:
            kw[f"{side}_layers"] = n
            w1 = sd[f"{prefix}.encoders.0.feed_forward.w_1.weight"]
            kw[f"{side}_units"] = int(w1.shape[0])
            dw = sd[f"{prefix}.encoders.0.conv_module.depthwise_conv.weight"]
            kw[f"{side}_kernel"] = int(dw.shape[-1])
    for pred in ("duration", "pitch", "energy"):
        n = _layer_count(sd, rf"{pred}_predictor\.conv\.(\d+)\.")
        if n:
            w = sd[f"{pred}_predictor.conv.0.0.weight"]
            kw[f"{pred}_layers"] = n
            kw[f"{pred}_chans"] = int(w.shape[0])
            kw[f"{pred}_kernel"] = int(w.shape[-1])
    n_flows = _layer_count(sd, r"post_flow\.flows\.(\d+)\.")
    kw["use_postflow"] = n_flows > 0
    if n_flows:
        kw["glow_blocks"] = n_flows // 3  # [ActNorm, InvConvNear, Coupling]
        kw["glow_layers"] = _layer_count(
            sd, r"post_flow\.flows\.2\.wn\.in_layers\.(\d+)\.")
        wv = sd.get("post_flow.flows.2.wn.in_layers.0.weight_v",
                    sd.get("post_flow.flows.2.wn.in_layers.0.weight"))
        if wv is not None:
            kw["glow_hidden"] = int(wv.shape[1])
            kw["glow_kernel"] = int(wv.shape[-1])

    lang_embs = None
    if "encoder.language_embedding.weight" in sd:
        lang_embs = int(sd["encoder.language_embedding.weight"].shape[0])
    utt_embed_dim = None
    if "encoder.hs_emb_projection.weight" in sd:
        # Linear(adim + utt_embed_dim -> adim)  (Conformer.py:70)
        w = sd["encoder.hs_emb_projection.weight"]
        utt_embed_dim = int(w.shape[1] - w.shape[0])
    conditional = any(k.startswith("duration_predictor.norms")
                      and "embedding_projection" in k for k in sd) or (
        utt_embed_dim is not None)
    return ToucanTTSConfig(lang_embs=lang_embs, utt_embed_dim=utt_embed_dim,
                           conditional_predictors=conditional and
                           utt_embed_dim is not None, **kw)


def load_toucan_tts(path: str, return_config: bool = False):
    """-> (variables, default_embedding | None[, config]).

    ``return_config=True`` additionally returns the
    :class:`ToucanTTSConfig` detected from the checkpoint layout (the
    reference's multilingual / multispeaker / single-speaker fallback,
    ``ToucanTTSInterface.py:56-63``)."""
    from toucan_tpu.compat.torch_toucan import convert_toucan_tts

    ckpt = _torch_load(path)
    sd = _to_numpy_state_dict(ckpt["model"])
    config = sniff_toucan_config(sd)
    variables = jax.tree.map(jnp.asarray, convert_toucan_tts(
        sd, enc_layers=config.enc_layers, dec_layers=config.dec_layers,
        duration_layers=config.duration_layers,
        pitch_layers=config.pitch_layers, energy_layers=config.energy_layers,
        # a glow-less (FastSpeech2-style) checkpoint has no post_flow.* keys
        glow_blocks=config.glow_blocks if config.use_postflow else 0,
        glow_layers=config.glow_layers,
        conditional=config.conditional_predictors))
    default_emb = ckpt.get("default_emb")
    if default_emb is not None:
        default_emb = default_emb.detach().cpu().numpy()
    if return_config:
        return variables, default_emb, config
    return variables, default_emb


def load_vocoder(path: str, kind: str = "hifigan"):
    from toucan_tpu.compat.torch_vocoder import convert_bigvgan, convert_hifigan

    ckpt = _torch_load(path)
    sd = _to_numpy_state_dict(ckpt["generator"] if "generator" in ckpt else ckpt)
    convert = convert_hifigan if kind == "hifigan" else convert_bigvgan
    return jax.tree.map(jnp.asarray, convert(sd))


def load_aligner(path: str):
    from toucan_tpu.compat.torch_aligner import convert_aligner

    ckpt = _torch_load(path)
    sd = _to_numpy_state_dict(ckpt["asr_model"] if "asr_model" in ckpt else ckpt)
    return jax.tree.map(jnp.asarray, convert_aligner(sd))


def load_style_embedding(path: str):
    from toucan_tpu.compat.torch_gst import convert_style_embedding

    ckpt = _torch_load(path)
    sd = _to_numpy_state_dict(ckpt["style_emb_func"] if "style_emb_func" in ckpt
                              else ckpt)
    return jax.tree.map(jnp.asarray, convert_style_embedding(sd))


def load_embedding_gan(path: str):
    """-> (g_variables, ResNetG instance, dataset_mean, dataset_std).

    Reads the reference ``embedding_gan.pt`` (``GAN.py:31-39``): the
    generator architecture comes from the checkpoint's own
    ``model_parameters`` and the weights from ``generator_state_dict``.
    """
    from toucan_tpu.compat.torch_gan import convert_resnet_g
    from toucan_tpu.models.embedding_gan import ResNetG

    ckpt = _torch_load(path)
    mp = ckpt["model_parameters"]
    data_dim = mp["data_dim"][-1] if isinstance(mp["data_dim"], (list, tuple)) \
        else mp["data_dim"]
    generator = ResNetG(data_dim=data_dim, z_dim=mp["z_dim"], size=mp["size"],
                        nfilter=mp["nfilter"], nfilter_max=mp["nfilter_max"])
    sd = _to_numpy_state_dict(ckpt["generator_state_dict"])
    variables = jax.tree.map(jnp.asarray, convert_resnet_g(sd, size=mp["size"]))
    mean = ckpt.get("dataset_mean")
    std = ckpt.get("dataset_std")
    if mean is not None and hasattr(mean, "detach"):
        mean = mean.detach().cpu().numpy()
    if std is not None and hasattr(std, "detach"):
        std = std.detach().cpu().numpy()
    return variables, generator, mean, std


def interface_from_torch(tts_path: str, vocoder_path: str, embedding_path: str,
                         vocoder_kind: str = "hifigan", language: str = "en",
                         use_g2p: bool = True, **interface_kwargs):
    """Build a ready ToucanTTSInterface from reference checkpoints — the
    migration path for users switching from the PyTorch toolkit.  Extra
    kwargs (e.g. ``matmul_precision="float32"`` for the parity-precision
    policy, ``dtype=jnp.bfloat16`` for serving) pass through."""
    from toucan_tpu.infer.interface import ToucanTTSInterface

    tts_vars, default_emb, config = load_toucan_tts(tts_path,
                                                    return_config=True)
    voc_vars = load_vocoder(vocoder_path, vocoder_kind)
    gst_vars = load_style_embedding(embedding_path)
    return ToucanTTSInterface(tts_vars, voc_vars, gst_vars, config=config,
                              default_embedding=default_emb,
                              vocoder=vocoder_kind, language=language,
                              use_g2p=use_g2p, **interface_kwargs)
