"""Training observability: progress spectrogram plots and logging callbacks.

Equivalent of the reference's per-epoch progress plots
(``Utility/utils.py:196-288`` plot_progress_spec) and optional wandb scalar
logging (``toucantts_train_loop.py:181-211``).  matplotlib/wandb are
optional; without them the callbacks degrade to no-ops or console logs.
"""

from __future__ import annotations

import os

import numpy as np


def plot_progress_spec(model, variables, save_dir: str, step: int,
                       frontend, sentence: str = None,
                       default_embedding=None, lang_id=None, run_postflow=True,
                       input_is_phones=False, max_frames: int = 2048):
    """Synthesize the language's example sentence and save before/after mel
    plots.  Returns (before_path, after_path) or None without matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None

    import jax.numpy as jnp
    from toucan_tpu.models.toucan_tts import ToucanTTS

    sentence = sentence or frontend.get_example_sentence(frontend.language) \
        or "~ðɪs ɪz ə tˈɛst~#"
    try:
        phones = frontend.string_to_features(sentence,
                                             input_phonemes=input_is_phones)
    except RuntimeError:
        phones = frontend.string_to_features("~ðɪs ɪz ə tˈɛst~#",
                                             input_phonemes=True)
    n = len(phones)
    utt = None
    if default_embedding is not None:
        utt = jnp.asarray(np.asarray(default_embedding)[None])
    lang = jnp.asarray([[lang_id]]) if lang_id is not None else None
    before, after, *_ = model.apply(
        {"params": variables["params"],
         **{k: v for k, v in variables.items() if k != "params"}},
        jnp.asarray(phones[None]), jnp.asarray([n]), max_frames,
        utterance_embedding=utt, lang_ids=lang, run_glow=run_postflow,
        method=ToucanTTS.infer)

    os.makedirs(save_dir, exist_ok=True)
    paths = []
    for name, mel in [("before", before), ("after", after)]:
        fig, ax = plt.subplots(figsize=(9, 4))
        ax.imshow(np.asarray(mel)[0].T, aspect="auto", origin="lower",
                  cmap="GnBu")
        ax.set_title(f"step {step} ({name} postflow)")
        path = os.path.join(save_dir, f"progress_{name}_{step}.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return tuple(paths)


def console_callback(step: int, metrics: dict):
    parts = "  ".join(f"{k}={v:.4f}" for k, v in metrics.items())
    print(f"[step {step}] {parts}")


def wandb_callback(step: int, metrics: dict):
    try:
        import wandb
        wandb.log(metrics, step=step)
    except ImportError:
        pass
