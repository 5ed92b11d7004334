"""Checkpointing, resume, and manual SWA.

Mirrors the reference behavior (``toucantts_train_loop.py:160-221``,
``run_weight_averaging.py``): per-epoch ``checkpoint_<step>`` files with a
keep-5 GC, highest-step resume, and "manual SWA" — average the parameters
of the N most recent checkpoints into ``best`` and reload them into the
live state.  Serialization uses flax msgpack on the full TrainState pytree.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
from flax import serialization

_CKPT_RE = re.compile(r"checkpoint_(\d+)\.msgpack$")


def save_checkpoint(directory: str, state, step: int, keep: int = 5) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint_{step}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    delete_old_checkpoints(directory, keep=keep)
    return path


def list_checkpoints(directory: str):
    if not os.path.isdir(directory):
        return []
    found = []
    for name in os.listdir(directory):
        m = _CKPT_RE.search(name)
        if m:
            found.append((int(m.group(1)), os.path.join(directory, name)))
    return [p for _, p in sorted(found)]


def delete_old_checkpoints(directory: str, keep: int = 5):
    paths = list_checkpoints(directory)
    for path in paths[:-keep] if keep else paths:
        os.remove(path)


def get_most_recent_checkpoint(directory: str):
    paths = list_checkpoints(directory)
    return paths[-1] if paths else None


def load_checkpoint(path: str, target_state):
    with open(path, "rb") as f:
        return serialization.from_bytes(target_state, f.read())


def average_checkpoints(paths, target_state):
    """Parameter-average the ``params`` of several checkpoints (manual SWA,
    reference ``run_weight_averaging.py:74-105``); non-param fields come
    from the most recent checkpoint."""
    states = [load_checkpoint(p, target_state) for p in paths]
    avg_params = jax.tree.map(
        lambda *leaves: np.mean(np.stack([np.asarray(l) for l in leaves]), axis=0),
        *[s.params for s in states])
    return states[-1].replace(params=avg_params)


def save_best(directory: str, state) -> str:
    path = os.path.join(directory, "best.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    return path


def swa_update(directory: str, state, n: int = 2):
    """Average the n most recent checkpoints into best.msgpack and return a
    state carrying the averaged parameters (reference reloads them live)."""
    paths = list_checkpoints(directory)[-n:]
    if len(paths) < n:
        return state
    averaged = average_checkpoints(paths, state)
    save_best(directory, averaged)
    return state.replace(params=averaged.params)
