"""Orbax-based sharded checkpointing for pod-scale training state.

The msgpack path (``toucan_tpu/train/checkpointing.py``) serializes the
full pytree on one host — fine single-host, but a multi-host pod needs
every host to write its own shards and restore them onto the same mesh
layout.  This module wraps orbax's OCDBT checkpointing with the repo's
checkpoint conventions (``checkpoint_<step>`` + keep-N + highest-step
resume + manual SWA, mirroring ``toucantts_train_loop.py:160-221``):

 * arrays are saved shard-by-shard (each host writes only its addressable
   shards; orbax coordinates across processes);
 * restore takes a *target state* (same pytree with the desired
   NamedShardings, e.g. from ``dist.mesh.shard_train_state``) and places
   every leaf directly onto its devices — no host-memory full copy;
 * ``swa_average`` averages the N most recent checkpoints on device.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^(\d+)$")


def _manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True,
                                             enable_async_checkpointing=False),
    )


def save_sharded_checkpoint(directory: str, state: Any, step: int,
                            keep: int = 5) -> str:
    """Save (possibly multi-host sharded) state as checkpoint ``step``."""
    with _manager(directory, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return os.path.join(os.path.abspath(directory), str(step))


def list_sharded_steps(directory: str):
    if not os.path.isdir(directory):
        return []
    steps = [int(m.group(1)) for name in os.listdir(directory)
             if (m := _STEP_RE.match(name)) and
             os.path.isdir(os.path.join(directory, name))]
    return sorted(steps)


def latest_sharded_step(directory: str) -> Optional[int]:
    steps = list_sharded_steps(directory)
    return steps[-1] if steps else None


def _abstract_target(target_state: Any):
    """Target pytree of ShapeDtypeStructs carrying the desired shardings."""
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        return x
    return jax.tree.map(leaf, target_state)


def restore_sharded_checkpoint(directory: str, target_state: Any,
                               step: Optional[int] = None) -> Any:
    """Restore onto the shardings of ``target_state`` (device placement
    happens shard-by-shard per host)."""
    if step is None:
        step = latest_sharded_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    with _manager(directory) as mgr:
        return mgr.restore(
            step, args=ocp.args.StandardRestore(_abstract_target(target_state)))


def swa_average(directory: str, target_state: Any, n: int = 2) -> Any:
    """Average the parameters of the ``n`` most recent sharded checkpoints
    on device (reference manual-SWA, ``run_weight_averaging.py:74-105``);
    non-array leaves and the step counter come from the newest one."""
    steps = list_sharded_steps(directory)[-n:]
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    states = [restore_sharded_checkpoint(directory, target_state, s)
              for s in steps]
    newest = states[-1]
    if len(states) == 1:
        return newest

    def avg(path, *leaves):
        ref = leaves[-1]
        if isinstance(ref, (jax.Array, np.ndarray)) and \
                jnp.issubdtype(jnp.asarray(ref).dtype, jnp.floating) and \
                any("params" in str(k) for k in path):
            out = leaves[0] / len(leaves)
            for leaf in leaves[1:]:
                out = out + leaf / len(leaves)
            return out
        return ref

    return jax.tree_util.tree_map_with_path(avg, *states)
