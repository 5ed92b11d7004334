"""Device mesh construction and sharding specs.

The reference is strictly single-device (SURVEY.md §2.10); this layer is the
TPU-native scaling design: a ('data', 'model') mesh where utterance batches
shard over 'data' (DP across chips/hosts) and the widest weight matrices —
conformer feed-forward kernels and vocoder channel dims — optionally shard
over 'model' (Megatron-style column/row split).  XLA inserts the matching
all-reduces over ICI from the shardings alone; there is no hand-written
collective in the model code.

Multi-host: ``initialize_distributed()`` (flags, env vars, or TPU-pod
auto-detect) before ``make_mesh`` and the same code runs across pod slices
(DCN handles the cross-host ring); per-host batches assemble into global
arrays with ``make_global_batch``.
"""

import os
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None) -> None:
    """Multi-host runtime bring-up (wraps ``jax.distributed.initialize``).

    Resolution order per field: explicit argument -> ``TOUCAN_COORDINATOR``
    / ``TOUCAN_NUM_PROCESSES`` / ``TOUCAN_PROCESS_ID`` env vars -> JAX's own
    auto-detection (TPU pods discover the coordinator from the metadata
    server, so all-None is the normal pod path).  Safe to call once per
    process, before any device use.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "TOUCAN_COORDINATOR")
    if num_processes is None and "TOUCAN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TOUCAN_NUM_PROCESSES"])
    if process_id is None and "TOUCAN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TOUCAN_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def make_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Host-local batch arrays -> global arrays sharded over 'data'.

    Single-process: a plain device put (the pjit in_shardings lay it out).
    Multi-process: every host contributes its local slice of the global
    batch via ``jax.make_array_from_process_local_data`` — the per-host
    data-sharding wiring the reference never needed (single GPU).
    """
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    sh = batch_sharding(mesh)
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch.items()}


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), \
        f"{n_data}x{n_model} mesh cannot use {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# (regex over param path, PartitionSpec) — first match wins.  Kernels are
# flax Conv (k, in, out) / Dense (in, out) layouts.
_TP_RULES = [
    # conformer position-wise FFN: column-split the expansion, row-split the
    # projection back (classic Megatron pairing; XLA adds one psum per block)
    (r"feed_forward(_macaron)?/w_1/kernel$", P(None, None, "model")),
    (r"feed_forward(_macaron)?/w_2/kernel$", P(None, "model", None)),
    # vocoder residual stacks: shard channels of the wide early stages
    (r"block_[01]_\d+/conv[12]_\d+/kernel$", P(None, None, "model")),
]


def _spec_for(path_names) -> P:
    name = "/".join(path_names)
    for pattern, spec in _TP_RULES:
        if re.search(pattern, name):
            return spec
    return P()


def param_sharding_rules(params, mesh: Mesh):
    """Pytree of NamedShardings: TP rules above, replicated otherwise."""

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for(path))

    return build(params)


def batch_sharding(mesh: Mesh):
    """Every batch array shards its leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def _replicated_like(tree, mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def _opt_sharding(opt_state, param_sh, mesh):
    """Optimizer-state NamedShardings: adam/radam moments inherit their
    parameter's sharding, every other leaf (counts, clip state) replicated."""
    replicated = NamedSharding(mesh, P())

    def opt_entry(entry):
        if hasattr(entry, "mu") and hasattr(entry, "nu"):  # ScaleByAdamState
            return entry._replace(count=replicated, mu=param_sh, nu=param_sh)
        return replicated  # plain leaf (e.g. schedule step counts)

    return jax.tree.map(opt_entry, opt_state,
                        is_leaf=lambda x: hasattr(x, "mu"))


def shard_train_state(state, mesh: Mesh):
    """NamedShardings for a TrainState: params follow the TP rules, adam
    moments inherit their parameter's sharding, everything else replicated."""
    param_sh = param_sharding_rules(state.params, mesh)
    replicated = NamedSharding(mesh, P())
    return state.replace(
        params=param_sh,
        batch_stats=_replicated_like(state.batch_stats, mesh),
        buffers=_replicated_like(state.buffers, mesh),
        opt_state=_opt_sharding(state.opt_state, param_sh, mesh),
        step=replicated,
        gst_variables=_replicated_like(state.gst_variables, mesh),
    )


def shard_vocoder_train_state(state, mesh: Mesh):
    """NamedShardings for a VocoderTrainState (train/vocoder_train.py).

    Generator params follow the TP rules (the wide early residual stages
    shard their channels over 'model'); discriminator params replicate (the
    17 critics are small and their conv geometries are irregular); both
    optimizer states inherit.  Batches shard over 'data' — the DP training
    the reference's single-GPU vocoder loop (``hifigan_train_loop.py``)
    never had.
    """
    g_sh = param_sharding_rules(state.g_params, mesh)
    d_sh = _replicated_like(state.d_params, mesh)
    replicated = NamedSharding(mesh, P())
    return state.replace(
        step=replicated,
        g_params=g_sh,
        g_opt_state=_opt_sharding(state.g_opt_state, g_sh, mesh),
        d_params=d_sh,
        d_opt_state=_opt_sharding(state.d_opt_state, d_sh, mesh),
    )


def shard_aligner_train_state(state, mesh: Mesh):
    """NamedShardings for an AlignerTrainState: pure DP — both nets are
    small (conv+BiLSTM), so params/opt replicate and the utterance batch
    shards over 'data' (BASELINE config 5: aligner loop data-parallel)."""
    rep_params = _replicated_like(state.asr_params, mesh)
    rep_tts = _replicated_like(state.tts_params, mesh)
    replicated = NamedSharding(mesh, P())
    return state.replace(
        step=replicated,
        asr_params=rep_params,
        asr_batch_stats=_replicated_like(state.asr_batch_stats, mesh),
        asr_opt_state=_opt_sharding(state.asr_opt_state, rep_params, mesh),
        tts_params=rep_tts,
        tts_opt_state=_opt_sharding(state.tts_opt_state, rep_tts, mesh),
    )
