"""Checkpoint averaging / SWA (reference: ``run_weight_averaging.py``).

Averages the N most recent checkpoints of every model directory under
Models/ into a ``best.msgpack`` (``make_best_in_all`` equivalent).
"""

import argparse
import os

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")


def make_best_in_all(models_dir=MODELS_DIR, n=2):
    from toucan_tpu.train import checkpointing

    for name in sorted(os.listdir(models_dir)):
        directory = os.path.join(models_dir, name)
        paths = checkpointing.list_checkpoints(directory)[-n:]
        if len(paths) < 1:
            continue
        # load without a typed target: average raw msgpack trees
        from flax import serialization
        import numpy as np
        import jax
        trees = []
        for p in paths:
            with open(p, "rb") as f:
                trees.append(serialization.msgpack_restore(f.read()))
        avg = jax.tree.map(
            lambda *leaves: (np.mean(np.stack(leaves), axis=0)
                             if hasattr(leaves[0], "dtype")
                             and np.issubdtype(np.asarray(leaves[0]).dtype, np.floating)
                             else leaves[-1]),
            *trees)
        out = os.path.join(directory, "best.msgpack")
        with open(out, "wb") as f:
            f.write(serialization.msgpack_serialize(avg))
        print(f"averaged {len(paths)} checkpoints -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--models_dir", default=MODELS_DIR)
    parser.add_argument("--n", type=int, default=2)
    args = parser.parse_args()
    make_best_in_all(args.models_dir, args.n)
