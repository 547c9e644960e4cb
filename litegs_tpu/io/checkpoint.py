"""Checkpoint save/resume of the full training state.

The reference pickles {epoch, optimizer, scheduler} wholesale and recovers
parameters from the optimizer's param groups (litegs/io_manager/
checkpoint.py:4-25).  Here the state is an explicit pytree
(TrainState = params + Adam moments + active_count + step), saved as a
single .npz plus a small JSON sidecar -- dependency-free, deterministic,
and restorable on any backend.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_checkpoint(ckpt_dir: str, epoch: int, state,
                    extra: dict | None = None) -> str:
    """Write chkpnt{epoch}.npz (+ .json metadata). Returns the path."""
    os.makedirs(ckpt_dir, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    path = os.path.join(ckpt_dir, f"chkpnt{epoch}.npz")
    np.savez(path, **{f"leaf_{i}": np.asarray(x)
                      for i, x in enumerate(leaves)})
    meta = {"epoch": epoch, "n_leaves": len(leaves),
            "treedef": str(treedef), "extra": extra or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str, state_template):
    """Restore (epoch, state) from a checkpoint file.

    ``state_template`` supplies the pytree structure (shapes must match;
    capacity is part of the saved shapes just as the reference's pickled
    tensors fix N).
    """
    with open(path + ".json") as f:
        meta = json.load(f)
    data = np.load(path)
    leaves_t, treedef = jax.tree.flatten(state_template)
    assert meta["n_leaves"] == len(leaves_t), \
        f"checkpoint has {meta['n_leaves']} leaves, template " \
        f"{len(leaves_t)}"
    # a different structure with coincidentally matching leaf count/shapes
    # (e.g. reordered TrainState fields) would silently misassign arrays
    assert meta["treedef"] == str(treedef), \
        f"checkpoint treedef mismatch:\n saved  {meta['treedef']}\n " \
        f"template {treedef}"
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        want = np.shape(tmpl)
        assert arr.shape == tuple(want), \
            f"leaf {i}: checkpoint {arr.shape} vs template {want}"
        leaves.append(jnp.asarray(arr))
    return meta["epoch"], jax.tree.unflatten(treedef, leaves)
