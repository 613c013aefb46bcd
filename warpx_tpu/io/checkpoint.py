"""Checkpoint / restart: serialize the full SimState pytree.

The reference's checkpoint is a diagnostics flush format writing every
MultiFab + particles + RNG + moving-window scalars, restored by
InitFromCheckpoint (Source/Diagnostics/FlushFormats/FlushFormatCheckpoint.cpp,
Source/Diagnostics/WarpXIO.cpp:90-330).  Here the state IS one pytree, so a
checkpoint is a flat npz of its leaves plus the host-side synchronization
flag; restart reproduces the uninterrupted run bit-for-bit (tested).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import numpy as np

from ..core.state import SimState

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: SimState, is_synchronized: bool):
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(os.path.join(path, "state.npz"), **arrays)
    meta = {
        "n_leaves": len(leaves),
        "is_synchronized": bool(is_synchronized),
        "step": int(state.step),
    }
    with open(os.path.join(path, "header.json"), "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(path: str, template: SimState) -> Tuple[SimState, bool]:
    """Restore into the structure of ``template`` (same config/capacities)."""
    import jax.numpy as jnp

    with open(os.path.join(path, "header.json")) as fh:
        meta = json.load(fh)
    data = np.load(os.path.join(path, "state.npz"))
    tmpl_leaves, treedef = jax.tree_util.tree_flatten(template)
    assert meta["n_leaves"] == len(tmpl_leaves), "checkpoint/config mismatch"
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta["is_synchronized"]
