"""Guard-cell halo exchange and guard accumulation inside shard_map.

The reference's FillBoundary (halo copy, Source/Parallelization/
WarpXComm.cpp:645-1059) becomes jax.lax.ppermute ring shifts of guard slabs
over ICI; SumBoundary (additive fold of deposited guard charge/current,
WarpXComm.cpp:1074 SyncCurrent / WarpXSumGuardCells.H) becomes the reverse
ppermute + add.  Axes not sharded on the device mesh use in-shard periodic
wrap, which is exactly the single-box periodic case.

All functions run INSIDE shard_map on per-shard local blocks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["exchange_halos", "accumulate_guards", "axis_ring"]


def axis_ring(axis_name: str, shift: int):
    """Ring permutation pairs for ppermute along a mesh axis.

    shift=+1 sends data to the right (higher index) neighbor.
    """
    n = lax.axis_size(axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def _shift_from(arr: jnp.ndarray, axis_name: str | None, direction: int):
    """Fetch a slab from the neighbor in ``direction`` (ppermute towards us)."""
    if axis_name is None:
        return arr
    return lax.ppermute(arr, axis_name, axis_ring(axis_name, -direction))


def exchange_halos(
    arr: jnp.ndarray,
    ng: int,
    mesh_axes: Sequence[str | None],
) -> jnp.ndarray:
    """Pad a local block with ng guard cells per side on every dimension.

    mesh_axes[d] is the mesh axis name sharding array dim d, or None if dim d
    is unsharded (periodic wrap within the shard).  Guards always carry the
    periodic-neighbor data; on a 1-shard mesh axis the ppermute is a self-copy,
    which reproduces single-box periodic semantics.
    """
    out = arr
    for d, ax in enumerate(mesh_axes):
        idx_lo = [slice(None)] * out.ndim
        idx_hi = [slice(None)] * out.ndim
        idx_lo[d] = slice(0, ng)
        idx_hi[d] = slice(out.shape[d] - ng, out.shape[d])
        low_slab = out[tuple(idx_lo)]
        high_slab = out[tuple(idx_hi)]
        if ax is None:
            left_guard, right_guard = high_slab, low_slab
        else:
            # my low guard = left neighbor's high slab, etc.
            left_guard = _shift_from(high_slab, ax, -1)
            right_guard = _shift_from(low_slab, ax, +1)
        out = jnp.concatenate([left_guard, out, right_guard], axis=d)
    return out


def accumulate_guards(
    padded: jnp.ndarray,
    ng: int,
    mesh_axes: Sequence[str | None],
) -> jnp.ndarray:
    """Fold deposited guard values back into neighbors' valid cells.

    Inverse of exchange_halos for additive quantities (J, rho): the low guard
    slab is added to the left neighbor's top valid cells and vice versa.
    Returns the valid-region array (guards stripped).
    """
    out = padded
    # process dims in reverse so earlier concatenations are stripped correctly
    for d in reversed(range(padded.ndim)):
        ax = mesh_axes[d]
        n_tot = out.shape[d]

        def sl(a, b):
            idx = [slice(None)] * out.ndim
            idx[d] = slice(a, b)
            return tuple(idx)

        low_guard = out[sl(0, ng)]
        high_guard = out[sl(n_tot - ng, n_tot)]
        valid = out[sl(ng, n_tot - ng)]
        if ax is None:
            from_right = low_guard  # low guard wraps onto my own top cells
            from_left = high_guard
        else:
            # right neighbor's low guard overlaps my top valid cells
            from_right = _shift_from(low_guard, ax, +1)
            from_left = _shift_from(high_guard, ax, -1)
        nv = valid.shape[d]
        valid = valid.at[sl(nv - ng, nv)].add(from_right)
        valid = valid.at[sl(0, ng)].add(from_left)
        out = valid
    return out
