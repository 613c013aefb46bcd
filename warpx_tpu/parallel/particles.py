"""Particle redistribution across shards (shard_map interior).

Replaces amrex ParticleContainer::Redistribute (reference: neighbor-local
exchange after the push, Source/Evolve/WarpXEvolve.cpp:540-564 — explicit EM
particles move at most ~1 cell/step so only face neighbors are involved) with
fixed-capacity buffers ppermuted along each mesh axis in sequence; diagonal
movers reach their owner in two hops (x-pass then z-pass), like staged
dimension-by-dimension routing.

All shapes are static: each face exchanges up to ``K`` particles per step;
overflow (more movers than K, or no free slot for an arrival) is counted in
the returned ``lost`` scalar rather than crashing — the host can assert on it.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from jax import lax

from ..core.state import ParticleState
from .halo import axis_ring

__all__ = ["exchange_particles"]


def _pack(sp: ParticleState, ndim: int) -> Tuple[jnp.ndarray, List[str]]:
    names = ["w", "ux", "uy", "uz"]
    arrays = [sp.w, sp.ux, sp.uy, sp.uz]
    for nm, arr in zip(("x", "y", "z"), (sp.x, sp.y, sp.z)):
        if arr is not None:
            names.append(nm)
            arrays.append(arr)
    stacked = jnp.stack(arrays, axis=0)  # (F, cap)
    return stacked, names


def _unpack(sp: ParticleState, data: jnp.ndarray, names: List[str], alive) -> ParticleState:
    kw = {"alive": alive}
    for i, nm in enumerate(names):
        kw[nm] = data[i]
    return sp.replace(**kw)


def exchange_particles(
    sp: ParticleState,
    ndim: int,
    dim_axis_names,  # per active dim: mesh axis name or None
    local_lo,  # per dim traced scalar
    local_hi,
    K: int,
) -> Tuple[ParticleState, jnp.ndarray]:
    """Send particles that left the local block to the face neighbor.

    Returns (new_state, lost_count).  Unsharded dims need no exchange (the
    periodic wrap applied afterwards keeps them in-block).
    """
    data, names = _pack(sp, ndim)
    alive = sp.alive
    cap = alive.shape[0]
    pos_index = {nm: i for i, nm in enumerate(names)}
    dim_pos_names = {1: ["z"], 2: ["x", "z"], 3: ["x", "y", "z"]}[ndim]
    lost = jnp.zeros((), jnp.int32)

    for d in range(ndim):
        ax = dim_axis_names[d]
        if ax is None:
            continue
        p = data[pos_index[dim_pos_names[d]]]
        out_left = alive & (p < local_lo[d])
        out_right = alive & (p >= local_hi[d])

        def make_buffer(mask):
            idx = jnp.nonzero(mask, size=K, fill_value=0)[0]
            valid = jnp.arange(K) < jnp.sum(mask)
            buf = data[:, idx]  # (F, K)
            return buf, valid, jnp.maximum(jnp.sum(mask) - K, 0)

        buf_l, valid_l, over_l = make_buffer(out_left)
        buf_r, valid_r, over_r = make_buffer(out_right)
        lost = lost + over_l.astype(jnp.int32) + over_r.astype(jnp.int32)
        # drop movers locally (including any overflow beyond K — counted above)
        alive = alive & ~(out_left | out_right)

        # ship: left buffer to left neighbor (ring shift -1), right to +1
        recv_from_right = lax.ppermute(
            jnp.concatenate([buf_l, valid_l[None].astype(buf_l.dtype)], axis=0),
            ax, axis_ring(ax, -1),
        )
        recv_from_left = lax.ppermute(
            jnp.concatenate([buf_r, valid_r[None].astype(buf_r.dtype)], axis=0),
            ax, axis_ring(ax, +1),
        )
        recv = jnp.concatenate([recv_from_right, recv_from_left], axis=1)  # (F+1, 2K)
        recv_data = recv[:-1]
        recv_alive = recv[-1] > 0.5

        free_idx = jnp.nonzero(~alive, size=2 * K, fill_value=cap)[0]
        placeable = recv_alive & (free_idx < cap)
        lost = lost + jnp.sum(recv_alive & ~placeable).astype(jnp.int32)
        tgt = jnp.where(placeable, free_idx, cap)  # cap -> dropped by mode
        data = jnp.swapaxes(
            jnp.swapaxes(data, 0, 1).at[tgt].set(
                jnp.swapaxes(recv_data, 0, 1), mode="drop"
            ),
            0, 1,
        )
        alive = alive.at[tgt].set(True, mode="drop")

    return _unpack(sp, data, names, alive), lost
