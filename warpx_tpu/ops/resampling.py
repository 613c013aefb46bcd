"""Particle resampling: leveling thinning.

Reimplements the reference's LevelingThinning (Source/Particles/Resampling/
LevelingThinning.cpp): per cell, a level weight w_level = t * <w> is chosen
(t = target_ratio, default 1.5); particles with w < w_level are kept with
probability w/w_level and their weight raised to w_level, conserving charge
in expectation while reducing the particle count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["leveling_thinning"]


def leveling_thinning(sp_state, geom, rng_key, target_ratio: float = 1.5):
    """One leveling-thinning pass. Returns (new_state, new_key)."""
    ndim = geom.ndim
    cap = sp_state.capacity
    pos = sp_state.positions(ndim)
    cell = jnp.zeros(cap, jnp.int32)
    n_cells_tot = 1
    for d in range(ndim):
        idx = jnp.floor(
            (pos[d] - geom.prob_lo[d]) / geom.dx[d]
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, geom.n_cell[d] - 1)
        cell = cell * geom.n_cell[d] + idx
        n_cells_tot *= geom.n_cell[d]

    w = jnp.where(sp_state.alive, sp_state.w, 0.0)
    wsum = jnp.zeros(n_cells_tot).at[cell].add(w)
    count = jnp.zeros(n_cells_tot).at[cell].add(
        sp_state.alive.astype(w.dtype)
    )
    avg_w = wsum / jnp.maximum(count, 1.0)
    w_level = target_ratio * avg_w[cell]

    key, sub = jax.random.split(rng_key)
    r = jax.random.uniform(sub, (cap,), dtype=w.dtype)
    below = sp_state.alive & (sp_state.w < w_level)
    keep = ~below | (r < sp_state.w / jnp.maximum(w_level, 1e-300))
    new_w = jnp.where(below & keep, w_level, sp_state.w)
    new_alive = sp_state.alive & keep
    return sp_state.replace(w=new_w, alive=new_alive), key
