"""Particle resampling: leveling thinning + velocity-coincidence thinning.

LevelingThinning (Source/Particles/Resampling/LevelingThinning.cpp): per
cell, a level weight w_level = t * <w> is chosen (t = target_ratio, default
1.5); particles with w < w_level are kept with probability w/w_level and
their weight raised to w_level, conserving charge in expectation while
reducing the particle count.

VelocityCoincidenceThinning (VelocityCoincidenceThinning.cpp): particles are
clustered per (cell, momentum bin) and each cluster of >2 particles merges
into TWO particles at the weighted-mean position that exactly conserve the
cluster's weight, momentum and kinetic energy (the Vranic two-particle
solve with a random azimuth for the perpendicular component).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["leveling_thinning", "velocity_coincidence_thinning"]


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


def velocity_coincidence_thinning(
    sp_state, geom, mass: float, rng_key, *,
    grid_type: str = "spherical",
    delta_ur: float = None,
    n_theta: int = 1,
    n_phi: int = 1,
    delta_u=None,
    min_ppc: int = 1,
):
    """Merge each (cell, momentum-bin) cluster of >2 particles into two.

    Reference: VelocityCoincidenceThinning.cpp:80-326 — clusters conserve
    weight, momentum and kinetic energy exactly; spherical bins use
    (|u|/dur, (atan2(uy,ux)+pi)/dtheta, acos(uz/|u|)/dphi)
    (VelocityCoincidenceThinning.H:130-148), cartesian bins use the particle
    min/max extents.  The reference's optional cluster_weight cap (its
    sequential in-bin split) is not implemented.  Returns (state, key).
    """
    from ..constants import c as _c

    c2 = _c * _c
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
    cell = jnp.where(sp_state.alive, cell, n_cells_tot)

    ux, uy, uz = sp_state.ux, sp_state.uy, sp_state.uz
    if grid_type == "spherical":
        u_mag = jnp.sqrt(ux * ux + uy * uy + uz * uz)
        safe = jnp.maximum(u_mag, 1e-300)
        u_theta = jnp.arctan2(uy, ux) + math.pi
        u_phi = jnp.arccos(jnp.clip(uz / safe, -1.0, 1.0))
        dtheta = 2.0 * math.pi / n_theta
        dphi = math.pi / n_phi
        ii = (u_theta / dtheta).astype(jnp.int32)
        jj = (u_phi / dphi).astype(jnp.int32)
        kk = (u_mag / delta_ur).astype(jnp.int32)
        vbin = ii + jj * n_theta + kk * n_theta * n_phi
    else:
        dux, duy, duz = delta_u
        ux_min, uy_min, uz_min = (jnp.min(a) for a in (ux, uy, uz))
        n1 = jnp.maximum(
            jnp.ceil((jnp.max(ux) - ux_min) / dux).astype(jnp.int32), 1
        )
        n2 = jnp.maximum(
            jnp.ceil((jnp.max(uy) - uy_min) / duy).astype(jnp.int32), 1
        )
        ii = ((ux - ux_min) / dux).astype(jnp.int32)
        jj = ((uy - uy_min) / duy).astype(jnp.int32)
        kk = ((uz - uz_min) / duz).astype(jnp.int32)
        vbin = ii + jj * n1 + kk * n1 * n2

    order = jnp.lexsort((vbin, cell))
    cell_s = cell[order]
    vbin_s = vbin[order]
    alive_s = sp_state.alive[order]
    idx_s = jnp.arange(cap)
    new_run = jnp.concatenate([
        jnp.ones(1, bool),
        (cell_s[1:] != cell_s[:-1]) | (vbin_s[1:] != vbin_s[:-1]),
    ])
    run_id = jnp.cumsum(new_run) - 1
    run_start = jax.lax.cummax(jnp.where(new_run, idx_s, 0))
    rank = idx_s - run_start

    w_s = jnp.where(alive_s, sp_state.w[order], 0.0)
    u_s = [a[order] for a in (ux, uy, uz)]
    pos_s = [p[order] for p in pos]
    gam = jnp.sqrt(1.0 + (u_s[0] ** 2 + u_s[1] ** 2 + u_s[2] ** 2) / c2)
    ke = mass * c2 * (gam - 1.0)

    def rsum(vals):
        return jnp.zeros(cap, vals.dtype).at[run_id].add(vals)

    tot_w = rsum(w_s)
    tot_n = rsum(alive_s.astype(w_s.dtype))
    tot_e = rsum(w_s * ke)
    mean_u = [rsum(w_s * u) / jnp.maximum(tot_w, 1e-300) for u in u_s]
    mean_x = [rsum(w_s * p) / jnp.maximum(tot_w, 1e-300) for p in pos_s]

    # per-cell particle counts for the min_ppc gate
    ppc = jnp.zeros(n_cells_tot + 1, w_s.dtype).at[cell].add(
        sp_state.alive.astype(w_s.dtype)
    )
    run_cell = jnp.full(cap, n_cells_tot, jnp.int32).at[run_id].set(cell_s)
    merge = (
        (tot_n > 2.0)
        & (tot_w > 1e-300)
        & (run_cell < n_cells_tot)
        & (ppc[run_cell] >= min_ppc)
    )

    key, sub = jax.random.split(rng_key)
    phi_r = jax.random.uniform(sub, (cap,)) * math.pi  # per run (indexed)

    # Vranic two-particle solve on the cluster means
    # (VelocityCoincidenceThinning.cpp:230-295)
    mux, muy, muz = mean_u
    u_perp2 = mux * mux + muy * muy
    u_perp = jnp.sqrt(u_perp2)
    u_mag2 = u_perp2 + muz * muz
    u_mag_c = jnp.sqrt(u_mag2)
    e_per_w = tot_e / jnp.maximum(tot_w, 1e-300)
    v_mag2 = e_per_w * (e_per_w + 2.0 * mass * c2) / (mass * mass * c2)
    v_perp = jnp.sqrt(jnp.maximum(v_mag2 - u_mag2, 0.0))
    vx = v_perp * jnp.cos(phi_r)
    vy = v_perp * jnp.sin(phi_r)
    cos_t = jnp.where(u_mag_c > 0, muz / jnp.maximum(u_mag_c, 1e-300), 0.0)
    sin_t = jnp.where(u_mag_c > 0, u_perp / jnp.maximum(u_mag_c, 1e-300), 0.0)
    cos_p = jnp.where(u_perp > 0, mux / jnp.maximum(u_perp, 1e-300), 0.0)
    sin_p = jnp.where(u_perp > 0, muy / jnp.maximum(u_perp, 1e-300), 0.0)
    ux_new = vx * cos_t * cos_p - vy * sin_p + u_mag_c * sin_t * cos_p
    uy_new = vx * cos_t * sin_p + vy * cos_p + u_mag_c * sin_t * sin_p
    uz_new = -vx * sin_t + u_mag_c * cos_t

    m_i = merge[run_id] & alive_s
    is_a = m_i & (rank == 0)
    is_b = m_i & (rank == 1)
    killed = m_i & (rank >= 2)

    def pick(a_val, b_val, cur):
        out = jnp.where(is_a, a_val[run_id], cur)
        return jnp.where(is_b, b_val[run_id], out)

    w_out = pick(tot_w / 2.0, tot_w / 2.0, sp_state.w[order])
    ux_out = pick(ux_new, 2.0 * mux - ux_new, u_s[0])
    uy_out = pick(uy_new, 2.0 * muy - uy_new, u_s[1])
    uz_out = pick(uz_new, 2.0 * muz - uz_new, u_s[2])
    pos_out = [pick(mx, mx, p) for mx, p in zip(mean_x, pos_s)]
    alive_out = alive_s & ~killed

    inv = jnp.zeros(cap, jnp.int32).at[order].set(idx_s.astype(jnp.int32))
    new_state = sp_state.replace(
        w=w_out[inv],
        ux=ux_out[inv], uy=uy_out[inv], uz=uz_out[inv],
        alive=alive_out[inv],
    ).with_positions(ndim, [p[inv] for p in pos_out])
    return new_state, key
