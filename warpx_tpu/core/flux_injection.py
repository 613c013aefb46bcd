"""NFluxPerCell particle injection from a plane.

Reimplements the reference's flux injection (PhysicalParticleContainer::
AddPlasmaFlux:1570-1790): every step, num_particles_per_cell macroparticles
are emitted per surface cell with weight flux*area_cell/ppc*dt, placed
uniformly within the surface cell, given a "gaussianflux" momentum (normal
component ~ u*Gaussian(u-u_m), drawn with the reference's two rejection
schemes, SampleGaussianFluxDistribution.H:32-80), and flown by a random
fraction of dt (:1759-1762).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import constants
from ..utils.expression import compile_expression

__all__ = ["make_flux_injector", "sample_gaussian_flux", "flux_capacity"]

_ROUNDS = 24  # vectorized rejection rounds (acceptance per round is high)


def sample_gaussian_flux(key, n, u_m, u_th, dtype):
    """Vectorized generateGaussianFluxDist (u >= 0, p(u) ~ u G(u-u_m))."""
    if u_th == 0.0:
        return jnp.full(n, u_m, dtype)
    abs_u_m = abs(u_m)
    keys = jax.random.split(key, 2 * _ROUNDS)
    u = jnp.full(n, abs_u_m + u_th, dtype)  # fallback value
    done = jnp.zeros(n, bool)
    if abs_u_m < 0.6 * u_th:
        umsign = math.copysign(1.0, u_m) if u_m != 0.0 else 1.0
        approx_u_th = u_th / math.sqrt(1.0 - abs_u_m / u_th)
        pref = (abs_u_m / u_th) / (2.0 * u_th * u_th)
        for r in range(_ROUNDS):
            x1 = jax.random.uniform(keys[2 * r], (n,), dtype)
            cand = approx_u_th * jnp.sqrt(
                2.0 * jnp.log(1.0 / (1.0 - x1))
            )
            x2 = jax.random.uniform(keys[2 * r + 1], (n,), dtype)
            acc = x2 < jnp.exp(-pref * (cand - umsign * u_th) ** 2)
            take = acc & ~done
            u = jnp.where(take, cand, u)
            done = done | acc
    else:
        approx_u_m = abs_u_m + u_th * u_th / abs_u_m
        inv_um = 1.0 / abs_u_m
        for r in range(_ROUNDS):
            cand = approx_u_m + u_th * jax.random.normal(
                keys[2 * r], (n,), dtype
            )
            x2 = jax.random.uniform(keys[2 * r + 1], (n,), dtype)
            acc = (cand > 0) & (
                x2 < cand * inv_um * jnp.exp(1.0 - cand * inv_um)
            )
            take = acc & ~done
            u = jnp.where(take, cand, u)
            done = done | acc
    return u


def _per_step_count(sp_cfg, geom):
    axes = geom.axis_names
    d_n = axes.index(sp_cfg.flux_normal_axis)
    n_trans = 1
    for d in range(geom.ndim):
        if d != d_n:
            n_trans *= geom.n_cell[d]
    return sp_cfg.num_particles_per_cell * n_trans, d_n


def flux_capacity(sp_cfg, geom, max_step: int) -> int:
    n, _ = _per_step_count(sp_cfg, geom)
    return n * max(max_step, 1)


def make_flux_injector(sp_cfg, geom, dt: float, dtype):
    """Build a jitted-compatible fn(sp_state, t, key) -> (sp_state, key)."""
    ndim = geom.ndim
    axes = geom.axis_names
    npart, d_n = _per_step_count(sp_cfg, geom)
    ppc = sp_cfg.num_particles_per_cell
    trans_dims = [d for d in range(ndim) if d != d_n]
    area = 1.0
    for d in trans_dims:
        area *= geom.dx[d]
    if ndim == 1:
        area = 1.0
    w_fac = area / ppc * dt
    direction = sp_cfg.flux_direction
    # normal-axis u params (xyz indexed; deck momenta in units of c)
    xyz_i = {"x": 0, "y": 1, "z": 2}[sp_cfg.flux_normal_axis]
    u_means = (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)
    u_ths = (sp_cfg.ux_th, sp_cfg.uy_th, sp_cfg.uz_th)
    flux_fn = None
    if sp_cfg.flux_expr:
        flux_fn = compile_expression(
            sp_cfg.flux_expr, ("x", "y", "z", "t"),
            dict(sp_cfg.user_constants),
        )

    def inject(sp, t, key):
        keys = jax.random.split(key, 8 + 3)
        # in-plane cell-structured positions: ppc per transverse cell
        pos = [None] * ndim
        # transverse cell index grid repeated ppc times
        import numpy as np

        cells = [np.arange(geom.n_cell[d]) for d in trans_dims]
        mesh = np.meshgrid(*cells, indexing="ij") if cells else []
        flat = [m.reshape(-1) for m in mesh]
        for i, d in enumerate(trans_dims):
            base = jnp.asarray(
                np.repeat(flat[i], ppc).astype(float) * geom.dx[d]
                + geom.prob_lo[d],
                dtype,
            )
            r = jax.random.uniform(keys[i], (npart,), dtype)
            pos[d] = base + r * geom.dx[d]
        pos[d_n] = jnp.full(npart, sp_cfg.surface_flux_pos, dtype)

        # momenta (units of c -> m*gamma*v via *c)
        u3 = [None, None, None]
        un = sample_gaussian_flux(
            keys[4], npart, u_means[xyz_i], u_ths[xyz_i], dtype
        )
        un = un * direction
        ki = 5
        for a in range(3):
            if a == xyz_i:
                u3[a] = un * constants.c
            else:
                u3[a] = (
                    u_means[a]
                    + u_ths[a] * jax.random.normal(keys[ki], (npart,), dtype)
                ) * constants.c
                ki += 1

        # weight from the (possibly space-time dependent) flux
        xyz = [jnp.zeros(npart, dtype)] * 3
        active_xyz = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        for d in range(ndim):
            xyz[active_xyz[d]] = pos[d]
        if flux_fn is not None:
            flux = jnp.asarray(flux_fn(*xyz, t), dtype)
        else:
            flux = jnp.full(npart, sp_cfg.flux, dtype)
        w_new = flux * w_fac
        ok = w_new > 0
        if sp_cfg.flux_tmin >= 0:
            ok = ok & (t >= sp_cfg.flux_tmin)
        if sp_cfg.flux_tmax >= 0:
            ok = ok & (t < sp_cfg.flux_tmax)

        # random flight within the step (UpdatePosition by t_fract)
        gam = jnp.sqrt(
            1.0 + (u3[0] ** 2 + u3[1] ** 2 + u3[2] ** 2) / constants.c**2
        )
        t_fract = jax.random.uniform(keys[3], (npart,), dtype) * dt
        for d in range(ndim):
            pos[d] = pos[d] + u3[active_xyz[d]] / gam * t_fract

        cap = sp.capacity
        free_idx = jnp.nonzero(~sp.alive, size=npart, fill_value=cap)[0]
        placeable = ok & (free_idx < cap)
        tgt = jnp.where(placeable, free_idx, cap)

        def put(arr, vals):
            return arr.at[tgt].set(jnp.asarray(vals, arr.dtype), mode="drop")

        sp = sp.replace(
            w=put(sp.w, w_new),
            ux=put(sp.ux, u3[0]),
            uy=put(sp.uy, u3[1]),
            uz=put(sp.uz, u3[2]),
            alive=sp.alive.at[tgt].set(True, mode="drop"),
        )
        new_pos = list(sp.positions(ndim))
        for d in range(ndim):
            new_pos[d] = put(new_pos[d], pos[d])
        return sp.with_positions(ndim, new_pos)

    return inject
