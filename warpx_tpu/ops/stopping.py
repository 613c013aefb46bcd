"""Background stopping: drag on a warm electron or ion background.

Reference: Source/Particles/Collision/BackgroundStopping/BackgroundStopping
.cpp — electrons: u *= exp(-alpha dt) with the NRL slowing-down rate in the
low-velocity limit; ions: kinetic-energy ODE dW/dt = -alpha/sqrt(W)
integrated exactly over the step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import ep0 as _ep0, kb as _kb, q_e as _q_e

__all__ = ["apply_background_stopping", "stopping_collision_update"]


def _loglambda(n, T_J, mass, Zb):
    vth = jnp.sqrt(3.0 * T_J / mass)
    wp = jnp.sqrt(n * _q_e * _q_e / (_ep0 * mass))
    lambdadb = vth / wp
    return jnp.log((12.0 * np.pi / Zb) * n * lambdadb**3)


def apply_background_stopping(
    sp, ndim, t, *, q: float, m: float, kind: str, M_bg: float,
    Z_bg: float, n_fn, T_fn, dt, dtype,
):
    """One stopping step for one species; returns the updated state."""
    cap = sp.w.shape[0]
    pos = sp.positions(ndim)
    pos3 = [jnp.zeros(cap, dtype)] * 3
    axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    for a, arr in zip(axes, pos):
        pos3[a] = arr
    n_b = n_fn(pos3[0], pos3[1], pos3[2], t)
    T_b = T_fn(pos3[0], pos3[1], pos3[2], t) * _kb
    Zb = abs(q / _q_e)
    ll = _loglambda(n_b, T_b, M_bg, Zb)
    if kind == "electrons":
        # BackgroundStopping.cpp:141-147
        alpha = (
            jnp.sqrt(2.0) * n_b * (q * q) * (_q_e * _q_e)
            * jnp.sqrt(M_bg) * ll
            / (12.0 * np.pi**1.5 * _ep0**2 * m * T_b * jnp.sqrt(T_b))
        )
        scale = jnp.exp(-alpha * dt)
    else:  # ions (BackgroundStopping.cpp:190-199)
        qi2 = Z_bg * Z_bg * _q_e * _q_e
        alpha = (
            jnp.sqrt(2.0) * n_b * qi2 * (q * q) * jnp.sqrt(m) * ll
            / (8.0 * np.pi * _ep0**2 * M_bg)
        )
        W0 = 0.5 * m * (sp.ux**2 + sp.uy**2 + sp.uz**2)
        f1 = jnp.maximum(W0**1.5 - 1.5 * alpha * dt, 0.0)
        W1 = f1 ** (2.0 / 3.0)
        scale = jnp.where(W0 > 0.0, jnp.sqrt(W1 / jnp.where(
            W0 > 0.0, W0, 1.0)), 0.0)
    scale = jnp.where(sp.alive, scale, 1.0)
    return sp.replace(ux=sp.ux * scale, uy=sp.uy * scale,
                      uz=sp.uz * scale)


def stopping_collision_update(state, cfg, dt):
    """Apply all background_stopping collisions for this step."""
    from ..utils.expression import compile_expression

    cols = [c for c in cfg.collisions if c.kind == "background_stopping"]
    if not cols:
        return state
    ndim = cfg.geometry.ndim
    by_name = {s.name: s for s in cfg.species}
    species_mut = dict(state.species)
    dtype = state.fields.Ex.dtype
    uc = dict(cfg.user_constants or ())
    for col in cols:
        sp_cfg = by_name[col.species[0]]
        sp = species_mut[sp_cfg.name]
        n_fn = compile_expression(col.background_density,
                                 ("x", "y", "z", "t"), uc)
        T_fn = compile_expression(col.background_temperature,
                                  ("x", "y", "z", "t"), uc)
        M_bg = col.background_mass if col.background_mass > 0 else (
            9.1093837015e-31 if col.background_type == "electrons" else None
        )
        if M_bg is None:
            raise ValueError(
                f"{col.name}: background_mass required for ion stopping"
            )
        species_mut[sp_cfg.name] = apply_background_stopping(
            sp, ndim, state.time, q=sp_cfg.charge, m=sp_cfg.mass,
            kind=col.background_type, M_bg=M_bg,
            Z_bg=col.background_charge_state, n_fn=n_fn, T_fn=T_fn,
            dt=dt, dtype=dtype,
        )
    return state.replace(species=species_mut)
