"""Hybrid-PIC (kinetic ions + inertialess fluid electrons) Ohm's-law solver.

TPU-native re-design of the reference's quasi-neutral hybrid model
(Source/FieldSolver/FiniteDifferenceSolver/HybridPICModel/HybridPICModel.cpp,
HybridPICSolveE.cpp:700-1000, WarpXPushFieldsHybridPIC.cpp):

  E = [ (J - J_i) x B  -  grad(P_e) ] / rho  +  eta J  -  eta_h lap(J)

with J = curl(B)/mu0 - J_ext (Ampere, no displacement current),
P_e = n0 kTe (n/n0)^gamma (adiabatic electron EOS), rho floored at
q_e n_floor.  Following the reference exactly: the grad(P_e) term enters
only the final end-of-step E solve, while the resistive terms enter only
the E used inside the Faraday substeps (HybridPICSolveE.cpp:890,898).

The B field advances through `substeps` x RK4 stages per half step with the
half-time-centered (rho, J_i) pairs (WarpXPushFieldsHybridPIC.cpp:102-143);
each stage is a full Ohm solve + Faraday curl — everything jnp.roll-based
on the periodic torus, fusing into a handful of XLA kernels.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..constants import c as _c, mu0 as _mu0, q_e as _q_e
from .yee import _down, _up, evolve_b

__all__ = [
    "curl_b_over_mu0", "electron_pressure", "ohm_solve_e",
    "hybrid_evolve_fields", "hybrid_initial_e",
]


def curl_b_over_mu0(fields, geom):
    """J_amp = curl(B)/mu0 at the Yee E sites (CalculatePlasmaCurrent,
    HybridPICSolveE.cpp CalculateCurrentAmpere)."""
    ndim = geom.ndim
    Bx, By, Bz = fields.Bx, fields.By, fields.Bz
    inv_mu0 = 1.0 / _mu0
    if ndim == 3:
        idx, idy, idz = (1.0 / d for d in geom.dx)
        jx = (_down(Bz, 1, idy) - _down(By, 2, idz)) * inv_mu0
        jy = (_down(Bx, 2, idz) - _down(Bz, 0, idx)) * inv_mu0
        jz = (_down(By, 0, idx) - _down(Bx, 1, idy)) * inv_mu0
    elif ndim == 2:
        idx, idz = (1.0 / d for d in geom.dx)
        jx = -_down(By, 1, idz) * inv_mu0
        jy = (_down(Bx, 1, idz) - _down(Bz, 0, idx)) * inv_mu0
        jz = _down(By, 0, idx) * inv_mu0
    else:
        idz = 1.0 / geom.dx[0]
        jx = -_down(By, 0, idz) * inv_mu0
        jy = _down(Bx, 0, idz) * inv_mu0
        jz = jnp.zeros_like(fields.Ez)
    return jx, jy, jz


def electron_pressure(rho, cfg):
    """P_e = n0 kTe ((rho/q_e)/n0)^gamma, J/m^3 (HybridPICModel.H:214;
    elec_temp converted eV -> J at read, HybridPICModel.cpp:50)."""
    n0 = cfg.hybrid_n0_ref
    T0 = cfg.hybrid_elec_temp * _q_e
    n = jnp.maximum(rho, 0.0) / _q_e
    return n0 * T0 * (n / n0) ** cfg.hybrid_gamma


def _to_nodal(arr, flags, ndim):
    """Average a staggered array to the nodal grid (periodic torus).
    flags: 1 = already nodal along the dim, 0 = centered (average i-1,i)."""
    out = arr
    for d in range(ndim):
        if flags[d] == 0:
            out = 0.5 * (out + jnp.roll(out, 1, axis=d))
    return out


def _nodal_to(arr, flags, ndim):
    """Interpolate a nodal array to a staggered site (average i, i+1 along
    centered dims)."""
    out = arr
    for d in range(ndim):
        if flags[d] == 0:
            out = 0.5 * (out + jnp.roll(out, -1, axis=d))
    return out


def _laplacian(arr, geom):
    out = jnp.zeros_like(arr)
    for d in range(geom.ndim):
        inv2 = 1.0 / (geom.dx[d] * geom.dx[d])
        out = out + (
            jnp.roll(arr, -1, axis=d) - 2.0 * arr + jnp.roll(arr, 1, axis=d)
        ) * inv2
    return out


def ohm_solve_e(
    fields,
    Ji3: Tuple,
    rho,
    geom,
    staggering,
    cfg,
    eta_fn=None,
    Pe=None,
    solve_for_Faraday: bool = True,
):
    """Ohm's-law E at the Yee E sites (HybridPICSolveE.cpp:700-1000).

    Ji3: ion current at the Yee E sites; rho: NODAL charge density.
    Returns a new FieldState with Ex/Ey/Ez replaced (jx/jy/jz untouched:
    the reference keeps the deposited ion current in current_fp and the
    Ampere current in a separate register).
    """
    ndim = geom.ndim
    jamp = curl_b_over_mu0(fields, geom)
    jext = _j_external(cfg, geom, staggering)
    jp = tuple(
        (a - e if e is not None else a) for a, e in zip(jamp, jext)
    )

    e_names = ("Ex", "Ey", "Ez")
    b_names = ("Bx", "By", "Bz")
    # nodal interpolants of J, Ji, B -> enE = (J - Ji) x B (nodal)
    jn = [
        _to_nodal(jp[i], staggering[e_names[i]], ndim) for i in range(3)
    ]
    jin = [
        _to_nodal(Ji3[i], staggering[e_names[i]], ndim) for i in range(3)
    ]
    bn = [
        _to_nodal(getattr(fields, b_names[i]), staggering[b_names[i]], ndim)
        for i in range(3)
    ]
    dj = [jn[i] - jin[i] for i in range(3)]
    enE = (
        dj[1] * bn[2] - dj[2] * bn[1],
        dj[2] * bn[0] - dj[0] * bn[2],
        dj[0] * bn[1] - dj[1] * bn[0],
    )

    rho_floor = _q_e * cfg.hybrid_n_floor
    axis_of = {1: {2: 0}, 2: {0: 0, 2: 1}, 3: {0: 0, 1: 1, 2: 2}}[ndim]
    out = {}
    if eta_fn is not None and solve_for_Faraday and \
            cfg.hybrid_resistivity_has_J:
        # |J| from the nodal-interpolated plasma current components
        jtot_n = jnp.sqrt(sum(j * j for j in jn))
    for i in range(3):
        flags = staggering[e_names[i]]
        rho_at = jnp.maximum(_nodal_to(rho, flags, ndim), rho_floor)
        enE_at = _nodal_to(enE[i], flags, ndim)
        e_val = enE_at
        if not solve_for_Faraday and Pe is not None:
            d = axis_of.get(i)
            if d is not None:
                # UpwardD of the nodal Pe onto the staggered E_i site
                grad_pe = _up(Pe, d, 1.0 / geom.dx[d])
            else:
                grad_pe = 0.0
            e_val = e_val - grad_pe
        e_val = e_val / rho_at
        if solve_for_Faraday and eta_fn is not None:
            if cfg.hybrid_resistivity_has_J:
                jt_at = _nodal_to(jtot_n, flags, ndim)
            else:
                jt_at = jnp.zeros_like(e_val)
            e_val = e_val + eta_fn(rho_at, jt_at) * jp[i]
            if cfg.hybrid_eta_h > 0.0:
                e_val = e_val - cfg.hybrid_eta_h * _laplacian(jp[i], geom)
        out[e_names[i]] = e_val
    return fields.replace(**out)


def _j_external(cfg, geom, staggering):
    """External current at the Yee E sites (GetCurrentExternal); None per
    component when the expression is absent.  Time-independent expressions
    only are evaluated here (trace-time constants)."""
    if not any(cfg.hybrid_j_ext):
        return (None, None, None)
    from ..utils.expression import compile_expression

    ndim = geom.ndim
    out = []
    names = ("Ex", "Ey", "Ez")
    for i, expr in enumerate(cfg.hybrid_j_ext):
        if not expr:
            out.append(None)
            continue
        fn = compile_expression(
            expr, ("x", "y", "z", "t"), dict(cfg.user_constants or ())
        )
        flags = staggering[names[i]]
        coords3 = [jnp.zeros((1,) * ndim)] * 3
        axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        grids = []
        for d in range(ndim):
            n = geom.n_cell[d]
            offs = 0.0 if flags[d] else 0.5
            g = geom.prob_lo[d] + (jnp.arange(n) + offs) * geom.dx[d]
            shape = [1] * ndim
            shape[d] = n
            grids.append(g.reshape(shape))
        for a, g in zip(axes, grids):
            coords3[a] = g
        out.append(
            jnp.broadcast_to(
                fn(coords3[0], coords3[1], coords3[2], 0.0), geom.n_cell
            )
        )
    return tuple(out)


def _rk4_b(fields, Ji3, rho, geom, staggering, cfg, eta_fn, dt):
    """One RK4 advance of B by dt under dB/dt = -curl E(B)
    (BfieldEvolveRK, HybridPICModel.cpp:429-540 — the reference's staged
    K bookkeeping reduces to classic RK4)."""

    def dbdt(f):
        f_e = ohm_solve_e(
            f, Ji3, rho, geom, staggering, cfg, eta_fn=eta_fn,
            solve_for_Faraday=True,
        )
        # evolve_b applies B += dt*(-curl E); extract the increment
        f_b = evolve_b(f_e, geom, 1.0, algo="yee")
        return (
            f_b.Bx - f_e.Bx, f_b.By - f_e.By, f_b.Bz - f_e.Bz,
        )

    b0 = (fields.Bx, fields.By, fields.Bz)
    k1 = dbdt(fields)
    f2 = fields.replace(**{
        n: b + 0.5 * dt * k
        for n, b, k in zip(("Bx", "By", "Bz"), b0, k1)
    })
    k2 = dbdt(f2)
    f3 = fields.replace(**{
        n: b + 0.5 * dt * k
        for n, b, k in zip(("Bx", "By", "Bz"), b0, k2)
    })
    k3 = dbdt(f3)
    f4 = fields.replace(**{
        n: b + dt * k for n, b, k in zip(("Bx", "By", "Bz"), b0, k3)
    })
    k4 = dbdt(f4)
    new_b = {
        n: b + (dt / 6.0) * (a + 2 * bb + 2 * cc + d)
        for n, b, a, bb, cc, d in zip(
            ("Bx", "By", "Bz"), b0, k1, k2, k3, k4
        )
    }
    return fields.replace(**new_b)


def hybrid_evolve_fields(
    fields,
    rho_n,
    rho_np1,
    ji_old3,
    ji_new3,
    geom,
    staggering,
    cfg,
    eta_fn,
    dt,
):
    """Full hybrid field advance for one PIC step
    (WarpXPushFieldsHybridPIC.cpp:24-190).

    rho_n / rho_np1: nodal rho at t^n / t^{n+1}; ji_old3 / ji_new3: ion
    current at t^{n-1/2} / t^{n+1/2} (Yee E sites).  Returns the new
    FieldState with B at t^{n+1} and the Ohm's-law E at t^{n+1}.
    """
    import jax as _jax

    sub = max(cfg.hybrid_substeps, 1)
    # J_i^n = (J^{n-1/2} + J^{n+1/2})/2
    ji_n = tuple(0.5 * (a + b) for a, b in zip(ji_old3, ji_new3))
    h = 0.5 * dt / sub

    def _substeps(f, ji3, rho):
        """sub x RK4 under lax.fori_loop (compiles one stage, not sub*4)."""

        def body(_i, b3):
            ff = f.replace(Bx=b3[0], By=b3[1], Bz=b3[2])
            ff = _rk4_b(ff, ji3, rho, geom, staggering, cfg, eta_fn, h)
            return (ff.Bx, ff.By, ff.Bz)

        b3 = _jax.lax.fori_loop(0, sub, body, (f.Bx, f.By, f.Bz))
        return f.replace(Bx=b3[0], By=b3[1], Bz=b3[2])

    fields = _substeps(fields, ji_n, rho_n)
    rho_half = 0.5 * (rho_n + rho_np1)
    fields = _substeps(fields, ji_new3, rho_half)
    # J_i^{n+1} = 2 J^{n+1/2} - J_i^n (extrapolation)
    ji_np1 = tuple(2.0 * b - a for a, b in zip(ji_n, ji_new3))
    pe = electron_pressure(rho_np1, cfg)
    fields = ohm_solve_e(
        fields, ji_np1, rho_np1, geom, staggering, cfg, eta_fn=eta_fn,
        Pe=pe, solve_for_Faraday=False,
    )
    return fields


def hybrid_initial_e(fields, rho0, ji0, geom, staggering, cfg, eta_fn):
    """Initial Ohm's-law E from the t=0 deposition (InitData ->
    HybridPICSolveE with solve_for_Faraday=false)."""
    pe = electron_pressure(rho0, cfg)
    return ohm_solve_e(
        fields, ji0, rho0, geom, staggering, cfg, eta_fn=eta_fn, Pe=pe,
        solve_for_Faraday=False,
    )
