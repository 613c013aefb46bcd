"""Theta-implicit and semi-implicit electromagnetic time solvers.

Reimplements the reference's implicit evolve schemes
(Source/FieldSolver/ImplicitSolvers/ThetaImplicitEM.{H,cpp},
SemiImplicitEM.cpp, WarpXImplicitOps.cpp) with the Picard fixed-point
nonlinear solver (Source/NonlinearSolvers/PicardSolver.H):

  theta-implicit (energy conserving at theta = 0.5):
    Eg^{n+1} = Eg^n + c^2 dt ( curl Bg^{n+theta} - mu0 Jg^{n+1/2} )
    Bg^{n+1} = Bg^n - dt curl Eg^{n+theta}
    xp^{n+1} = xp^n + dt up^{n+1/2} * 2/(gamma^n + gamma^{n+1})
    up^{n+1} = up^n + dt q/m (Ep^{n+theta} + v^{n+1/2} x Bp^{n+theta})

  semi-implicit: B advanced explicitly by the full dt first, then the same
  nonlinear solve for E^{n+1/2} with coefficient dt/2 and fixed B.

The nonlinear unknown is E^{n+theta}; one Picard iteration evaluates
ComputeRHS (ThetaImplicitEM.cpp:124-140): update B^{n+theta}, run ONE
per-particle iteration of ImplicitPushXP (PhysicalParticleContainer.cpp:2935;
the Picard branch fixes max_particle_iterations = 1, ImplicitSolver.H:127),
deposit the charge-conserving J^{n+1/2}
(doChargeConservingDepositionShapeNImplicit, CurrentDeposition.H:934), then
E <- E^n + c^2 theta dt (curl B - mu0 J).  The time-centered particle state
(ubar, x_half) persists across nonlinear iterations, exactly like the
reference's in-place particle attributes.

Periodic domains only (matches the reference's implicit test decks).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..constants import c as _c
from ..ops.deposit import deposit_current_esirkepov
from ..ops.implicit_gather import gather_eb_implicit
from ..ops.push import PUSHERS
from ..core.state import SimState
from . import yee

__all__ = ["make_implicit_step"]

_inv_c2 = 1.0 / (_c * _c)


def _gamma(ux, uy, uz):
    return jnp.sqrt(1.0 + (ux * ux + uy * uy + uz * uz) * _inv_c2)


def _cn_gaminv(ubar3, un3):
    """Crank-Nicolson inverse gamma 2/(gamma^n + gamma^{n+1}) with
    u^{n+1} = 2 ubar - u^n (UpdatePosition.H:66-72)."""
    up1 = tuple(2.0 * ub - un for ub, un in zip(ubar3, un3))
    return 2.0 / (_gamma(*un3) + _gamma(*up1))


def _norm2(e3):
    return jnp.sqrt(sum(jnp.sum(a * a) for a in e3))


def make_implicit_step(cfg, staggering, dtype):
    """Build the jitted implicit step function state -> state."""
    geom = cfg.geometry
    dt = cfg.dt
    theta = cfg.implicit_theta if cfg.evolve_scheme == "theta_implicit_em" \
        else 0.5
    semi = cfg.evolve_scheme == "semi_implicit_em"
    adt = (0.5 * dt) if semi else (theta * dt)
    maxits = cfg.picard_max_iterations
    rtol = cfg.picard_rtol
    atol = cfg.picard_atol
    n_part_iters = cfg.implicit_max_particle_iterations
    algo = "nodal" if cfg.grid_type == "collocated" else cfg.em_solver
    order = cfg.particle_shape
    axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]

    sp_cfgs = [s for s in cfg.species if not s.do_not_push or True]

    def fields_with(fields, e3=None, b3=None, j3=None):
        kw = {}
        if e3 is not None:
            kw.update(Ex=e3[0], Ey=e3[1], Ez=e3[2])
        if b3 is not None:
            kw.update(Bx=b3[0], By=b3[1], Bz=b3[2])
        if j3 is not None:
            kw.update(jx=j3[0], jy=j3[1], jz=j3[2])
        return fields.replace(**kw)

    def particle_rhs(e3, b3, state, ubar, xhalf):
        """One ImplicitPushXP iteration + J deposit for every species.

        Returns (J3, new ubar dict, new xhalf dict)."""
        zero3 = tuple(
            jnp.zeros(geom.n_cell, dtype) for _ in range(3)
        )
        j3 = zero3
        farr = {
            "Ex": e3[0], "Ey": e3[1], "Ez": e3[2],
            "Bx": b3[0], "By": b3[1], "Bz": b3[2],
        }
        new_ubar, new_xhalf = {}, {}
        for sp_cfg in sp_cfgs:
            sp = state.species[sp_cfg.name]
            name = sp_cfg.name
            pos_n = sp.positions(geom.ndim)
            un3 = (sp.ux, sp.uy, sp.uz)
            ub = ubar[name]
            xh = xhalf[name]
            pusher = PUSHERS[sp_cfg.pusher]

            def one_iter(carry, _pos_n=pos_n, _un3=un3, _pusher=pusher,
                         _q=sp_cfg.charge, _m=sp_cfg.mass):
                ub_c, _xh = carry
                gi = _cn_gaminv(ub_c, _un3)
                vel_act = tuple(ub_c[a] * gi for a in axes)
                xh_c = tuple(
                    p + 0.5 * dt * v for p, v in zip(_pos_n, vel_act)
                )
                e6 = gather_eb_implicit(_pos_n, xh_c, farr, geom, order)
                e6 = (
                    e6[0] + cfg.e_ext_particle[0],
                    e6[1] + cfg.e_ext_particle[1],
                    e6[2] + cfg.e_ext_particle[2],
                    e6[3] + cfg.b_ext_particle[0],
                    e6[4] + cfg.b_ext_particle[1],
                    e6[5] + cfg.b_ext_particle[2],
                )
                uf = _pusher(*_un3, *e6, _q, _m, dt)
                return (
                    tuple(0.5 * (a + b) for a, b in zip(uf, _un3)), xh_c
                )

            if n_part_iters == 1:
                ub, xh = one_iter((ub, xh))
            else:
                # inner per-particle Picard (ImplicitPushXP iteration loop,
                # PhysicalParticleContainer.cpp:2935) under fori_loop
                ub, xh = jax.lax.fori_loop(
                    0, n_part_iters, lambda _i, c: one_iter(c), (ub, xh)
                )
            new_ubar[name] = ub
            new_xhalf[name] = xh
            if not sp_cfg.do_not_deposit:
                w_eff = jnp.where(sp.alive, sp.w, 0.0)
                pos_new = tuple(
                    2.0 * h - p for h, p in zip(xh, pos_n)
                )
                gi = _cn_gaminv(ub, un3)
                jx, jy, jz = deposit_current_esirkepov(
                    list(pos_new), ub[0], ub[1], ub[2], w_eff,
                    sp_cfg.charge, geom, dt, order,
                    positions_old=list(pos_n), gaminv_override=gi,
                )
                j3 = (j3[0] + jx, j3[1] + jy, j3[2] + jz)
        return j3, new_ubar, new_xhalf

    def compute_rhs(e3, state, b_old3, ubar, xhalf):
        """RHS = c^2*adt*(curl B^{n+theta} - mu0 J^{n+1/2}); also returns
        the updated particle state (ThetaImplicitEM::ComputeRHS)."""
        if semi:
            b3 = b_old3  # B fixed at n+1/2 during the solve
        else:
            bf = yee.evolve_b(
                fields_with(state.fields, e3=e3, b3=b_old3), geom, adt, algo
            )
            b3 = (bf.Bx, bf.By, bf.Bz)
        j3, ubar, xhalf = particle_rhs(e3, b3, state, ubar, xhalf)
        ef = yee.evolve_e(
            fields_with(
                state.fields,
                e3=tuple(jnp.zeros_like(a) for a in e3),
                b3=b3, j3=j3,
            ),
            geom, adt, algo,
        )
        return (ef.Ex, ef.Ey, ef.Ez), b3, j3, ubar, xhalf

    def step(state: SimState) -> SimState:
        fields = state.fields
        e_old = (fields.Ex, fields.Ey, fields.Ez)
        if semi:
            # advance B from n-1/2 to n+1/2 with E^n (SemiImplicitEM.cpp:73)
            bf = yee.evolve_b(fields, geom, dt, algo)
            b_old3 = (bf.Bx, bf.By, bf.Bz)
        else:
            b_old3 = (fields.Bx, fields.By, fields.Bz)
        ubar0 = {
            s.name: (
                state.species[s.name].ux,
                state.species[s.name].uy,
                state.species[s.name].uz,
            )
            for s in sp_cfgs
        }
        xhalf0 = {
            s.name: state.species[s.name].positions(geom.ndim)
            for s in sp_cfgs
        }

        if cfg.implicit_nonlinear == "newton":
            # Jacobian-free Newton-Krylov (NewtonSolver.H): solve
            # F(E) = E - E^n - RHS(E) = 0 with GMRES on the EXACT
            # Jacobian-vector product via jax.jvp (the reference
            # approximates J*v by finite differences,
            # JacobianFunctionMF.H); particles re-solve their inner
            # Picard from u^n at every residual evaluation so F is a
            # pure function of E.
            def F(e3):
                rhs3, _, _, _, _ = compute_rhs(
                    e3, state, b_old3, ubar0, xhalf0
                )
                return tuple(
                    a - b - r for a, b, r in zip(e3, e_old, rhs3)
                )

            f0v = F(e_old)
            f0n = _norm2(f0v)
            f0s = jnp.where(f0n > 0, f0n, 1.0)

            def n_cond(carry):
                it, _e3, fv, _ = carry
                fn = _norm2(fv)
                return (
                    (it < cfg.newton_max_iterations)
                    & (fn >= cfg.newton_atol)
                    & (fn / f0s >= cfg.newton_rtol)
                )

            def n_body(carry):
                it, e3, fv, f0 = carry

                def mv(v3):
                    return jax.jvp(F, (e3,), (v3,))[1]

                dx, _ = jax.scipy.sparse.linalg.gmres(
                    mv, tuple(-f for f in fv),
                    tol=cfg.gmres_rtol, atol=cfg.gmres_atol,
                    restart=cfg.gmres_restart,
                    maxiter=max(cfg.gmres_max_iterations
                                // cfg.gmres_restart, 1),
                    solve_method="batched",
                )
                e_new = tuple(a + d for a, d in zip(e3, dx))
                return (it + 1, e_new, F(e_new), f0)

            _, e_theta, _, _ = jax.lax.while_loop(
                n_cond, n_body, (jnp.zeros((), jnp.int32), e_old, f0v, f0s)
            )
            # final consistent particle state / J at the solution
            _, b_theta, j3, ubar, xhalf = compute_rhs(
                e_theta, state, b_old3, ubar0, xhalf0
            )
            return _finish(state, e_old, b_old3, e_theta, b_theta, j3,
                           ubar, xhalf)

        # Picard fixed-point loop: E = E_old + RHS(E)  (PicardSolver.H:132)
        def cond(carry):
            it, e3, ub, xh, j3, b3, norm_abs, norm0 = carry
            norm_rel = norm_abs / norm0
            return (it < maxits) & (norm_abs >= atol) & (norm_rel >= rtol)

        def body(carry):
            it, e3, ub, xh, _, _, _, norm0 = carry
            rhs3, b3, j3, ub, xh = compute_rhs(e3, state, b_old3, ub, xh)
            e_new = tuple(eo + r for eo, r in zip(e_old, rhs3))
            norm_abs = _norm2(tuple(a - b for a, b in zip(e3, e_new)))
            norm0 = jnp.where(
                it == 0, jnp.where(norm_abs > 0, norm_abs, 1.0), norm0
            )
            return (it + 1, e_new, ub, xh, j3, b3, norm_abs, norm0)

        zero3 = tuple(jnp.zeros(geom.n_cell, dtype) for _ in range(3))
        carry0 = (
            jnp.zeros((), jnp.int32), e_old, ubar0, xhalf0, zero3, b_old3,
            jnp.asarray(jnp.inf, dtype), jnp.asarray(1.0, dtype),
        )
        it, e_theta, ubar, xhalf, j3, b_theta, _, _ = jax.lax.while_loop(
            cond, body, carry0
        )
        return _finish(state, e_old, b_old3, e_theta, b_theta, j3, ubar,
                       xhalf)

    def _finish(state, e_old, b_old3, e_theta, b_theta, j3, ubar, xhalf):
        fields = state.fields
        if not semi:
            # UpdateWarpXFields with the final E (ThetaImplicitEM.cpp:110):
            # B^{n+theta} = B^n - theta*dt*curl(E_final)
            bf = yee.evolve_b(
                fields_with(state.fields, e3=e_theta, b3=b_old3),
                geom, adt, algo,
            )
            b_theta = (bf.Bx, bf.By, bf.Bz)

        # finish particles: x^{n+1} = 2*x_half - x^n ; u^{n+1} = 2*ubar - u^n
        new_species = dict(state.species)
        for sp_cfg in sp_cfgs:
            sp = state.species[sp_cfg.name]
            nm = sp_cfg.name
            pos_n = sp.positions(geom.ndim)
            pos1 = []
            for d, (h, p) in enumerate(zip(xhalf[nm], pos_n)):
                x1 = 2.0 * h - p
                lo, hi = geom.prob_lo[d], geom.prob_hi[d]
                pos1.append(lo + jnp.mod(x1 - lo, hi - lo))
            sp = sp.replace(
                ux=2.0 * ubar[nm][0] - sp.ux,
                uy=2.0 * ubar[nm][1] - sp.uy,
                uz=2.0 * ubar[nm][2] - sp.uz,
            )
            new_species[nm] = sp.with_positions(geom.ndim, pos1)

        # finish fields
        if semi:
            e1 = tuple(2.0 * et - eo for et, eo in zip(e_theta, e_old))
            b1 = b_old3  # already at n+1/2 (leapfrog B for semi scheme)
        else:
            c0 = 1.0 / theta
            c1 = 1.0 - c0
            e1 = tuple(c0 * et + c1 * eo for et, eo in zip(e_theta, e_old))
            b1 = tuple(
                c0 * bt + c1 * bo for bt, bo in zip(b_theta, b_old3)
            )
        fields = fields_with(fields, e3=e1, b3=b1, j3=j3)
        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
        )

    return jax.jit(step)
