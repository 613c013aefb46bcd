"""Plasma injection: per-cell particle placement, weights, momentum sampling.

Reimplements the AddPlasma path (reference: Source/Particles/
PhysicalParticleContainer.cpp:925-1334 with InjectorPosition/Density/Momentum,
Source/Initialization/InjectorPosition.H:67-107 regular layout,
Source/Particles/AddPlasmaUtilities.H:73 volume scale factor).

Runs host-side at initialization (NumPy), producing the fixed-capacity device
arrays; weights are density(x) * dV / ppc_total.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from .. import constants
from ..utils.expression import compile_expression
from .config import SpeciesConfig
from .grid import Geometry
from .state import ParticleState

__all__ = ["inject_species", "inject_gaussian_beam"]


def _regular_unit_positions(ppc: Tuple[int, ...], ndim: int) -> np.ndarray:
    """Unit-cell offsets for NUniformPerCell, ordered like the reference
    (InjectorPosition.H:100-107: i_part decomposes as x-major, then z, then y)."""
    ppc = tuple(ppc)[:ndim]  # decks may give 3 values in 2D; extras ignored
    if ndim == 3:
        nx, ny, nz = ppc
    elif ndim == 2:
        nx, nz = ppc
        ny = 1
    else:
        (nz,) = ppc
        nx = ny = 1
    n_tot = nx * ny * nz
    out = np.zeros((n_tot, 3))
    for i_part in range(n_tot):
        ix = i_part // (ny * nz)
        iz = (i_part - ix * (ny * nz)) // ny
        iy = (i_part - ix * (ny * nz)) - ny * iz
        out[i_part] = [(0.5 + ix) / nx, (0.5 + iy) / ny, (0.5 + iz) / nz]
    return out


def _bulk_momentum(sp: SpeciesConfig):
    """Bulk momentum (units of c) of the distribution, for the boosted-frame
    ballistic correction (PhysicalParticleContainer.cpp:137-147)."""
    if sp.momentum_distribution in ("constant", "gaussian"):
        return np.array([sp.ux, sp.uy, sp.uz], float)
    if sp.momentum_distribution in ("maxwell_boltzmann", "maxwell_juttner"):
        b = sp.beta_bulk * (-1.0 if sp.bulk_vel_dir.startswith("-") else 1.0)
        d = {"x": 0, "y": 1, "z": 2}.get(sp.bulk_vel_dir.strip("+-") or "x", 0)
        u = np.zeros(3)
        if abs(b) < 1.0 and b != 0.0:
            u[d] = b / np.sqrt(1.0 - b * b)
        return u
    return np.zeros(3)


def inject_species(
    sp: SpeciesConfig,
    geom: Geometry,
    dtype,
    rng: np.random.Generator,
    capacity: int | None = None,
    gamma_boost: float = 1.0,
    refine_spec=None,
) -> ParticleState:
    """``refine_spec`` = (i0, i1, rv, wdir): warpx.refine_plasma — cells
    whose transverse coarse index falls inside [i0, i1) of the refined box
    inject on the fine lattice (r-times more streams at 1/prod(r) weight;
    findRefinedInjectionBox, PhysicalParticleContainer.cpp:3260)."""
    ndim = geom.ndim
    if sp.injection_style == "singleparticle":
        # reference: SingleParticle injection (one macroparticle at the given
        # position/momentum; u in units of c)
        axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        cap = capacity or 1
        def one(v):
            out = np.zeros(cap, dtype=dtype)
            out[0] = v
            return out
        ps = ParticleState(
            w=one(sp.single_particle_weight),
            ux=one(sp.single_particle_u[0] * constants.c),
            uy=one(sp.single_particle_u[1] * constants.c),
            uz=one(sp.single_particle_u[2] * constants.c),
            alive=np.arange(cap) < 1,
            extra={},
        )
        return ps.with_positions(
            ndim, [one(sp.single_particle_pos[a]) for a in axes]
        )
    if sp.injection_style == "multipleparticles":
        # reference: MultipleParticles injection — explicit per-particle
        # position/momentum/weight lists (PhysicalParticleContainer.cpp
        # AddNParticles path for multiple_particles_* keys)
        axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        px, py, pz, mux, muy, muz, mw = [
            np.asarray(col, dtype=dtype) for col in sp.multiple_particles
        ]
        n = mw.shape[0]
        cap = capacity or n

        def fill(col):
            out = np.zeros(cap, dtype=dtype)
            out[:n] = col
            return out

        ps = ParticleState(
            w=fill(mw),
            ux=fill(mux * constants.c),
            uy=fill(muy * constants.c),
            uz=fill(muz * constants.c),
            alive=np.arange(cap) < n,
            extra={},
        )
        pos_cols = (px, py, pz)
        return ps.with_positions(ndim, [fill(pos_cols[a]) for a in axes])
    if sp.injection_style == "external_file":
        # openPMD from-file injection (AddPlasmaFromFile,
        # PhysicalParticleContainer.cpp:680-800): positions are
        # position + positionOffset (+ z_shift on z), u = momentum / mass
        # (proper gamma*v in m/s), weights straight from the file; only
        # particles inside the species bounds are kept
        from ..io.openpmd import read_openpmd_particles

        data = read_openpmd_particles(sp.injection_file)
        x = data["x"].astype(dtype)
        y = data["y"].astype(dtype)
        z = (data["z"] + sp.z_shift).astype(dtype)
        keep = np.ones(x.shape[0], bool)
        axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        pos_all = (x, y, z)
        if sp.bounds_lo:
            for d, a in enumerate(axes):
                keep &= (pos_all[a] >= sp.bounds_lo[d]) & (
                    pos_all[a] <= sp.bounds_hi[d]
                )
        n = x.shape[0]
        cap = capacity or n

        def fill(col, masked=True):
            out = np.zeros(cap, dtype=dtype)
            out[:n] = np.where(keep, col, 0.0) if masked else col
            return out

        inv_m = 1.0 / sp.mass
        alive = np.zeros(cap, bool)
        alive[:n] = keep
        ps = ParticleState(
            w=fill(data["w"].astype(dtype)),
            ux=fill((data["px"] * inv_m).astype(dtype), masked=False),
            uy=fill((data["py"] * inv_m).astype(dtype), masked=False),
            uz=fill((data["pz"] * inv_m).astype(dtype), masked=False),
            alive=alive,
            extra={},
        )
        return ps.with_positions(
            ndim, [fill(pos_all[a], masked=False) for a in axes]
        )
    if sp.injection_style not in ("nuniformpercell", "nrandompercell"):
        # empty container
        cap = capacity or 0
        zeros = np.zeros(cap, dtype=dtype)
        ps = ParticleState(
            w=zeros,
            ux=zeros.copy(),
            uy=zeros.copy(),
            uz=zeros.copy(),
            alive=np.zeros(cap, dtype=bool),
        )
        return ps.with_positions(ndim, [zeros.copy() for _ in range(ndim)])

    # --- per-cell offsets (unit box, full xyz triple)
    if sp.injection_style == "nuniformpercell":
        unit = _regular_unit_positions(sp.num_particles_per_cell_each_dim, ndim)
    else:
        n = sp.num_particles_per_cell
        unit = rng.random((n, 3))
    ppc_tot = unit.shape[0]

    # --- cell grid
    mesh_axes = [
        geom.prob_lo[d] + np.arange(geom.n_cell[d]) * geom.dx[d]
        for d in range(ndim)
    ]
    cell_lo = np.meshgrid(*mesh_axes, indexing="ij")
    cell_lo = np.stack([m.reshape(-1) for m in cell_lo], axis=-1)  # (ncells, ndim)

    # positions: (ncells, ppc, ndim) -> flatten
    if ndim == 3:
        unit_active = unit
    elif ndim == 2:
        unit_active = unit[:, [0, 2]]
    else:
        unit_active = unit[:, [2]]
    dx = np.array(geom.dx)
    pos = cell_lo[:, None, :] + unit_active[None, :, :] * dx[None, None, :]
    pos = pos.reshape(-1, ndim).astype(dtype)
    scale_vec = np.full(pos.shape[0], geom.cell_volume / ppc_tot, dtype)
    if refine_spec is not None:
        i0_r, i1_r, rv_r, wdir_r = refine_spec

        def _in_fp(p):
            m = np.ones(p.shape[0], bool)
            for d in range(ndim):
                if d == wdir_r:
                    continue
                ci = np.floor(
                    (p[:, d] - geom.prob_lo[d]) / geom.dx[d]
                ).astype(np.int64)
                m &= (ci >= i0_r[d]) & (ci < i1_r[d])
            return m

        R = int(np.prod(rv_r))
        dxf = dx / np.asarray(rv_r)
        subs = np.meshgrid(
            *[np.arange(rv_r[d]) * dxf[d] for d in range(ndim)],
            indexing="ij",
        )
        sub = np.stack([s.reshape(-1) for s in subs], axis=-1)
        pos_f = (
            cell_lo[:, None, None, :] + sub[None, :, None, :]
            + unit_active[None, None, :, :] * dxf[None, None, None, :]
        ).reshape(-1, ndim).astype(dtype)
        scale_vec = np.concatenate([
            np.where(_in_fp(pos), 0.0, scale_vec),
            np.where(
                _in_fp(pos_f), geom.cell_volume / (R * ppc_tot), 0.0
            ).astype(dtype),
        ])
        pos = np.concatenate([pos, pos_f], axis=0)

    # full xyz coordinates for profile evaluation (inactive axes = 0)
    xyz = np.zeros((pos.shape[0], 3), dtype=dtype)
    if ndim == 3:
        xyz[:] = pos
    elif ndim == 2:
        xyz[:, 0] = pos[:, 0]
        xyz[:, 2] = pos[:, 1]
    else:
        xyz[:, 2] = pos[:, 0]

    # boosted frame: profiles/bounds are given at t_lab=0 in LAB coords;
    # ballistic correction z -> z0_lab (PhysicalParticleContainer.cpp:
    # applyBallisticCorrection with t=0)
    if gamma_boost > 1.0:
        beta_boost = float(np.sqrt(1.0 - 1.0 / gamma_boost**2))
        ub = _bulk_momentum(sp)
        betaz_bulk = ub[2] / np.sqrt(1.0 + ub @ ub)
        xyz = xyz.copy()
        xyz[:, 2] = gamma_boost * xyz[:, 2] * (1.0 - beta_boost * betaz_bulk)

    # --- injection bounds (reference: PhysicalParticleContainer xmin..zmax;
    # compared in LAB coordinates when boosted, AddPlasma:1021)
    mask = np.ones(pos.shape[0], dtype=bool)
    if sp.bounds_lo:
        axes3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        for d in range(ndim):
            coord = xyz[:, axes3[d]]
            mask &= (coord >= sp.bounds_lo[d]) & (coord <= sp.bounds_hi[d])

    # --- density -> weight
    if sp.profile == "constant":
        dens = np.full(pos.shape[0], sp.density, dtype=dtype)
    elif sp.profile in ("parse", "parse_density_function"):
        fn = compile_expression(
            sp.density_expr, ["x", "y", "z"], dict(sp.user_constants)
        )
        dens = np.asarray(fn(xyz[:, 0], xyz[:, 1], xyz[:, 2]), dtype=dtype)
    else:
        raise NotImplementedError(f"density profile {sp.profile}")
    w = np.where(mask, dens * scale_vec, 0.0).astype(dtype)
    mask &= w > 0

    # --- momentum (units of gamma*beta; stored as u = c * value, m/s)
    n = pos.shape[0]
    if sp.momentum_distribution in ("at_rest", "none"):
        ux = np.zeros(n, dtype=dtype)
        uy = np.zeros(n, dtype=dtype)
        uz = np.zeros(n, dtype=dtype)
    elif sp.momentum_distribution == "constant":
        ux = np.full(n, sp.ux, dtype=dtype)
        uy = np.full(n, sp.uy, dtype=dtype)
        uz = np.full(n, sp.uz, dtype=dtype)
    elif sp.momentum_distribution == "gaussian":
        ux = rng.normal(sp.ux, sp.ux_th or 0.0, n).astype(dtype)
        uy = rng.normal(sp.uy, sp.uy_th or 0.0, n).astype(dtype)
        uz = rng.normal(sp.uz, sp.uz_th or 0.0, n).astype(dtype)
    elif sp.momentum_distribution in ("maxwell_boltzmann", "maxwell_juttner"):
        bdir = {"x": 0, "y": 1, "z": 2}.get(sp.bulk_vel_dir.strip("+-") or "x", 0)
        sampler = (
            _sample_boltzmann
            if sp.momentum_distribution == "maxwell_boltzmann"
            else _sample_juttner
        )
        sign = -1.0 if sp.bulk_vel_dir.startswith("-") else 1.0
        # parsed theta(x,y,z) / beta(x,y,z) profiles
        # (TemperatureProperties/VelocityProperties parser types)
        theta = sp.theta
        if sp.theta_expr:
            fn = compile_expression(
                sp.theta_expr, ["x", "y", "z"], dict(sp.user_constants)
            )
            theta = np.asarray(fn(xyz[:, 0], xyz[:, 1], xyz[:, 2]),
                               np.float64)
        beta_signed = sp.beta_bulk * sign
        if sp.beta_expr:
            fn = compile_expression(
                sp.beta_expr, ["x", "y", "z"], dict(sp.user_constants)
            )
            beta_signed = sign * np.asarray(
                fn(xyz[:, 0], xyz[:, 1], xyz[:, 2]), np.float64
            )
        ux, uy, uz = sampler(rng, n, theta, beta_signed, bdir, dtype)
    elif sp.momentum_distribution == "uniform":
        # cuboid in u-space (InjectorMomentumUniform)
        ux = rng.uniform(sp.u_min[0], sp.u_max[0], n).astype(dtype)
        uy = rng.uniform(sp.u_min[1], sp.u_max[1], n).astype(dtype)
        uz = rng.uniform(sp.u_min[2], sp.u_max[2], n).astype(dtype)
    elif sp.momentum_distribution == "gaussian_parse_momentum_function":
        cols = []
        for me, te in zip(sp.momentum_exprs, sp.momentum_th_exprs):
            fm = compile_expression(me, ["x", "y", "z"],
                                    dict(sp.user_constants))
            ft = compile_expression(te, ["x", "y", "z"],
                                    dict(sp.user_constants))
            mu = np.asarray(fm(xyz[:, 0], xyz[:, 1], xyz[:, 2]), np.float64)
            th = np.asarray(ft(xyz[:, 0], xyz[:, 1], xyz[:, 2]), np.float64)
            cols.append(
                (np.broadcast_to(mu, (n,))
                 + np.broadcast_to(th, (n,)) * rng.standard_normal(n)
                 ).astype(dtype)
            )
        ux, uy, uz = cols
    elif sp.momentum_distribution == "parse_momentum_function":
        fns = [
            compile_expression(e, ["x", "y", "z"], dict(sp.user_constants))
            for e in sp.momentum_exprs
        ]
        ux = np.asarray(fns[0](xyz[:, 0], xyz[:, 1], xyz[:, 2]), dtype=dtype)
        uy = np.asarray(fns[1](xyz[:, 0], xyz[:, 1], xyz[:, 2]), dtype=dtype)
        uz = np.asarray(fns[2](xyz[:, 0], xyz[:, 1], xyz[:, 2]), dtype=dtype)
    else:
        raise NotImplementedError(
            f"momentum distribution {sp.momentum_distribution}"
        )
    if gamma_boost > 1.0:
        # transform to the boosted frame (AddPlasma:1243-1246):
        # dens *= gamma*(1 - beta*betaz_lab); uz' = gamma*(uz - beta*gamma_lab)
        beta_boost = float(np.sqrt(1.0 - 1.0 / gamma_boost**2))
        gamma_lab = np.sqrt(1.0 + ux * ux + uy * uy + uz * uz)
        betaz_lab = uz / gamma_lab
        w = (w * gamma_boost * (1.0 - beta_boost * betaz_lab)).astype(dtype)
        uz = gamma_boost * (uz - beta_boost * gamma_lab)
    ux = (ux * constants.c).astype(dtype)
    uy = (uy * constants.c).astype(dtype)
    uz = (uz * constants.c).astype(dtype)

    # --- runtime attributes evaluated at injection (t=0)
    extra_vals = {}
    for (aname, expr, is_int) in sp.attributes:
        fn = compile_expression(
            expr, ["x", "y", "z", "ux", "uy", "uz", "t"], dict(sp.user_constants)
        )
        val = np.asarray(
            fn(xyz[:, 0], xyz[:, 1], xyz[:, 2], ux, uy, uz, 0.0)
        )
        extra_vals[aname] = (
            np.round(val).astype(np.int32) if is_int else val.astype(dtype)
        )

    # --- compact to alive-first layout, pad to capacity
    keep = np.nonzero(mask)[0]
    count = keep.size
    if capacity is None and sp.capacity_factor > 1.0:
        capacity = int(np.ceil(count * sp.capacity_factor))
    cap = capacity or count
    if cap < count:
        raise ValueError(f"capacity {cap} < injected count {count}")

    def _pad(a, fill=0.0):
        out = np.full(cap, fill, dtype=a.dtype)
        out[:count] = a[keep]
        return out

    alive = np.zeros(cap, dtype=bool)
    alive[:count] = True
    ps = ParticleState(
        w=_pad(w),
        ux=_pad(ux),
        uy=_pad(uy),
        uz=_pad(uz),
        alive=alive,
        extra={k: _pad(v) for k, v in extra_vals.items()},
    )
    # dead-slot positions parked at the domain center (harmless for mod-index)
    centers = [
        0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(ndim)
    ]
    return ps.with_positions(
        ndim,
        [_pad(pos[:, d].astype(dtype), fill=centers[d]) for d in range(ndim)],
    )


def inject_gaussian_beam(
    sp: SpeciesConfig, geom: Geometry, dtype, rng: np.random.Generator,
    gamma_boost: float = 1.0,
) -> ParticleState:
    """Gaussian beam injection (reference: PhysicalParticleContainer::
    AddGaussianBeam, PhysicalParticleContainer.cpp:503-680): npart particles
    normally distributed around (x_m,y_m,z_m) with per-axis rms, weight
    q_tot/(q*npart), gaussian momentum."""
    ndim = geom.ndim
    n = sp.npart
    x = rng.normal(sp.x_m, sp.x_rms, n)
    y = rng.normal(sp.y_m, sp.y_rms, n)
    z = rng.normal(sp.z_m, sp.z_rms, n)
    # inactive transverse coordinates are identically zero in the reference
    # (PhysicalParticleContainer.cpp:543-551 constexpr x/y = 0)
    if ndim < 3:
        y = np.zeros(n)
    if ndim == 1:
        x = np.zeros(n)
    keep = np.abs(z - sp.z_m) <= sp.z_cut * (sp.z_rms if sp.z_rms else np.inf)
    if sp.momentum_distribution == "gaussian":
        ux = rng.normal(sp.ux, sp.ux_th or 0.0, n)
        uy = rng.normal(sp.uy, sp.uy_th or 0.0, n)
        uz = rng.normal(sp.uz, sp.uz_th or 0.0, n)
    elif sp.momentum_distribution == "constant":
        ux = np.full(n, sp.ux)
        uy = np.full(n, sp.uy)
        uz = np.full(n, sp.uz)
    else:
        ux = uy = uz = np.zeros(n)
    if gamma_boost > 1.0:
        # MapParticletoBoostedFrame (PhysicalParticleContainer.cpp:455-492)
        # at t_lab = 0 and boosted time t0 = 0
        beta_boost = np.sqrt(1.0 - 1.0 / gamma_boost**2)
        tpr = -gamma_boost * beta_boost * z / constants.c  # [s]
        zpr = gamma_boost * z
        gamma_lab = np.sqrt(1.0 + ux * ux + uy * uy + uz * uz)
        uz = gamma_boost * uz - gamma_boost * beta_boost * gamma_lab
        gammapr = np.sqrt(1.0 + ux * ux + uy * uy + uz * uz)
        vzpr = uz / gammapr * constants.c  # [m/s]
        if sp.do_backward_propagation:
            # flip AFTER vzpr: the position map uses the unflipped velocity
            # (PhysicalParticleContainer.cpp:487-498)
            uz = -uz
        z = zpr - tpr * vzpr
    weight = sp.q_tot / (sp.charge * n)
    if ndim == 2:
        # 2D: weight = q_tot/(npart*charge*y_rms)
        # (PhysicalParticleContainer.cpp:543)
        weight /= sp.y_rms
    elif ndim == 1:
        # 1D: /(x_rms*y_rms) (PhysicalParticleContainer.cpp:548)
        weight /= (sp.x_rms * sp.y_rms)
    w = np.where(keep, weight, 0.0).astype(dtype)
    ps = ParticleState(
        w=w,
        ux=(ux * constants.c).astype(dtype),
        uy=(uy * constants.c).astype(dtype),
        uz=(uz * constants.c).astype(dtype),
        alive=np.asarray(keep),
        extra={},
    )
    # runtime attributes evaluated at injection (t=0), as in inject_species
    if sp.attributes:
        from ..utils.expression import compile_expression

        extra_vals = {}
        for (aname, expr, is_int) in sp.attributes:
            fn = compile_expression(
                expr, ["x", "y", "z", "ux", "uy", "uz", "t"],
                dict(sp.user_constants),
            )
            val = np.asarray(fn(x, y, z, ux * constants.c,
                                uy * constants.c, uz * constants.c, 0.0))
            val = np.broadcast_to(val, (n,))
            extra_vals[aname] = (
                np.round(val).astype(np.int32) if is_int
                else val.astype(dtype)
            )
        ps = ps.replace(extra=extra_vals)
    if ndim == 1:
        return ps.with_positions(1, [z.astype(dtype)])
    if ndim == 2:
        return ps.with_positions(2, [x.astype(dtype), z.astype(dtype)])
    return ps.with_positions(3, [x.astype(dtype), y.astype(dtype), z.astype(dtype)])


def _sample_boltzmann(rng, n, theta, beta, bdir, dtype):
    """Maxwell-Boltzmann momenta with drift (InjectorMomentum.H:202-245:
    u ~ N(0, sqrt(theta)) per comp, Zenitani flipping, boost along bdir).

    ``theta``/``beta`` may be scalars or per-particle arrays (parsed
    temperature/velocity profiles)."""
    theta = np.broadcast_to(np.asarray(theta, np.float64), (n,))
    beta = np.broadcast_to(np.asarray(beta, np.float64), (n,))
    u = rng.standard_normal((3, n)) * np.sqrt(theta)
    gamma = np.sqrt(1.0 + (u * u).sum(axis=0))
    if np.any(beta != 0.0):
        flip = -beta * u[bdir] / gamma > rng.random(n)
        u[bdir] = np.where(flip, -u[bdir], u[bdir])
        u[bdir] = (u[bdir] + gamma * beta) / np.sqrt(1.0 - beta * beta)
    return u.astype(dtype)


def _sample_juttner(rng, n, theta, beta, bdir, dtype):
    """Maxwell-Juttner momenta via the Sobol method with Zenitani flipping
    (InjectorMomentum.H:296-360); per-particle theta/beta supported.

    The Sobol rejection acceptance vanishes like exp(-1/theta): the
    reference ABORTS below theta = 0.1 (InjectorMomentum.H:313) and so do
    we — otherwise the loop effectively never terminates."""
    theta = np.broadcast_to(np.asarray(theta, np.float64), (n,))
    beta = np.broadcast_to(np.asarray(beta, np.float64), (n,))
    if n and float(theta.min()) < 0.1:
        raise ValueError(
            "Temperature parameter theta is less than minimum 0.1 allowed "
            "for Maxwell-Juttner (Sobol sampling; InjectorMomentum.H:313)"
        )
    um = np.zeros(n)
    todo = np.ones(n, bool)
    while todo.any():
        idx = np.nonzero(todo)[0]
        m = idx.size
        th = theta[idx]
        cand = -th * np.log(
            rng.random(m) * rng.random(m) * rng.random(m)
        )
        gam = np.sqrt(1.0 + cand * cand)
        acc = cand - gam > th * np.log(rng.random(m))
        um[idx[acc]] = cand[acc]
        todo[idx[acc]] = False
    x1 = rng.random(n)
    x2 = rng.random(n)
    u = np.zeros((3, n))
    s_perp = 2.0 * um * np.sqrt(x1 * (1.0 - x1))
    u[(bdir + 1) % 3] = s_perp * np.sin(2.0 * np.pi * x2)
    u[(bdir + 2) % 3] = s_perp * np.cos(2.0 * np.pi * x2)
    u[bdir] = um * (2.0 * x1 - 1.0)
    gamma = np.sqrt(1.0 + (u * u).sum(axis=0))
    if np.any(beta != 0.0):
        flip = -beta * u[bdir] / gamma > rng.random(n)
        u[bdir] = np.where(flip, -u[bdir], u[bdir])
        u[bdir] = (u[bdir] + gamma * beta) / np.sqrt(1.0 - beta * beta)
    return u.astype(dtype)
