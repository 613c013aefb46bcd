"""RZ (quasi-cylindrical) PIC: multi-mode fields, cylindrical Yee, RZ
particle ops.

Reimplements the reference's RZ geometry (compile-time WARPX_DIM_RZ):

  * fields carry 2*n_modes-1 real components per quantity — mode 0 then
    (re, im) per azimuthal mode m (Source/WarpX.H:316 n_rz_azimuthal_modes);
    arrays here are (C, NR, NZ) with staggering identical to 2D XZ
    (x -> r), z periodic;
  * cylindrical Yee curl updates with 1/r metric terms and on-axis
    rules (FiniteDifferenceAlgorithms/CylindricalYeeAlgorithm.H,
    EvolveB.cpp EvolveBCylindrical, EvolveE.cpp EvolveECylindrical,
    EvolveF.cpp EvolveFCylindrical);
  * particles live in full 3D Cartesian (x, y, z) and are pushed with the
    standard pushers ("RZ pushes particles in 3D"); gather interpolates
    (Er,Et,Ez,Br,Bt,Bz) at (r,z) per mode with e^{i m theta} phases and
    rotates to Cartesian (Gather/FieldGather.H RZ branch); Esirkepov
    deposition runs on the radii r(t) with the theta velocity at the
    mid position (Deposition/CurrentDeposition.H:643 RZ branch);
  * deposited J/rho get the below-axis guard folds and 1/(2 pi r) inverse
    ring-volume scaling with the Verboncoeur axis correction
    (WarpXPushFieldsEM.cpp ApplyInverseVolumeScalingToCurrentDensity);
  * axis guard cells for the gather are filled with the per-mode parity
    rules (BoundaryConditions/WarpXFieldBoundaries.cpp:191
    ApplyFieldBoundaryOnAxis).

Mode m=0 is the complete, tested path (the stock RZ Langmuir deck);
higher modes use the same array layout.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants
from ..constants import c as _c, ep0 as _ep0, mu0 as _mu0
from ..core.state import FieldState, ParticleState, SimState
from ..ops.push import PUSHERS
from ..ops.shapes import esirkepov_weights, shape_weights

__all__ = [
    "RZ_STAGGER", "compute_dt_rz", "make_rz_step_fns", "rz_checksums",
    "rz_cell_centered_output", "rz_inject_species",
]

# (r, z) nodal flags, identical to the 2D XZ Yee staggering with x -> r
RZ_STAGGER = {
    "Er": (0, 1), "Et": (1, 1), "Ez": (1, 0),
    "Br": (1, 0), "Bt": (0, 0), "Bz": (0, 1),
    "jr": (0, 1), "jt": (1, 1), "jz": (1, 0),
    "rho": (1, 1), "F": (1, 1),
}


def rz_stagger(cfg, name):
    """Component nodal flags: the spectral (PSATD) solver stores every
    component fully CELL-CENTERED (WarpX.cpp:2153-2160 RZ+PSATD forces
    TheCellVector); the FDTD path uses the cylindrical Yee staggering."""
    if cfg.em_solver == "psatd":
        return (0, 0)
    return RZ_STAGGER[name]


_GALERKIN_R = {"Er": ("r",), "Et": (), "Ez": ("z",),
               "Br": ("z",), "Bt": ("r", "z"), "Bz": ("r",)}
# below-axis guard parity for mode 0 (r/theta components odd, z/scalars even)
_AXIS_PARITY0 = {"Er": -1, "Et": -1, "Br": -1, "Bt": -1,
                 "Ez": +1, "Bz": +1, "F": +1, "rho": +1}


def compute_dt_rz(dr, dz, n_modes, cfl):
    """Semi-analytic RZ CFL (CylindricalYeeAlgorithm.H:46-63)."""
    coeffs = (0.2105, 1.0, 3.5234, 8.5104, 15.5059, 24.5037)
    alpha = (coeffs[n_modes - 1] if n_modes < 7
             else (n_modes - 1.0) ** 2 - 0.4)
    return cfl / (_c * math.sqrt((1.0 + alpha) / (dr * dr) + 1.0 / (dz * dz)))


def _shape(cfg):
    geom = cfg.geometry
    return geom.n_cell[0], geom.n_cell[1], 2 * cfg.n_rz_modes - 1


def _z_bcs(cfg):
    """(periodic, bc_lo, bc_hi) for the z dimension."""
    per = cfg.geometry.periodic[1]
    bc_lo = (tuple(cfg.field_bc_lo or ()) + ("none", "periodic"))[1]
    bc_hi = (tuple(cfg.field_bc_hi or ()) + ("none", "periodic"))[1]
    return per, bc_lo, bc_hi


def field_shape(cfg, name):
    """(C, NR(+1), NZ(+1)) array shape: AMReX-faithful nodal layout — a
    component NODAL in bounded z stores nz+1 valid values (both walls)."""
    nr, nz, ncomp = _shape(cfg)
    fr, fz = rz_stagger(cfg, name)
    nzv = nz + (1 if (fz and not cfg.geometry.periodic[1]) else 0)
    return (ncomp, nr + 1 if fr else nr, nzv)


# component tangential to a z-wall (r/theta components); z/scalars normal
_Z_TANG = {"Er": True, "Et": True, "Br": True, "Bt": True,
           "Ez": False, "Bz": False}


def _extend_z(arr, name, cfg, ng):
    """Pad ``ng`` z-guard layers filled per the z BCs: periodic wrap, or the
    PEC mirror rules (WarpX_PEC.cpp SetEfieldOnPEC/SetBfieldOnPEC — E
    tangential odd + wall zero, E normal even; B tangential even, B normal
    odd + wall zero).  Used by the gather and the wall-adjacent curls."""
    per, bc_lo, bc_hi = _z_bcs(cfg)
    if per:
        return jnp.concatenate(
            [arr[..., -ng:], arr, arr[..., :ng]], axis=-1
        )
    from ..core.boundaries import fill_guards_pec

    nz = cfg.geometry.n_cell[1]
    nodal = rz_stagger(cfg, name)[1] == 1
    zshape = arr.shape[:-1] + (ng,)
    out = jnp.concatenate(
        [jnp.zeros(zshape, arr.dtype), arr, jnp.zeros(zshape, arr.dtype)],
        axis=-1,
    )
    tang = _Z_TANG[name]
    if name[0] == "E":
        mirror_neg = tang
        zero_wall = tang and nodal
    else:
        mirror_neg = not tang
        zero_wall = (not tang) and nodal
    for side, bc in (("lo", bc_lo), ("hi", bc_hi)):
        if bc == "pec":
            out = fill_guards_pec(
                out, out.ndim - 1, ng, nz, nodal, mirror_neg, side,
                zero_wall,
            )
    return out


def _sm_bcs(cfg):
    """(sm_zlo, sm_zhi, sm_rhi) Silver-Mueller flags for the RZ walls."""
    per, bc_lo, bc_hi = _z_bcs(cfg)
    bc_rhi = (tuple(cfg.field_bc_hi or ()) + ("none", "periodic"))[0]
    sm = "absorbing_silver_mueller"
    return (not per and bc_lo == sm, not per and bc_hi == sm, bc_rhi == sm)


def rz_zero_fields(cfg, dtype) -> FieldState:
    """FieldState with RZ layouts; Cartesian names map r->x, t->y."""
    z = lambda nm: jnp.zeros(field_shape(cfg, nm), dtype)  # noqa: E731
    sm_zlo, sm_zhi, sm_rhi = _sm_bcs(cfg)
    smg = None
    if sm_zlo or sm_zhi or sm_rhi:
        # guard-cell B rings outside the absorbing walls (see FieldState.smg)
        nr, nz, ncomp = _shape(cfg)
        nzn = field_shape(cfg, "Et")[2]
        smg = {}
        for side, on in (("zlo", sm_zlo), ("zhi", sm_zhi)):
            if on:
                smg["br_" + side] = jnp.zeros((ncomp, nr + 1), dtype)
                smg["bt_" + side] = jnp.zeros((ncomp, nr), dtype)
        if sm_rhi:
            smg["bt_rhi"] = jnp.zeros((ncomp, nz), dtype)
            smg["bz_rhi"] = jnp.zeros((ncomp, nzn), dtype)
    return FieldState(
        Ex=z("Er"), Ey=z("Et"), Ez=z("Ez"),
        Bx=z("Br"), By=z("Bt"), Bz=z("Bz"),
        jx=z("jr"), jy=z("jt"), jz=z("jz"),
        F=z("F") if cfg.do_dive_cleaning else None,
        smg=smg,
    )


# --------------------------------------------------------------- injection
def _rz_attributes(sp_cfg, x, y, z, u3, np_dtype, t=0.0):
    """Runtime attributes evaluated at injection (addRealAttributes)."""
    extra = {}
    if sp_cfg.attributes:
        from ..utils.expression import compile_expression

        for (aname, expr, is_int) in sp_cfg.attributes:
            fn = compile_expression(
                expr, ["x", "y", "z", "ux", "uy", "uz", "t"],
                dict(sp_cfg.user_constants),
            )
            val = np.broadcast_to(
                np.asarray(fn(x, y, z, u3[0], u3[1], u3[2], t)), x.shape
            )
            extra[aname] = (np.round(val).astype(np.int32) if is_int
                            else val.astype(np_dtype))
    return extra


def rz_inject_gaussian_beam(sp_cfg, cfg, np_dtype, rng):
    """AddGaussianBeam in RZ (PhysicalParticleContainer.cpp:503-680): full
    3D Cartesian normal positions, weight q_tot/(q*npart)."""
    n = sp_cfg.npart
    x = rng.normal(sp_cfg.x_m, sp_cfg.x_rms, n)
    y = rng.normal(sp_cfg.y_m, sp_cfg.y_rms, n)
    z = rng.normal(sp_cfg.z_m, sp_cfg.z_rms, n)
    keep = np.abs(z - sp_cfg.z_m) <= sp_cfg.z_cut * (
        sp_cfg.z_rms if sp_cfg.z_rms else np.inf
    )
    if sp_cfg.momentum_distribution == "gaussian":
        u3 = [
            rng.normal(m, th or 0.0, n) * _c
            for m, th in ((sp_cfg.ux, sp_cfg.ux_th),
                          (sp_cfg.uy, sp_cfg.uy_th),
                          (sp_cfg.uz, sp_cfg.uz_th))
        ]
    elif sp_cfg.momentum_distribution == "constant":
        u3 = [np.full(n, v * _c) for v in (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)]
    else:
        u3 = [np.zeros(n)] * 3
    w = np.where(
        keep, sp_cfg.q_tot / (sp_cfg.charge * n), 0.0
    ).astype(np_dtype)
    extra = _rz_attributes(sp_cfg, x, y, z, u3, np_dtype)
    extra["theta"] = np.arctan2(y, x).astype(np_dtype)
    return ParticleState(
        w=w, ux=u3[0].astype(np_dtype), uy=u3[1].astype(np_dtype),
        uz=u3[2].astype(np_dtype), alive=keep,
        x=x.astype(np_dtype), y=y.astype(np_dtype), z=z.astype(np_dtype),
        extra=extra,
    )


def rz_inject_species(sp_cfg, cfg, np_dtype, rng):
    """NUniformPerCell in RZ (PhysicalParticleContainer.cpp:1120-1305):
    per cell (ir, iz) place (n_r x n_theta x n_z) particles; theta =
    2*pi*(it+0.5)/n_theta + a per-cell random offset when <species>.
    random_theta (reference default, :1124-1125, 1168-1170); weight =
    density * (dr*dz/ppc) * 2*pi*r (radially weighted).  The raw injection
    theta is stored as the `theta` attribute (PIdx::theta) — the push
    overwrites it with atan2(y, x), matching SetParticlePosition."""
    if sp_cfg.injection_style == "gaussian_beam":
        return rz_inject_gaussian_beam(sp_cfg, cfg, np_dtype, rng)
    geom = cfg.geometry
    nr, nz = geom.n_cell
    dr, dz = geom.dx
    rmin, zmin = geom.prob_lo
    ppc = sp_cfg.num_particles_per_cell_each_dim or (1, 1, 1)
    n_r, n_t, n_z = (tuple(ppc) + (1, 1, 1))[:3]
    ppc_tot = n_r * n_t * n_z

    ir, iz, a, t, b = np.meshgrid(
        np.arange(nr), np.arange(nz), np.arange(n_r), np.arange(n_t),
        np.arange(n_z), indexing="ij",
    )
    r = rmin + (ir + (a + 0.5) / n_r) * dr
    z = zmin + (iz + (b + 0.5) / n_z) * dz
    theta = 2.0 * np.pi * (t + 0.5) / n_t
    if sp_cfg.random_theta:
        theta = theta + rng.uniform(0.0, 2.0 * np.pi, (nr, nz, 1, 1, 1))
    theta = np.broadcast_to(theta, r.shape)
    r, z, theta = [q.ravel().astype(np_dtype) for q in (r, z, theta)]
    x = r * np.cos(theta)
    y = r * np.sin(theta)

    # species bounds: xmin/xmax apply to the RADIUS (insideBounds(xb,...))
    lo = sp_cfg.bounds_lo or (-np.inf, -np.inf)
    hi = sp_cfg.bounds_hi or (np.inf, np.inf)
    inside = (r >= lo[0]) & (r <= hi[0]) & (z >= lo[1]) & (z <= hi[1])

    dens = _density_at(sp_cfg, x, y, z, np_dtype)
    u3 = _momentum_at(sp_cfg, x, y, z, np_dtype, rng)
    alive = inside & (dens > 0)
    w = np.where(
        alive, dens * (dr * dz / ppc_tot) * 2.0 * np.pi * r, 0.0
    ).astype(np_dtype)
    extra = _rz_attributes(sp_cfg, x, y, z, u3, np_dtype)
    # the RAW injection theta is stored (PhysicalParticleContainer.cpp:1301
    # pa[PIdx::theta] = theta); the push rewrites it to atan2(y, x) in
    # (-pi, pi] (GetAndSetPosition.H SetParticlePosition), so only
    # never-pushed particles (e.g. last-step MoveWindow injectees) keep it
    extra["theta"] = theta
    ps = ParticleState(
        w=w,
        ux=np.where(alive, u3[0], 0.0).astype(np_dtype),
        uy=np.where(alive, u3[1], 0.0).astype(np_dtype),
        uz=np.where(alive, u3[2], 0.0).astype(np_dtype),
        alive=alive,
        x=x, y=y, z=z,
        extra=extra,
    )
    if sp_cfg.do_continuous_injection and cfg.do_moving_window:
        # headroom for the whole run's window motion, in whole columns
        v = abs(cfg.moving_window_v) * _c
        cols = int(math.ceil(v * cfg.dt * max(cfg.max_step, 1) / dz)) + 2
        pad = cols * nr * ppc_tot

        def _pad(arr, fill=0.0):
            return np.concatenate(
                [arr, np.full(pad, fill, arr.dtype)]
            )

        ps = ps.replace(
            w=_pad(ps.w), ux=_pad(ps.ux), uy=_pad(ps.uy), uz=_pad(ps.uz),
            alive=np.concatenate([ps.alive, np.zeros(pad, bool)]),
            x=_pad(ps.x), y=_pad(ps.y), z=_pad(ps.z),
            extra={k: _pad(v_) for k, v_ in ps.extra.items()},
        )
    return ps


def _density_at(sp_cfg, x, y, z, np_dtype):
    from ..utils.expression import compile_expression

    if sp_cfg.profile == "constant":
        return np.full(x.shape, sp_cfg.density, np_dtype)
    if sp_cfg.profile in ("parse", "parse_density_function"):
        fn = compile_expression(
            sp_cfg.density_expr, ["x", "y", "z"], dict(sp_cfg.user_constants)
        )
        return np.asarray(fn(x, y, z), np_dtype)
    raise NotImplementedError(f"RZ density profile {sp_cfg.profile}")


def _momentum_at(sp_cfg, x, y, z, np_dtype, rng):
    from ..utils.expression import compile_expression

    n = x.shape[0]
    md = sp_cfg.momentum_distribution
    if md in ("at_rest", "none"):
        u3 = [np.zeros(n, np_dtype)] * 3
    elif md == "constant":
        u3 = [np.full(n, v, np_dtype)
              for v in (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)]
    elif md == "gaussian":
        u3 = [
            rng.normal(m, th or 0.0, n).astype(np_dtype)
            for m, th in ((sp_cfg.ux, sp_cfg.ux_th),
                          (sp_cfg.uy, sp_cfg.uy_th),
                          (sp_cfg.uz, sp_cfg.uz_th))
        ]
    elif md == "parse_momentum_function":
        u3 = [
            np.asarray(
                compile_expression(
                    e, ["x", "y", "z"], dict(sp_cfg.user_constants)
                )(x, y, z),
                np_dtype,
            ) * np.ones(n, np_dtype)
            for e in sp_cfg.momentum_exprs
        ]
    else:
        raise NotImplementedError(f"RZ momentum distribution {md}")
    return [u * _c for u in u3]


# ---------------------------------------------------------- laser antenna
def rz_antenna_particles(laser, cfg, np_dtype):
    """RZ laser antenna layout (LaserParticleContainer.cpp:524-537): a
    radial lattice r_i = position_r + dr*(i+0.5) fanned into n_spokes =
    (n_modes-1)*min_particles_per_mode theta spokes, two particles (+/- w)
    per point with ring weight w = (ep0/mobility)*dr * 2*pi*r/n_spokes.

    Returns (ParticleState, mobility)."""
    geom = cfg.geometry
    dr = geom.dx[0]
    mobility = 0.05 / laser.e_max
    w0 = constants.ep0 / mobility * dr
    n_spokes = max(1, (cfg.n_rz_modes - 1) * 4)
    r0, z0 = laser.position[0], laser.position[2]
    # radial lattice covering [prob_lo_r, prob_hi_r]
    imin = int((geom.prob_lo[0] - r0) / dr)
    imax = int((geom.prob_hi[0] - r0) / dr)
    pts = []
    for i in range(imin, imax + 1):
        r = r0 + dr * (i + 0.5)
        if not (geom.prob_lo[0] <= r <= geom.prob_hi[0]):
            continue
        if not (geom.prob_lo[1] <= z0 <= geom.prob_hi[1]):
            continue
        for s in range(n_spokes):
            phase = 2.0 * np.pi * s / n_spokes
            rw = w0 * 2.0 * np.pi * r / n_spokes
            pts.append((r * np.cos(phase), r * np.sin(phase), z0, rw))
            pts.append((r * np.cos(phase), r * np.sin(phase), z0, -rw))
    n = len(pts)
    arr = np.array(pts, dtype=np_dtype).reshape(n, 4)
    zeros = np.zeros(n, dtype=np_dtype)
    return ParticleState(
        w=arr[:, 3].copy(), ux=zeros.copy(), uy=zeros.copy(),
        uz=zeros.copy(), alive=np.ones(n, dtype=bool),
        x=arr[:, 0].copy(), y=arr[:, 1].copy(), z=arr[:, 2].copy(),
    ), mobility


def update_antenna_rz(sp, laser, mobility, t, dt):
    """Prescribed antenna motion in RZ (update_laser_particle with the 3D
    plane vectors u_X = p_X, u_Y = n x p_X, LaserParticleContainer.cpp:210;
    the Gaussian profile uses the 3D diffraction prefactor)."""
    from ..core.laser import fill_amplitude, polarization_p_x

    nvec = np.array(laser.direction, float)
    nvec = nvec / np.linalg.norm(nvec)
    p_X = polarization_p_x(laser)
    u_Y = np.cross(nvec, p_X)
    Xp = (p_X[0] * (sp.x - laser.position[0])
          + p_X[1] * (sp.y - laser.position[1])
          + p_X[2] * (sp.z - laser.position[2]))
    Yp = (u_Y[0] * (sp.x - laser.position[0])
          + u_Y[1] * (sp.y - laser.position[1])
          + u_Y[2] * (sp.z - laser.position[2]))
    amplitude = fill_amplitude(laser, 3, Xp, Yp, t)
    sign_charge = jnp.where(sp.w > 0, -1.0, 1.0)
    v_over_c = sign_charge * mobility * amplitude
    vx = _c * v_over_c * p_X[0]
    vy = _c * v_over_c * p_X[1]
    vz = _c * v_over_c * p_X[2]
    gamma = 1.0 / jnp.sqrt(1.0 - v_over_c * v_over_c)
    return sp.replace(
        ux=gamma * vx, uy=gamma * vy, uz=gamma * vz,
        x=sp.x + vx * dt, y=sp.y + vy * dt, z=sp.z + vz * dt,
    )


# ------------------------------------------------------------------ gather
def _extend_axis(arr, name, ng, nr_valid, nodal_r=None):
    """Pad ``ng`` mirrored rows below the axis (mode parity) and ``ng``
    zero rows beyond rmax; z stays periodic (handled by index wrap)."""
    ncomp = arr.shape[0]
    if nodal_r is None:
        nodal_r = RZ_STAGGER[name][0] == 1
    # mirror index: guard row g (= -1-k or -k) reflects valid row
    rows = []
    for g in range(ng, 0, -1):
        src = g if nodal_r else g - 1  # nodal: F(-g) ~ F(g); cc: F(-g) ~ F(g-1)
        src = min(src, arr.shape[1] - 1)
        comps = []
        for ci in range(ncomp):
            m = (ci + 1) // 2
            if ci == 0:
                parity = _AXIS_PARITY0[name]
            else:
                base = _AXIS_PARITY0[name]
                # mode-m parity (WarpXFieldBoundaries.cpp:244-266):
                # r/t components: (-1)^(m+1); z/scalars: -(-1)^(m+1)*(-1)=...
                sgn = (-1.0) ** (m + 1)
                parity = sgn if base < 0 else -sgn
            comps.append(parity * arr[ci, src])
        rows.append(jnp.stack(comps, axis=0)[:, None, :])
    below = jnp.concatenate(rows, axis=1) if rows else arr[:, :0]
    above = jnp.zeros((ncomp, ng, arr.shape[2]), arr.dtype)
    return jnp.concatenate([below, arr, above], axis=1)


def gather_rz(pos3, farr: Dict[str, jnp.ndarray], cfg, order, ng,
              z_origin=None):
    """Gather (Ex..Bz) in Cartesian at particle positions.

    farr: name -> (C, NR, NZ) field arrays (RZ names).  Fields are gathered
    per-mode at (r, z) with cos/sin(m theta) phases and rotated from
    (r, t) to (x, y) (FieldGather.H:1522-1560 RZ mode sum + rotation).
    z_origin overrides the z grid origin (Galilean drifted grid).
    """
    geom = cfg.geometry
    dr, dz = geom.dx
    rmin, zmin = geom.prob_lo
    if z_origin is not None:
        zmin = z_origin
    nz = geom.n_cell[1]
    x, y, z = pos3
    r = jnp.sqrt(x * x + y * y)
    cost = jnp.where(r > 0, x / jnp.where(r > 0, r, 1.0), 1.0)
    sint = jnp.where(r > 0, y / jnp.where(r > 0, r, 1.0), 0.0)
    rg = (r - rmin) / dr
    zg = (z - zmin) / dz
    nmodes = cfg.n_rz_modes

    # e^{i m theta} phases via recurrence
    phases = [(jnp.ones_like(cost), jnp.zeros_like(sint))]
    for _ in range(1, nmodes):
        pc, ps = phases[-1]
        phases.append((pc * cost - ps * sint, pc * sint + ps * cost))

    bounded_z = not geom.periodic[1]
    out = {}
    for name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
        fr, fz = rz_stagger(cfg, name)
        arr = _extend_axis(farr[name], name, ng, farr[name].shape[1],
                           nodal_r=(fr == 1))
        if bounded_z:
            arr = _extend_z(arr, name, cfg, ng)
        o_r = order - 1 if (cfg.galerkin and "r" in _GALERKIN_R[name]) \
            else order
        o_z = order - 1 if (cfg.galerkin and "z" in _GALERKIN_R[name]) \
            else order
        xr = rg - (0.5 if fr == 0 else 0.0)
        xz = zg - (0.5 if fz == 0 else 0.0)
        i0, wr = shape_weights(xr, o_r)
        k0, wz = shape_weights(xz, o_z)
        val = None
        for a, wa in enumerate(wr):
            ridx = jnp.clip(i0 + a + ng, 0, arr.shape[1] - 1)
            for b, wb in enumerate(wz):
                zidx = (jnp.clip(k0 + b + ng, 0, arr.shape[2] - 1)
                        if bounded_z else jnp.mod(k0 + b, nz))
                vals = arr[:, ridx, zidx]  # (C, np)
                contrib = vals[0]
                for m in range(1, nmodes):
                    pc, ps = phases[m]
                    # stored components are the cos/sin coefficients (the
                    # deposit's factor 2 normalizes them); FieldGather.H:322
                    contrib = contrib + (
                        vals[2 * m - 1] * pc + vals[2 * m] * ps
                    )
                term = (wa * wb) * contrib
                val = term if val is None else val + term
        out[name] = val

    ex = cost * out["Er"] - sint * out["Et"]
    ey = sint * out["Er"] + cost * out["Et"]
    bx = cost * out["Br"] - sint * out["Bt"]
    by = sint * out["Br"] + cost * out["Bt"]
    return ex, ey, out["Ez"], bx, by, out["Bz"]


# ----------------------------------------------------------------- deposit
def _scatter_rz(target, ridx, zidx, vals):
    nr_e, nz = target.shape
    lin = ridx * nz + zidx
    return target.reshape(-1).at[lin.reshape(-1)].add(
        vals.reshape(-1)
    ).reshape(nr_e, nz)


def _fold_and_scale(ext, name, cfg, ng, kind, mode_sign=1.0):
    """Below-axis guard folds + inverse ring-volume scaling for deposited
    quantities (WarpXPushFieldsEM.cpp ApplyInverseVolumeScaling*).

    ext: (NR + 2*ng, NZ) extended mode-component array (mode 0 handling;
    higher modes would flip the fold signs per (-1)^(m+1)).
    kind: 'r' (antisym fold, 0 on axis), 't' (antisym fold incl node,
    0 on axis), 'z'/'rho' (symmetric fold, axis_volume_factor on axis).
    """
    geom = cfg.geometry
    dr = geom.dx[0]
    rmin = geom.prob_lo[0]
    nodal_r = rz_stagger(cfg, name)[0] == 1
    nr_valid = ext.shape[0] - 2 * ng
    arr = ext[ng:-ng]
    if rmin == 0.0:
        updates = []
        for gi in range(ng):
            guard = ext[ng - 1 - gi]  # row at index -(gi+1)
            # target valid row per the reference index maps
            if nodal_r:
                tgt = gi + 1  # F(-g) folds onto F(g)
            else:
                tgt = gi  # F(-1-i) folds onto F(i)
            if tgt >= nr_valid:
                continue
            sgn = {"r": -1.0, "t": -1.0, "z": +1.0, "rho": +1.0}[kind]
            sgn = sgn * mode_sign
            updates.append((tgt, sgn * guard))
        for tgt, add in updates:
            arr = arr.at[tgt].add(add)
    # radius at each valid row
    off = 0.0 if nodal_r else 0.5
    rrow = jnp.abs(rmin + (jnp.arange(nr_valid) + off) * dr)
    on_axis = rrow == 0.0
    avf = 1.0 / 3.0  # Verboncoeur correction (default true, WarpX.cpp)
    if kind in ("r", "t"):
        scale = jnp.where(on_axis, 0.0,
                          1.0 / (2.0 * jnp.pi * jnp.where(on_axis, 1.0, rrow)))
    else:
        scale = jnp.where(
            on_axis,
            1.0 / (jnp.pi * dr * avf),
            1.0 / (2.0 * jnp.pi * jnp.where(on_axis, 1.0, rrow)),
        )
    return arr * scale[:, None]


def deposit_rho_rz(pos3, w, q, cfg, order, ng, dtype, z_origin=None):
    """Nodal rho, all azimuthal modes (ChargeDeposition.H RZ: factor
    2 e^{i m theta} per mode) with ring-volume scaling.  z_origin overrides
    the z grid origin (moving window).  Bounded z scatters into z guards
    that are then dropped (the reference's explicit-path SumBoundary folds
    only periodic directions)."""
    geom = cfg.geometry
    dr, dz = geom.dx
    rmin, zmin = geom.prob_lo
    if z_origin is not None:
        zmin = z_origin
    nr, nz = geom.n_cell
    bounded_z = not geom.periodic[1]
    nzv = nz + (1 if bounded_z else 0)  # rho is z-nodal
    ngz = ng if bounded_z else 0
    nmodes = cfg.n_rz_modes
    ncomp = 2 * nmodes - 1
    x, y, z = pos3
    r = jnp.sqrt(x * x + y * y)
    ok = r > 0
    safe = jnp.where(ok, r, 1.0)
    c0 = jnp.where(ok, x / safe, 1.0)
    s0 = jnp.where(ok, y / safe, 0.0)
    phases = [(jnp.ones_like(c0), jnp.zeros_like(s0))]
    for _ in range(1, nmodes):
        pc, ps = phases[-1]
        phases.append((pc * c0 - ps * s0, pc * s0 + ps * c0))
    rg = (r - rmin) / dr
    zg = (z - zmin) / dz
    i0, wr = shape_weights(rg, order)
    k0, wz = shape_weights(zg, order)
    ext = jnp.zeros((ncomp, nr + 1 + 2 * ng, nzv + 2 * ngz), dtype)
    wq = (q / (dr * dz)) * w
    for a, wa in enumerate(wr):
        ridx = jnp.clip(i0 + a + ng, 0, ext.shape[1] - 1)
        for b, wb in enumerate(wz):
            zidx = (jnp.clip(k0 + b + ngz, 0, ext.shape[2] - 1)
                    if bounded_z else jnp.mod(k0 + b, nz))
            val = wq * wa * wb
            ext = ext.at[0].set(_scatter_rz(ext[0], ridx, zidx, val))
            for m in range(1, nmodes):
                pc, ps = phases[m]
                ext = ext.at[2 * m - 1].set(_scatter_rz(
                    ext[2 * m - 1], ridx, zidx, 2.0 * val * pc))
                ext = ext.at[2 * m].set(_scatter_rz(
                    ext[2 * m], ridx, zidx, 2.0 * val * ps))
    if bounded_z:
        ext = ext[..., ngz:ngz + nzv]
    return _fold_and_scale_modes(ext, "rho", cfg, ng, "rho")


def deposit_current_rz(pos_new3, ux, uy, uz, w, q, cfg, dt, order, ng,
                       dtype, z_origin=None):
    """Esirkepov RZ current deposition, all azimuthal modes
    (CurrentDeposition.H:826-890 RZ branch).

    pos_new3 are the already-pushed Cartesian positions; the old Cartesian
    position is reconstructed ballistically and the deposit runs on the
    RADII (charge conserving in (r, z)); J_theta is direct with the theta
    velocity at the mid position for mode 0 and the charge-conserving
    theta-displacement form for modes m >= 1 (the -2i r wq/(m dt dz) *
    [S_new (xy_new - xy_mid) + S_old (xy_mid - xy_old)] term,
    CurrentDeposition.H:218).  Components (2m-1, 2m) store the cos/sin
    coefficients (deposit factor 2 from the mode normalization).
    Returns (jr, jt, jz) ring-volume-scaled (C, NR(+1), NZ) arrays.
    """
    geom = cfg.geometry
    dr, dz = geom.dx
    rmin, zmin = geom.prob_lo
    if z_origin is not None:
        zmin = z_origin
    nr, nz = geom.n_cell
    bounded_z = not geom.periodic[1]
    ngz = ng if bounded_z else 0
    nz_nod = nz + (1 if bounded_z else 0)  # jr/jt are z-nodal
    nmodes = cfg.n_rz_modes
    ncomp = 2 * nmodes - 1
    inv_c2 = 1.0 / (_c * _c)
    gaminv = 1.0 / jnp.sqrt(
        1.0 + (ux * ux + uy * uy + uz * uz) * inv_c2
    )
    xn, yn, zn = pos_new3
    xm = xn - 0.5 * dt * ux * gaminv
    ym = yn - 0.5 * dt * uy * gaminv
    xo = xn - dt * ux * gaminv
    yo = yn - dt * uy * gaminv
    zo = zn - dt * uz * gaminv
    rp_new = jnp.sqrt(xn * xn + yn * yn)
    rp_mid = jnp.sqrt(xm * xm + ym * ym)
    rp_old = jnp.sqrt(xo * xo + yo * yo)

    def _trig(xc, yc, rp):
        ok = rp > 0
        safe = jnp.where(ok, rp, 1.0)
        return jnp.where(ok, xc / safe, 1.0), jnp.where(ok, yc / safe, 0.0)

    cnew, snew = _trig(xn, yn, rp_new)
    cmid, smid = _trig(xm, ym, rp_mid)
    cold, sold = _trig(xo, yo, rp_old)
    vt = (-ux * smid + uy * cmid) * gaminv

    # e^{i m theta} at new/mid/old via recurrence
    def _phases(c0, s0):
        out = [(jnp.ones_like(c0), jnp.zeros_like(s0))]
        for _ in range(1, nmodes):
            pc, ps = out[-1]
            out.append((pc * c0 - ps * s0, pc * s0 + ps * c0))
        return out

    ph_new = _phases(cnew, snew)
    ph_mid = _phases(cmid, smid)
    ph_old = _phases(cold, sold)

    r_new = (rp_new - rmin) / dr
    r_old = (rp_old - rmin) / dr
    z_new = (zn - zmin) / dz
    z_old = (zo - zmin) / dz
    i0, sr_n, sr_o = esirkepov_weights(r_new, r_old, order)
    k0, sz_n, sz_o = esirkepov_weights(z_new, z_old, order)
    T = order + 3
    wq = q * w
    invdtd_r = 1.0 / (dt * dz)
    invdtd_z = 1.0 / (dt * dr)
    invvol = 1.0 / (dr * dz)
    third, sixth = 1.0 / 3.0, 1.0 / 6.0

    ext_r = jnp.zeros((ncomp, nr + 2 * ng, nz_nod + 2 * ngz), dtype)
    ext_t = jnp.zeros((ncomp, nr + 1 + 2 * ng, nz_nod + 2 * ngz), dtype)
    ext_z = jnp.zeros((ncomp, nr + 1 + 2 * ng, nz + 2 * ngz), dtype)

    cum_r = []
    acc = 0.0
    for a in range(T):
        acc = acc + (sr_o[a] - sr_n[a])
        cum_r.append(acc)
    cum_z = []
    acc = 0.0
    for b in range(T):
        acc = acc + (sz_o[b] - sz_n[b])
        cum_z.append(acc)

    for a in range(T):
        ridx_r = jnp.clip(i0 + a + ng, 0, ext_r.shape[1] - 1)
        ridx_tz = jnp.clip(i0 + a + ng, 0, ext_t.shape[1] - 1)
        # radius of this tap in units of dr (CurrentDeposition.H:218's
        # (i_new-1+i + xyzmin.x*dinv.x) factor)
        r_tap = (i0 + a).astype(dtype) + rmin / dr
        for b in range(T):
            if bounded_z:
                zidx = jnp.clip(k0 + b + ngz, 0, ext_r.shape[2] - 1)
                zidx_cc = jnp.clip(k0 + b + ngz, 0, ext_z.shape[2] - 1)
            else:
                zidx = zidx_cc = jnp.mod(k0 + b, nz)
            # jr: cumulative in r, averaged z shapes
            val_r = (wq * invdtd_r) * cum_r[a] * 0.5 * (sz_n[b] + sz_o[b])
            ext_r = ext_r.at[0].set(_scatter_rz(ext_r[0], ridx_r, zidx, val_r))
            # jt mode 0: direct with the Esirkepov transverse mix
            mix = (
                third * (sr_n[a] * sz_n[b] + sr_o[a] * sz_o[b])
                + sixth * (sr_n[a] * sz_o[b] + sr_o[a] * sz_n[b])
            )
            ext_t = ext_t.at[0].set(_scatter_rz(
                ext_t[0], ridx_tz, zidx, (wq * vt * invvol) * mix
            ))
            # jz: cumulative in z, averaged r shapes
            val_z = (wq * invdtd_z) * cum_z[b] * 0.5 * (sr_n[a] + sr_o[a])
            ext_z = ext_z.at[0].set(_scatter_rz(ext_z[0], ridx_tz, zidx, val_z))
            sn_ab = sr_n[a] * sz_n[b]
            so_ab = sr_o[a] * sz_o[b]
            for m in range(1, nmodes):
                pcn, psn = ph_new[m]
                pcm, psm = ph_mid[m]
                pco, pso = ph_old[m]
                # jr / jz: factor 2 e^{i m theta_mid}
                ext_r = ext_r.at[2 * m - 1].set(_scatter_rz(
                    ext_r[2 * m - 1], ridx_r, zidx, 2.0 * val_r * pcm))
                ext_r = ext_r.at[2 * m].set(_scatter_rz(
                    ext_r[2 * m], ridx_r, zidx, 2.0 * val_r * psm))
                ext_z = ext_z.at[2 * m - 1].set(_scatter_rz(
                    ext_z[2 * m - 1], ridx_tz, zidx, 2.0 * val_z * pcm))
                ext_z = ext_z.at[2 * m].set(_scatter_rz(
                    ext_z[2 * m], ridx_tz, zidx, 2.0 * val_z * psm))
                # jt: -2i r_tap wq/(m dt dz) [Sn (xy_n-xy_m) + So (xy_m-xy_o)]
                K = 2.0 * r_tap * wq * invdtd_r / m
                p_re = sn_ab * (pcn - pcm) + so_ab * (pcm - pco)
                p_im = sn_ab * (psn - psm) + so_ab * (psm - pso)
                ext_t = ext_t.at[2 * m - 1].set(_scatter_rz(
                    ext_t[2 * m - 1], ridx_tz, zidx, K * p_im))
                ext_t = ext_t.at[2 * m].set(_scatter_rz(
                    ext_t[2 * m], ridx_tz, zidx, -K * p_re))

    if bounded_z:
        # drop z guard scatters (only periodic dirs fold, SumBoundary)
        ext_r = ext_r[..., ngz:ngz + nz_nod]
        ext_t = ext_t[..., ngz:ngz + nz_nod]
        ext_z = ext_z[..., ngz:ngz + nz]
    jr = _fold_and_scale_modes(ext_r, "jr", cfg, ng, "r")
    jt = _fold_and_scale_modes(ext_t, "jt", cfg, ng, "t")
    jz = _fold_and_scale_modes(ext_z, "jz", cfg, ng, "z")
    return jr, jt, jz


def _fold_and_scale_modes(ext, name, cfg, ng, kind):
    """Per-mode below-axis folds + ring-volume scaling for a (C, NR+2ng, NZ)
    deposited array: fold sign for mode m is the mode-0 sign times (-1)^m
    (a point at (-r, theta) is (r, theta+pi): e^{im(theta+pi)} =
    (-1)^m e^{im theta})."""
    comps = []
    for ci in range(ext.shape[0]):
        m = (ci + 1) // 2
        comps.append(
            _fold_and_scale(ext[ci], name, cfg, ng, kind,
                            mode_sign=(-1.0) ** m)
        )
    return jnp.stack(comps, axis=0)


# ------------------------------------------------------------- field solve
def _r_nodal(cfg):
    nr = cfg.geometry.n_cell[0]
    dr = cfg.geometry.dx[0]
    return cfg.geometry.prob_lo[0] + jnp.arange(nr + 1) * dr


def _r_cc(cfg):
    nr = cfg.geometry.n_cell[0]
    dr = cfg.geometry.dx[0]
    return cfg.geometry.prob_lo[0] + (jnp.arange(nr) + 0.5) * dr


def _dz_up(a):
    """(f[j+1]-f[j]) with periodic z (axis -1)."""
    return jnp.roll(a, -1, axis=-1) - a


def _dz_dn(a):
    return a - jnp.roll(a, 1, axis=-1)


def _dz_nod_to_cc(a, cfg):
    """d/dz of a z-nodal array evaluated at the nz cell centers.

    Periodic storage keeps nz entries (wrap); bounded storage keeps nz+1
    entries so the derivative needs no guards."""
    if cfg.geometry.periodic[1]:
        return _dz_up(a)
    return a[..., 1:] - a[..., :-1]


def _dz_cc_to_nod(a, name, cfg):
    """d/dz of a z-cc array evaluated at the nodal z points.

    Bounded z pads one PEC/zero guard per side (tangential B and normal E
    mirror symmetrically, so the wall derivative vanishes — overwritten by
    the wall enforcement anyway)."""
    if cfg.geometry.periodic[1]:
        return _dz_dn(a)
    p = _extend_z(a, name, cfg, 1)
    return p[..., 1:] - p[..., :-1]


def evolve_b_rz(fields: FieldState, cfg, dt) -> FieldState:
    """EvolveBCylindrical (EvolveB.cpp), mode 0 + higher modes."""
    geom = cfg.geometry
    dr, dz = geom.dx
    inv_dr, inv_dz = 1.0 / dr, 1.0 / dz
    Er, Et, Ez = fields.Ex, fields.Ey, fields.Ez
    Br, Bt, Bz = fields.Bx, fields.By, fields.Bz
    nr = geom.n_cell[0]
    r_nod = _r_nodal(cfg)  # (nr+1,)
    r_cc = _r_cc(cfg)  # (nr,)
    on_axis = geom.prob_lo[0] == 0.0

    # Br (nodal r, cc z): dBr/dt = dEt/dz (m=0) [+ m terms]
    br = Br + dt * _dz_nod_to_cc(Et, cfg) * inv_dz
    if on_axis:
        br = br.at[0, 0, :].set(0.0)
        for m in range(1, cfg.n_rz_modes):
            if m == 1:
                dEtz = _dz_nod_to_cc(Et, cfg) * inv_dz
                br = br.at[2 * m - 1, 0, :].set(
                    Br[2 * m - 1, 0, :]
                    + dt * (dEtz[2 * m - 1, 0, :] - m * Ez[2 * m, 1, :] / dr)
                )
                br = br.at[2 * m, 0, :].set(
                    Br[2 * m, 0, :]
                    + dt * (dEtz[2 * m, 0, :] + m * Ez[2 * m - 1, 1, :] / dr)
                )
            else:
                br = br.at[2 * m - 1, 0, :].set(0.0)
                br = br.at[2 * m, 0, :].set(0.0)
    if cfg.n_rz_modes > 1:
        # off-axis m terms: -/+ m Ez/r
        rr = r_nod[None, 1:, None] if on_axis else r_nod[None, :, None]
        for m in range(1, cfg.n_rz_modes):
            s = 1 if on_axis else 0
            br = br.at[2 * m - 1, s:, :].add(
                dt * (-m) * Ez[2 * m, s:, :] / rr[0]
            )
            br = br.at[2 * m, s:, :].add(
                dt * m * Ez[2 * m - 1, s:, :] / rr[0]
            )

    # Bt (cc r, cc z): dBt/dt = dEz/dr - dEr/dz
    bt = Bt + dt * (
        (Ez[:, 1:, :] - Ez[:, :-1, :]) * inv_dr
        - _dz_nod_to_cc(Er, cfg) * inv_dz
    )

    # Bz (cc r, nodal z): dBz/dt = -(1/r) d(r Et)/dr [+ m Er/r terms]
    rEt = r_nod[None, :, None] * Et
    bz = Bz + dt * (-(rEt[:, 1:, :] - rEt[:, :-1, :]) * inv_dr
                    / r_cc[None, :, None])
    for m in range(1, cfg.n_rz_modes):
        bz = bz.at[2 * m - 1].add(dt * m * Er[2 * m] / r_cc[None, :, None][0])
        bz = bz.at[2 * m].add(dt * (-m) * Er[2 * m - 1]
                              / r_cc[None, :, None][0])
    return fields.replace(Bx=br, By=bt, Bz=bz)


def evolve_e_rz(fields: FieldState, cfg, dt, F=None) -> FieldState:
    """EvolveECylindrical (EvolveE.cpp), mode 0 + higher modes."""
    geom = cfg.geometry
    dr, dz = geom.dx
    inv_dr, inv_dz = 1.0 / dr, 1.0 / dz
    c2 = _c * _c
    Er, Et, Ez = fields.Ex, fields.Ey, fields.Ez
    Br, Bt, Bz = fields.Bx, fields.By, fields.Bz
    jr, jt, jz = fields.jx, fields.jy, fields.jz
    r_nod = _r_nodal(cfg)
    r_cc = _r_cc(cfg)
    on_axis = geom.prob_lo[0] == 0.0
    nmodes = cfg.n_rz_modes

    # Er (cc r, nodal z): dEr/dt = c^2(-dBt/dz - mu0 jr) [+ m Bz/r]
    er = Er + c2 * dt * (-_dz_cc_to_nod(Bt, "Bt", cfg) * inv_dz - _mu0 * jr)
    for m in range(1, nmodes):
        er = er.at[2 * m - 1].add(c2 * dt * m * Bz[2 * m]
                                  / r_cc[None, :, None][0])
        er = er.at[2 * m].add(c2 * dt * (-m) * Bz[2 * m - 1]
                              / r_cc[None, :, None][0])

    # Et (nodal r, nodal z): dEt/dt = c^2(-dBz/dr + dBr/dz - mu0 jt)
    # interior rows need Bz[i-1], Bz[i]; row 0 (axis) and row nr use guards
    zero_r = jnp.zeros_like(Bz[:, :1, :])
    bz_ext = jnp.concatenate([zero_r, Bz, zero_r], axis=1)  # cc rows -1..nr
    dBz_dr = (bz_ext[:, 1:, :] - bz_ext[:, :-1, :]) * inv_dr  # at nodal rows
    et = Et + c2 * dt * (-dBz_dr + _dz_cc_to_nod(Br, "Br", cfg) * inv_dz
                         - _mu0 * jt)
    if on_axis:
        et = et.at[0, 0, :].set(0.0)
        for m in range(1, nmodes):
            if m == 1:
                et = et.at[2 * m - 1, 0, :].set(er[2 * m, 0, :])
                et = et.at[2 * m, 0, :].set(-er[2 * m - 1, 0, :])
            else:
                et = et.at[2 * m - 1, 0, :].set(0.0)
                et = et.at[2 * m, 0, :].set(0.0)

    # Ez (nodal r, cc z): dEz/dt = c^2((1/r) d(r Bt)/dr - mu0 jz)
    rBt = r_cc[None, :, None] * Bt
    rbt_ext = jnp.concatenate(
        [jnp.zeros_like(rBt[:, :1, :]), rBt, jnp.zeros_like(rBt[:, :1, :])],
        axis=1,
    )
    dr_rbt = (rbt_ext[:, 1:, :] - rbt_ext[:, :-1, :]) * inv_dr
    r_div = jnp.where(r_nod == 0.0, 1.0, r_nod)[None, :, None]
    ez = Ez + c2 * dt * (dr_rbt / r_div - _mu0 * jz)
    if on_axis:
        # on-axis regularization: dEz/dt = c^2(4 Bt[0]/dr - mu0 jz)
        ez = ez.at[0, 0, :].set(
            Ez[0, 0, :] + c2 * dt * (4.0 * Bt[0, 0, :] / dr
                                     - _mu0 * jz[0, 0, :])
        )
        for m in range(1, nmodes):
            ez = ez.at[2 * m - 1, 0, :].set(0.0)
            ez = ez.at[2 * m, 0, :].set(0.0)
        # higher-mode off-axis -+ m Br/r terms
        for m in range(1, nmodes):
            rr = r_nod[1:][None, :, None][0]
            ez = ez.at[2 * m - 1, 1:, :].add(
                c2 * dt * (-m) * Br[2 * m, 1:, :] / rr
            )
            ez = ez.at[2 * m, 1:, :].add(
                c2 * dt * m * Br[2 * m - 1, 1:, :] / rr
            )

    if F is not None:
        # E += c^2 dt grad F (EvolveE.cpp Ffield block)
        er = er + c2 * dt * (F[:, 1:, :] - F[:, :-1, :]) * inv_dr
        ez = ez + c2 * dt * _dz_nod_to_cc(F, cfg) * inv_dz
        for m in range(1, nmodes):
            rr = jnp.where(r_nod == 0.0, 1.0, r_nod)[None, :, None][0]
            et = et.at[2 * m - 1].add(c2 * dt * m * F[2 * m] / rr)
            et = et.at[2 * m].add(c2 * dt * (-m) * F[2 * m - 1] / rr)
    return fields.replace(Ex=er, Ey=et, Ez=ez)


def apply_silver_mueller_rz(fields: FieldState, cfg, dt) -> FieldState:
    """First-order absorbing (Silver-Mueller) recurrence on the guard-cell
    B rings (ApplySilverMuellerBoundary.cpp RZ branch :57-175), applied
    once per step after the first half B push with full-dt coefficients
    (WarpXFieldBoundaries.cpp:133-146: "only applied on the first
    half-push of B").

      z walls:  Br_g <- c1z Br_g -/+ c2z Et_wall ; Bt_g <- c1z Bt_g +/- c2z Er_wall
      r=rmax:   Bt_g <- c1r Bt_g - c2r Ez_wall   ; Bz_g <- c1r Bz_g + (c2r - c3r/r_g) Et_wall

    The reference's coef3_r*UpwardDz(Er_guard) term in the Bt update and
    the m*Er_guard mode couplings in the Bz update read the r-guard Er,
    which EvolveE never writes (valid-box tileboxes) — it stays at its
    initial zero, so those terms vanish identically and are dropped here.
    """
    sm_zlo, sm_zhi, sm_rhi = _sm_bcs(cfg)
    smg = dict(fields.smg)
    dr, dz = cfg.geometry.dx
    cdt_dz = _c * dt / dz
    c1z = (1.0 - cdt_dz) / (1.0 + cdt_dz)
    c2z = 2.0 * cdt_dz / (1.0 + cdt_dz) / _c
    Er, Et, Ez = fields.Ex, fields.Ey, fields.Ez
    if sm_zhi:
        smg["br_zhi"] = c1z * smg["br_zhi"] - c2z * Et[:, :, -1]
        smg["bt_zhi"] = c1z * smg["bt_zhi"] + c2z * Er[:, :, -1]
    if sm_zlo:
        smg["br_zlo"] = c1z * smg["br_zlo"] + c2z * Et[:, :, 0]
        smg["bt_zlo"] = c1z * smg["bt_zlo"] - c2z * Er[:, :, 0]
    if sm_rhi:
        cdt_dr = _c * dt / dr
        c1r = (1.0 - cdt_dr) / (1.0 + cdt_dr)
        c2r = 2.0 * cdt_dr / (1.0 + cdt_dr) / _c
        c3r = _c * dt / (1.0 + cdt_dr) / _c
        nr = cfg.geometry.n_cell[0]
        r_g = cfg.geometry.prob_lo[0] + (nr + 0.5) * dr
        smg["bt_rhi"] = c1r * smg["bt_rhi"] - c2r * Ez[:, -1, :]
        smg["bz_rhi"] = (
            c1r * smg["bz_rhi"] + (c2r - c3r / r_g) * Et[:, -1, :]
        )
    return fields.replace(smg=smg)


def _sm_wall_e_fix(fields: FieldState, cfg, dt) -> FieldState:
    """Add the guard-B contributions that evolve_e_rz's zero-guard wall
    stencils dropped: the wall-node E updates read the innermost guard
    B values, which under Silver-Mueller live in fields.smg (the RZ
    analog of the E curl reaching the SM guard layer in EvolveE)."""
    sm_zlo, sm_zhi, sm_rhi = _sm_bcs(cfg)
    smg = fields.smg
    dr, dz = cfg.geometry.dx
    c2dt = _c * _c * dt
    er, et, ez = fields.Ex, fields.Ey, fields.Ez
    # z walls: Er += -c^2 dt dBt/dz, Et += +c^2 dt dBr/dz; the computed
    # wall derivative used guard=0
    if sm_zlo:
        er = er.at[:, :, 0].add(c2dt / dz * smg["bt_zlo"])
        et = et.at[:, :, 0].add(-c2dt / dz * smg["br_zlo"])
    if sm_zhi:
        er = er.at[:, :, -1].add(-c2dt / dz * smg["bt_zhi"])
        et = et.at[:, :, -1].add(c2dt / dz * smg["br_zhi"])
    if sm_rhi:
        # Et += -c^2 dt dBz/dr, Ez += c^2 dt (1/r) d(r Bt)/dr at row nr
        nr = cfg.geometry.n_cell[0]
        r_g = cfg.geometry.prob_lo[0] + (nr + 0.5) * dr
        r_w = _r_nodal(cfg)[-1]
        et = et.at[:, -1, :].add(-c2dt / dr * smg["bz_rhi"])
        ez = ez.at[:, -1, :].add(c2dt / dr * r_g * smg["bt_rhi"] / r_w)
    if cfg.geometry.prob_lo[0] == 0.0:
        # re-enforce the on-axis Et conditions (evolve_e_rz applied them
        # before the corrections perturbed the wall columns)
        cols = ([0] if sm_zlo else []) + ([-1] if sm_zhi else [])
        for zi in cols:
            et = et.at[0, 0, zi].set(0.0)
            for m in range(1, cfg.n_rz_modes):
                if m == 1:
                    et = et.at[2 * m - 1, 0, zi].set(er[2 * m, 0, zi])
                    et = et.at[2 * m, 0, zi].set(-er[2 * m - 1, 0, zi])
                else:
                    et = et.at[2 * m - 1, 0, zi].set(0.0)
                    et = et.at[2 * m, 0, zi].set(0.0)
    return fields.replace(Ex=er, Ey=et, Ez=ez)


def evolve_f_rz(F, fields: FieldState, rho, cfg, dt):
    """EvolveFCylindrical: dF/dt = divE - rho/eps0 (with 1/r terms)."""
    geom = cfg.geometry
    dr, dz = geom.dx
    inv_dr, inv_dz = 1.0 / dr, 1.0 / dz
    Er, Et, Ez = fields.Ex, fields.Ey, fields.Ez
    r_nod = _r_nodal(cfg)
    r_cc = _r_cc(cfg)
    on_axis = geom.prob_lo[0] == 0.0
    rEr = r_cc[None, :, None] * Er
    rer_ext = jnp.concatenate(
        [jnp.zeros_like(rEr[:, :1, :]), rEr, jnp.zeros_like(rEr[:, :1, :])],
        axis=1,
    )
    dr_rer = (rer_ext[:, 1:, :] - rer_ext[:, :-1, :]) * inv_dr
    r_div = jnp.where(r_nod == 0.0, 1.0, r_nod)[None, :, None]
    newF = F + dt * (-rho / _ep0 + dr_rer / r_div
                     + _dz_cc_to_nod(Ez, "Ez", cfg) * inv_dz)
    if on_axis:
        newF = newF.at[0, 0, :].set(
            F[0, 0, :] + dt * (
                -rho[0, 0, :] / _ep0 + 4.0 * Er[0, 0, :] / dr
                + (_dz_cc_to_nod(Ez, "Ez", cfg) * inv_dz)[0, 0, :]
            )
        )
        for m in range(1, cfg.n_rz_modes):
            newF = newF.at[2 * m - 1, 0, :].set(0.0)
            newF = newF.at[2 * m, 0, :].set(0.0)
    return newF


def enforce_walls_rz(fields: FieldState, cfg) -> FieldState:
    """Zero tangential-E / normal-B wall values at PEC faces (the RZ analog
    of SetEfieldOnPEC/SetBfieldOnPEC wall rules, WarpX_PEC.cpp:118-340).

    z walls (nodal index 0 / nz): Er, Et (tangential E) and Bz (normal B).
    r=rmax wall (nodal row nr): Et, Ez (tangential E) and Br (normal B)."""
    per, bc_lo, bc_hi = _z_bcs(cfg)
    upd = {}
    Er, Et, Ez = fields.Ex, fields.Ey, fields.Ez
    Br, Bt, Bz = fields.Bx, fields.By, fields.Bz
    if not per:
        if bc_lo == "pec":
            Er = Er.at[..., 0].set(0.0)
            Et = Et.at[..., 0].set(0.0)
            Bz = Bz.at[..., 0].set(0.0)
        if bc_hi == "pec":
            Er = Er.at[..., -1].set(0.0)
            Et = Et.at[..., -1].set(0.0)
            Bz = Bz.at[..., -1].set(0.0)
    bc_r_hi = (tuple(cfg.field_bc_hi or ()) + ("none", "periodic"))[0]
    if bc_r_hi == "pec":
        Et = Et.at[:, -1, :].set(0.0)
        Ez = Ez.at[:, -1, :].set(0.0)
        Br = Br.at[:, -1, :].set(0.0)
    upd.update(Ex=Er, Ey=Et, Ez=Ez, Bx=Br, By=Bt, Bz=Bz)
    return fields.replace(**upd)


# -------------------------------------------------------------------- step
def make_rz_step_fns(cfg, dtype):
    """(step, half_push) jitted functions for the RZ explicit EM loop.

    Handles bounded z (PEC walls), the moving window along z with
    continuous plasma injection (WarpXMovingWindow.cpp analog: fields roll
    by whole cells, the z origin rides in ``aux['window_lo']``) and laser
    antennas (prescribed spoke particles depositing J alongside)."""
    geom = cfg.geometry
    dt = cfg.dt
    order = cfg.particle_shape
    ng = order + 2
    nr, nz = geom.n_cell
    dr, dz = geom.dx
    per_z = geom.periodic[1]
    lasers = {l.name: l for l in cfg.lasers}
    is_laser = {sp.name: sp.injection_style == "laser" for sp in cfg.species}
    zext = geom.prob_hi[1] - geom.prob_lo[1]
    max_shift = (
        int(math.ceil(abs(cfg.moving_window_v) * _c * dt / dz)) + 1
        if cfg.do_moving_window else 0
    )
    any_sm = any(_sm_bcs(cfg))

    # embedded boundary (staircase level set, the RZ analog of the
    # Cartesian bounded path): covered-edge E and covered-face B stay
    # FROZEN at zero — the implicit function is sampled at each
    # component's staggered (r, z) point with (x=r, y=0)
    # (WarpXInitEB.cpp parser convention; phi > 0 is covered)
    eb_masks = None
    if cfg.eb_implicit_function:
        if cfg.do_moving_window:
            raise NotImplementedError("RZ embedded boundary with a moving "
                                      "window")
        if any(not is_laser[sp.name] for sp in cfg.species):
            raise NotImplementedError(
                "RZ embedded boundary with particles (EB scraping is "
                "implemented on the Cartesian bounded path only)"
            )
        from ..utils.expression import compile_expression

        _eb_fn = compile_expression(
            cfg.eb_implicit_function, ("x", "y", "z"),
            dict(cfg.user_constants or ()),
        )
        r_nodv = np.asarray(_r_nodal(cfg))
        r_ccv = np.asarray(_r_cc(cfg))
        # a component is frozen only when its WHOLE edge (E) / face (B)
        # is covered (the reference's Yee-EB skips the update when the
        # edge length / face area is zero — partially-cut edges keep the
        # full update on the staircase path); the edge/face extent per
        # component: Er r-edge, Et azimuthal point, Ez z-edge, Br
        # theta-z face, Bt r-z face, Bz r-theta face
        _extent = {"Er": ("r",), "Et": (), "Ez": ("z",),
                   "Br": ("z",), "Bt": ("r", "z"), "Bz": ("r",)}
        eb_masks = {}
        for nm, attr in (("Er", "Ex"), ("Et", "Ey"), ("Ez", "Ez"),
                         ("Br", "Bx"), ("Bt", "By"), ("Bz", "Bz")):
            fr, fz = rz_stagger(cfg, nm)
            rc = r_nodv if fr else r_ccv
            shp = field_shape(cfg, nm)
            zoff = 0.0 if fz else 0.5
            zc = geom.prob_lo[1] + (np.arange(shp[2]) + zoff) * dz
            rr, zz = np.meshgrid(rc, zc, indexing="ij")
            dr_off = ((-0.5 * dr, 0.0, 0.5 * dr)
                      if "r" in _extent[nm] else (0.0,))
            dz_off = ((-0.5 * dz, 0.0, 0.5 * dz)
                      if "z" in _extent[nm] else (0.0,))
            phi_min = None
            for ro in dr_off:
                for zo in dz_off:
                    p = np.asarray(
                        _eb_fn(rr + ro, np.zeros_like(rr), zz + zo)
                    )
                    phi_min = p if phi_min is None else np.minimum(
                        phi_min, p
                    )
            eb_masks[attr] = jnp.asarray((phi_min <= 0.0)[None, :, :])

    def apply_eb(fields):
        return fields.replace(**{
            attr: getattr(fields, attr) * m for attr, m in eb_masks.items()
        })

    def z_origin_of(state):
        if cfg.do_moving_window:
            return state.aux["window_lo"]
        return None

    def gather_all(state, pos3, z0):
        farr = {
            "Er": state.fields.Ex, "Et": state.fields.Ey,
            "Ez": state.fields.Ez, "Br": state.fields.Bx,
            "Bt": state.fields.By, "Bz": state.fields.Bz,
        }
        return gather_rz(pos3, farr, cfg, order, ng, z_origin=z0)

    def shift_z(arr, num_shift):
        n_val = arr.shape[-1]
        rolled = jnp.roll(arr, -num_shift, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
        return jnp.where(idx >= n_val - num_shift, 0.0, rolled)

    def continuous_injection(state, sp_cfg, sp, window_lo):
        """Inject plasma into newly uncovered whole cells at the window top
        (ContinuousInjection analog of rz_inject_species; random per-cell
        theta offsets fold the step into the RNG key)."""
        key = f"inject_pos:{sp_cfg.name}"
        cur_pos = state.aux[key]
        window_hi = window_lo + zext
        # (window_hi - cur_pos) is a whole number of cells for an at-rest
        # plasma (both move in dz quanta) — nudge the floor so float
        # accumulation error can't drop the newest column for a step
        new_pos = cur_pos + jnp.floor(
            (window_hi - cur_pos) / dz + 1e-9
        ) * dz

        ppc = sp_cfg.num_particles_per_cell_each_dim or (1, 1, 1)
        n_r, n_t, n_z = (tuple(ppc) + (1, 1, 1))[:3]
        ppc_tot = n_r * n_t * n_z
        K = max(2 * max_shift, 4)
        # candidate band: the top K z columns of the current window
        col = jnp.arange(nz - K, nz)
        zcol = window_lo + col.astype(dtype) * dz
        ir, icol, a, t, b = jnp.meshgrid(
            jnp.arange(nr), jnp.arange(K), jnp.arange(n_r),
            jnp.arange(n_t), jnp.arange(n_z), indexing="ij",
        )
        r = (geom.prob_lo[0] + (ir + (a + 0.5) / n_r) * dr).astype(dtype)
        z = zcol[icol] + ((b + 0.5) / n_z) * dz
        theta = 2.0 * jnp.pi * (t + 0.5) / n_t
        if sp_cfg.random_theta:
            key_th = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step),
                abs(hash(sp_cfg.name + ":theta")) % (2**31),
            )
            off = jax.random.uniform(
                key_th, (nr, K, 1, 1, 1), dtype,
                maxval=2.0 * jnp.pi,
            )
            theta = theta + off
        theta = jnp.broadcast_to(theta, r.shape)
        npart = nr * K * ppc_tot
        r, z, theta = (q.reshape(npart) for q in (r, z, theta))
        x = r * jnp.cos(theta)
        y = r * jnp.sin(theta)

        sel = (z > cur_pos) & (z < new_pos)
        lo = sp_cfg.bounds_lo or (-np.inf, -np.inf)
        hi = sp_cfg.bounds_hi or (np.inf, np.inf)
        sel &= (r >= lo[0]) & (r <= hi[0]) & (z >= lo[1]) & (z <= hi[1])

        if sp_cfg.profile == "constant":
            dens = jnp.full(npart, sp_cfg.density, dtype)
        else:
            from ..utils.expression import compile_expression

            fn = compile_expression(
                sp_cfg.density_expr, ["x", "y", "z"],
                dict(sp_cfg.user_constants),
            )
            dens = jnp.asarray(fn(x, y, z), dtype)
        w_new = jnp.where(
            sel, dens * (dr * dz / ppc_tot) * 2.0 * jnp.pi * r, 0.0
        )
        sel &= w_new > 0

        md = sp_cfg.momentum_distribution
        if md in ("at_rest", "none"):
            u_new = [jnp.zeros(npart, dtype)] * 3
        elif md == "constant":
            u_new = [jnp.full(npart, v * _c, dtype)
                     for v in (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)]
        elif md == "gaussian":
            key_u = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step),
                abs(hash(sp_cfg.name + ":u")) % (2**31),
            )
            ks = jax.random.split(key_u, 3)
            u_new = [
                (mu + (th or 0.0) * jax.random.normal(k, (npart,), dtype))
                * _c
                for mu, th, k in zip(
                    (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz),
                    (sp_cfg.ux_th, sp_cfg.uy_th, sp_cfg.uz_th), ks)
            ]
        else:
            raise NotImplementedError(
                f"RZ continuous injection with {md}"
            )

        # raw injection theta, as at initial injection
        # (PhysicalParticleContainer.cpp:1301); the push rewrites to atan2
        extra_new = {"theta": theta}
        if sp_cfg.attributes:
            from ..utils.expression import compile_expression

            for (aname, expr, is_int) in sp_cfg.attributes:
                fn = compile_expression(
                    expr, ["x", "y", "z", "ux", "uy", "uz", "t"],
                    dict(sp_cfg.user_constants),
                )
                val = jnp.broadcast_to(
                    jnp.asarray(
                        fn(x, y, z, u_new[0], u_new[1], u_new[2],
                           state.time), dtype
                    ), (npart,)
                )
                extra_new[aname] = (
                    jnp.round(val).astype(jnp.int32) if is_int else val
                )

        cap = sp.capacity
        free_idx = jnp.nonzero(~sp.alive, size=npart, fill_value=cap)[0]
        rank = jnp.cumsum(sel) - 1
        slot = free_idx[jnp.clip(rank, 0, npart - 1)]
        placeable = sel & (slot < cap)
        tgt = jnp.where(placeable, slot, cap)

        def put(arr, vals):
            return arr.at[tgt].set(jnp.asarray(vals, arr.dtype),
                                   mode="drop")

        sp = sp.replace(
            w=put(sp.w, w_new),
            ux=put(sp.ux, u_new[0]),
            uy=put(sp.uy, u_new[1]),
            uz=put(sp.uz, u_new[2]),
            alive=sp.alive.at[tgt].set(True, mode="drop"),
            x=put(sp.x, x), y=put(sp.y, y), z=put(sp.z, z),
        )
        extra = dict(sp.extra)
        for aname, vals in extra_new.items():
            if aname in extra:
                extra[aname] = put(extra[aname], vals)
        sp = sp.replace(extra=extra)
        aux = dict(state.aux)
        aux[key] = new_pos
        return state.replace(aux=aux), sp

    def step_window(state: SimState) -> SimState:
        if not cfg.do_moving_window:
            return state
        aux = dict(state.aux)
        v = cfg.moving_window_v * _c
        window_x = aux["window_x"] + v * dt
        num_shift = jnp.floor(
            (window_x - aux["window_lo"]) / dz
        ).astype(jnp.int32)
        num_shift = jnp.clip(num_shift, 0, max_shift)
        aux["window_x"] = window_x
        shift_len = num_shift.astype(dtype) * dz
        aux["window_lo"] = aux["window_lo"] + shift_len

        f = state.fields
        upd = {
            nm: shift_z(getattr(f, nm), num_shift)
            for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
        }
        if f.F is not None:
            upd["F"] = shift_z(f.F, num_shift)
        if f.smg is not None:
            # the z-resolved r-wall guard rings ride the window like any
            # field row; the z-wall rings (beyond the shifted wall) reset
            # to the zero incoming-vacuum state on shift steps
            smg = dict(f.smg)
            for k in ("bt_rhi", "bz_rhi"):
                if k in smg:
                    smg[k] = shift_z(smg[k], num_shift)
            shifted = num_shift > 0
            for k in ("br_zlo", "bt_zlo", "br_zhi", "bt_zhi"):
                if k in smg:
                    smg[k] = jnp.where(shifted, 0.0, smg[k])
            upd["smg"] = smg
        state = state.replace(fields=f.replace(**upd), aux=aux)

        new_species = dict(state.species)
        for sp_cfg in cfg.species:
            if not sp_cfg.do_continuous_injection or is_laser[sp_cfg.name]:
                continue
            state, sp = continuous_injection(
                state, sp_cfg, new_species[sp_cfg.name],
                state.aux["window_lo"],
            )
            new_species[sp_cfg.name] = sp
        return state.replace(species=new_species)

    def step(state: SimState) -> SimState:
        z0 = z_origin_of(state)
        zlo = z0 if z0 is not None else geom.prob_lo[1]
        zhi = zlo + zext
        need_rho = cfg.do_dive_cleaning
        rho_old = rho_new = None
        if need_rho:
            rho_old = jnp.zeros(field_shape(cfg, "rho"), dtype)
            rho_new = jnp.zeros(field_shape(cfg, "rho"), dtype)
        j3 = None
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            pos3 = (sp.x, sp.y, sp.z)
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            if (need_rho and not sp_cfg.do_not_deposit
                    and not is_laser[sp_cfg.name]):
                rho_old = rho_old + deposit_rho_rz(
                    pos3, w_eff, sp_cfg.charge, cfg, order, ng, dtype,
                    z_origin=z0,
                )
            if is_laser[sp_cfg.name]:
                laser = lasers[sp_cfg.name]
                sp_new = update_antenna_rz(
                    sp, laser, 0.05 / laser.e_max, state.time, dt
                )
                ux, uy, uz = sp_new.ux, sp_new.uy, sp_new.uz
                xn, yn, zn = sp_new.x, sp_new.y, sp_new.z
            else:
                e6 = gather_all(state, pos3, z0)
                pusher = PUSHERS[sp_cfg.pusher]
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass,
                    dt,
                )
                gi = 1.0 / jnp.sqrt(
                    1.0 + (ux * ux + uy * uy + uz * uz) / (_c * _c)
                )
                xn = sp.x + ux * gi * dt
                yn = sp.y + uy * gi * dt
                zn = sp.z + uz * gi * dt
            if per_z:
                zn = zlo + jnp.mod(zn - zlo, zext)
                in_z = True
            else:
                in_z = (zn > zlo) & (zn < zhi)
            rnew = jnp.sqrt(xn * xn + yn * yn)
            alive = sp.alive & (rnew < geom.prob_hi[0]) & in_z
            w_dep = jnp.where(sp.alive, sp.w, 0.0)
            if not sp_cfg.do_not_deposit:
                jr, jt, jz = deposit_current_rz(
                    (xn, yn, zn), ux, uy, uz, w_dep, sp_cfg.charge, cfg,
                    dt, order, ng, dtype, z_origin=z0,
                )
                j3 = (jr, jt, jz) if j3 is None else (
                    j3[0] + jr, j3[1] + jt, j3[2] + jz
                )
            if (need_rho and not sp_cfg.do_not_deposit
                    and not is_laser[sp_cfg.name]):
                w_al = jnp.where(alive, sp.w, 0.0)
                rho_new = rho_new + deposit_rho_rz(
                    (xn, yn, zn), w_al, sp_cfg.charge, cfg, order, ng,
                    dtype, z_origin=z0,
                )
            sp_out = sp.replace(
                x=xn, y=yn, z=zn, ux=ux, uy=uy, uz=uz, alive=alive,
                w=jnp.where(alive, sp.w, 0.0),
            )
            if "theta" in sp.extra:
                # SetParticlePosition stores theta = atan2(y, x) after
                # every push (GetAndSetPosition.H:213) — laser antenna
                # particles included (LaserParticleContainer uses the same
                # SetParticlePosition path)
                extra = dict(sp_out.extra)
                extra["theta"] = jnp.where(
                    sp.alive, jnp.arctan2(yn, xn), extra["theta"]
                )
                sp_out = sp_out.replace(extra=extra)
            new_species[sp_cfg.name] = sp_out
        if j3 is None:
            j3 = (
                jnp.zeros(field_shape(cfg, "jr"), dtype),
                jnp.zeros(field_shape(cfg, "jt"), dtype),
                jnp.zeros(field_shape(cfg, "jz"), dtype),
            )
        if cfg.use_filter:
            from .spectral import bilinear_filter_rz

            npe = tuple(cfg.filter_npass_each_dir or (1, 1))
            j3 = tuple(
                bilinear_filter_rz(a, nm, cfg, npass_each=npe)
                for a, nm in zip(j3, ("jr", "jt", "jz"))
            )
            if need_rho:
                rho_old = bilinear_filter_rz(rho_old, "rho", cfg,
                                             npass_each=npe)
                rho_new = bilinear_filter_rz(rho_new, "rho", cfg,
                                             npass_each=npe)
        fields = state.fields.replace(jx=j3[0], jy=j3[1], jz=j3[2])
        F = fields.F
        if need_rho:
            F = evolve_f_rz(F, fields, rho_old, cfg, 0.5 * dt)
        fields = evolve_b_rz(fields, cfg, 0.5 * dt)
        if eb_masks is not None:
            fields = apply_eb(fields)
        if any_sm:
            # guard-B recurrence once per step, full-dt coefficients
            fields = apply_silver_mueller_rz(fields, cfg, dt)
        fields = evolve_e_rz(fields, cfg, dt, F=F)
        if any_sm:
            fields = _sm_wall_e_fix(fields, cfg, dt)
        if eb_masks is not None:
            fields = apply_eb(fields)
        if need_rho:
            F = evolve_f_rz(F, fields, rho_new, cfg, 0.5 * dt)
        fields = evolve_b_rz(fields, cfg, 0.5 * dt)
        if eb_masks is not None:
            fields = apply_eb(fields)
        fields = fields.replace(F=F)
        if not per_z:
            fields = enforce_walls_rz(fields, cfg)
        state = state.replace(
            fields=fields, species=new_species, step=state.step + 1,
            time=state.time + dt,
        )
        return step_window(state)

    def half_push(state: SimState, dt_half) -> SimState:
        new_species = {}
        z0 = z_origin_of(state)
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if is_laser[sp_cfg.name] or sp_cfg.mass == 0.0:
                new_species[sp_cfg.name] = sp
                continue
            e6 = gather_all(state, (sp.x, sp.y, sp.z), z0)
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass,
                dt_half,
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    return jax.jit(step), jax.jit(half_push, static_argnames=("dt_half",))


# ------------------------------------------------------------- diagnostics
_RZ_MODE_BASE = {"Er": "Er", "Et": "Etheta", "Ez": "Ez",
                 "Br": "Br", "Bt": "Btheta", "Bz": "Bz",
                 "jr": "Jr", "jt": "Jtheta", "jz": "Jz", "rho": "rho"}


def _rz_center(a, name, cfg):
    """Average a (nr?, nz?) mode slice to cell centers."""
    fr, fz = rz_stagger(cfg, name)
    if fr == 1:
        a = 0.5 * (a[1:, :] + a[:-1, :])
    if fz == 1:
        if cfg.geometry.periodic[1]:
            a = 0.5 * (a + jnp.roll(a, -1, axis=1))
        else:  # bounded: nz+1 valid nodal values
            a = 0.5 * (a[:, 1:] + a[:, :-1])
    return a


def rz_diag_rho(state: SimState, cfg, ng=None) -> jnp.ndarray:
    """Mode rho deposited from the live species (the rho compute functor).

    PSATD stores every component cell-centered, so the diag deposit uses
    the spectral path's cell-centered deposit; FDTD uses the (r,z)-nodal
    deposit matching field_shape(cfg, 'rho')."""
    order = cfg.particle_shape
    ng = ng if ng is not None else order + 2
    z0 = state.aux.get("window_lo") if cfg.do_moving_window else None
    rho = jnp.zeros(field_shape(cfg, "rho"),
                    state.fields.Ex.dtype)
    if cfg.em_solver == "psatd":
        from .spectral import deposit_cc_rz

        def _dep(pos3, w_eff, q):
            return deposit_cc_rz(pos3, w_eff, q, cfg, order, ng,
                                 rho.dtype, z_origin=z0)
    else:
        def _dep(pos3, w_eff, q):
            return deposit_rho_rz(pos3, w_eff, q, cfg, order, ng,
                                  rho.dtype, z_origin=z0)
    for sp_cfg in cfg.species:
        # laser antennas ARE included: MultiParticleContainer holds lasers
        # in allcontainers (MultiParticleContainer.cpp:119) so
        # GetChargeDensity sums their +/- weight pairs (a net dipole once
        # the prescribed motion separates the pair)
        if sp_cfg.do_not_deposit:
            continue
        sp = state.species[sp_cfg.name]
        w_eff = jnp.where(sp.alive, sp.w, 0.0)
        rho = rho + _dep((sp.x, sp.y, sp.z), w_eff, sp_cfg.charge)
    if cfg.use_filter:
        # RhoFunctor filters the diag rho like the deposition path does:
        # ApplyFilterandSumBoundaryRho (bilinear) and, under RZ PSATD, the
        # k-space binomial filter (RhoFunctor.cpp:61-74) — realized here by
        # the same binomial filter the J deposit uses
        from .spectral import bilinear_filter_rz

        npass = max(cfg.filter_npass_each_dir or (1,))
        rho = bilinear_filter_rz(rho, "rho", cfg, npass)
    return rho


def rz_cell_centered_output(state: SimState, cfg) -> Dict[str, jnp.ndarray]:
    """Cell-centered (nr, nz) fields at theta = 0 (mode sum with e^{i m 0}),
    plus per-mode real/imag components (diag dump_rz_modes naming:
    Er_0_real, Etheta_1_imag, ...) and deposited rho, mirroring the RZ
    plotfile layout the reference checksums read."""
    out = {}
    quans = [
        ("Er", state.fields.Ex), ("Et", state.fields.Ey),
        ("Ez", state.fields.Ez), ("Br", state.fields.Bx),
        ("Bt", state.fields.By), ("Bz", state.fields.Bz),
        ("jr", state.fields.jx), ("jt", state.fields.jy),
        ("jz", state.fields.jz),
        ("rho", rz_diag_rho(state, cfg)),
    ]
    for name, arr in quans:
        a = arr[0] + sum(arr[2 * m - 1] for m in range(1, cfg.n_rz_modes))
        out[name] = _rz_center(a, name, cfg)
        base = _RZ_MODE_BASE[name]
        out[f"{base}_0_real"] = _rz_center(arr[0], name, cfg)
        for m in range(1, cfg.n_rz_modes):
            out[f"{base}_{m}_real"] = _rz_center(arr[2 * m - 1], name, cfg)
            out[f"{base}_{m}_imag"] = _rz_center(arr[2 * m], name, cfg)
    if cfg.em_solver == "psatd":
        from .spectral import rz_spectral_aux_fields

        for name, arr in rz_spectral_aux_fields(state, cfg).items():
            out[name] = arr[0] + sum(
                arr[2 * m - 1] for m in range(1, cfg.n_rz_modes)
            )
    return out


def rz_checksums(state: SimState, cfg) -> Dict[str, Dict[str, float]]:
    """sum(|Q|) per quantity, matching the reference checksum vocabulary
    (Regression/Checksum/checksum.py: plotfile fields + particle arrays)."""
    out = {"lev=0": {}}
    for k, v in rz_cell_centered_output(state, cfg).items():
        out["lev=0"][k] = float(jnp.sum(jnp.abs(v)))
    for sp_cfg in cfg.species:
        if sp_cfg.injection_style == "laser":
            continue
        sp = state.species[sp_cfg.name]
        m = sp_cfg.mass
        alive = sp.alive
        r = jnp.sqrt(sp.x**2 + sp.y**2)
        theta = sp.extra.get("theta")
        if theta is None:
            theta = jnp.arctan2(sp.y, sp.x)
        qd = {
            "particle_momentum_x": jnp.abs(m * sp.ux),
            "particle_momentum_y": jnp.abs(m * sp.uy),
            "particle_momentum_z": jnp.abs(m * sp.uz),
            "particle_position_x": jnp.abs(r),
            "particle_position_y": jnp.abs(sp.z),
            "particle_theta": jnp.abs(theta),
            "particle_weight": jnp.abs(sp.w),
        }
        for aname, arr in sp.extra.items():
            if aname != "theta":
                qd[f"particle_{aname}"] = jnp.abs(arr)
        out[sp_cfg.name] = {
            k: float(jnp.sum(jnp.where(alive, v, 0.0))) for k, v in qd.items()
        }
    return out
