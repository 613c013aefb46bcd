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


def field_shape(cfg, name):
    nr, nz, ncomp = _shape(cfg)
    fr = rz_stagger(cfg, name)[0]
    return (ncomp, nr + 1 if fr else nr, nz)


def rz_zero_fields(cfg, dtype) -> FieldState:
    """FieldState with RZ layouts; Cartesian names map r->x, t->y."""
    z = lambda nm: jnp.zeros(field_shape(cfg, nm), dtype)  # noqa: E731
    return FieldState(
        Ex=z("Er"), Ey=z("Et"), Ez=z("Ez"),
        Bx=z("Br"), By=z("Bt"), Bz=z("Bz"),
        jx=z("jr"), jy=z("jt"), jz=z("jz"),
        F=z("F") if cfg.do_dive_cleaning else None,
    )


# --------------------------------------------------------------- injection
def rz_inject_species(sp_cfg, cfg, np_dtype, rng):
    """NUniformPerCell in RZ (PhysicalParticleContainer.cpp:1120-1305):
    per cell (ir, iz) place (n_r x n_theta x n_z) particles; theta is
    deterministic 2*pi*(it+0.5)/n_theta (random_theta is an RNG detail of
    the reference; physics gates do not depend on it); weight =
    density * (dr*dz/ppc) * 2*pi*r (radially weighted)."""
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
    return ParticleState(
        w=w,
        ux=np.where(alive, u3[0], 0.0).astype(np_dtype),
        uy=np.where(alive, u3[1], 0.0).astype(np_dtype),
        uz=np.where(alive, u3[2], 0.0).astype(np_dtype),
        alive=alive,
        x=x, y=y, z=z,
    )


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

    out = {}
    for name in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
        fr, fz = rz_stagger(cfg, name)
        arr = _extend_axis(farr[name], name, ng, farr[name].shape[1],
                           nodal_r=(fr == 1))
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
                zidx = jnp.mod(k0 + b, nz)
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


def deposit_rho_rz(pos3, w, q, cfg, order, ng, dtype):
    """Nodal rho, all azimuthal modes (ChargeDeposition.H RZ: factor
    2 e^{i m theta} per mode) with ring-volume scaling."""
    geom = cfg.geometry
    dr, dz = geom.dx
    rmin, zmin = geom.prob_lo
    nr, nz = geom.n_cell
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
    ext = jnp.zeros((ncomp, nr + 1 + 2 * ng, nz), dtype)
    wq = (q / (dr * dz)) * w
    for a, wa in enumerate(wr):
        ridx = jnp.clip(i0 + a + ng, 0, ext.shape[1] - 1)
        for b, wb in enumerate(wz):
            zidx = jnp.mod(k0 + b, nz)
            val = wq * wa * wb
            ext = ext.at[0].set(_scatter_rz(ext[0], ridx, zidx, val))
            for m in range(1, nmodes):
                pc, ps = phases[m]
                ext = ext.at[2 * m - 1].set(_scatter_rz(
                    ext[2 * m - 1], ridx, zidx, 2.0 * val * pc))
                ext = ext.at[2 * m].set(_scatter_rz(
                    ext[2 * m], ridx, zidx, 2.0 * val * ps))
    return _fold_and_scale_modes(ext, "rho", cfg, ng, "rho")


def deposit_current_rz(pos_new3, ux, uy, uz, w, q, cfg, dt, order, ng,
                       dtype):
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
    nr, nz = geom.n_cell
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

    ext_r = jnp.zeros((ncomp, nr + 2 * ng, nz), dtype)
    ext_t = jnp.zeros((ncomp, nr + 1 + 2 * ng, nz), dtype)
    ext_z = jnp.zeros((ncomp, nr + 1 + 2 * ng, nz), dtype)

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
            zidx = jnp.mod(k0 + b, nz)
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
    br = Br + dt * _dz_up(Et) * inv_dz
    if on_axis:
        br = br.at[0, 0, :].set(0.0)
        for m in range(1, cfg.n_rz_modes):
            if m == 1:
                dEtz = _dz_up(Et) * inv_dz
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
        (Ez[:, 1:, :] - Ez[:, :-1, :]) * inv_dr - _dz_up(Er) * inv_dz
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
    er = Er + c2 * dt * (-_dz_dn(Bt) * inv_dz - _mu0 * jr)
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
    et = Et + c2 * dt * (-dBz_dr + _dz_dn(Br) * inv_dz - _mu0 * jt)
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
        ez = ez + c2 * dt * _dz_up(F) * inv_dz
        for m in range(1, nmodes):
            rr = jnp.where(r_nod == 0.0, 1.0, r_nod)[None, :, None][0]
            et = et.at[2 * m - 1].add(c2 * dt * m * F[2 * m] / rr)
            et = et.at[2 * m].add(c2 * dt * (-m) * F[2 * m - 1] / rr)
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
    newF = F + dt * (-rho / _ep0 + dr_rer / r_div + _dz_dn(Ez) * inv_dz)
    if on_axis:
        newF = newF.at[0, 0, :].set(
            F[0, 0, :] + dt * (
                -rho[0, 0, :] / _ep0 + 4.0 * Er[0, 0, :] / dr
                + (_dz_dn(Ez) * inv_dz)[0, 0, :]
            )
        )
        for m in range(1, cfg.n_rz_modes):
            newF = newF.at[2 * m - 1, 0, :].set(0.0)
            newF = newF.at[2 * m, 0, :].set(0.0)
    return newF


# -------------------------------------------------------------------- step
def make_rz_step_fns(cfg, dtype):
    """(step, half_push) jitted functions for the RZ explicit EM loop."""
    geom = cfg.geometry
    dt = cfg.dt
    order = cfg.particle_shape
    ng = order + 2

    def gather_all(state, pos3):
        farr = {
            "Er": state.fields.Ex, "Et": state.fields.Ey,
            "Ez": state.fields.Ez, "Br": state.fields.Bx,
            "Bt": state.fields.By, "Bz": state.fields.Bz,
        }
        return gather_rz(pos3, farr, cfg, order, ng)

    def step(state: SimState) -> SimState:
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
            if need_rho and not sp_cfg.do_not_deposit:
                rho_old = rho_old + deposit_rho_rz(
                    pos3, w_eff, sp_cfg.charge, cfg, order, ng, dtype
                )
            e6 = gather_all(state, pos3)
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass, dt
            )
            gi = 1.0 / jnp.sqrt(
                1.0 + (ux * ux + uy * uy + uz * uz) / (_c * _c)
            )
            xn = sp.x + ux * gi * dt
            yn = sp.y + uy * gi * dt
            zn = sp.z + uz * gi * dt
            # z periodic wrap; r boundary: absorb beyond rmax
            zlo, zhi = geom.prob_lo[1], geom.prob_hi[1]
            zn = zlo + jnp.mod(zn - zlo, zhi - zlo)
            rnew = jnp.sqrt(xn * xn + yn * yn)
            alive = sp.alive & (rnew < geom.prob_hi[0])
            w_dep = jnp.where(sp.alive, sp.w, 0.0)
            if not sp_cfg.do_not_deposit:
                jr, jt, jz = deposit_current_rz(
                    (xn, yn, zn), ux, uy, uz, w_dep, sp_cfg.charge, cfg,
                    dt, order, ng, dtype,
                )
                j3 = (jr, jt, jz) if j3 is None else (
                    j3[0] + jr, j3[1] + jt, j3[2] + jz
                )
            if need_rho and not sp_cfg.do_not_deposit:
                w_al = jnp.where(alive, sp.w, 0.0)
                rho_new = rho_new + deposit_rho_rz(
                    (xn, yn, zn), w_al, sp_cfg.charge, cfg, order, ng,
                    dtype,
                )
            new_species[sp_cfg.name] = sp.replace(
                x=xn, y=yn, z=zn, ux=ux, uy=uy, uz=uz, alive=alive,
                w=jnp.where(alive, sp.w, 0.0),
            )
        if j3 is None:
            j3 = (
                jnp.zeros(field_shape(cfg, "jr"), dtype),
                jnp.zeros(field_shape(cfg, "jt"), dtype),
                jnp.zeros(field_shape(cfg, "jz"), dtype),
            )
        if cfg.use_filter:
            from .spectral import bilinear_filter_rz

            npass = max(cfg.filter_npass_each_dir or (1,))
            j3 = tuple(
                bilinear_filter_rz(a, nm, cfg, npass)
                for a, nm in zip(j3, ("jr", "jt", "jz"))
            )
            if need_rho:
                rho_old = bilinear_filter_rz(rho_old, "rho", cfg, npass)
                rho_new = bilinear_filter_rz(rho_new, "rho", cfg, npass)
        fields = state.fields.replace(jx=j3[0], jy=j3[1], jz=j3[2])
        F = fields.F
        if need_rho:
            F = evolve_f_rz(F, fields, rho_old, cfg, 0.5 * dt)
        fields = evolve_b_rz(fields, cfg, 0.5 * dt)
        fields = evolve_e_rz(fields, cfg, dt, F=F)
        if need_rho:
            F = evolve_f_rz(F, fields, rho_new, cfg, 0.5 * dt)
        fields = evolve_b_rz(fields, cfg, 0.5 * dt)
        fields = fields.replace(F=F)
        return state.replace(
            fields=fields, species=new_species, step=state.step + 1,
            time=state.time + dt,
        )

    def half_push(state: SimState, dt_half) -> SimState:
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            e6 = gather_all(state, (sp.x, sp.y, sp.z))
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass,
                dt_half,
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    return jax.jit(step), jax.jit(half_push, static_argnames=("dt_half",))


# ------------------------------------------------------------- diagnostics
def rz_cell_centered_output(state: SimState, cfg) -> Dict[str, jnp.ndarray]:
    """Cell-centered (nr, nz) fields at theta = 0 (mode sum with e^{i m 0}),
    mirroring the RZ plotfile layout the reference checksums read."""
    out = {}
    for name, arr in (
        ("Er", state.fields.Ex), ("Et", state.fields.Ey),
        ("Ez", state.fields.Ez), ("Br", state.fields.Bx),
        ("Bt", state.fields.By), ("Bz", state.fields.Bz),
        ("jr", state.fields.jx), ("jt", state.fields.jy),
        ("jz", state.fields.jz),
    ):
        fr, fz = rz_stagger(cfg, name)
        a = arr[0] + sum(arr[2 * m - 1] for m in range(1, cfg.n_rz_modes))
        if fr == 1:  # nodal in r -> average to cc
            a = 0.5 * (a[1:, :] + a[:-1, :])
        if fz == 1:  # nodal in periodic z
            a = 0.5 * (a + jnp.roll(a, -1, axis=1))
        out[name] = a
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
        sp = state.species[sp_cfg.name]
        m = sp_cfg.mass
        alive = sp.alive
        r = jnp.sqrt(sp.x**2 + sp.y**2)
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
        out[sp_cfg.name] = {
            k: float(jnp.sum(jnp.where(alive, v, 0.0))) for k, v in qd.items()
        }
    return out
