#!/usr/bin/env python
"""Independent minimal numpy implementation of the 2D Galilean PSATD PIC loop.

Transcribed fresh from the reference equations
(PsatdAlgorithmJConstantInTime.cpp:228-300,437-515; direct deposition at
relative_time=-dt/2, CurrentDeposition.H:102; ShiftGalileanBoundary origin
drift) for the cold matched-drift configuration.  Purpose: decide whether the
scheme as-understood is stable (then diff framework vs this loop) or my
structural reading of the reference is wrong.

Collocated nodes, infinite order, CIC (order 1), Boris push, no filter,
update_with_rho=1, periodic 2D (x,z).
"""

import numpy as np

c = 299792458.0
ep0 = 8.8541878128e-12
q_e = 1.602176634e-19
m_e = 9.1093837015e-31

# --- configuration (mirrors the reduced probe deck) ---
n = 64
L = 77.36
dx = dz = L / n
gamma0 = 10.0
uzm = -np.sqrt(gamma0**2 - 1.0)  # gamma*beta (units of c)
vg = uzm / gamma0 * c            # galilean velocity = drift velocity
dens = 282197938148984.7
dt = dz / c                       # cfl = 1
steps = 180

rng = np.random.default_rng(0)

# --- particles: 2x2 per cell lattice, electrons + ions ---


def make_particles():
    ii, jj, ss, tt = np.meshgrid(
        np.arange(n), np.arange(n), (0.25, 0.75), (0.25, 0.75),
        indexing="ij",
    )
    x = (ii + ss).ravel() * dx - L / 2
    z = (jj + tt).ravel() * dz - L / 2
    w = np.full(x.size, dens * dx * dz / 4.0)
    uz = np.full(x.size, uzm * c)  # proper velocity [m/s]
    ux = np.zeros_like(uz)
    uy = np.zeros_like(uz)
    return [x, z, ux, uy, uz, w]


ele = make_particles()
ion = make_particles()
m_i = 5.0 * m_e  # deck: ions are light (see inputs_base_2d ions.mass)
ele[4] += 1e-6 * c * rng.standard_normal(ele[4].size)  # seed

# --- k-space setup ---
kx = 2 * np.pi * np.fft.fftfreq(n, dx)
kz = 2 * np.pi * np.fft.fftfreq(n, dz)
KX, KZ = np.meshgrid(kx, kz, indexing="ij")
w_c = KZ * vg
om = c * np.sqrt(KX**2 + KZ**2)
om2 = om * om
C = np.cos(om * dt)
S_ck = np.where(om != 0, np.sin(om * dt) / np.where(om == 0, 1, om), dt)
theta = np.exp(1j * w_c * dt * 0.5)
theta_star = np.conj(theta)
T2 = theta * theta
om2_m_w2 = om2 - w_c**2
nz = (om != 0) | (w_c != 0)
X1 = np.where(
    nz,
    (1.0 - T2 * C + 1j * w_c * T2 * S_ck)
    / (ep0 * np.where(om2_m_w2 == 0, 1, om2_m_w2)),
    0.5 * dt * dt / ep0,
)
tmp = np.where(om != 0, (1 - C) / (ep0 * np.where(om2 == 0, 1, om2)),
               0.5 * dt * dt / ep0)
dth = np.where(theta_star - theta == 0, 1, theta_star - theta)
wnz = w_c != 0
c2 = c * c
X2 = np.where(
    wnz, c2 * (theta_star * X1 - theta * tmp) / dth,
    np.where(om != 0, c2 * (dt - S_ck) / (ep0 * dt * np.where(om2 == 0, 1, om2)),
             c2 * dt * dt / (6 * ep0)),
)
X3 = np.where(
    wnz, c2 * (theta_star * X1 - theta_star * tmp) / dth,
    np.where(om != 0, c2 * (dt * C - S_ck) / (ep0 * dt * np.where(om2 == 0, 1, om2)),
             -c2 * dt * dt / (3 * ep0)),
)
X4 = 1j * w_c * X1 - T2 * S_ck / ep0


def cic(xg, zg, vals):
    """CIC deposit of vals at grid coords (xg, zg) onto (n, n), periodic."""
    i0 = np.floor(xg).astype(int)
    j0 = np.floor(zg).astype(int)
    fx = xg - i0
    fz = zg - j0
    out = np.zeros((n, n))
    for di, wxi in ((0, 1 - fx), (1, fx)):
        for dj, wzi in ((0, 1 - fz), (1, fz)):
            np.add.at(out, ((i0 + di) % n, (j0 + dj) % n), vals * wxi * wzi)
    return out


def cic_gather(field, xg, zg):
    i0 = np.floor(xg).astype(int)
    j0 = np.floor(zg).astype(int)
    fx = xg - i0
    fz = zg - j0
    out = np.zeros_like(xg)
    for di, wxi in ((0, 1 - fx), (1, fx)):
        for dj, wzi in ((0, 1 - fz), (1, fz)):
            out += field[(i0 + di) % n, (j0 + dj) % n] * wxi * wzi
    return out


def boris(ux, uy, uz, ex, ey, ez, bx, by, bz, q, m):
    qmdt2 = q * dt / (2 * m)
    uxm = ux + qmdt2 * ex
    uym = uy + qmdt2 * ey
    uzm_ = uz + qmdt2 * ez
    ginv = 1.0 / np.sqrt(1 + (uxm**2 + uym**2 + uzm_**2) / c2)
    tx, ty, tz = qmdt2 * ginv * bx, qmdt2 * ginv * by, qmdt2 * ginv * bz
    tsq = tx**2 + ty**2 + tz**2
    sx, sy, sz = 2 * tx / (1 + tsq), 2 * ty / (1 + tsq), 2 * tz / (1 + tsq)
    upx = uxm + (uym * tz - uzm_ * ty)
    upy = uym + (uzm_ * tx - uxm * tz)
    upz = uzm_ + (uxm * ty - uym * tx)
    uxp = uxm + (upy * sz - upz * sy) + qmdt2 * ex
    uyp = uym + (upz * sx - upx * sz) + qmdt2 * ey
    uzp = uzm_ + (upx * sy - upy * sx) + qmdt2 * ez
    return uxp, uyp, uzp


F = {k: np.zeros((n, n)) for k in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")}
t = 0.0
lo_x = -L / 2


def step(t, F, species):
    o_z = -L / 2 + vg * t   # drifting z origin (ShiftGalileanBoundary)
    rho_old = np.zeros((n, n))
    rho_new = np.zeros((n, n))
    J = [np.zeros((n, n)) for _ in range(3)]
    dV = dx * dz
    for sp, (q, m) in zip(species, ((-q_e, m_e), (q_e, m_i))):
        x, z, ux, uy, uz, w = sp
        xg = (x - lo_x) / dx
        zg = (z - o_z) / dz
        rho_old += cic(xg, zg, q * w / dV)
        e6 = [cic_gather(F[kk], xg, zg) for kk in
              ("Ex", "Ey", "Ez", "Bx", "By", "Bz")]
        ux, uy, uz = boris(ux, uy, uz, *e6, q, m)
        ginv = 1.0 / np.sqrt(1 + (ux**2 + uy**2 + uz**2) / c2)
        vx, vy, vz = ux * ginv, uy * ginv, uz * ginv
        x = x + vx * dt
        z = z + vz * dt
        # direct deposition at x^{n+1} - v dt/2 with the origin at its own
        # time o(t^{n+1/2}) (LowerCorner time_shift 0.5*dt); rho_new with
        # origin o(t^{n+1})
        o_z_half = o_z + vg * dt / 2
        o_z_new = o_z + vg * dt
        xgm = (x - lo_x - vx * dt / 2) / dx
        zgm = (z - o_z_half - vz * dt / 2) / dz
        J[0] += cic(xgm, zgm, q * w * vx / dV)
        J[1] += cic(xgm, zgm, q * w * vy / dV)
        J[2] += cic(xgm, zgm, q * w * vz / dV)
        rho_new += cic((x - lo_x) / dx, (z - o_z_new) / dz, q * w / dV)
        sp[0], sp[1], sp[2], sp[3], sp[4] = x, z, ux, uy, uz
    # bilinear (binomial) filter on J and rho, both dims (warpx.use_filter)
    def filt(a):
        for ax in (0, 1):
            a = 0.25 * np.roll(a, 1, ax) + 0.5 * a + 0.25 * np.roll(a, -1, ax)
        return a
    J = [filt(a) for a in J]
    rho_old = filt(rho_old)
    rho_new = filt(rho_new)
    # spectral push
    f = {k: np.fft.fftn(F[k]) for k in F}
    jf = [np.fft.fftn(a) for a in J]
    ro = np.fft.fftn(rho_old)
    rn = np.fft.fftn(rho_new)
    rho_fac = X2 * rn - T2 * X3 * ro
    Ex = T2 * C * f["Ex"] + 1j * c2 * T2 * S_ck * (KZ * 0 - KZ * f["By"]) \
        + X4 * jf[0] - 1j * rho_fac * KX
    # careful 2D: k = (KX, 0, KZ); curl terms:
    # (k x B)_x = ky Bz - kz By = -KZ*By
    # (k x B)_y = kz Bx - kx Bz
    # (k x B)_z = kx By - ky Bx = KX*By
    Ex = T2 * C * f["Ex"] + 1j * c2 * T2 * S_ck * (-KZ * f["By"]) \
        + X4 * jf[0] - 1j * rho_fac * KX
    Ey = T2 * C * f["Ey"] + 1j * c2 * T2 * S_ck * (KZ * f["Bx"] - KX * f["Bz"]) \
        + X4 * jf[1]
    Ez = T2 * C * f["Ez"] + 1j * c2 * T2 * S_ck * (KX * f["By"]) \
        + X4 * jf[2] - 1j * rho_fac * KZ
    Bx = T2 * C * f["Bx"] - 1j * T2 * S_ck * (-KZ * f["Ey"]) \
        + 1j * X1 * (-KZ * jf[1])
    By = T2 * C * f["By"] - 1j * T2 * S_ck * (KZ * f["Ex"] - KX * f["Ez"]) \
        + 1j * X1 * (KZ * jf[0] - KX * jf[2])
    Bz = T2 * C * f["Bz"] - 1j * T2 * S_ck * (KX * f["Ey"]) \
        + 1j * X1 * (KX * jf[1])
    for k2, v in zip(("Ex", "Ey", "Ez", "Bx", "By", "Bz"),
                     (Ex, Ey, Ez, Bx, By, Bz)):
        F[k2] = np.real(np.fft.ifftn(v))
    return t + dt, F


species = [ele, ion]
for s_ in range(steps):
    t, F = step(t, F, species)
    if (s_ + 1) % 20 == 0:
        E = sum((F[k] ** 2).sum() for k in ("Ex", "Ey", "Ez")) \
            + c2 * sum((F[k] ** 2).sum() for k in ("Bx", "By", "Bz"))
        # dominant mode diagnostics
        tot = sum(np.abs(np.fft.fftn(F[k]))**2 for k in ("Ex", "Ey", "Ez"))
        idx = np.unravel_index(np.argmax(tot), tot.shape)
        comps = {k: float(np.abs(np.fft.fftn(F[k]))[idx]) for k in F}
        kxi = idx[0] if idx[0] <= n // 2 else idx[0] - n
        kzi = idx[1] if idx[1] <= n // 2 else idx[1] - n
        print(f"step {s_+1:4d}  E = {E:.6e}  peak k=({kxi},{kzi}) "
              + " ".join(f"{k}={v:.1e}" for k, v in comps.items()),
              flush=True)
