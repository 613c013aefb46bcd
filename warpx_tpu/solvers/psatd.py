"""PSATD pseudo-spectral analytical time-domain Maxwell solver.

Reimplements the reference's standard (J-constant-in-time) PSATD algorithm
(Source/FieldSolver/SpectralSolver/SpectralAlgorithms/
PsatdAlgorithmJConstantInTime.cpp): per-step the fields are FFT-ed over the
guard-grown box (guards filled periodically), pushed analytically in k-space
with precomputed coefficients, and transformed back:

  E+ = C E + i c^2 S_ck (k x B) - S_ck/eps0 J - i (X2 rho_new - X3 rho_old) k
  B+ = C B - i S_ck (k x E) + i X1 (k x J)
  C = cos(w dt), S_ck = sin(w dt)/w, w = c |k_mod|
  X1 = (1-C)/(eps0 w^2); X2 = c^2 (dt-S_ck)/(eps0 dt w^2);
  X3 = c^2 (dt C-S_ck)/(eps0 dt w^2)          (:300-380, w_c = 0 branch)

with update_with_rho=0 the rho terms use rho_old = i eps0 k.E and
rho_new = rho_old - i k.J dt (:247-259).  Finite-order stencils enter as
modified k vectors built from Fornberg coefficients
(SpectralKSpace.cpp:191-266; WarpX.cpp:3119 getFornbergStencilCoefficients),
with ngFFT = nox_fft/2 guard cells on staggered grids
(GuardCellManager.cpp:205-208).  Staggered components are shifted to nodal in
k-space by exp(-+ i k dx/2) factors during the transforms
(SpectralKSpace.cpp:140-176).

All coefficients are precomputed host-side in f64 at trace time; the per-step
work is FFTs + elementwise complex math, which XLA maps well to the TPU.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..constants import c as _c
from ..constants import ep0 as _ep0

__all__ = ["PsatdSolver", "fornberg_coefficients", "modified_k"]

_c2 = _c * _c


def fornberg_coefficients(n_order: int, collocated: bool) -> np.ndarray:
    """Fornberg stencil coefficients by recurrence (WarpX.cpp:3119-3160)."""
    m = n_order // 2
    coeffs = np.zeros(m)
    if collocated:
        coeffs[0] = m * 2.0 / (m + 1)
        for n in range(1, m):
            coeffs[n] = -(m - n) * 1.0 / (m + n + 1) * coeffs[n - 1]
    else:
        prod = 1.0
        for k in range(1, m + 1):
            prod *= (m + k) / (4.0 * k)
        coeffs[0] = 4.0 * m * prod * prod
        for n in range(1, m):
            coeffs[n] = (
                -((2 * n - 1) * (m - n)) * 1.0 / ((2 * n + 1) * (m + n)) * coeffs[n - 1]
            )
    return coeffs


def modified_k(k: np.ndarray, dx: float, n_order: int, collocated: bool) -> np.ndarray:
    """Finite-order modified k (SpectralKSpace.cpp:191-266); n_order==-1 is
    the infinite-order (exact) case."""
    if n_order == -1:
        return k.copy()
    coeffs = fornberg_coefficients(n_order, collocated)
    out = np.zeros_like(k)
    for n, cf in enumerate(coeffs):
        if collocated:
            out += cf * np.sin(k * (n + 1) * dx) / ((n + 1) * dx)
        else:
            out += cf * np.sin(k * (n + 0.5) * dx) / ((n + 0.5) * dx)
    if collocated:
        # enforce exactly-zero modified k at the Nyquist frequency
        N = k.shape[0]
        if N % 2 == 0:
            out[N // 2] = 0.0
    return out


class PsatdSolver:
    """Periodic-padded single-shard PSATD push (standard, non-Galilean)."""

    def __init__(
        self,
        geom,
        staggering: Dict,
        dt: float,
        n_order: int = 16,
        collocated_grid: bool = False,
        update_with_rho: bool = False,
        current_correction: bool = False,
        v_galilean=(0.0, 0.0, 0.0),
        v_comoving=(0.0, 0.0, 0.0),
        single_box: bool = False,
        vay_deposition: bool = False,
        time_averaging: bool = False,
        dive_cleaning: bool = False,
        divb_cleaning: bool = False,
        dtype=jnp.float64,
    ):
        self.geom = geom
        self.staggering = staggering
        self.dt = dt
        self.update_with_rho = update_with_rho
        self.current_correction = current_correction
        self.v_galilean = tuple(v_galilean)
        self.is_galilean = any(v != 0.0 for v in self.v_galilean)
        self.v_comoving = tuple(v_comoving)
        self.is_comoving = any(v != 0.0 for v in self.v_comoving)
        if self.is_comoving and self.is_galilean:
            raise NotImplementedError(
                "Galilean and comoving PSATD cannot be combined"
            )
        if self.is_comoving and not update_with_rho:
            raise NotImplementedError(
                "psatd.update_with_rho must be 1 for comoving PSATD "
                "(WarpX.cpp:1610)"
            )
        self.vay_deposition = vay_deposition
        # F/G spectral divergence cleaning
        # (PsatdAlgorithmJConstantInTime.cpp:294-316)
        self.dive_cleaning = dive_cleaning
        self.divb_cleaning = divb_cleaning
        if (dive_cleaning or divb_cleaning) and (
            self.is_galilean or self.is_comoving
        ):
            raise NotImplementedError(
                "divergence cleaning not implemented for Galilean/comoving "
                "PSATD (PsatdAlgorithmJConstantInTime.cpp:98-105)"
            )
        if dive_cleaning and not update_with_rho:
            raise NotImplementedError(
                "warpx.do_dive_cleaning = 1 requires psatd.update_with_rho "
                "(WarpX.cpp:1605)"
            )
        ndim = geom.ndim
        # guard cells: nox_fft/2 staggered, nox_fft collocated
        # (GuardCellManager.cpp:205-208).  With periodic_single_box the FFT
        # spans the whole periodic domain exactly (no guards) at the same
        # stencil order; infinite order implies single box.
        if n_order == -1 or single_box or vay_deposition:
            # Vay deposition divides D by k: guard-pad FFT leakage near k=0
            # would be amplified, so use the exact whole-domain FFT
            self.ng = 0
        else:
            self.ng = n_order if collocated_grid else n_order // 2
        self.n_fft = tuple(geom.n_cell[d] + 2 * self.ng for d in range(ndim))

        # Current correction on the padded path: the reference evaluates
        # CurrentCorrection on each box's guard-grown k-grid
        # (PsatdAlgorithmJConstantInTime.cpp:719-800).  On ANY padded
        # k-grid the projection k(k.J)/k^2 is weakly unstable in this
        # formulation: the Galilean NCI mode is re-seeded at ~0.04/step
        # and inputs_test_2d_galilean_psatd_current_correction lands
        # 4e-4 vs its 2e-8 stability gate — verified against a faithful
        # per-box (max_grid_size=64) block-local FFT prototype, which is
        # stable without CC but equally unstable with it.  With global
        # arrays the natural divergence projection is the EXACT
        # periodic-domain FFT (a true continuity projection); applying
        # CC there and keeping the guard-padded E/B push restores the
        # gate (2.3e-8 after 400 steps, flat).
        self._cc_exact = None
        if current_correction and self.ng > 0:
            self._cc_exact = PsatdSolver(
                geom, staggering, dt, n_order=n_order,
                collocated_grid=collocated_grid,
                update_with_rho=update_with_rho, current_correction=True,
                v_galilean=v_galilean, v_comoving=v_comoving,
                single_box=True, dtype=dtype,
            )

        # k vectors of the grown box, modified-k, shifts, coefficients
        ks = []
        kmods = []
        shifts_fwd = []
        for d in range(ndim):
            k = 2.0 * np.pi * np.fft.fftfreq(self.n_fft[d], d=geom.dx[d])
            if d == 0 and self.n_fft[d] % 2 == 0:
                # the reference's R2C transform halves its first axis and
                # keeps the Nyquist wavenumber POSITIVE (SpectralKSpace.cpp
                # "the first axis contains only the positive k"); with a full
                # complex FFT + real projection this only changes the Nyquist
                # bin, where we must match the +pi/dx convention
                k = k.copy()
                k[self.n_fft[d] // 2] = abs(k[self.n_fft[d] // 2])
            ks.append(k)
            kmods.append(modified_k(k, geom.dx[d], n_order, collocated_grid))
            shifts_fwd.append(np.exp(-1j * k * 0.5 * geom.dx[d]))
        self._kmod = [
            jnp.asarray(self._bcast(kmods[d], d, ndim)) for d in range(ndim)
        ]
        self._shift_fwd = [
            jnp.asarray(self._bcast(shifts_fwd[d], d, ndim)) for d in range(ndim)
        ]
        self._shift_bwd = [
            jnp.asarray(self._bcast(np.conj(shifts_fwd[d]), d, ndim))
            for d in range(ndim)
        ]

        # coefficient arrays over the grown box
        kmod_full = np.zeros(self.n_fft)
        for d in range(ndim):
            kmod_full = kmod_full + self._np_bcast(kmods[d], d, ndim) ** 2
        knorm = np.sqrt(kmod_full)
        om = _c * knorm
        om2 = om * om
        C = np.cos(om * dt)
        S_ck = np.where(om != 0.0, np.sin(om * dt) / np.where(om == 0, 1, om), dt)
        if self.is_galilean:
            # Galilean PSATD (PsatdAlgorithmJConstantInTime.cpp:400-520):
            # w_c = k_centered . v_gal built on the CENTERED (collocated)
            # finite-order modified k for both grid types
            active_axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
            w_c = np.zeros(self.n_fft)
            for d in range(ndim):
                vg = self.v_galilean[active_axes[d]]
                if vg == 0.0:
                    continue
                kc = modified_k(ks[d], geom.dx[d], n_order, True)
                w_c = w_c + self._np_bcast(kc, d, ndim) * vg
            self._w_c = jnp.asarray(w_c)
            theta = np.exp(1j * w_c * dt * 0.5)
            theta_star = np.conj(theta)
            T2 = theta * theta
            om2_m_w2 = om2 - w_c * w_c
            nz = (om != 0.0) | (w_c != 0.0)
            X1 = np.where(
                nz,
                (1.0 - T2 * C + 1j * w_c * T2 * S_ck)
                / (_ep0 * np.where(om2_m_w2 == 0, 1, om2_m_w2)),
                0.5 * dt * dt / _ep0,
            )
            tmp = np.where(
                om != 0.0,
                (1.0 - C) / (_ep0 * np.where(om2 == 0, 1, om2)),
                0.5 * dt * dt / _ep0,
            )
            dth = np.where(theta_star - theta == 0, 1, theta_star - theta)
            wnz = w_c != 0.0
            X2 = np.where(
                wnz,
                _c2 * (theta_star * X1 - theta * tmp) / dth,
                np.where(
                    om != 0.0,
                    _c2 * (dt - S_ck) / (_ep0 * dt * np.where(om2 == 0, 1, om2)),
                    _c2 * dt * dt / (6.0 * _ep0),
                ),
            )
            X3 = np.where(
                wnz,
                _c2 * (theta_star * X1 - theta_star * tmp) / dth,
                np.where(
                    om != 0.0,
                    _c2 * (dt * C - S_ck) / (_ep0 * dt * np.where(om2 == 0, 1, om2)),
                    -_c2 * dt * dt / (3.0 * _ep0),
                ),
            )
            X4 = 1j * w_c * X1 - T2 * S_ck / _ep0
            self._T2 = jnp.asarray(T2)
            self._X4 = jnp.asarray(X4)
        else:
            X1 = np.where(om != 0.0, (1.0 - C) / (_ep0 * np.where(om2 == 0, 1, om2)),
                          0.5 * dt * dt / _ep0)
            X2 = np.where(
                om != 0.0,
                _c2 * (dt - S_ck) / (_ep0 * dt * np.where(om2 == 0, 1, om2)),
                _c2 * dt * dt / (6.0 * _ep0),
            )
            X3 = np.where(
                om != 0.0,
                _c2 * (dt * C - S_ck) / (_ep0 * dt * np.where(om2 == 0, 1, om2)),
                -_c2 * dt * dt / (3.0 * _ep0),
            )
        if self.is_comoving:
            # Comoving PSATD (PsatdAlgorithmComoving.cpp:164-414): the
            # update keeps the standard form (no Theta^2 shifts — the grid
            # does not move) but X1..X4 carry the comoving phase
            # theta = exp(-i k.v dt/2) built on the INFINITE-order k
            # (kx_vec with n_order=-1), while C, S_ck use the finite-order
            # modified k.  nu = -k.v/omega, so i*nu*om = -i*k.v.
            active_axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
            kv = np.zeros(self.n_fft)
            k2_inf = np.zeros(self.n_fft)
            for d in range(ndim):
                kb = self._np_bcast(ks[d], d, ndim)
                kv = kv + kb * self.v_comoving[active_axes[d]]
                k2_inf = k2_inf + kb * kb
            om_i = _c * np.sqrt(k2_inf)
            om2_i = om_i * om_i
            om2_m = om2  # finite-order omega^2 (om_mod in the reference)
            om_m = om
            theta = np.exp(-0.5j * kv * dt)
            theta_star = np.conj(theta)
            T2 = theta * theta

            g = lambda x: np.where(x == 0, 1, x)  # noqa: E731
            # --- main branch: om_mod,om != 0, nu not 0 or +-om_mod/om
            den = g(om2_m - kv * kv)
            x1 = om2_i / den * (theta_star - theta * C - 1j * kv * theta * S_ck)
            X1_a = x1 / (_ep0 * g(om2_i))
            dth = g(theta_star - theta)
            X2_a = _c2 * (x1 * om2_m - theta * (1.0 - C) * om2_i) / (
                dth * _ep0 * g(om2_i) * g(om2_m))
            X3_a = _c2 * (x1 * om2_m - theta_star * (1.0 - C) * om2_i) / (
                dth * _ep0 * g(om2_i) * g(om2_m))
            X4_a = -1j * kv * X1_a - theta * S_ck / _ep0
            # --- resonant branches nu = +-om_mod/om, i.e. k.v = -+om_mod
            tmp1 = np.exp(1j * om_m * dt)
            tmp2 = np.exp(-1j * om_m * dt)
            tmp1s = np.exp(0.5j * om_m * dt)
            tmp2s = np.exp(-0.5j * om_m * dt)
            t1m1 = g(tmp1 - 1.0)
            X1_p = tmp1s * (1.0 - tmp2 * tmp2 - 2j * om_m * dt) / (
                4.0 * _ep0 * g(om2_m))
            X2_p = _c2 * (-4.0 + 3.0 * tmp1 + tmp2 - 2j * om_m * dt * tmp1) / (
                4.0 * _ep0 * g(om2_m) * t1m1)
            X3_p = _c2 * (2.0 - tmp2 - 3.0 * tmp1 + 2.0 * tmp1 * tmp1
                          - 2j * om_m * dt * tmp1) / (
                4.0 * _ep0 * g(om2_m) * t1m1)
            X4_p = tmp1s * (1j - 1j * tmp2 * tmp2 - 2.0 * om_m * dt) / (
                4.0 * _ep0 * g(om_m))
            X1_m = tmp2s * (1.0 - tmp1 * tmp1 + 2j * om_m * dt) / (
                4.0 * _ep0 * g(om2_m))
            X2_m = _c2 * (-3.0 + 4.0 * tmp1 - tmp1 * tmp1 - 2j * om_m * dt) / (
                4.0 * _ep0 * g(om2_m) * t1m1)
            X3_m = _c2 * (3.0 - 2.0 * tmp2 - 2.0 * tmp1 + tmp1 * tmp1
                          - 2j * om_m * dt) / (
                4.0 * _ep0 * g(om2_m) * t1m1)
            X4_m = tmp2s * (-1j + 1j * tmp1 * tmp1 - 2.0 * om_m * dt) / (
                4.0 * _ep0 * g(om_m))
            # --- om_mod = 0, om != 0, nu != 0 (collocated Nyquist)
            kv2 = g(kv * kv)
            T2m1 = g(T2 - 1.0)
            X1_c = (-theta_star + theta + 1j * kv * dt * theta) / (_ep0 * kv2)
            X2_c = _c2 * (1.0 - T2 - 1j * kv * dt * T2
                          + 0.5 * kv * kv * dt * dt * T2) / (_ep0 * kv2 * T2m1)
            X3_c = _c2 * (1.0 - T2 - 1j * kv * dt * T2
                          + 0.5 * kv * kv * dt * dt) / (_ep0 * kv2 * T2m1)
            X4_c = -1j * (theta - theta_star) / (_ep0 * g(kv))
            # --- branch masks (float equalities, as in the reference)
            kvnz = kv != 0.0
            res_p = kvnz & (om_m != 0.0) & (om_i != 0.0) & (kv == -om_m)
            res_m = kvnz & (om_m != 0.0) & (om_i != 0.0) & (kv == om_m)
            main = (kvnz & (om_m != 0.0) & (om_i != 0.0)
                    & ~res_p & ~res_m)
            regc = kvnz & (om_m == 0.0) & (om_i != 0.0)
            conds = [main, res_p, res_m, regc]
            X1 = np.select(conds, [X1_a, X1_p, X1_m, X1_c], default=X1)
            X2 = np.select(conds, [X2_a, X2_p, X2_m, X2_c], default=X2)
            X3 = np.select(conds, [X3_a, X3_p, X3_m, X3_c], default=X3)
            X4 = np.select(
                conds, [X4_a, X4_p, X4_m, X4_c], default=-S_ck / _ep0
            ).astype(complex)
            self._T2 = jnp.asarray(np.ones(self.n_fft, complex))
            self._X4 = jnp.asarray(X4)
            self._kv_inf = jnp.asarray(kv)
        self._C = jnp.asarray(C)
        self._S_ck = jnp.asarray(S_ck)
        self._X1 = jnp.asarray(X1)
        self._X2 = jnp.asarray(X2)
        self._X3 = jnp.asarray(X3)
        self.time_averaging = time_averaging
        if time_averaging:
            # Averaged (Galilean) PSATD: <E>,<B> over [t+dt/2, t+3dt/2]
            # (PsatdAlgorithmJConstantInTime::
            #  InitializeSpectralCoefficientsAveraging, :530-695)
            if not update_with_rho:
                raise NotImplementedError(
                    "psatd.do_time_averaging requires update_with_rho"
                )
            w = w_c if self.is_galilean else np.zeros(self.n_fft)
            w2 = w * w
            w3 = w2 * w
            om4 = om2 * om2
            th1 = np.exp(1j * w * dt * 0.5)
            th2 = np.exp(1j * w * dt)
            th3 = np.exp(1j * w * dt * 1.5)
            th5 = np.exp(1j * w * dt * 2.5)
            C1 = np.cos(0.5 * om * dt)
            C3 = np.cos(1.5 * om * dt)
            S1_om = np.where(
                om != 0.0, np.sin(0.5 * om * dt) / np.where(om == 0, 1, om),
                0.5 * dt,
            )
            S3_om = np.where(
                om != 0.0, np.sin(1.5 * om * dt) / np.where(om == 0, 1, om),
                1.5 * dt,
            )
            nz = (om != 0.0) | (w != 0.0)
            o_m_w = np.where(om2 - w2 == 0, 1.0, om2 - w2)
            Psi1 = np.where(
                nz,
                (th3 * (om2 * S3_om + 1j * w * C3)
                 - th1 * (om2 * S1_om + 1j * w * C1)) / (dt * o_m_w),
                1.0,
            )
            Psi2 = np.where(
                nz,
                (th3 * (C3 - 1j * w * S3_om)
                 - th1 * (C1 - 1j * w * S1_om)) / (dt * o_m_w),
                -dt,
            )
            Psi3 = np.where(
                w != 0.0,
                -1j * (th3 - th1) / (dt * np.where(w == 0, 1, w)),
                1.0,
            )
            dt2 = dt * dt
            Y1 = np.where(
                nz,
                (1.0 - Psi1 - 1j * w * Psi2) / (_ep0 * o_m_w),
                13.0 * dt2 / (24.0 * _ep0),
            )
            om2s = np.where(om2 == 0, 1, om2)
            om4s = np.where(om4 == 0, 1, om4)
            w3s = np.where(w3 == 0, 1, w3)
            th2m1 = np.where(th2 == 1.0, 1.0, th2 - 1.0)
            Y2 = np.select(
                [(om != 0.0) & (w != 0.0), (om != 0.0) & (w == 0.0),
                 (om == 0.0) & (w != 0.0)],
                [
                    1j * _c2 * (_ep0 * om2s * Y1 - Psi3 + Psi1)
                    / (_ep0 * om2s * th2m1),
                    1j * _c2 * (C1 - C3 - dt2 * om2) / (_ep0 * dt2 * om4s),
                    _c2 * (9.0 * dt2 * w2 * th3 - dt2 * w2 * th1
                           - 24.0 * th3 + 24.0 * th1 + 1j * 8.0 * dt * w
                           + 1j * 24.0 * dt * w * th3
                           - 1j * 8.0 * dt * w * th1)
                    / (8.0 * _ep0 * dt * w3s
                       * np.where(th2 == 1.0, 1.0, 1.0 - th2)),
                ],
                default=-1j * 5.0 * _c2 * dt2 / (24.0 * _ep0),
            )
            Y3 = np.select(
                [(om != 0.0) & (w != 0.0), (om != 0.0) & (w == 0.0),
                 (om == 0.0) & (w != 0.0)],
                [
                    1j * _c2 * (Psi3 - Psi1 - _ep0 * th2 * om2s * Y1)
                    / (_ep0 * om2s * th2m1),
                    1j * _c2 * (C3 - C1 + dt * om2 * (S3_om - S1_om))
                    / (_ep0 * dt2 * om4s),
                    _c2 * (9.0 * dt2 * w2 * th3 - dt2 * w2 * th1
                           - 16.0 * th5 + 8.0 * th3 + 8.0 * th1
                           + 1j * 12.0 * dt * w * th5
                           + 1j * 8.0 * dt * w * th3
                           - 1j * 4.0 * dt * w * th1
                           + 1j * 8.0 * dt * w * th2)
                    / (8.0 * _ep0 * dt * w3s * th2m1),
                ],
                default=-1j * _c2 * dt2 / (3.0 * _ep0),
            )
            Y4 = (Psi2 + 1j * _ep0 * w * Y1) / _ep0
            self._Psi1 = jnp.asarray(Psi1)
            self._Psi2 = jnp.asarray(Psi2)
            self._Y1 = jnp.asarray(Y1)
            self._Y2 = jnp.asarray(Y2)
            self._Y3 = jnp.asarray(Y3)
            self._Y4 = jnp.asarray(Y4)
        # 1/k^2 with zero at k=0 (current correction)
        inv_k2 = np.where(kmod_full != 0.0, 1.0 / np.where(kmod_full == 0, 1, kmod_full), 0.0)
        self._inv_k2 = jnp.asarray(inv_k2)
        self._om = jnp.asarray(om)
        self._knorm = jnp.asarray(knorm)

    @staticmethod
    def _bcast(v, d, ndim):
        shape = [1] * ndim
        shape[d] = v.shape[0]
        return v.reshape(shape)

    @staticmethod
    def _np_bcast(v, d, ndim):
        shape = [1] * ndim
        shape[d] = v.shape[0]
        return v.reshape(shape)

    # --------------------------------------------------------------- helpers
    def _pad(self, arr):
        """Periodic pad by ng per side (the guard fill before the per-box FFT)."""
        if self.ng == 0:
            return arr
        return jnp.pad(arr, [(self.ng, self.ng)] * arr.ndim, mode="wrap")

    def _crop(self, arr):
        if self.ng == 0:
            return arr
        sl = tuple(slice(self.ng, s - self.ng) for s in arr.shape)
        return arr[sl]

    def forward(self, arr, comp_name):
        """Real field -> k-space nodal representation."""
        F = jnp.fft.fftn(self._pad(arr))
        for d in range(self.geom.ndim):
            if self.staggering[comp_name][d] == 0:  # cell-centered in d
                F = F * self._shift_fwd[d]
        return F

    def backward(self, F, comp_name):
        for d in range(self.geom.ndim):
            if self.staggering[comp_name][d] == 0:
                F = F * self._shift_bwd[d]
        return self._crop(jnp.fft.ifftn(F).real)

    def _cc_corrected_J(self, J, rho_old_k, rho_new_k, kx, ky, kz):
        """k-space current correction on THIS solver's k-grid:
        F = [k.J - i (rho_new - rho_old)/dt] / k^2; J <- J - F k
        (PsatdAlgorithmJConstantInTime::CurrentCorrection:719-800); the
        Galilean variant replaces the time derivative with the
        theta2-weighted difference (:764-775, k.v_gal on the CENTERED
        modified k), the comoving variant with the theta-weighted
        infinite-order k.v form (PsatdAlgorithmComoving.cpp:478-499)."""
        I = 1j
        dt = self.dt
        k_dot_J = kx * J[0] + ky * J[1] + kz * J[2]
        F_std = (k_dot_J - I * (rho_new_k - rho_old_k) / dt) * self._inv_k2
        if self.is_comoving:
            kv = self._kv_inf
            th = jnp.exp(-0.5j * kv * dt)
            den = jnp.where(th * th == 1.0, 1.0, 1.0 - th * th)
            F_com = (
                k_dot_J + kv * th * (rho_new_k - rho_old_k) / den
            ) * self._inv_k2
            F = jnp.where(kv != 0.0, F_com, F_std)
        elif self.is_galilean:
            w_c = self._w_c
            t2 = jnp.exp(I * w_c * dt)
            den = jnp.where(t2 == 1.0, 1.0, 1.0 - t2)
            F_gal = (
                k_dot_J - w_c * (rho_new_k - rho_old_k * t2) / den
            ) * self._inv_k2
            F = jnp.where(w_c != 0.0, F_gal, F_std)
        else:
            F = F_std
        return [J[0] - F * kx, J[1] - F * ky, J[2] - F * kz]

    def _k3(self):
        """(kx, ky, kz) modified-k broadcastable over the full xyz triple,
        with zeros for inactive axes."""
        ndim = self.geom.ndim
        zero = 0.0
        if ndim == 3:
            return self._kmod[0], self._kmod[1], self._kmod[2]
        if ndim == 2:
            return self._kmod[0], zero, self._kmod[1]
        return zero, zero, self._kmod[0]

    def spectral_div_e(self, fields):
        """Nodal div(E) via i k.E in spectral space (SpectralSolver::
        ComputeSpectralDivE, used by the divE diagnostic under PSATD)."""
        E = [self.forward(getattr(fields, nm), nm) for nm in ("Ex", "Ey", "Ez")]
        kx, ky, kz = self._k3()
        D = 1j * (kx * E[0] + ky * E[1] + kz * E[2])
        return self._crop(jnp.fft.ifftn(D).real)

    # ------------------------------------------------------------------ push
    def push(self, fields, rho_pair=None, j_old=None):
        """One PSATD step: E,B <- analytic k-space advance with J (and rho).

        rho_pair = (rho_old_real, rho_new_real) nodal arrays when current
        correction or update_with_rho is active.
        j_old = (jx,jy,jz) at the START of the step for the J-linear-in-time
        (multi-J) update (PsatdAlgorithmJLinearInTime.cpp:115-190): fields.j*
        then hold J at the END of the step.
        """
        names_e = ("Ex", "Ey", "Ez")
        names_b = ("Bx", "By", "Bz")
        names_j = ("jx", "jy", "jz")
        E = [self.forward(getattr(fields, nm), nm) for nm in names_e]
        B = [self.forward(getattr(fields, nm), nm) for nm in names_b]
        if self.vay_deposition:
            # the deposited arrays are the NODAL D fields; the
            # charge-conserving J is i*D/k per component
            # (PsatdAlgorithmJConstantInTime::VayDeposition:805-861)
            J = [self.forward(getattr(fields, nm), "rho") for nm in names_j]
        else:
            J = [self.forward(getattr(fields, nm), nm) for nm in names_j]
        kx, ky, kz = self._k3()
        dt = self.dt
        I = 1j

        corrected_vay = None
        if self.vay_deposition:
            def div_k(D, k):
                if isinstance(k, float):
                    return jnp.zeros_like(D)
                return jnp.where(k != 0.0, I * D / jnp.where(k == 0, 1, k), 0.0)

            J = [div_k(J[0], kx), div_k(J[1], ky), div_k(J[2], kz)]
            # real-space J (nodal) for diagnostics (PSATDBackwardTransformJ)
            corrected_vay = {
                nm: self.backward(Jc, "rho") for nm, Jc in zip(names_j, J)
            }

        rho_old_k = rho_new_k = None
        if rho_pair is not None:
            rho_old_k = self.forward(rho_pair[0], "rho")
            rho_new_k = self.forward(rho_pair[1], "rho")

        corrected_j = None
        if self.current_correction:
            # The corrected J is also transformed back to real space
            # (PSATDBackwardTransformJ) and becomes the diagnostic current
            if self._cc_exact is not None:
                # exact periodic-domain projection (see __init__): correct
                # on the whole-domain FFT, then re-pad for the E/B push
                ex = self._cc_exact
                Jc = ex._cc_corrected_J(
                    [ex.forward(getattr(fields, nm), nm) for nm in names_j],
                    ex.forward(rho_pair[0], "rho"),
                    ex.forward(rho_pair[1], "rho"),
                    *ex._k3(),
                )
                corrected_j = {
                    nm: ex.backward(a, nm) for nm, a in zip(names_j, Jc)
                }
                fields = fields.replace(**corrected_j)
                J = [self.forward(getattr(fields, nm), nm) for nm in names_j]
            else:
                J = self._cc_corrected_J(
                    J, rho_old_k, rho_new_k, kx, ky, kz
                )
                corrected_j = {
                    nm: self.backward(Jc, nm) for nm, Jc in zip(names_j, J)
                }

        k_dot_E = kx * E[0] + ky * E[1] + kz * E[2]
        k_dot_J = kx * J[0] + ky * J[1] + kz * J[2]
        if self.update_with_rho:
            rho_old = rho_old_k
            rho_new = rho_new_k
        else:
            rho_old = I * _ep0 * k_dot_E
            if self.is_galilean:
                w_c = self._w_c
                T2g = jnp.exp(I * w_c * dt)
                rho_new = jnp.where(
                    w_c != 0.0,
                    T2g * rho_old
                    + (1.0 - T2g) * k_dot_J / jnp.where(w_c == 0, 1, w_c),
                    rho_old - I * k_dot_J * dt,
                )
            else:
                rho_new = rho_old - I * k_dot_J * dt

        C, S_ck, X1, X2, X3 = self._C, self._S_ck, self._X1, self._X2, self._X3
        if self.is_galilean or self.is_comoving:
            T2, X4 = self._T2, self._X4
        else:
            T2, X4 = 1.0, -S_ck / _ep0
        rho_fac = X2 * rho_new - T2 * X3 * rho_old

        if j_old is not None:
            # J linear in time: J(t) interpolates J_old -> J_new
            # (PsatdAlgorithmJLinearInTime.cpp:160-186); X1..X4 as standard
            Jo = [self.forward(a, nm) for a, nm in zip(j_old, names_j)]
            dJ = [J[i] - Jo[i] for i in range(3)]
            Ex = (
                C * E[0] + I * _c2 * S_ck * (ky * B[2] - kz * B[1])
                + X4 * Jo[0] - I * rho_fac * kx - X1 * dJ[0] / dt
            )
            Ey = (
                C * E[1] + I * _c2 * S_ck * (kz * B[0] - kx * B[2])
                + X4 * Jo[1] - I * rho_fac * ky - X1 * dJ[1] / dt
            )
            Ez = (
                C * E[2] + I * _c2 * S_ck * (kx * B[1] - ky * B[0])
                + X4 * Jo[2] - I * rho_fac * kz - X1 * dJ[2] / dt
            )
            Bx = (
                C * B[0] - I * S_ck * (ky * E[2] - kz * E[1])
                + I * X1 * (ky * Jo[2] - kz * Jo[1])
                + I * X2 / _c2 * (ky * dJ[2] - kz * dJ[1])
            )
            By = (
                C * B[1] - I * S_ck * (kz * E[0] - kx * E[2])
                + I * X1 * (kz * Jo[0] - kx * Jo[2])
                + I * X2 / _c2 * (kz * dJ[0] - kx * dJ[2])
            )
            Bz = (
                C * B[2] - I * S_ck * (kx * E[1] - ky * E[0])
                + I * X1 * (kx * Jo[1] - ky * Jo[0])
                + I * X2 / _c2 * (kx * dJ[1] - ky * dJ[0])
            )
            out = fields.replace(
                Ex=self.backward(Ex, "Ex"), Ey=self.backward(Ey, "Ey"),
                Ez=self.backward(Ez, "Ez"), Bx=self.backward(Bx, "Bx"),
                By=self.backward(By, "By"), Bz=self.backward(Bz, "Bz"),
            )
            return out

        Ex = (
            T2 * C * E[0]
            + I * _c2 * T2 * S_ck * (ky * B[2] - kz * B[1])
            + X4 * J[0]
            - I * rho_fac * kx
        )
        Ey = (
            T2 * C * E[1]
            + I * _c2 * T2 * S_ck * (kz * B[0] - kx * B[2])
            + X4 * J[1]
            - I * rho_fac * ky
        )
        Ez = (
            T2 * C * E[2]
            + I * _c2 * T2 * S_ck * (kx * B[1] - ky * B[0])
            + X4 * J[2]
            - I * rho_fac * kz
        )
        Bx = T2 * C * B[0] - I * T2 * S_ck * (ky * E[2] - kz * E[1]) + I * X1 * (
            ky * J[2] - kz * J[1]
        )
        By = T2 * C * B[1] - I * T2 * S_ck * (kz * E[0] - kx * E[2]) + I * X1 * (
            kz * J[0] - kx * J[2]
        )
        Bz = T2 * C * B[2] - I * T2 * S_ck * (kx * E[1] - ky * E[0]) + I * X1 * (
            kx * J[1] - ky * J[0]
        )

        # F/G spectral divergence cleaning
        # (PsatdAlgorithmJConstantInTime.cpp:294-316)
        fg_upd = {}
        if self.dive_cleaning:
            F_old = self.forward(fields.F, "F")
            Ex = Ex + I * _c2 * S_ck * F_old * kx
            Ey = Ey + I * _c2 * S_ck * F_old * ky
            Ez = Ez + I * _c2 * S_ck * F_old * kz
            F_new = (
                C * F_old + S_ck * (I * k_dot_E - rho_old / _ep0)
                - X1 * ((rho_new - rho_old) / dt + I * k_dot_J)
            )
            fg_upd["F"] = self.backward(F_new, "F")
        if self.divb_cleaning:
            G_old = self.forward(fields.G, "G")
            k_dot_B = kx * B[0] + ky * B[1] + kz * B[2]
            Bx = Bx + I * S_ck * G_old * kx
            By = By + I * S_ck * G_old * ky
            Bz = Bz + I * S_ck * G_old * kz
            fg_upd["G"] = self.backward(
                C * G_old + I * _c2 * S_ck * k_dot_B, "G"
            )

        out = fields.replace(
            **fg_upd,
            Ex=self.backward(Ex, "Ex"),
            Ey=self.backward(Ey, "Ey"),
            Ez=self.backward(Ez, "Ez"),
            Bx=self.backward(Bx, "Bx"),
            By=self.backward(By, "By"),
            Bz=self.backward(Bz, "Bz"),
        )
        if self.time_averaging:
            # time-averaged <E>,<B> from the OLD fields and this step's
            # J / rho pair (PsatdAlgorithmJConstantInTime.cpp:319-358)
            P1, P2 = self._Psi1, self._Psi2
            Y1, Y2, Y3, Y4 = self._Y1, self._Y2, self._Y3, self._Y4
            rho_t = Y2 * rho_new + Y3 * rho_old
            Eax = P1 * E[0] - I * _c2 * P2 * (ky * B[2] - kz * B[1]) \
                + Y4 * J[0] + rho_t * kx
            Eay = P1 * E[1] - I * _c2 * P2 * (kz * B[0] - kx * B[2]) \
                + Y4 * J[1] + rho_t * ky
            Eaz = P1 * E[2] - I * _c2 * P2 * (kx * B[1] - ky * B[0]) \
                + Y4 * J[2] + rho_t * kz
            Bax = P1 * B[0] + I * P2 * (ky * E[2] - kz * E[1]) \
                + I * Y1 * (ky * J[2] - kz * J[1])
            Bay = P1 * B[1] + I * P2 * (kz * E[0] - kx * E[2]) \
                + I * Y1 * (kz * J[0] - kx * J[2])
            Baz = P1 * B[2] + I * P2 * (kx * E[1] - ky * E[0]) \
                + I * Y1 * (kx * J[1] - ky * J[0])
            out = out.replace(
                Ex_avg=self.backward(Eax, "Ex"),
                Ey_avg=self.backward(Eay, "Ey"),
                Ez_avg=self.backward(Eaz, "Ez"),
                Bx_avg=self.backward(Bax, "Bx"),
                By_avg=self.backward(Bay, "By"),
                Bz_avg=self.backward(Baz, "Bz"),
            )
        if corrected_j is not None:
            out = out.replace(**corrected_j)
        if corrected_vay is not None:
            out = out.replace(**corrected_vay)
        return out


class PsatdFirstOrder(PsatdSolver):
    """First-order-form PSATD (PsatdAlgorithmFirstOrder.cpp:60-355): the
    integrated first-order Maxwell system with J constant/linear and rho
    constant/linear in time, optionally with the F/G divergence-cleaning
    potentials evolved spectrally.  Used by the multi-J scheme
    (psatd.solution_type = first-order, OneStep_multiJ).

    The reference's per-component C01..C16 coefficient table reduces to the
    closed form (k = modified k, khat = k/|k|, S = sin(w dt), C = cos(w dt)):

      no div cleaning:
        E+ = C E + (1-C) khat (khat.E) + i c S/|k| (k x B)
             - mu0 c S/|k| Jc0 + A k (k.Jc0) - mu0 (1-C)/k^2 Jc1 + Bc k (k.Jc1)
        B+ = C B + (1-C) khat (khat.B) - i S/(c|k|) (k x E)
             + i mu0 (1-C)/k^2 (k x Jc0) - i D (k x Jc1)
      with div cleaning (projector terms replaced by F/G coupling):
        E+ = C E + i c S/|k| (k x B) + i c S/|k| k F - mu0 c S/|k| Jc0
             - mu0 (1-C)/k^2 Jc1 + i mu0 c^2 (C-1)/k^2 k rho_c0 - i c D k rho_c1
        B+ = C B - i S/(c|k|) (k x E) + i S/(c|k|) k G
             + i mu0 (1-C)/k^2 (k x Jc0) - i D (k x Jc1)
        F+ = C F + i S/(c|k|) (k.E) + i mu0 (C-1)/k^2 (k.Jc0) + i D (k.Jc1)
             - mu0 c S/|k| rho_c0 + mu0 (C-1)/k^2 rho_c1
        G+ = C G + i c S/|k| (k.B)
      A  = mu0 c (|k| S - dt c k^2)/k^4,  Bc = mu0 (2(1-C) - dt^2 c^2 k^2)/(2 k^4),
      D  = mu0 (|k| S - dt c k^2)/(c k^4)
      k=0: E+ = E - mu0 c^2 (dt Jc0 + dt^2/2 Jc1); F+ = F - mu0 c^2 (dt rho_c0
           + dt^2/2 rho_c1); B,G unchanged.

    Jc0 = J_mid (constant) or J_old (linear); Jc1 = (J_new-J_old)/dt; same
    for rho.  Current correction / Vay / Galilean are not defined for this
    algorithm (reference aborts).
    """

    def __init__(self, *args, j_in_time="linear", rho_in_time="linear",
                 div_cleaning=False, **kw):
        super().__init__(*args, **kw)
        if self.is_galilean or self.is_comoving:
            raise NotImplementedError(
                "first-order PSATD with Galilean/comoving velocities"
            )
        if self.current_correction or self.vay_deposition:
            raise NotImplementedError(
                "current correction / Vay deposition not implemented for "
                "first-order PSATD equations"
            )
        self.j_in_time = j_in_time
        self.rho_in_time = rho_in_time
        self.div_cleaning = div_cleaning

    def push_first_order(self, fields, j_c0, j_c1=None, rho_c0=None,
                         rho_c1=None):
        """One sub-step advance of (E, B[, F, G]).  j_c0/j_c1 are real-space
        (jx,jy,jz) tuples; rho_* real-space scalars; returns a new
        FieldState (F/G updated only when div_cleaning)."""
        names_e = ("Ex", "Ey", "Ez")
        names_b = ("Bx", "By", "Bz")
        names_j = ("jx", "jy", "jz")
        E = [self.forward(getattr(fields, nm), nm) for nm in names_e]
        B = [self.forward(getattr(fields, nm), nm) for nm in names_b]
        J0 = [self.forward(a, nm) for a, nm in zip(j_c0, names_j)]
        J1 = ([self.forward(a, nm) for a, nm in zip(j_c1, names_j)]
              if j_c1 is not None else None)
        R0 = self.forward(rho_c0, "rho") if rho_c0 is not None else None
        R1 = self.forward(rho_c1, "rho") if rho_c1 is not None else None
        Fk = self.forward(fields.F, "F") if self.div_cleaning else None
        Gk = self.forward(fields.G, "G") if self.div_cleaning else None

        kx, ky, kz = self._k3()
        k3 = (kx, ky, kz)
        dt = self.dt
        I = 1j
        mu0 = 1.0 / (_ep0 * _c2)
        C = self._C
        om = self._om
        knorm = self._knorm
        S = jnp.sin(om * dt)
        k2 = knorm * knorm
        nz = k2 != 0.0
        g = lambda x: jnp.where(nz, x, 1.0)  # noqa: E731
        inv_k = jnp.where(nz, 1.0 / g(knorm), 0.0)
        inv_k2 = jnp.where(nz, 1.0 / g(k2), 0.0)
        inv_k4 = inv_k2 * inv_k2
        S_k = S * inv_k
        one_m_C_k2 = (1.0 - C) * inv_k2
        D = mu0 * (knorm * S - dt * _c * k2) * inv_k4 / _c
        A = _c2 * D  # mu0 c (|k| S - dt c k^2) / k^4
        Bc = mu0 * (2.0 * (1.0 - C) - dt * dt * _c2 * k2) * 0.5 * inv_k4

        def dot(k_t, V):
            return k_t[0] * V[0] + k_t[1] * V[1] + k_t[2] * V[2]

        def cross(k_t, V, i):
            j, l = ((1, 2), (2, 0), (0, 1))[i]
            return k_t[j] * V[l] - k_t[l] * V[j]

        kdE = dot(k3, E)
        kdB = dot(k3, B)
        kdJ0 = dot(k3, J0)
        kdJ1 = dot(k3, J1) if J1 is not None else None

        E_new, B_new = [], []
        for i in range(3):
            k_i = k3[i]
            e = C * E[i] + I * _c * S_k * cross(k3, B, i) \
                - mu0 * _c * S_k * J0[i]
            b = C * B[i] - I * S_k / _c * cross(k3, E, i) \
                + I * mu0 * one_m_C_k2 * cross(k3, J0, i)
            if self.div_cleaning:
                e = e + I * _c * S_k * k_i * Fk \
                    + I * mu0 * _c2 * (C - 1.0) * inv_k2 * k_i * R0
                b = b + I * S_k / _c * k_i * Gk
                if R1 is not None:
                    e = e - I * _c * D * k_i * R1
            else:
                e = e + one_m_C_k2 * k_i * kdE + A * k_i * kdJ0
            if J1 is not None:
                e = e - mu0 * one_m_C_k2 * J1[i]
                b = b - I * D * cross(k3, J1, i)
                if not self.div_cleaning:
                    e = e + Bc * k_i * kdJ1
            # k = 0 limits (PsatdAlgorithmFirstOrder.cpp:160-171)
            e0 = E[i] - mu0 * _c2 * dt * J0[i]
            if J1 is not None:
                e0 = e0 - 0.5 * mu0 * _c2 * dt * dt * J1[i]
            E_new.append(jnp.where(nz, e, e0))
            B_new.append(jnp.where(nz, b, B[i]))

        out = fields.replace(
            Ex=self.backward(E_new[0], "Ex"),
            Ey=self.backward(E_new[1], "Ey"),
            Ez=self.backward(E_new[2], "Ez"),
            Bx=self.backward(B_new[0], "Bx"),
            By=self.backward(B_new[1], "By"),
            Bz=self.backward(B_new[2], "Bz"),
        )
        if self.div_cleaning:
            f_new = C * Fk + I * S_k / _c * kdE \
                + I * mu0 * (C - 1.0) * inv_k2 * kdJ0 \
                - mu0 * _c * S_k * R0
            if kdJ1 is not None:
                f_new = f_new + I * D * kdJ1
            if R1 is not None:
                f_new = f_new + mu0 * (C - 1.0) * inv_k2 * R1
            f0 = Fk - mu0 * _c2 * dt * R0
            if R1 is not None:
                f0 = f0 - 0.5 * mu0 * _c2 * dt * dt * R1
            g_new = C * Gk + I * _c * S_k * kdB
            out = out.replace(
                F=self.backward(jnp.where(nz, f_new, f0), "F"),
                G=self.backward(jnp.where(nz, g_new, Gk), "G"),
            )
        return out


def pml_split_dirs(comp: str, cleaning: bool) -> tuple:
    """Split directions for a PML component, first = the reference's comp 0
    (PMLComponent.H: xy=0/xz=1/xx=2 etc.; F/G splits are x/y/z)."""
    if comp in ("F", "G"):
        return ("x", "y", "z")
    own = comp[1]  # 'x'|'y'|'z'
    others = [a for a in "xyz" if a != own]
    return tuple(others) + ((own,) if cleaning else ())


class PsatdPmlSolver:
    """Spectral split-field PML push (PsatdAlgorithmPml.cpp:79-455).

    Evolves the Berenger split components of E/B (and, with divergence
    cleaning, the F/G splits) analytically in k-space over a single
    extended box that covers the domain plus its PML strips.  The reference
    runs this per-PML-patch; here the strips are regions of one array and
    the interior split values are re-fed from the regular fields every step
    (the analog of PML::Exchange feeding the PML guard cells), so only the
    strip values carry split dynamics before they are damped in real space.

    Split keys are (comp, dir) tuples, e.g. ("Ex", "y") for the reference's
    Exy (PMLComponent.H ordering: xy/xz[/xx], yz/yx[/yy], zx/zy[/zz]).
    """

    def __init__(
        self,
        geom,
        staggering: Dict,
        dt: float,
        n_order: int = 16,
        collocated_grid: bool = False,
        v_galilean=(0.0, 0.0, 0.0),
        dive_cleaning: bool = False,
        divb_cleaning: bool = False,
        dtype=jnp.float64,
    ):
        if dive_cleaning != divb_cleaning:
            raise NotImplementedError(
                "PML-PSATD requires do_pml_dive_cleaning == "
                "do_pml_divb_cleaning (PsatdAlgorithmPml.cpp only implements "
                "the neither/both branches)"
            )
        ndim = geom.ndim
        if ndim == 1:
            raise NotImplementedError("PML in Cartesian 1D geometry")
        self.geom = geom
        self.staggering = staggering
        self.dt = dt
        self.cleaning = dive_cleaning
        self.is_galilean = any(v != 0.0 for v in v_galilean)
        self.n_fft = tuple(geom.n_cell)

        ks, kmods, shifts = [], [], []
        for d in range(ndim):
            k = 2.0 * np.pi * np.fft.fftfreq(self.n_fft[d], d=geom.dx[d])
            if d == 0 and self.n_fft[d] % 2 == 0:
                k = k.copy()
                k[self.n_fft[d] // 2] = abs(k[self.n_fft[d] // 2])
            ks.append(k)
            kmods.append(modified_k(k, geom.dx[d], n_order, collocated_grid))
            shifts.append(np.exp(-1j * k * 0.5 * geom.dx[d]))
        bc = PsatdSolver._np_bcast
        self._shift_fwd = [
            jnp.asarray(bc(shifts[d], d, ndim)) for d in range(ndim)
        ]
        self._shift_bwd = [
            jnp.asarray(bc(np.conj(shifts[d]), d, ndim)) for d in range(ndim)
        ]

        # full xyz modified-k triple over the box (ky = 0 in 2D)
        zeros = np.zeros(self.n_fft)
        if ndim == 3:
            kx = bc(kmods[0], 0, ndim) + zeros
            ky = bc(kmods[1], 1, ndim) + zeros
            kz = bc(kmods[2], 2, ndim) + zeros
        else:
            kx = bc(kmods[0], 0, ndim) + zeros
            ky = zeros
            kz = bc(kmods[1], 1, ndim) + zeros
        kx2, ky2, kz2 = kx * kx, ky * ky, kz * kz
        k2 = kx2 + ky2 + kz2
        knorm = np.sqrt(k2)
        C = np.cos(_c * knorm * dt)
        S_ck = np.where(
            knorm != 0.0,
            np.sin(_c * knorm * dt) / np.where(knorm == 0, 1, _c * knorm),
            dt,
        )
        inv_k2 = np.where(k2 != 0.0, 1.0 / np.where(k2 == 0, 1, k2), 0.0)
        knz = knorm != 0.0
        self._knz = jnp.asarray(knz)

        # C1..C9 (PsatdAlgorithmPml.cpp:208-216); identity at k = 0
        self._C1 = jnp.asarray(np.where(knz, (kx2 * C + ky2 + kz2) * inv_k2, 1.0))
        self._C2 = jnp.asarray(np.where(knz, (kx2 + ky2 * C + kz2) * inv_k2, 1.0))
        self._C3 = jnp.asarray(np.where(knz, (kx2 + ky2 + kz2 * C) * inv_k2, 1.0))
        self._C4 = jnp.asarray(kx2 * (C - 1.0) * inv_k2)
        self._C5 = jnp.asarray(ky2 * (C - 1.0) * inv_k2)
        self._C6 = jnp.asarray(kz2 * (C - 1.0) * inv_k2)
        self._C7 = jnp.asarray(ky * kz * (1.0 - C) * inv_k2)
        self._C8 = jnp.asarray(kx * kz * (1.0 - C) * inv_k2)
        self._C9 = jnp.asarray(kx * ky * (1.0 - C) * inv_k2)

        I = 1j
        if not self.cleaning:
            # C10..C22 (:221-233)
            dS = dt - S_ck
            self._C10 = jnp.asarray(I * _c2 * kx * ky * kz * dS * inv_k2)
            self._C11 = jnp.asarray(I * _c2 * ky2 * kz * dS * inv_k2)
            self._C12 = jnp.asarray(I * _c2 * kz2 * ky * dS * inv_k2)
            self._C13 = jnp.asarray(I * _c2 * kz2 * kx * dS * inv_k2)
            self._C14 = jnp.asarray(I * _c2 * kx2 * kz * dS * inv_k2)
            self._C15 = jnp.asarray(I * _c2 * kx2 * ky * dS * inv_k2)
            self._C16 = jnp.asarray(I * _c2 * ky2 * kx * dS * inv_k2)
            self._C17 = jnp.asarray(
                I * _c2 * kx * (ky2 * dt + (kz2 + kx2) * S_ck) * inv_k2)
            self._C18 = jnp.asarray(
                I * _c2 * kx * (kz2 * dt + (ky2 + kx2) * S_ck) * inv_k2)
            self._C19 = jnp.asarray(
                I * _c2 * ky * (kz2 * dt + (kx2 + ky2) * S_ck) * inv_k2)
            self._C20 = jnp.asarray(
                I * _c2 * ky * (kx2 * dt + (kz2 + ky2) * S_ck) * inv_k2)
            self._C21 = jnp.asarray(
                I * _c2 * kz * (kx2 * dt + (ky2 + kz2) * S_ck) * inv_k2)
            self._C22 = jnp.asarray(
                I * _c2 * kz * (ky2 * dt + (kx2 + kz2) * S_ck) * inv_k2)
        else:
            # C23..C25 (:292-294)
            self._C23 = jnp.asarray(I * _c2 * kx * S_ck)
            self._C24 = jnp.asarray(I * _c2 * ky * S_ck)
            self._C25 = jnp.asarray(I * _c2 * kz * S_ck)

        if self.is_galilean:
            # T2 = exp(i w_c dt), w_c on CENTERED modified k (:428-441)
            active = {2: (0, 2), 3: (0, 1, 2)}[ndim]
            w_c = np.zeros(self.n_fft)
            for d in range(ndim):
                vg = v_galilean[active[d]]
                if vg == 0.0:
                    continue
                kc = modified_k(ks[d], geom.dx[d], n_order, True)
                w_c = w_c + bc(kc, d, ndim) * vg
            self._T2 = jnp.asarray(np.exp(I * w_c * dt))
        else:
            self._T2 = 1.0

    def split_dirs(self, comp: str) -> tuple:
        return pml_split_dirs(comp, self.cleaning)

    def _fwd(self, arr, comp):
        F = jnp.fft.fftn(arr)
        for d in range(self.geom.ndim):
            if self.staggering[comp][d] == 0:
                F = F * self._shift_fwd[d]
        return F

    def _bwd(self, F, comp):
        for d in range(self.geom.ndim):
            if self.staggering[comp][d] == 0:
                F = F * self._shift_bwd[d]
        return jnp.fft.ifftn(F).real

    def push(self, splits: Dict):
        """One PML-PSATD step on {(comp, dir): real array} splits."""
        K = {key: self._fwd(arr, key[0]) for key, arr in splits.items()}

        def tot(nm):
            s = None
            for key, v in K.items():
                if key[0] == nm:
                    s = v if s is None else s + v
            return s

        Ex, Ey, Ez = tot("Ex"), tot("Ey"), tot("Ez")
        Bx, By, Bz = tot("Bx"), tot("By"), tot("Bz")
        T2 = self._T2
        C1, C2, C3 = self._C1, self._C2, self._C3
        C4, C5, C6 = self._C4, self._C5, self._C6
        C7, C8, C9 = self._C7, self._C8, self._C9
        out = {}
        if not self.cleaning:
            Exy, Exz = K[("Ex", "y")], K[("Ex", "z")]
            Eyx, Eyz = K[("Ey", "x")], K[("Ey", "z")]
            Ezx, Ezy = K[("Ez", "x")], K[("Ez", "y")]
            Bxy, Bxz = K[("Bx", "y")], K[("Bx", "z")]
            Byx, Byz = K[("By", "x")], K[("By", "z")]
            Bzx, Bzy = K[("Bz", "x")], K[("Bz", "y")]
            C10, C11, C12, C13 = self._C10, self._C11, self._C12, self._C13
            C14, C15, C16 = self._C14, self._C15, self._C16
            C17, C18, C19 = self._C17, self._C18, self._C19
            C20, C21, C22 = self._C20, self._C21, self._C22
            # (PsatdAlgorithmPml.cpp:252-287)
            out[("Ex", "y")] = T2 * (C2 * Exy + C5 * Exz + C9 * Ey
                                     + C10 * Bx + C11 * By + C19 * Bz)
            out[("Ex", "z")] = T2 * (C6 * Exy + C3 * Exz + C8 * Ez
                                     - C10 * Bx - C22 * By - C12 * Bz)
            out[("Ey", "z")] = T2 * (C3 * Eyz + C6 * Eyx + C7 * Ez
                                     + C21 * Bx + C10 * By + C13 * Bz)
            out[("Ey", "x")] = T2 * (C9 * Ex + C4 * Eyz + C1 * Eyx
                                     - C14 * Bx - C10 * By - C18 * Bz)
            out[("Ez", "x")] = T2 * (C8 * Ex + C1 * Ezx + C4 * Ezy
                                     + C15 * Bx + C17 * By + C10 * Bz)
            out[("Ez", "y")] = T2 * (C7 * Ey + C5 * Ezx + C2 * Ezy
                                     - C20 * Bx - C16 * By - C10 * Bz)
            out[("Bx", "y")] = T2 * (C2 * Bxy + C5 * Bxz + C9 * By
                                     - (C10 * Ex + C11 * Ey + C19 * Ez) / _c2)
            out[("Bx", "z")] = T2 * (C6 * Bxy + C3 * Bxz + C8 * Bz
                                     + (C10 * Ex + C22 * Ey + C12 * Ez) / _c2)
            out[("By", "z")] = T2 * (C3 * Byz + C6 * Byx + C7 * Bz
                                     - (C21 * Ex + C10 * Ey + C13 * Ez) / _c2)
            out[("By", "x")] = T2 * (C9 * Bx + C4 * Byz + C1 * Byx
                                     + (C14 * Ex + C10 * Ey + C18 * Ez) / _c2)
            out[("Bz", "x")] = T2 * (C8 * Bx + C1 * Bzx + C4 * Bzy
                                     - (C15 * Ex + C17 * Ey + C10 * Ez) / _c2)
            out[("Bz", "y")] = T2 * (C7 * By + C5 * Bzx + C2 * Bzy
                                     + (C20 * Ex + C16 * Ey + C10 * Ez) / _c2)
        else:
            F, G = tot("F"), tot("G")
            Exx, Exy, Exz = K[("Ex", "x")], K[("Ex", "y")], K[("Ex", "z")]
            Eyx, Eyy, Eyz = K[("Ey", "x")], K[("Ey", "y")], K[("Ey", "z")]
            Ezx, Ezy, Ezz = K[("Ez", "x")], K[("Ez", "y")], K[("Ez", "z")]
            Bxx, Bxy, Bxz = K[("Bx", "x")], K[("Bx", "y")], K[("Bx", "z")]
            Byx, Byy, Byz = K[("By", "x")], K[("By", "y")], K[("By", "z")]
            Bzx, Bzy, Bzz = K[("Bz", "x")], K[("Bz", "y")], K[("Bz", "z")]
            Fx, Fy, Fz = K[("F", "x")], K[("F", "y")], K[("F", "z")]
            Gx, Gy, Gz = K[("G", "x")], K[("G", "y")], K[("G", "z")]
            C23, C24, C25 = self._C23, self._C24, self._C25
            # (PsatdAlgorithmPml.cpp:296-371)
            out[("Ex", "x")] = T2 * (C1 * Exx + C4 * Exy + C4 * Exz
                                     - C9 * Ey - C8 * Ez + C23 * F)
            out[("Ex", "y")] = T2 * (C5 * Exx + C2 * Exy + C5 * Exz
                                     + C9 * Ey + C24 * Bz - C7 * G)
            out[("Ex", "z")] = T2 * (C6 * Exx + C6 * Exy + C3 * Exz
                                     + C8 * Ez - C25 * By + C7 * G)
            out[("Ey", "x")] = T2 * (C9 * Ex + C1 * Eyx + C4 * Eyy
                                     + C4 * Eyz - C23 * Bz + C8 * G)
            out[("Ey", "y")] = T2 * (-C9 * Ex + C5 * Eyx + C2 * Eyy
                                     + C5 * Eyz - C7 * Ez + C24 * F)
            out[("Ey", "z")] = T2 * (C6 * Eyx + C6 * Eyy + C3 * Eyz
                                     + C7 * Ez + C25 * Bx - C8 * G)
            out[("Ez", "x")] = T2 * (C8 * Ex + C1 * Ezx + C4 * Ezy
                                     + C4 * Ezz + C23 * By - C9 * G)
            out[("Ez", "y")] = T2 * (C7 * Ey + C5 * Ezx + C2 * Ezy
                                     + C5 * Ezz - C24 * Bx + C9 * G)
            out[("Ez", "z")] = T2 * (-C8 * Ex - C7 * Ey + C6 * Ezx
                                     + C6 * Ezy + C3 * Ezz + C25 * F)
            out[("Bx", "x")] = T2 * (C1 * Bxx + C4 * Bxy + C4 * Bxz
                                     - C9 * By - C8 * Bz + C23 / _c2 * G)
            out[("Bx", "y")] = T2 * (-C24 / _c2 * Ez + C5 * Bxx + C2 * Bxy
                                     + C5 * Bxz + C9 * By + C7 * F)
            out[("Bx", "z")] = T2 * (C25 / _c2 * Ey + C6 * Bxx + C6 * Bxy
                                     + C3 * Bxz + C8 * Bz - C7 * F)
            out[("By", "x")] = T2 * (C23 / _c2 * Ez + C9 * Bx + C1 * Byx
                                     + C4 * Byy + C4 * Byz - C8 * F)
            out[("By", "y")] = T2 * (-C9 * Bx + C5 * Byx + C2 * Byy
                                     + C5 * Byz - C7 * Bz + C24 / _c2 * G)
            out[("By", "z")] = T2 * (-C25 / _c2 * Ex + C6 * Byx + C6 * Byy
                                     + C3 * Byz + C7 * Bz + C8 * F)
            out[("Bz", "x")] = T2 * (-C23 / _c2 * Ey + C8 * Bx + C1 * Bzx
                                     + C4 * Bzy + C4 * Bzz + C9 * F)
            out[("Bz", "y")] = T2 * (C24 / _c2 * Ex + C7 * By + C5 * Bzx
                                     + C2 * Bzy + C5 * Bzz - C9 * F)
            out[("Bz", "z")] = T2 * (-C8 * Bx - C7 * By + C6 * Bzx
                                     + C6 * Bzy + C3 * Bzz + C25 / _c2 * G)
            out[("F", "x")] = T2 * (C23 / _c2 * Ex + C8 * By - C9 * Bz
                                    + C1 * Fx + C4 * Fy + C4 * Fz)
            out[("F", "y")] = T2 * (C24 / _c2 * Ey - C7 * Bx + C9 * Bz
                                    + C5 * Fx + C2 * Fy + C5 * Fz)
            out[("F", "z")] = T2 * (C25 / _c2 * Ez + C7 * Bx - C8 * By
                                    + C6 * Fx + C6 * Fy + C3 * Fz)
            out[("G", "x")] = T2 * (-C8 * Ey + C9 * Ez + C23 * Bx
                                    + C1 * Gx + C4 * Gy + C4 * Gz)
            out[("G", "y")] = T2 * (C7 * Ex - C9 * Ez + C24 * By
                                    + C5 * Gx + C2 * Gy + C5 * Gz)
            out[("G", "z")] = T2 * (-C7 * Ex + C8 * Ey + C25 * Bz
                                    + C6 * Gx + C6 * Gy + C3 * Gz)

        return {
            key: self._bwd(jnp.where(self._knz, v, K[key]), key[0])
            for key, v in out.items()
        }
