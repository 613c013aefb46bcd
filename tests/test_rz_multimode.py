"""RZ azimuthal modes m >= 1 validated against full 3D Cartesian.

An x-polarized transverse velocity perturbation u_x = eps f(r) sin(k0 z)
is azimuthally m=1 in cylindrical decomposition (ur ~ cos(theta),
ut ~ -sin(theta)).  The RZ run with n_rz_azimuthal_modes=2 must reproduce
the 3D Cartesian fields of the same plasma oscillation on the theta=0
half-plane — the reference validates its RZ modes the same way
(Examples/Tests/langmuir/analysis_rz.py is the m=0 version; RZ LWFA decks
drive m=1 via the linearly polarized laser).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig, SpeciesConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation

c = constants.c
q_e = constants.q_e
m_e = constants.m_e

N0 = 2.0e24
WP = np.sqrt(N0 * q_e**2 / (constants.ep0 * m_e))
KP = WP / c
EPS = 0.01
K0 = 2 * np.pi / 20e-6
W0 = 5e-6
R_MAX = 20e-6
Z_HALF = 20e-6

_UX = f"{EPS}/{KP}*exp(-(x*x+y*y)/{W0}**2)*sin({K0}*z)"


def _species():
    common = dict(
        injection_style="nuniformpercell",
        profile="constant", density=N0,
        bounds_lo=(0.0 - R_MAX, -R_MAX, -Z_HALF),
        bounds_hi=(18e-6, R_MAX, Z_HALF),
    )
    els = SpeciesConfig(
        name="electrons", charge=-q_e, mass=m_e,
        num_particles_per_cell_each_dim=(2, 2, 2),
        momentum_distribution="parse_momentum_function",
        momentum_exprs=(_UX, "0", "0"),
        **common,
    )
    ions = SpeciesConfig(
        name="ions", charge=q_e, mass=1836.2 * m_e,
        num_particles_per_cell_each_dim=(2, 2, 2),
        momentum_distribution="at_rest",
        **common,
    )
    return els, ions


@pytest.mark.slow
def test_rz_m1_matches_3d():
    nsteps = 20
    # --- RZ run: 2 azimuthal modes
    geom_rz = Geometry(
        2, (32, 64), (0.0, -Z_HALF), (R_MAX, Z_HALF),
        periodic=(False, True), rz=True,
    )
    els, ions = _species()
    import dataclasses

    # RZ bounds: radial bound only positive; uses xmin/xmax as r bounds.
    # n_theta = 4 per cell: with n_theta = 2 the injection samples only
    # theta = +-pi/2 where an x-directed velocity has no radial component,
    # so the m=1 radial current is unsampled (the reference's m>=1 decks
    # use >= 4 theta points per cell for the same reason)
    els_rz = dataclasses.replace(
        els, bounds_lo=(-18e-6, -18e-6, -Z_HALF),
        bounds_hi=(18e-6, 18e-6, Z_HALF),
        num_particles_per_cell_each_dim=(2, 4, 2),
    )
    ions_rz = dataclasses.replace(
        ions, bounds_lo=(-18e-6, -18e-6, -Z_HALF),
        bounds_hi=(18e-6, 18e-6, Z_HALF),
        num_particles_per_cell_each_dim=(2, 4, 2),
    )
    from warpx_tpu.rz.core import compute_dt_rz, rz_cell_centered_output

    n_modes = 2
    dt = compute_dt_rz(R_MAX / 32, 2 * Z_HALF / 64, n_modes, 1.0)
    cfg_rz = SimConfig(
        geometry=geom_rz, max_step=nsteps, dt=dt,
        particle_shape=1, species=(els_rz, ions_rz), n_rz_modes=n_modes,
        use_filter=False, current_deposition="esirkepov",
        particle_bc_lo=("none", "periodic"),
        particle_bc_hi=("absorbing", "periodic"),
    )
    sim_rz = Simulation(cfg_rz)
    sim_rz.init()
    sim_rz.evolve()
    out_rz = rz_cell_centered_output(sim_rz.state, cfg_rz)
    t_rz = float(sim_rz.state.time)

    # --- 3D Cartesian run of the same configuration
    geom_3d = Geometry(
        3, (32, 32, 64), (-R_MAX, -R_MAX, -Z_HALF),
        (R_MAX, R_MAX, Z_HALF), periodic=(True, True, True),
    )
    cfg_3d = SimConfig(
        geometry=geom_3d, max_step=nsteps, dt=dt,
        particle_shape=1, species=(els, ions),
        use_filter=False, current_deposition="esirkepov",
    )
    sim_3d = Simulation(cfg_3d)
    sim_3d.init()
    sim_3d.evolve()
    t_3d = float(sim_3d.state.time)
    assert abs(t_rz - t_3d) < 1e-20

    f3 = sim_3d.state.fields
    ex3 = np.asarray(f3.Ex)  # (nx, ny, nz), staggered in x

    # Ex on the y=0 plane: Ex flags (0,1,1) -> cell-centered in x, nodal in
    # y (index ny/2 IS y=0) and nodal in z -> average to z cell centers
    ny = ex3.shape[1]
    ex_mid = ex3[:, ny // 2, :]
    ex_cc = 0.5 * (ex_mid + np.roll(ex_mid, -1, axis=1))
    # radial line at theta=0: x in (0, R_MAX), i.e. upper half of x index
    nx = ex_cc.shape[0]
    ex_line = ex_cc[nx // 2:, :]  # (16, nz) at centers (2j+1) R/32

    # RZ: Ex(theta=0) = Er(m0+m1 sum at theta=0); out_rz gives the mode sum
    er_rz = np.asarray(out_rz["Er"])  # (nr=32, nz)
    # match radial resolution: 3D has dx = R_MAX/16 along the +x line; RZ has
    # dr = R_MAX/32 -> average RZ pairs
    er_rz_c = 0.5 * (er_rz[0::2, :] + er_rz[1::2, :])  # (16, nz)

    scale = np.abs(ex_line).max()
    assert scale > 0
    # global RMS agreement.  Pointwise, the two DISCRETIZATIONS differ:
    # cylindrical Yee with axis rules vs the Cartesian grid's own m>1
    # square-grid harmonics — at z-gradient columns the near-axis profiles
    # deviate up to ~0.4 of peak at this resolution (open question whether
    # that shrinks with resolution; see NOTES_r4).  The integrated m=1
    # response (RMS, amplitude, mode purity) is the gate.
    err_rms = np.sqrt(np.mean((er_rz_c - ex_line) ** 2)) / scale
    assert err_rms < 0.08, err_rms
    # amplitudes agree
    assert abs(np.abs(er_rz_c).max() - scale) < 0.25 * scale

    # the m=1 content must actually be present (not collapsed to m=0):
    # Er's m=1 component dominates over m=0 for an x-polarized perturbation
    fr = sim_rz.state.fields
    er_full = np.asarray(fr.Ex)  # (C, nr, nz) component layout
    amp_m0 = np.abs(er_full[0]).max()
    amp_m1 = np.abs(er_full[1]).max()
    assert amp_m1 > 3.0 * amp_m0, (amp_m0, amp_m1)
