"""ECT conformal FDTD solver (embedded_boundary_rotated_cube family).

Reference: EvolveBCartesianECT (EvolveB.cpp:220-385), EvolveRhoCartesianECT
(EvolveECTRho.cpp), face extensions (WarpXFaceExtensions.cpp), geometry
(WarpXInitEB.cpp ComputeEdgeLengths/ComputeFaceAreas/MarkCells).

Gates are the reference's own analyses: a TM(0,1,1) eigenmode of a PEC cube
rotated against the grid must hold its analytic field pattern after ~1.125
periods — rel l2 error < 1e-2 in 3D (analysis_fields_3d.py:56) and < 1e-1
in 2D (analysis_fields_2d.py:66).  A staircase solver fails these by an
order of magnitude; the conformal cut-cell update with area borrowing is
what keeps the mode frequency exact.
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

C = 299792458.0
MU0 = 1.25663706212e-06
EB_DIR = f"{REFERENCE}/Examples/Tests/embedded_boundary_rotated_cube"


def test_ect_geometry_plane_cut():
    """Edge/face fractions are exact for a planar cut."""
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.solvers.ect import ect_geometry

    geom = Geometry(ndim=3, n_cell=(4, 4, 4), prob_lo=(0, 0, 0),
                    prob_hi=(1, 1, 1), periodic=(False,) * 3)

    def phi_at(c):
        return c[0] - 0.31  # covered where x > 0.31

    geo = ect_geometry(phi_at, geom, geom.prob_lo)
    dA = 0.0625
    np.testing.assert_allclose(geo["S"][0][:, 0, 0] / dA, [1, 1, 0, 0, 0])
    # cut fraction (0.31 - 0.25) / 0.25 = 0.24 before BCK/borrowing
    np.testing.assert_allclose(geo["edges"]["Ex"][:, 0, 0] / 0.25,
                               [1.0, 0.24, 0, 0])
    # the unstable 0.24-fraction Sy faces borrowed up to S_stab = 0.5 dA
    assert (geo["flags"][1][1, :, :] == 0).all()
    np.testing.assert_allclose(geo["S_mod"][1][1, :, :] / dA, 0.5)


def test_expression_assignment_segments():
    """AMReX parser 'a=...; b=...; expr' local-symbol syntax."""
    from warpx_tpu.utils.expression import compile_expression

    fn = compile_expression(
        "xr=x*2+c0; zr=xr+z; xr*zr", ("x", "z"), {"c0": 3.0}
    )
    assert float(fn(2.0, 1.0)) == pytest.approx(7.0 * 8.0)


def _run(deck_path):
    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(deck_path)
    sim.init()
    sim.evolve()
    return sim


def test_ect_rotated_cube_2d():
    sim = _run(f"{EB_DIR}/inputs_test_2d_embedded_boundary_rotated_cube")
    t = float(sim.state.time)
    theta = np.pi / 8
    m, n = 0, 1
    Lx = Lz = 1.06
    dx = 1.6 / 32
    By_s = np.asarray(sim.state.fields.By)[:32, :32]
    x = np.arange(32) * dx - 0.8
    X, Z = np.meshgrid(x, x, indexing="ij")
    xr = X * np.cos(-theta) + Z * np.sin(-theta)
    zr = -X * np.sin(-theta) + Z * np.cos(-theta)
    By_th = (
        MU0
        * np.cos(m * np.pi / Lx * (xr - Lx / 2))
        * np.cos(n * np.pi / Lz * (zr - Lz / 2))
        * np.cos(np.pi / Lx * C * t)
    ) * (By_s != 0)
    err = np.sqrt(np.sum((By_s - By_th) ** 2) / np.sum(By_th**2))
    assert err < 1e-1, err  # analysis_fields_2d.py rel_tol_err


@pytest.mark.slow
def test_ect_rotated_cube_3d():
    sim = _run(f"{EB_DIR}/inputs_test_3d_embedded_boundary_rotated_cube")
    t = float(sim.state.time)
    theta = np.pi / 6
    n, p = 1, 1
    Ly = Lz = Lx = 1.0
    h_2 = (n * np.pi / Ly) ** 2 + (p * np.pi / Lz) ** 2
    dx = 1.6 / 64
    ct = np.cos(np.sqrt(2) * np.pi / Lx * C * t)

    def theory(shifts, ny, nz):
        x0 = (np.arange(64) + shifts[0]) * dx - 0.8
        y0 = (np.arange(ny) + shifts[1]) * dx - 0.8
        z0 = (np.arange(nz) + shifts[2]) * dx - 0.8
        _, Y0, Z0 = np.meshgrid(x0, y0, z0, indexing="ij")
        y = Y0 * np.cos(-theta) - Z0 * np.sin(-theta)
        z = Y0 * np.sin(-theta) + Z0 * np.cos(-theta)
        By = (
            -2 / h_2 * MU0 * (n * np.pi / Ly) * (p * np.pi / Lz)
            * np.sin(n * np.pi / Ly * (y - Ly / 2))
            * np.cos(p * np.pi / Lz * (z - Lz / 2)) * ct
        )
        Bz = (
            MU0 * np.cos(n * np.pi / Ly * (y - Ly / 2))
            * np.sin(p * np.pi / Lz * (z - Lz / 2)) * ct
        )
        return By, Bz

    By_s = np.asarray(sim.state.fields.By)[:, :64, :64]
    By_t, Bz_t = theory([0.5, 0.0, 0.5], 64, 64)
    By_th = (By_t * np.cos(theta) - Bz_t * np.sin(theta)) * (By_s != 0)
    err_y = np.sqrt(np.sum((By_s - By_th) ** 2) / np.sum(By_th**2))
    assert err_y < 1e-2, err_y  # analysis_fields_3d.py rel_tol_err

    Bz_s = np.asarray(sim.state.fields.Bz)[:, :64, :64]
    By_t2, Bz_t2 = theory([0.5, 0.5, 0.0], 64, 64)
    Bz_th = (By_t2 * np.sin(theta) + Bz_t2 * np.cos(theta)) * (Bz_s != 0)
    err_z = np.sqrt(np.sum((Bz_s - Bz_th) ** 2) / np.sum(Bz_th**2))
    assert err_z < 1e-2, err_z
