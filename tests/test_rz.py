"""RZ geometry vs the reference's own analytic acceptance gate.

The stock RZ Langmuir deck (Examples/Tests/langmuir/inputs_test_rz_langmuir_
multi) is gated by analysis_rz.py at 12% max error of Er and Ez against the
analytic plasma-wave solution at the final time.  Golden checksums are not
applicable (the deck's default random_theta samples the AMReX RNG stream).
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.rz.core import rz_cell_centered_output

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DECK = f"{REFERENCE}/Examples/Tests/langmuir/inputs_test_rz_langmuir_multi"


def _theory(cfg, t0):
    from scipy.constants import c, e, epsilon_0, m_e

    eps, n, w0 = 0.01, 2.0e24, 5.0e-6
    rmin, zmin = cfg.geometry.prob_lo
    rmax, zmax = cfg.geometry.prob_hi
    nr, nz = cfg.geometry.n_cell
    k0 = 2.0 * np.pi * 2 / (zmax - zmin)
    wp = np.sqrt(n * e**2 / (m_e * epsilon_0))
    dr, dz = (rmax - rmin) / nr, (zmax - zmin) / nz
    coords = np.indices([nr, nz], "d")
    rr = rmin + (coords[0] + 0.5) * dr
    zz = zmin + (coords[1] + 0.5) * dz
    er = (eps * m_e * c**2 / e * 2 * rr / w0**2 * np.exp(-rr**2 / w0**2)
          * np.sin(k0 * zz) * np.sin(wp * t0))
    ez = (-eps * m_e * c**2 / e * k0 * np.exp(-rr**2 / w0**2)
          * np.cos(k0 * zz) * np.sin(wp * t0))
    return er, ez


def _run(nsteps=None):
    overrides = () if nsteps is None else (f"max_step={nsteps}",)
    sim = Simulation.from_deck(DECK, overrides=overrides,
                               output_dir="/tmp/rz_test_diags")
    sim.diags = []
    sim.reduced = []
    sim.init()
    sim.evolve()
    return sim


@pytest.mark.slow
def test_rz_langmuir_full():
    """Full 80-step deck at the reference's own tolerance
    (analysis_rz.py:143 tolerance_rel = 0.12)."""
    sim = _run()
    out = rz_cell_centered_output(sim.state, sim.cfg)
    er_th, ez_th = _theory(sim.cfg, float(sim.state.time))
    for nm, th in (("Er", er_th), ("Ez", ez_th)):
        err = np.abs(np.asarray(out[nm]) - th).max() / np.abs(th).max()
        assert err < 0.12, (nm, err)


def test_rz_langmuir_short():
    """Fast-tier smoke: 20 steps, comparable pointwise accuracy."""
    sim = _run(20)
    out = rz_cell_centered_output(sim.state, sim.cfg)
    er_th, ez_th = _theory(sim.cfg, float(sim.state.time))
    for nm, th in (("Er", er_th), ("Ez", ez_th)):
        err = np.abs(np.asarray(out[nm]) - th).max() / np.abs(th).max()
        assert err < 0.12, (nm, err)
    # charge bookkeeping: total weight conserved (absorbing r wall untouched)
    for nm, sp in sim.state.species.items():
        assert float(sp.w.sum()) > 0


def test_rz_injection_weights():
    """Radially weighted injection: sum of weights equals the species'
    total particle number integral n0 * pi * (r_max_sp^2) * Lz."""
    sim = Simulation.from_deck(DECK, overrides=("max_step=0",),
                               output_dir="/tmp/rz_test_diags")
    sim.diags = []
    sim.reduced = []
    sim.init()
    cfg = sim.cfg
    n0 = 2.0e24
    r_sp = 18e-6  # electrons.xmax (radius bound)
    lz = cfg.geometry.prob_hi[1] - cfg.geometry.prob_lo[1]
    expected = n0 * np.pi * r_sp**2 * lz
    total_w = float(sim.state.species["electrons"].w.sum())
    # r-binned injection quantizes the radius bound at the sub-cell level
    assert abs(total_w - expected) / expected < 2e-2, total_w
