"""Godfrey NCI corrector: a cold relativistic drifting plasma (the boosted-
frame configuration) is numerical-Cherenkov unstable in plain FDTD; with
warpx.use_fdtd_nci_corr the EM energy growth must be suppressed by orders
of magnitude (reference: NCIGodfreyFilter.cpp, Examples/Tests/nci_fdtd
_stability)."""

import numpy as np
import pytest

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig, SpeciesConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.solvers.yee import compute_dt_yee


def _drift_sim(nci: bool):
    geom = Geometry(2, (32, 32), (0.0, 0.0), (16e-6, 16e-6), (True, True))
    gamma = 10.0
    uz = np.sqrt(gamma**2 - 1.0)
    species = tuple(
        SpeciesConfig(
            name=nm, charge=q, mass=m,
            injection_style="nuniformpercell",
            num_particles_per_cell_each_dim=(2, 2),
            profile="constant", density=1.0e27,
            momentum_distribution="gaussian", uz=uz,
            ux_th=1e-3, uy_th=1e-3, uz_th=1e-3,
        )
        for nm, q, m in (
            ("electrons", -constants.q_e, constants.m_e),
            ("ions", constants.q_e, 5.0 * constants.m_e),
        )
    )
    cfg = SimConfig(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.98),
        particle_shape=3, species=species, use_nci_corr=nci,
    )
    return Simulation(cfg)


def _em_energy(sim):
    f = sim.state.fields
    e = sum(float((np.asarray(getattr(f, c)) ** 2).sum()) for c in ("Ex", "Ey", "Ez"))
    b = sum(float((np.asarray(getattr(f, c)) ** 2).sum()) for c in ("Bx", "By", "Bz"))
    return 0.5 * constants.ep0 * e + 0.5 / constants.mu0 * b


@pytest.mark.slow
def test_nci_corrector_suppresses_instability():
    energies = {}
    for nci in (False, True):
        sim = _drift_sim(nci)
        sim.init()
        sim.evolve(600)
        energies[nci] = _em_energy(sim)
    # the unfiltered run must have gone NCI-unstable and the corrected run
    # must hold the EM energy orders of magnitude lower
    assert energies[False] > 30.0 * energies[True], energies
