"""Theta/semi-implicit EM solver vs the reference's own acceptance gates.

The reference's implicit tests (Examples/Tests/implicit/analysis_1d.py) gate
on total (field + particle) energy conservation: 1e-14 relative for
theta-implicit (exactly energy conserving at theta = 0.5) and 2.5e-5 for
semi-implicit, over the full 100-step deck.  Golden checksums are not
applicable (the decks sample Gaussian thermal momenta from the AMReX RNG
stream).
"""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.diagnostics.reduced import compute_reduced

DECKS = f"{REFERENCE}/Examples/Tests/implicit"


def _total_energy(sim):
    fe = compute_reduced("FieldEnergy", sim.state, sim.cfg, sim.staggering)
    pe = compute_reduced("ParticleEnergy", sim.state, sim.cfg, sim.staggering)
    return fe["total_lev0(J)"] + pe["total(J)"]


def _energy_drift(deck, nsteps):
    sim = Simulation.from_deck(deck, output_dir="/tmp/implicit_diags")
    sim.diags = []
    sim.reduced = []
    sim.init()
    energies = [_total_energy(sim)]
    for _ in range(nsteps):
        sim.evolve(1)
        energies.append(_total_energy(sim))
    e = np.array(energies)
    return np.abs((e - e[0]) / e[0]).max()


@pytest.mark.skipif(not reference_available(), reason="needs /root/reference")
def test_theta_implicit_energy_conservation_fast():
    """Short-run smoke gate for the fast tier (same 1e-14/step-class bound)."""
    drift = _energy_drift(
        f"{DECKS}/inputs_test_1d_theta_implicit_picard", 20
    )
    assert drift < 1e-14, drift


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="needs /root/reference")
def test_theta_implicit_energy_conservation_full():
    """Full 100-step deck at the reference's own tolerance
    (Examples/Tests/implicit/analysis_1d.py:35-38)."""
    drift = _energy_drift(
        f"{DECKS}/inputs_test_1d_theta_implicit_picard", 100
    )
    assert drift < 1e-14, drift


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="needs /root/reference")
def test_semi_implicit_energy_conservation_full():
    drift = _energy_drift(
        f"{DECKS}/inputs_test_1d_semi_implicit_picard", 100
    )
    assert drift < 2.5e-5, drift


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="needs /root/reference")
def test_theta_implicit_jfnk_energy_conservation():
    """Newton/JFNK nonlinear solver on the 2D vandb deck (reduced size):
    theta=0.5 with converged inner particle iterations conserves total
    energy to 1e-14-class (analysis_vandb_jfnk_2d.py gates 2e-14 at full
    size).  The Jacobian-vector product is the exact jax.jvp."""
    sim = Simulation.from_deck(
        f"{DECKS}/inputs_test_2d_theta_implicit_jfnk_vandb",
        overrides=(
            "amr.n_cell=16 16",
            "my_constants.nppcz=4",
            "max_step=8",
        ),
        output_dir="/tmp/implicit_jfnk",
    )
    sim.diags = []
    sim.reduced = []
    assert sim.cfg.implicit_nonlinear == "newton"
    sim.init()
    energies = [_total_energy(sim)]
    for _ in range(8):
        sim.evolve(1)
        energies.append(_total_energy(sim))
    e = np.array(energies)
    drift = np.abs((e - e[0]) / e[0]).max()
    assert drift < 5e-14, drift
