"""Force-free pusher test (reference Examples/Tests/particle_pusher).

Ex = -Vy*Bz exactly cancels the magnetic force; x must stay ~0 over 10000
steps (the Boris pusher fails at 2321 m; Higuera-Cary passes at ~1.1e-4,
reference analysis tolerance 1e-3).  The checksum quantities here are
error-level (analytically zero), so cross-implementation comparison uses the
physics criterion."""

import os

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_3d_particle_pusher_force_free():
    deck = os.path.join(
        REFERENCE, "Examples/Tests/particle_pusher/inputs_test_3d_particle_pusher"
    )
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve()
    sp = sim.state.species["positron"]
    x = float(np.asarray(sp.x)[np.asarray(sp.alive)][0])
    assert abs(x) < 1e-3  # analysis.py tolerance; Boris would give 2321
