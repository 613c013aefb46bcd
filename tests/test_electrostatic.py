"""Electrostatic solver tests (labframe + relativistic sphere expansion).

The reference solves Poisson with AMReX MLMG on the nodal grid; we invert the
7-point nodal Laplacian exactly with fast transforms.  The two discrete
operators differ slightly (MLMG's nodal FEM-type stencil), so parity is at
the ~1e-2 level (both within the example's own discretization error vs the
analytic sphere solution); tracked as a known gap.
"""

import os

import pytest

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.diagnostics.checksum import compare_checksums

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [
        "test_3d_electrostatic_sphere_lab_frame",
        "test_3d_electrostatic_sphere",
    ],
)
def test_electrostatic_sphere(name):
    deck = os.path.join(
        REFERENCE, f"Examples/Tests/electrostatic_sphere/inputs_{name}"
    )
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve()
    compare_checksums(
        sim.checksums(),
        os.path.join(
            REFERENCE, f"Regression/Checksum/benchmarks_json/{name}.json"
        ),
        rtol=3e-2,
    )
