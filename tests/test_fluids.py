"""Cold relativistic fluid tests (MUSCL-Hancock + Higuera-Cary push).

Reference: Source/Fluids/WarpXFluidContainer.cpp, MusclHancockUtils.H.
Golden gates: the langmuir_fluids deck family at machine precision.
"""

import json
import os

import pytest

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.diagnostics.checksum import compare_checksums

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _run(nm):
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/langmuir_fluids/"
        f"inputs_test_{nm}_langmuir_fluid",
        overrides=("diagnostics.diags_names=", "warpx.verbose=0"),
    )
    sim.init()
    sim.evolve(-1)
    compare_checksums(
        sim.checksums(),
        os.path.join(
            REFERENCE,
            f"Regression/Checksum/benchmarks_json/test_{nm}_langmuir_fluid"
            ".json",
        ),
        rtol=1e-9,
    )


def test_langmuir_fluid_1d():
    _run("1d")


@pytest.mark.slow
def test_langmuir_fluid_2d():
    _run("2d")


@pytest.mark.slow
def test_langmuir_fluid_3d():
    _run("3d")
