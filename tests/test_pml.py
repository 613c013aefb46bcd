"""PML absorption test: an obliquely-launched laser pulse must be absorbed.

The reference's checksum for this deck measures residual reflections; our PML
matches the reference residuals to ~30% (known gap, tracked) while absorbing
>99.9% of the pulse energy, so this test gates on absorption physics.
"""

import os

import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_2d_pml_absorbs_pulse():
    deck = os.path.join(REFERENCE, "Examples/Tests/pml/inputs_test_2d_pml_x_yee")
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve(120)  # pulse fully formed, reaching the PML
    def energy(f):
        # components live on different staggered (n vs n+1) grids: sum each
        return float(sum((getattr(f, c) ** 2).sum() for c in ("Ex", "Ey", "Ez")))

    peak = energy(sim.state.fields)
    sim.evolve()  # to step 300: pulse crossed the boundary
    residual = energy(sim.state.fields)
    assert residual < 1e-3 * peak, (residual, peak)


@pytest.mark.slow
def test_2d_pml_x_yee_golden():
    """Residual-reflection parity: the stock pml_x_yee deck lands on its
    reference checksums (benchmarks_json/test_2d_pml_x_yee.json).  The
    residual E/B sums after the pulse exits ARE the reflection measurement,
    so this gates the Berenger split + quadratic sigma profile exactly."""
    import json

    from tests.conftest import REFERENCE, reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/pml/inputs_test_2d_pml_x_yee"
    )
    sim.init()
    sim.evolve()
    comp = sim.checksums()
    gold = json.load(open(
        f"{REFERENCE}/Regression/Checksum/benchmarks_json/"
        "test_2d_pml_x_yee.json"
    ))
    for group, entries in gold.items():
        for key, rv in entries.items():
            cv = comp[group][key]
            assert abs(cv - rv) <= 1e-3 * abs(rv) + 1e-40, (key, cv, rv)
