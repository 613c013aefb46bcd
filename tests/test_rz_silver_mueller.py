"""RZ Silver-Mueller absorbing boundaries (z walls + r=rmax).

The guard-cell B layer outside an absorbing wall is dynamic state
(FieldState.smg) evolved by the first-order recurrence of
ApplySilverMuellerBoundary.cpp; the wall-node E updates read it back
(rz/core.py apply_silver_mueller_rz / _sm_wall_e_fix).
"""

import json
import os

import numpy as np
import pytest

from .conftest import REFERENCE, reference_available


@pytest.mark.slow
def test_rz_silver_mueller_z_deck():
    """The reference deck's own gate (analysis.py:42-48): a laser pulse
    (peak ~6 V/m) is emitted toward the walls; after 500 steps every
    diag-output E value must be below 0.01 V/m.  Field checksums land on
    the reference goldens at ~1e-9 (the scheme is reference-exact)."""
    if not reference_available():
        pytest.skip("reference not mounted")
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.rz.core import rz_cell_centered_output

    sim = Simulation.from_deck(
        os.path.join(
            REFERENCE,
            "Examples/Tests/silver_mueller/inputs_test_rz_silver_mueller_z",
        ),
        overrides=("diagnostics.diags_names =",),
    )
    sim.init()
    sim.evolve()
    out = rz_cell_centered_output(sim.state, sim.cfg)
    for k in ("Er", "Et", "Ez"):
        assert np.abs(np.asarray(out[k])).max() < 0.01, k
    gold = json.load(open(os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/test_rz_silver_mueller_z.json",
    )))["lev=0"]
    ours = sim.checksums()["lev=0"]
    for q in ("Er", "Et", "Ez", "Br", "Bt", "Bz"):
        ref = gold[q]
        got = ours[q]
        assert abs(got - ref) <= 1e-8 * max(abs(ref), 1e-30), (q, got, ref)
