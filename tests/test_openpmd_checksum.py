"""Golden checksums routed through the WRITTEN openPMD files.

Runs the 1D Langmuir reference deck with openPMD output enabled, then
computes the reference-style sum(abs(Q)) checksums FROM THE FILE ON DISK
and gates them against the reference golden JSON — so io/openpmd.py is
inside the correctness contract (SURVEY §4's lesson; round-2 Weak #10).
"""

import glob
import os

import pytest

from .conftest import REFERENCE, reference_available


@pytest.mark.slow
def test_langmuir_1d_checksums_from_file(tmp_path):
    if not reference_available():
        pytest.skip("reference not mounted")
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.diagnostics.checksum import (
        checksums_from_openpmd, compare_checksums,
    )

    deck = os.path.join(
        REFERENCE, "Examples/Tests/langmuir/inputs_test_1d_langmuir_multi"
    )
    out = str(tmp_path / "diags")
    sim = Simulation.from_deck(deck, output_dir=out)
    sim.init()
    sim.evolve()
    files = sorted(glob.glob(os.path.join(out, "**", "*.h5"),
                             recursive=True))
    assert files, f"no openPMD output written under {out}"
    cs = checksums_from_openpmd(files[-1], int(sim.state.step))
    diffs = compare_checksums(cs, os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/test_1d_langmuir_multi.json",
    ))
    for k, rel in diffs.items():
        assert rel < 1e-9, (k, rel)
