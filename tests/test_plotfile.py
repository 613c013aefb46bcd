"""Plotfile flush format: exact round-trip + golden checksums from disk.

The writer/reader pair (io/plotfile.py) is the analog of the reference's
FlushFormatPlotfile (amrex::WriteMultiLevelPlotfile + particle WritePlotFile);
the golden gate reads the written plotfile back the way the reference's
Regression/Checksum/checksum.py reads plotfiles through yt.
"""

import glob
import os

import numpy as np
import pytest

from .conftest import REFERENCE, reference_available


def test_plotfile_roundtrip(tmp_path):
    from warpx_tpu.io.plotfile import (
        read_particles, read_plotfile, write_plotfile,
    )

    rng = np.random.default_rng(0)
    lev0 = {n: rng.normal(size=(8, 6, 4)) for n in ("Ex", "By", "jz")}
    lev1 = {n: rng.normal(size=(16, 12, 8)) for n in ("Ex", "By", "jz")}
    parts = {
        "electrons": {
            "x": rng.normal(size=17), "y": rng.normal(size=17),
            "z": rng.normal(size=17), "weight": rng.random(17),
            "momentum_x": rng.normal(size=17),
        }
    }
    p = str(tmp_path / "plt000010")
    write_plotfile(
        p, [lev0, lev1], prob_lo=(-1.0, -2.0, 0.0), prob_hi=(1.0, 2.0, 4.0),
        time=3.5e-13, step=10, ref_ratio=[(2, 2, 2)], particles=parts,
    )
    levels, meta = read_plotfile(p)
    assert meta["ndim"] == 3 and meta["step"] == 10
    assert meta["prob_lo"] == [-1.0, -2.0, 0.0]
    assert abs(meta["time"] - 3.5e-13) < 1e-25
    assert len(levels) == 2
    for lev, ref in zip(levels, (lev0, lev1)):
        for n, arr in ref.items():
            np.testing.assert_array_equal(lev[n], arr)
    back = read_particles(p, "electrons")
    for k, v in parts["electrons"].items():
        np.testing.assert_array_equal(back[k], v)


@pytest.mark.slow
def test_langmuir_1d_checksums_from_plotfile(tmp_path):
    if not reference_available():
        pytest.skip("reference not mounted")
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.diagnostics.checksum import (
        checksums_from_plotfile, compare_checksums,
    )

    deck = os.path.join(
        REFERENCE, "Examples/Tests/langmuir/inputs_test_1d_langmuir_multi"
    )
    out = str(tmp_path / "diags")
    sim = Simulation.from_deck(deck, output_dir=out)
    sim.init()
    sim.evolve()
    plts = sorted(glob.glob(os.path.join(out, "diag1*")))
    assert plts, f"no plotfile written under {out}"
    cs = checksums_from_plotfile(plts[-1])
    diffs = compare_checksums(cs, os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/test_1d_langmuir_multi.json",
    ))
    for k, rel in diffs.items():
        assert rel < 1e-9, (k, rel)
