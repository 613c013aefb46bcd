"""I/O tests: openPMD HDF5 layout, checkpoint/restart equivalence, reduced diags."""

import os

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.io.checkpoint import load_checkpoint, save_checkpoint

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DECK_1D = os.path.join(
    REFERENCE, "Examples/Tests/langmuir/inputs_test_1d_langmuir_multi"
)


def test_checkpoint_restart_bitexact(tmp_path):
    """Restarted run matches the uninterrupted run exactly (the analog of the
    reference's restart regression tests, Examples/analysis_default_restart.py)."""
    sim1 = Simulation.from_deck(DECK_1D, output_dir=str(tmp_path / "a"))
    sim1.init()
    sim1.evolve(40)
    save_checkpoint(str(tmp_path / "chk"), sim1.state, sim1.is_synchronized)
    sim1.evolve()  # to step 80

    sim2 = Simulation.from_deck(DECK_1D, output_dir=str(tmp_path / "b"))
    sim2.init()
    sim2.state, sim2.is_synchronized = load_checkpoint(
        str(tmp_path / "chk"), sim2.state
    )
    assert int(sim2.state.step) == 40
    sim2.evolve()

    f1, f2 = sim1.state.fields, sim2.state.fields
    np.testing.assert_array_equal(np.asarray(f1.Ez), np.asarray(f2.Ez))
    np.testing.assert_array_equal(
        np.asarray(sim1.state.species["electrons"].z),
        np.asarray(sim2.state.species["electrons"].z),
    )


def test_openpmd_output(tmp_path):
    import h5py

    sim = Simulation.from_deck(DECK_1D, output_dir=str(tmp_path / "diags"))
    sim.init()
    sim.evolve()
    # the deck's diag1 has no <diag>.format key, so it defaults to plotfile
    # (matching the reference's default); the openpmd diag carries the HDF5
    assert (tmp_path / "diags" / "diag1000080" / "Header").exists()
    path = tmp_path / "diags" / "openpmd.h5"
    assert path.exists()
    with h5py.File(path) as fh:
        assert fh.attrs["openPMD"] == b"1.1.0"
        it = fh["data/80"]
        assert "E" in it["fields"] and "z" in it["fields/E"]
        sums = float(np.abs(it["fields/E/z"][()]).sum())
        assert sums > 0
        assert "electrons" in it["particles"]


def test_reduced_diags(tmp_path):
    from warpx_tpu.diagnostics.reduced import REDUCED_DIAGS, compute_reduced

    sim = Simulation.from_deck(DECK_1D, output_dir=str(tmp_path))
    sim.init()
    sim.evolve(10)
    from warpx_tpu.diagnostics.reduced import _PARAM_KINDS

    for kind in REDUCED_DIAGS:
        if kind in _PARAM_KINDS:
            continue  # exercised with params in test_new_reduced_diagnostics
        vals = compute_reduced(kind, sim.state, sim.cfg, sim.staggering)
        assert vals and all(np.isfinite(v) for v in vals.values()), kind
    e = compute_reduced("FieldEnergy", sim.state, sim.cfg, sim.staggering)
    assert e["total_lev0(J)"] > 0


def test_new_reduced_diagnostics(tmp_path):
    """BeamRelevant / ParticleHistogram / FieldProbe / FieldReduction
    (reference: Source/Diagnostics/ReducedDiags)."""
    import numpy as np

    from warpx_tpu import constants
    from warpx_tpu.diagnostics.reduced import compute_reduced
    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation

    geom = Geometry(3, (8, 8, 8), (-4e-6,) * 3, (4e-6,) * 3, (True,) * 3)
    beam = SpeciesConfig(
        name="beam", charge=-constants.q_e, mass=constants.m_e,
        injection_style="gaussian_beam",
        x_rms=5e-7, y_rms=5e-7, z_rms=5e-7,
        npart=5000, q_tot=-1e-12,
        momentum_distribution="gaussian", uz=100.0,
        ux_th=0.5, uy_th=0.5, uz_th=1.0,
    )
    cfg = SimConfig(geometry=geom, max_step=1, dt=1e-16, species=(beam,))
    sim = Simulation(cfg)
    sim.init()

    br = compute_reduced("BeamRelevant", sim.state, cfg, sim.staggering,
                         params={"species": "beam"})
    assert abs(br["charge(C)"] - (-1e-12)) < 1e-15
    assert abs(br["gamma_mean()"] - np.sqrt(1 + 100.0**2)) < 0.5
    assert 3e-7 < br["x_rms(m)"] < 7e-7
    assert br["emittance_x(m)"] > 0

    ph = compute_reduced(
        "ParticleHistogram", sim.state, cfg, sim.staggering,
        params={"species": "beam", "bin_number": 8,
                "bin_min": 90.0, "bin_max": 110.0,
                "histogram_function": "uz"},
    )
    total_w = sum(ph.values())
    assert abs(total_w - 1e-12 / constants.q_e) < 0.1 * 1e-12 / constants.q_e

    fr = compute_reduced(
        "FieldReduction", sim.state, cfg, sim.staggering,
        params={"reduced_function": "Ex*Ex+Ey*Ey+Ez*Ez",
                "reduction_type": "Maximum"},
    )
    assert fr["value()"] >= 0.0

    fp = compute_reduced(
        "FieldProbe", sim.state, cfg, sim.staggering,
        params={"x_probe": 0.0, "y_probe": 0.0, "z_probe": 0.0},
    )
    assert "part_Ex_lev0-(V/m)" in fp
