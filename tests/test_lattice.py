"""Accelerator-lattice tests (hard-edged quadrupoles + plasma lenses).

Reference: Source/AcceleratorLattice/ (LatticeElements/HardEdged_K.H:25-46
residence-fraction correction), Examples/Tests/{accelerator_lattice,
plasma_lens}.  Golden gates: particle position/momentum sums, plus the J
sums on decks where the reference's diagnostic J is self-consistent (in the
moving-window variant the reference's JFunctor loses exactly half the
deposit to unsummed guard cells — JFunctor.cpp:53 uses FillBoundary, not
SumBoundary, on a non-periodic domain — so J is not gated there).
"""

import json
import os

import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _run(deck_rel, tmp_path):
    sim = Simulation.from_deck(
        os.path.join(REFERENCE, deck_rel), output_dir=str(tmp_path)
    )
    sim.init()
    sim.evolve(-1)
    return sim.checksums()


def _golden(name):
    with open(os.path.join(
        REFERENCE, f"Regression/Checksum/benchmarks_json/{name}.json"
    )) as fh:
        return json.load(fh)


def _gate(cs, gold, keys, rtol):
    for grp, key in keys:
        mine, ref = cs[grp][key], gold[grp][key]
        assert abs(mine - ref) <= rtol * abs(ref), (
            f"{grp}/{key}: {mine:.12e} vs golden {ref:.12e}"
        )


PARTICLE_KEYS = [
    ("particle_position_x", "particle_position_z"),
    ("particle_momentum_x", "particle_momentum_z"),
]


@pytest.mark.slow
def test_hard_edged_quadrupoles(tmp_path):
    cs = _run(
        "Examples/Tests/accelerator_lattice/"
        "inputs_test_3d_hard_edged_quadrupoles", tmp_path,
    )
    gold = _golden("test_3d_hard_edged_quadrupoles")
    keys = [("electron", k) for pair in PARTICLE_KEYS for k in pair]
    keys += [("electron", "particle_weight")]
    # ES-mode diagnostic J (deposited fresh at output, JFunctor.cpp:41-49)
    keys += [("lev=0", "jx"), ("lev=0", "jz")]
    _gate(cs, gold, keys, rtol=1e-6)
    # y/py are roundoff-zero in this deck (gold ~1e-34); bound absolutely
    assert cs["electron"]["particle_momentum_y"] < 1e-30
    assert cs["electron"]["particle_position_y"] < 1e-7


@pytest.mark.slow
def test_hard_edged_plasma_lens(tmp_path):
    cs = _run(
        "Examples/Tests/plasma_lens/inputs_test_3d_plasma_lens_hard_edged",
        tmp_path,
    )
    gold = _golden("test_3d_plasma_lens_hard_edged")
    keys = [
        ("electrons", f"particle_{q}_{ax}")
        for q in ("position", "momentum") for ax in "xyz"
    ]
    # jz parity is exact (2e-13); jx/jy reflect the same reference guard-cell
    # loss as the moving-window case (EM run, FillBoundary-only J exchange)
    keys += [("lev=0", "jz")]
    _gate(cs, gold, keys, rtol=1e-6)


@pytest.mark.slow
def test_hard_edged_quadrupoles_moving_window(tmp_path):
    cs = _run(
        "Examples/Tests/accelerator_lattice/"
        "inputs_test_3d_hard_edged_quadrupoles_moving", tmp_path,
    )
    gold = _golden("test_3d_hard_edged_quadrupoles_moving")
    keys = [("electron", k) for pair in PARTICLE_KEYS for k in pair]
    _gate(cs, gold, keys, rtol=1e-6)
