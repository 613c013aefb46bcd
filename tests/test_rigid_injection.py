"""Rigid injection (RigidInjectedParticleContainer re-design).

Reference gate (Examples/Tests/rigid_injection/analysis_rigid_injection_lab
.py): a Gaussian beam with large divergence propagates RIGIDLY from -5 um to
the z = 20 um injection plane, then expands from emittance only; the final
width must match sqrt(w0^2 + (z-z0)^2 theta0^2) within 5% (and must NOT
match the no-rigid expansion from -5 um).  Deterministic checksums (weight,
z-momentum) are gated against the golden file; transverse sums are RNG-seed
dependent and are not.
"""

import json
import os

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_rigid_injection_lab():
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/rigid_injection/"
        "inputs_test_2d_rigid_injection_lab",
    )
    sim.init()
    sim.evolve(-1)
    sp = sim.state.species["beam"]
    alive = np.asarray(sp.alive)
    z = float(np.asarray(sp.z)[alive].mean())
    w = float(np.asarray(sp.x)[alive].std())
    z0, w0 = 20.0e-6, 1.0e-6
    theta0 = np.arcsin(0.1)
    wth = np.sqrt(w0**2 + (z - z0) ** 2 * theta0**2)
    assert abs(w - wth) / wth < 0.05, (w, wth)
    # must NOT look like rigid injection was off
    wth_no_rigid = np.sqrt(w0**2 + (z - (-5.0e-6)) ** 2 * theta0**2)
    assert abs(w - wth_no_rigid) / wth_no_rigid > 0.05
    # deterministic checksums: weight exact, z-momentum at roundoff
    with open(os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/test_2d_rigid_injection_lab"
        ".json",
    )) as fh:
        gold = json.load(fh)
    cs = sim.checksums()
    assert abs(
        cs["beam"]["particle_weight"] - gold["beam"]["particle_weight"]
    ) < 1e-9 * gold["beam"]["particle_weight"]
    assert abs(
        cs["beam"]["particle_momentum_z"]
        - gold["beam"]["particle_momentum_z"]
    ) < 1e-9 * gold["beam"]["particle_momentum_z"]
    # runtime attributes initialized at injection (gaussian_beam style):
    # center counts |x| < 0.5 sigma (~38% of 2000)
    center = float(np.asarray(sp.extra["center"]).sum())
    assert 650 < center < 900, center
