"""RZ bounded z (PEC walls) + moving window + laser antenna, end-to-end.

Gates the flagship BASELINE config 3 deck
(Examples/Physics_applications/laser_acceleration/inputs_test_rz_laser_
acceleration: FDTD RZ, 2 azimuthal modes, PEC z walls, moving window,
Gaussian laser antenna, continuous injection, gaussian beam) against its
reference golden (test_rz_laser_acceleration.json).

Tolerance classes (measured headroom ~2-10x):

* DETERMINISTIC laser-driven m=1 components (the antenna is a prescribed
  current, independent of the plasma RNG): Et/Etheta_1, Br/Br_1, Bz_1,
  Er_1_imag, Btheta_1_imag, Ez_1_imag — gated at 2e-3.
* DETERMINISTIC particle invariants: weights, r ("position_x" in the RZ
  plotfile convention stores the radius), orig_z — gated at 1e-10.
* RNG-dominated wake quantities (electrons.random_theta draws from the
  AMReX RNG stream we don't replicate, 1x4x1 ppc; the beam is a
  gaussian_beam from the same stream): plasma-response fields, currents,
  rho, thetas, momenta — sanity envelope 1.0 (right order of magnitude,
  catches sign/scale/volume-factor errors without pretending RNG parity).

Reference: the RZ z-boundary path is WarpX_PEC.cpp applied along z plus
WarpXPushFieldsEM.cpp ApplyInverseVolumeScaling; moving window is
WarpXMovingWindow.cpp with RZ continuous injection
(PhysicalParticleContainer.cpp ContinuousInjection RZ branch).
"""

import json

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DECK = (f"{REFERENCE}/Examples/Physics_applications/laser_acceleration/"
        "inputs_test_rz_laser_acceleration")
GOLD = (f"{REFERENCE}/Regression/Checksum/benchmarks_json/"
        "test_rz_laser_acceleration.json")

# deterministic laser-mode field components (antenna-driven, RNG-free)
LASER_KEYS = {
    "Et", "Etheta_1_real", "Er_1_imag", "Br", "Br_1_real",
    "Bz", "Bz_1_real", "Btheta_1_imag", "Ez_1_imag",
}
# deterministic particle invariants (r grid positions, weights, origins)
EXACT_PARTICLE_KEYS = {
    "particle_weight", "particle_position_x", "particle_position_y",
    "particle_orig_z",
}


@pytest.mark.slow
def test_rz_laser_acceleration_golden():
    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(DECK, output_dir="/tmp/rz_laser_test_diags")
    sim.init()
    sim.evolve()
    comp = sim.checksums()
    with open(GOLD) as fh:
        gold = json.load(fh)
    failures = []
    for group, entries in gold.items():
        for key, rv in entries.items():
            cv = comp.get(group, {}).get(key)
            if cv is None:
                failures.append(f"missing {group}/{key}")
                continue
            rel = abs(cv - rv) / max(abs(rv), 1e-300)
            if group == "lev=0" and key in LASER_KEYS:
                tol = 2e-3
            elif group == "electrons" and key in EXACT_PARTICLE_KEYS:
                # grid-injected species: r/z/weights are RNG-free
                # (the beam is a gaussian_beam draw — envelope only)
                tol = 1e-10
            else:
                tol = 1.0  # RNG-dominated wake/beam statistics
            # rel==1.0 exactly means cv == 0: a dead code path (quantity
            # never deposited/updated) must not pass the sanity envelope
            if not np.isfinite(cv) or rel > tol or (rv != 0.0 and cv == 0.0):
                failures.append(
                    f"{group}/{key}: rel {rel:.3e} > {tol} "
                    f"(comp {cv:.6e} gold {rv:.6e})"
                )
    assert not failures, "\n".join(failures)
