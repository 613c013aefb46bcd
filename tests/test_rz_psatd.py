"""RZ spectral (Hankel) PSATD.

Gates:
* DHT round trips (forward/backward matrix pairs) for every (order, mode)
  combination the transformer uses;
* a pure (kr, kz) eigenmode advances by exactly cos(c k dt) in one step
  (the analytic PSATD propagator, PsatdAlgorithmRZ.cpp:205-214);
* (slow) the reference RZ Langmuir PSATD decks land on their goldens
  (test_rz_langmuir_multi_psatd[_current_correction].json); tolerance 2e-4
  covers the noise-floor components (Bt is ~1e-8 of Er/c in this m=0
  problem; particle_momentum_x is at 1e-36, pure round-off).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.rz.spectral import HankelTransform

c = constants.c

REF = "/root/reference"


@pytest.mark.parametrize("p,m", [
    (0, 0), (1, 0), (-1, 0), (1, 1), (0, 1), (2, 1), (2, 2), (1, 2), (3, 2),
])
def test_hankel_roundtrip(p, m):
    nr, rmax = 48, 1.0
    h = HankelTransform(p, m, nr, rmax)
    dr = rmax / nr
    r = dr * (np.arange(nr) + 0.5)
    f = r ** abs(p) * np.exp(-8 * r ** 2) * (1 - (r / rmax) ** 2)
    err = np.abs(h.Mb @ (h.Mf @ f) - f).max() / np.abs(f).max()
    assert err < 1e-6, (p, m, err)


def test_rz_psatd_semigroup():
    """Vacuum PSATD is the analytic propagator per spectral mode, so two
    dt steps must equal one 2dt step to round-off (semigroup property) —
    a sharp end-to-end check of transforms + update equations."""
    import dataclasses

    from scipy.special import j1

    from warpx_tpu.core.config import SimConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.rz.core import rz_zero_fields
    from warpx_tpu.rz.spectral import PsatdRZ

    nr, nz = 32, 32
    rmax, L = 1.0, 2.0
    geom = Geometry(2, (nr, nz), (0.0, -L / 2), (rmax, L / 2),
                    periodic=(False, True), rz=True)
    dt = 0.9 * min(geom.dx) / c
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=dt, em_solver="psatd",
        psatd_order=16,
        psatd_update_with_rho=False, psatd_current_correction=False,
        n_rz_modes=2, tiled_particles="off",
    )
    s1 = PsatdRZ(cfg, jnp.float64)
    s2 = PsatdRZ(dataclasses.replace(cfg, dt=2 * dt), jnp.float64)

    dr, dz = geom.dx
    r = dr * (np.arange(nr) + 0.5)
    z = -L / 2 + dz * (np.arange(nz) + 0.5)
    # smooth, regular-at-axis initial data in both modes
    prof_r = np.outer(j1(3.8 * r) * np.exp(-2 * r ** 2),
                      np.cos(2 * np.pi * z / L))
    prof_z = np.outer(np.exp(-4 * r ** 2), np.sin(4 * np.pi * z / L))
    f = rz_zero_fields(cfg, jnp.float64)
    f = f.replace(
        Ez=f.Ez.at[0].set(jnp.asarray(prof_z)).at[1].set(
            jnp.asarray(0.3 * prof_r)),
        Ex=f.Ex.at[0].set(jnp.asarray(prof_r)),
        By=f.By.at[0].set(jnp.asarray(prof_r / c)),
    )
    a = s1.push(s1.push(f, None), None)
    b = s2.push(f, None)
    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        ga, gb = np.asarray(getattr(a, nm)), np.asarray(getattr(b, nm))
        scale = max(np.abs(gb).max(), np.abs(prof_r).max() / c)
        err = np.abs(ga - gb).max() / scale
        assert err < 1e-11, (nm, err)


@pytest.mark.slow
@pytest.mark.parametrize("deck,gold", [
    ("inputs_test_rz_langmuir_multi_psatd",
     "test_rz_langmuir_multi_psatd.json"),
    ("inputs_test_rz_langmuir_multi_psatd_current_correction",
     "test_rz_langmuir_multi_psatd_current_correction.json"),
])
def test_rz_langmuir_psatd_golden(deck, gold):
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.diagnostics.checksum import compare_checksums

    sim = Simulation.from_deck(f"{REF}/Examples/Tests/langmuir/{deck}")
    sim.init()
    sim.evolve()
    # raises on any component beyond rtol (atol floors the round-off-scale
    # entries: particle_momentum_x ~ 1e-36 in this zero-net-px problem)
    compare_checksums(
        sim.checksums(),
        f"{REF}/Regression/Checksum/benchmarks_json/{gold}",
        rtol=2e-4, atol=1e-35,
    )


@pytest.mark.slow
@pytest.mark.parametrize("deck,energy_ref", [
    # reference gate values from analysis_galilean.py:83-89 (RZ branch);
    # energy_ref is the saturated NCI energy of an UNSTABLE run — a stable
    # run must stay below 1e-8 of it
    ("inputs_test_rz_galilean_psatd", 191002.6526271543),
    ("inputs_test_rz_galilean_psatd_current_correction_psb",
     472779.70801323955),
])
def test_rz_galilean_psatd_stability(deck, energy_ref):
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.rz.core import rz_cell_centered_output

    sim = Simulation.from_deck(
        f"{REF}/Examples/Tests/nci_psatd_stability/{deck}"
    )
    sim.init()
    sim.evolve()
    out = rz_cell_centered_output(sim.state, sim.cfg)
    energy = constants.ep0 / 2 * sum(
        float(np.sum(np.asarray(out[k]) ** 2)) for k in ("Er", "Et", "Ez")
    )
    assert energy / energy_ref < 1e-8, (energy, energy_ref)
