"""Background MCC collision tests (null-collision method physics gates).

The reference's MCC golden decks need the external warpx-data cross-section
tables (absent here), so these tests gate the collision physics directly
with synthetic cross sections: analytic momentum-relaxation and ionization
growth rates (reference: BackgroundMCCCollision.cpp, ImpactIonization.H).
"""

import numpy as np
import pytest

from warpx_tpu import constants
from warpx_tpu.core.config import (
    CollisionConfig, MCCProcessConfig, SimConfig, SpeciesConfig,
)
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation


def _sim(collision, species, max_step=40, dt=1e-9):
    geom = Geometry(1, (16,), (0.0,), (1.0,), (True,))
    cfg = SimConfig(
        geometry=geom, max_step=max_step, dt=dt,
        species=tuple(species), collisions=(collision,),
        em_solver="none", electrostatic="labframe",
    )
    sim = Simulation(cfg)
    sim.init()
    return sim


def _inv_v_xsec(sigma0, E_ref, e_lo=0.2, e_hi=5000.0, de=0.2):
    """sigma(E) = sigma0 sqrt(E_ref/E): nu = n sigma v is then constant in
    energy, so nu_max == nu and the null-collision method is exact (the
    nu_max sweep always extends to 5000 eV, BackgroundMCCCollision.cpp:169)."""
    es = np.arange(e_lo, e_hi + de / 2, de)
    sg = sigma0 * np.sqrt(E_ref / es)
    return tuple(es.tolist()), tuple(sg.tolist())


def test_elastic_momentum_relaxation():
    """Electrons drifting through a cold heavy gas with constant sigma:
    isotropic elastic scattering randomizes direction at nu = n sigma v, so
    <uz>(t) = u0 exp(-nu t)."""
    u0 = 1e6  # m/s, non-relativistic
    E_p = 0.5 * constants.m_e * u0**2 / constants.q_e  # ~2.84 eV
    n_gas = 1e20
    sigma = 2e-19
    nu = n_gas * sigma * u0
    dt = 0.02 / nu
    steps = 50
    es, sg = _inv_v_xsec(sigma, E_p)
    col = CollisionConfig(
        name="mcc", species=("electrons", "electrons"),
        kind="background_mcc",
        background_density=str(n_gas),
        background_temperature="1e-3",  # effectively cold
        background_mass=6.64e-26,  # argon-ish, M >> m
        max_background_density=n_gas,
        processes=(MCCProcessConfig("elastic", 0.0, es, sg),),
    )
    sp = SpeciesConfig(
        name="electrons", charge=-constants.q_e, mass=constants.m_e,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(512,),
        profile="constant", density=1e10,
        momentum_distribution="constant", uz=u0 / constants.c,
        do_not_deposit=True, do_not_gather=True,
    )
    sim = _sim(col, [sp], max_step=steps, dt=dt)
    sim.evolve()
    sps = sim.state.species["electrons"]
    alive = np.asarray(sps.alive)
    mean_uz = float(np.asarray(sps.uz)[alive].mean())
    expected = u0 * np.exp(-nu * dt * steps)
    # 8192 particles, ~1 collision each: few-percent statistics
    assert abs(mean_uz - expected) / u0 < 0.05, (mean_uz, expected)


def test_charge_exchange_drift_loss():
    """Ions drifting through their own cold neutral gas: charge exchange
    swaps projectile and target velocities, so the drift decays at
    nu = n sigma v."""
    M_ion = 6.64e-26
    E_p = 1.0  # eV
    u0 = float(np.sqrt(2 * E_p * constants.q_e / M_ion))
    n_gas = 1e20
    sigma = 5e-19
    nu = n_gas * sigma * u0
    dt = 0.02 / nu
    steps = 50
    es, sg = _inv_v_xsec(sigma, E_p)
    col = CollisionConfig(
        name="cx", species=("ions", "ions"), kind="background_mcc",
        background_density=str(n_gas), background_temperature="1e-3",
        max_background_density=n_gas,
        processes=(MCCProcessConfig("charge_exchange", 0.0, es, sg),),
    )
    sp = SpeciesConfig(
        name="ions", charge=constants.q_e, mass=M_ion,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(512,),
        profile="constant", density=1e10,
        momentum_distribution="constant", uz=u0 / constants.c,
        do_not_deposit=True, do_not_gather=True,
    )
    sim = _sim(col, [sp], max_step=steps, dt=dt)
    sim.evolve()
    spv = sim.state.species["ions"]
    alive = np.asarray(spv.alive)
    mean_uz = float(np.asarray(spv.uz)[alive].mean())
    expected = u0 * np.exp(-nu * dt * steps)
    assert abs(mean_uz - expected) / u0 < 0.05, (mean_uz, expected)


def test_impact_ionization_yield():
    """Electrons above threshold ionize at nu_i = n sigma v; after one
    ionization the shared energy drops both electrons below threshold, so
    the ion yield after time T is N0 (1 - exp(-nu_i T)).  Energy bookkeeping
    (ImpactIonization.H:243-247): each outgoing electron carries
    (E - E_ion)/2."""
    E0 = 30.0  # eV
    E_ion = 24.0  # eV -> secondaries at 3 eV, below threshold
    u0 = np.sqrt(2 * E0 * constants.q_e / constants.m_e)
    n_gas = 1e20
    sigma = 1e-19
    nu = n_gas * sigma * u0
    dt = 0.01 / nu
    steps = 30
    # sigma ~ 1/v above threshold, 0 at the threshold grid point (real
    # tables start at 0; the lo-clamp keeps sub-threshold electrons inert)
    es, sg = _inv_v_xsec(sigma, E0, e_lo=E_ion, de=0.2)
    sg = (0.0,) + sg[1:]
    col = CollisionConfig(
        name="iz", species=("electrons", "electrons"),
        kind="background_mcc",
        background_density=str(n_gas), background_temperature="300",
        max_background_density=n_gas,
        ionization_species="ions",
        processes=(
            MCCProcessConfig("ionization", E_ion, es, sg),
        ),
    )
    spe = SpeciesConfig(
        name="electrons", charge=-constants.q_e, mass=constants.m_e,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(256,),
        profile="constant", density=1e10,
        momentum_distribution="constant", uz=u0 / constants.c,
        do_not_deposit=True, do_not_gather=True,
    )
    spi = SpeciesConfig(
        name="ions", charge=constants.q_e, mass=6.64e-26,
        injection_style="none",
        do_not_deposit=True, do_not_gather=True, do_not_push=True,
    )
    sim = _sim(col, [spe, spi], max_step=steps, dt=dt)
    n0 = int(np.asarray(sim.state.species["electrons"].alive).sum())
    sim.evolve()
    n_ion = int(np.asarray(sim.state.species["ions"].alive).sum())
    n_e = int(np.asarray(sim.state.species["electrons"].alive).sum())
    expected = n0 * (1.0 - np.exp(-nu * dt * steps))
    assert n_e == n0 + n_ion  # every ionization adds exactly one electron
    assert abs(n_ion - expected) / expected < 0.15, (n_ion, expected)
    # secondary electrons carry (E0 - E_ion)/2 each
    uz = np.asarray(sim.state.species["electrons"].uz)
    ux = np.asarray(sim.state.species["electrons"].ux)
    uy = np.asarray(sim.state.species["electrons"].uy)
    alive = np.asarray(sim.state.species["electrons"].alive)
    E_eV = (
        0.5 * constants.m_e * (ux**2 + uy**2 + uz**2)[alive]
        / constants.q_e
    )
    secondaries = E_eV < E_ion
    assert secondaries.sum() >= 2 * n_ion * 0.95
    E_sec = np.sort(E_eV)[:max(2 * n_ion - 2, 1)]
    assert np.allclose(E_sec, (E0 - E_ion) / 2, rtol=0.02)


def test_cross_section_file_roundtrip(tmp_path):
    """load_cross_section reads two-column uniform-grid tables and rejects
    non-uniform grids (ScatteringProcess.cpp:96)."""
    from warpx_tpu.ops.mcc import load_cross_section

    p = tmp_path / "xs.dat"
    np.savetxt(p, np.column_stack([np.linspace(0, 100, 11),
                                   np.full(11, 1e-20)]))
    e, s = load_cross_section(str(p))
    assert e.shape == (11,) and np.allclose(s, 1e-20)
    bad = tmp_path / "bad.dat"
    np.savetxt(bad, np.column_stack([[0.0, 1.0, 3.0], [1, 1, 1]]))
    with pytest.raises(ValueError):
        load_cross_section(str(bad))


def test_ion_stopping_golden():
    """background_stopping (electrons + ions backgrounds, constant and
    parsed profiles) against the reference golden checksums
    (Examples/Tests/ion_stopping; BackgroundStopping.cpp formulas)."""
    import os

    from warpx_tpu.diagnostics.checksum import compare_checksums

    from .conftest import REFERENCE, reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    sim = Simulation.from_deck(
        os.path.join(
            REFERENCE, "Examples/Tests/ion_stopping/inputs_test_3d_ion_stopping"
        )
    )
    sim.init()
    sim.evolve()
    compare_checksums(
        sim.checksums(),
        os.path.join(
            REFERENCE,
            "Regression/Checksum/benchmarks_json/test_3d_ion_stopping.json",
        ),
        rtol=1e-9,
    )
