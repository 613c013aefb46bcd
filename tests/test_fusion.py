"""Nuclear fusion collisions (reference: BinaryCollision/NuclearFusion/).

Gates:
* cross-section fits hit published anchors (D-T peak ~5 b near 64 keV;
  p-B11 148 keV resonance; Tentori/Buck continuity at 9.76 MeV);
* two-product kinematics conserve momentum exactly and energy to roundoff;
* a uniform proton-boron box produces the Higginson-expected fusion yield
  (reference analysis: Examples/Tests/nuclear_fusion/analysis_proton_boron_fusion.py
  checks the same n1 n2 sigma v dt V rate per slab).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.ops.fusion import (
    M_ALPHA, bosch_hale_cross_section, collision_parameters,
    proton_boron_cross_section, two_product_momenta,
)

c = constants.c
q_e = constants.q_e
BARN = 1e-28
M_D = 2.01410177812 * 1.66053906660e-27
M_T = 3.0160492779 * 1.66053906660e-27
M_P = 1.00782503223 * 1.66053906660e-27
M_B11 = 11.00930536 * 1.66053906660e-27


def test_dt_cross_section_peak():
    E = jnp.linspace(5e3, 300e3, 400) * q_e
    sig = np.asarray(bosch_hale_cross_section(E, "dt", M_D, M_T))
    i = np.argmax(sig)
    E_peak_keV = float(E[i] / q_e / 1e3)
    assert 55.0 < E_peak_keV < 75.0, E_peak_keV
    assert 4.0 < sig[i] / BARN < 6.0, sig[i] / BARN
    # rises monotonically below the peak
    assert (np.diff(sig[: i + 1]) > 0).all()
    # zero at zero energy
    assert float(bosch_hale_cross_section(jnp.zeros(1), "dt", M_D, M_T)[0]) == 0.0


def test_pb_resonance_and_continuity():
    sig = lambda ekev: float(  # noqa: E731
        proton_boron_cross_section(jnp.array([ekev * 1e3 * q_e]))[0]
    )
    # 148 keV Breit-Wigner resonance (Tentori-Belloni fit)
    assert sig(148.0) > 2.0 * sig(110.0)
    assert sig(148.0) > 2.0 * sig(190.0)
    # continuity between the Tentori and Buck fits at 9.76 MeV
    lo, hi = sig(9759.0), sig(9761.0)
    assert abs(hi - lo) < 5e-3 * lo, (lo, hi)


def test_two_product_kinematics_conservation():
    key = jax.random.PRNGKey(3)
    n = 128
    u1 = tuple(jax.random.normal(jax.random.fold_in(key, i), (n,)) * 0.02 * c
               for i in range(3))
    u2 = tuple(jax.random.normal(jax.random.fold_in(key, 3 + i), (n,)) * 0.01 * c
               for i in range(3))
    m_he4, m_n = 4.00260325413 * 1.66053906660e-27, 1.0013784193052508 * 1.67262192369e-27
    E_fus = 17.5893e6 * q_e
    up1, up2 = two_product_momenta(key, u1, M_D, u2, M_T, m_he4, m_n, E_fus)
    # momentum conservation: m1 u1 + m2 u2 == m1_out u1_out + m2_out u2_out
    for d in range(3):
        p_in = M_D * u1[d] + M_T * u2[d]
        p_out = m_he4 * up1[d] + m_n * up2[d]
        np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_in),
                                   rtol=1e-9, atol=1e-25)
    # energy: E_out_tot = E_in_tot - E_rest_in + E_rest_out + E_fusion
    def etot(u3, m):
        g = jnp.sqrt(1 + (u3[0]**2 + u3[1]**2 + u3[2]**2) / c**2)
        return m * g * c * c

    E_in = etot(u1, M_D) + etot(u2, M_T)
    E_out = etot(up1, m_he4) + etot(up2, m_n)
    expected = E_in - (M_D + M_T) * c * c + (m_he4 + m_n) * c * c + E_fus
    # energies are ~GeV-scale rest masses; roundoff leaves ~1e-10 relative
    # (E_fusion itself is 4e-3 of the budget, so this is still sharp)
    np.testing.assert_allclose(np.asarray(E_out), np.asarray(expected),
                               rtol=3e-9)


def _fusion_sim(ekev_com=600.0, mult=1.0e30, ppc=64):
    """Uniform proton/boron box: protons drift so the COM kinetic energy is
    ekev_com; boron at rest; both frozen (do_not_push/deposit)."""
    from warpx_tpu.core.config import (
        CollisionConfig, SimConfig, SpeciesConfig,
    )
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation

    # nonrelativistic: E_com = 1/2 m_red v^2
    m_red = M_P * M_B11 / (M_P + M_B11)
    v = np.sqrt(2.0 * ekev_com * 1e3 * q_e / m_red)
    geom = Geometry(3, (4, 4, 4), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    mk = lambda nm, q, m, uz, st: SpeciesConfig(  # noqa: E731
        name=nm, charge=q, mass=m, species_type=st,
        injection_style="nrandompercell",
        num_particles_per_cell=ppc, profile="constant", density=1.0,
        momentum_distribution="constant", uz=uz / c,
        do_not_push=True, do_not_deposit=True,
    )
    species = (
        mk("proton", q_e, M_P, v, "hydrogen1"),
        mk("boron", 5 * q_e, M_B11, 0.0, "boron11"),
        SpeciesConfig(
            name="alpha", charge=2 * q_e, mass=M_ALPHA,
            species_type="helium4", injection_style="none",
        ),
    )
    col = CollisionConfig(
        name="pbf", species=("proton", "boron"), kind="nuclearfusion",
        product_species=("alpha",), fusion_kind="protonboron",
        fusion_multiplier=mult,
        # let the threshold mechanism settle at ~0.1 events/pair for stats
        fusion_probability_target_value=0.1,
    )
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=1e-8, em_solver="none",
        species=species, collisions=(col,), use_filter=False,
    )
    return Simulation(cfg), v


@pytest.mark.slow
def test_proton_boron_yield_matches_rate():
    """Total produced alpha weight == 3 * n_p n_B sigma(E) v dt V within
    statistics (the reference's analysis gate, Higginson scheme)."""
    sim, v = _fusion_sim()
    state = sim.init()
    state = sim._step(state)
    sim.state = state
    alpha = state.species["alpha"]
    w_alpha = float(jnp.sum(jnp.where(alpha.alive, alpha.w, 0.0)))
    n_alpha = int(jnp.sum(alpha.alive))
    assert n_alpha > 50, n_alpha

    # expected reaction weight: w_p w_B / V_cell * sigma v dt summed pairs =
    # (per unit volume) n_p n_B sigma v dt V_domain; 3 alphas per reaction
    prot = state.species["proton"]
    u1 = (jnp.zeros(1), jnp.zeros(1), jnp.full(1, v))
    u2 = (jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
    E_kin, v_rel, lab2com = collision_parameters(u1, u2, M_P, M_B11)
    sigma = float(proton_boron_cross_section(E_kin)[0])
    n_p = n_b = 1.0  # m^-3 (density in deck)
    V = 1.0
    expected_reactions = (
        n_p * n_b * sigma * float(v_rel[0]) * 1e-8 * V * float(lab2com[0])
    )
    got = w_alpha / 3.0
    assert abs(got - expected_reactions) < 0.25 * expected_reactions, (
        got, expected_reactions,
    )
    # alpha momenta: total momentum of products consistent with reactants
    # (each fusion produces 3 alphas at 2 positions with half weights)
    pz_alpha = float(jnp.sum(jnp.where(alpha.alive, alpha.w * M_ALPHA * alpha.uz, 0.0)))
    pz_in_per_reaction = M_P * v
    np.testing.assert_allclose(
        pz_alpha, got * pz_in_per_reaction, rtol=0.15
    )


@pytest.mark.slow
def test_dd_intra_species_yield():
    """Intra-species D-D fusion runs and produces neutron+He3 with equal
    counts and conserved weight bookkeeping."""
    from warpx_tpu.core.config import (
        CollisionConfig, SimConfig, SpeciesConfig,
    )
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation

    ekev = 100.0
    m_red = M_D / 2
    v = np.sqrt(2.0 * ekev * 1e3 * q_e / m_red)
    geom = Geometry(3, (4, 4, 4), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    species = (
        SpeciesConfig(
            name="deut", charge=q_e, mass=M_D, species_type="hydrogen2",
            injection_style="nrandompercell", num_particles_per_cell=64,
            profile="constant", density=1.0,
            momentum_distribution="gaussian",
            ux_th=v / c, uy_th=v / c, uz_th=v / c,
            do_not_push=True, do_not_deposit=True,
        ),
        SpeciesConfig(
            name="neutron2", charge=0.0,
            mass=1.0013784193052508 * 1.67262192369e-27,
            species_type="neutron", injection_style="none",
        ),
        SpeciesConfig(
            name="he3", charge=2 * q_e, mass=3.0160293201 * 1.66053906660e-27,
            species_type="helium3", injection_style="none",
        ),
    )
    col = CollisionConfig(
        name="ddf", species=("deut", "deut"), kind="nuclearfusion",
        product_species=("neutron2", "he3"), fusion_kind="ddn",
        fusion_multiplier=1.0e30,
        fusion_probability_target_value=0.1,
    )
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=1e-8, em_solver="none",
        species=species, collisions=(col,), use_filter=False,
    )
    sim = Simulation(cfg)
    state = sim.init()
    state = sim._step(state)
    neu, he3 = state.species["neutron2"], state.species["he3"]
    n_n = int(jnp.sum(neu.alive))
    n_h = int(jnp.sum(he3.alive))
    assert n_n > 10 and n_n == n_h, (n_n, n_h)
    w_n = float(jnp.sum(jnp.where(neu.alive, neu.w, 0.0)))
    w_h = float(jnp.sum(jnp.where(he3.alive, he3.w, 0.0)))
    np.testing.assert_allclose(w_n, w_h, rtol=1e-12)
