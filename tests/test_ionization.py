"""ADK field ionization: rate formula unit test + end-to-end creation test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.ops.ionization import (
    IONIZATION_ENERGIES, adk_coefficients, ionization_probability,
)


def test_adk_rate_hydrogen():
    """Rate at the hydrogen barrier-suppression field scale is order unity
    per atomic time; check against the closed-form ADK expression."""
    dt = 1e-17
    pre, expp, power = adk_coefficients("H", dt)
    # analytic reconstruction of the same formula
    UH = IONIZATION_ENERGIES["H"][0]
    alpha = constants.alpha
    Ea = constants.m_e * constants.c**2 / constants.q_e * alpha**4 / constants.r_e
    E = 0.05 * Ea
    p = ionization_probability(
        jnp.zeros(1, jnp.int32),
        jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
        jnp.full(1, E), jnp.zeros(1), jnp.zeros(1),
        jnp.zeros(1), jnp.zeros(1), jnp.zeros(1),
        pre, expp, power, 1,
    )
    w_manual = float(pre[0]) * E ** float(power[0]) * np.exp(float(expp[0]) / E)
    assert np.isclose(float(p[0]), 1.0 - np.exp(-w_manual), rtol=1e-12)
    assert 0 < float(p[0]) < 1


def test_ionization_creates_electrons():
    """A strong static E field ionizes N2+ ions and creates electrons."""
    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.solvers.yee import compute_dt_yee

    geom = Geometry(1, (32,), (0.0,), (32e-6,), (True,))
    ions = SpeciesConfig(
        name="ions", charge=constants.q_e, mass=2.3428415e-26,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(2,),
        profile="constant", density=1.0,
        momentum_distribution="at_rest",
        do_field_ionization=True, physical_element="N",
        ionization_initial_level=2, ionization_product_species="electrons",
    )
    electrons = SpeciesConfig(
        name="electrons", charge=-constants.q_e, mass=constants.m_e,
        injection_style="none",
    )
    cfg = SimConfig(
        geometry=geom, max_step=10, dt=compute_dt_yee(geom, 0.9),
        particle_shape=1, species=(ions, electrons),
    )
    sim = Simulation(cfg)
    state = sim.init()
    # strong uniform Ex ~ intense laser scale -> rapid ionization
    state = state.replace(
        fields=state.fields.replace(Ex=jnp.full(geom.n_cell, 5e12))
    )
    sim.state = state
    sim.evolve(5)
    n_e = int(sim.state.species["electrons"].alive.sum())
    lev = np.asarray(sim.state.species["ions"].extra["ionizationLevel"])
    assert n_e > 0
    assert lev.max() > 2
    # charge conservation: electrons created == total level increase
    assert n_e == int((lev - 2).sum())
