"""DSMC binary collisions (reference: BinaryCollision/DSMC/DSMCFunc.H).

Gates: collision rate == n sigma v_rel dt against a constant cross section,
total momentum conservation, and charge-exchange velocity swap.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.core.config import (
    CollisionConfig, MCCProcessConfig, SimConfig, SpeciesConfig,
)
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation

c = constants.c
q_e = constants.q_e
m_p = 1.67262192369e-27


def _sim(procs, uz1=1e5, uz2=-1e5, dens=1e18, sigma=None):
    geom = Geometry(3, (4, 4, 4), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    mk = lambda nm, uz: SpeciesConfig(  # noqa: E731
        name=nm, charge=0.0, mass=m_p,
        injection_style="nrandompercell", num_particles_per_cell=64,
        profile="constant", density=dens,
        momentum_distribution="constant", uz=uz / c,
        do_not_push=True, do_not_deposit=True,
    )
    col = CollisionConfig(
        name="d1", species=("a", "b"), kind="dsmc", processes=procs,
    )
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=1e-7, em_solver="none",
        species=(mk("a", uz1), mk("b", uz2)), collisions=(col,),
        use_filter=False,
    )
    sim = Simulation(cfg)
    sim.init()
    return sim


def _flat_sigma(val=1e-19):
    return MCCProcessConfig(
        kind="elastic", energies=(0.0, 1e9), sigmas=(val, val),
    )


def test_dsmc_elastic_rate_and_conservation():
    sigma = 1e-19
    sim = _sim((_flat_sigma(sigma),))
    st0 = sim.state
    p0 = sum(
        float(jnp.sum(jnp.where(s.alive, s.w * s.uz, 0.0))) * m_p
        for s in st0.species.values()
    )
    st1 = sim._step(st0)
    # collided particles changed their momentum direction
    a0, a1 = st0.species["a"], st1.species["a"]
    changed = np.asarray(jnp.abs(a1.uz - a0.uz) > 1.0) & np.asarray(a0.alive)
    frac = changed.mean()
    v_rel = 2e5  # nonrelativistic head-on
    expected = 1e18 * sigma * v_rel * 1e-7  # n sigma v dt
    # elastic isotropic scattering leaves ~0 chance of uz unchanged
    assert abs(frac - expected) < 0.3 * expected, (frac, expected)
    # total momentum conserved exactly (swaps within pairs)
    p1 = sum(
        float(jnp.sum(jnp.where(s.alive, s.w * s.uz, 0.0))) * m_p
        for s in st1.species.values()
    )
    scale = abs(float(jnp.sum(jnp.abs(st0.species["a"].uz)))) * m_p
    assert abs(p1 - p0) < 1e-9 * scale, (p0, p1)
    # energy conserved (elastic, equal masses: |u| preserved pairwise)
    def ke(st):
        return sum(
            float(jnp.sum(jnp.where(
                s.alive, s.w * (s.ux**2 + s.uy**2 + s.uz**2), 0.0)))
            for s in st.species.values()
        )
    np.testing.assert_allclose(ke(st1), ke(st0), rtol=1e-9)


def test_dsmc_charge_exchange_swaps():
    proc = MCCProcessConfig(
        kind="charge_exchange", energies=(0.0, 1e9), sigmas=(1e-18, 1e-18),
    )
    sim = _sim((proc,))
    st0 = sim.state
    st1 = sim._step(st0)
    a0, a1 = st0.species["a"], st1.species["a"]
    changed = np.asarray(jnp.abs(a1.uz - a0.uz) > 1.0) & np.asarray(a0.alive)
    assert changed.sum() > 50
    # swapped particles carry the partner's velocity exactly
    sw = np.asarray(a1.uz)[changed]
    np.testing.assert_allclose(sw, -1e5, rtol=1e-12)
