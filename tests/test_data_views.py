"""pywarpx-style data views (fields.py / particle_containers.py analogs)."""

import numpy as np

import jax.numpy as jnp

from warpx_tpu import constants, fields, particle_containers
from warpx_tpu.core.config import SimConfig, SpeciesConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.solvers.yee import compute_dt_yee


def _sim():
    geom = Geometry(3, (8, 8, 8), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    sp = SpeciesConfig(
        name="electrons", charge=-constants.q_e, mass=constants.m_e,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(1, 1, 1),
        profile="constant", density=1.0e20, capacity_factor=2.0,
    )
    cfg = SimConfig(geometry=geom, max_step=2,
                    dt=compute_dt_yee(geom, 0.9), species=(sp,))
    sim = Simulation(cfg)
    sim.init()
    return sim


def test_field_wrapper_read_write_mesh():
    sim = _sim()
    Ex = fields.ExWrapper()
    assert Ex.shape == (8, 8, 8)
    Ex[:, :, 4] = 3.0
    assert float(np.abs(Ex[:, :, 4] - 3.0).max()) == 0.0
    assert Ex[0, 0, 3] == 0.0
    # the write landed in the live state
    assert float(sim.state.fields.Ex[2, 5, 4]) == 3.0
    # mesh honors staggering: Ex is cell-centered in x, nodal in y
    assert np.isclose(Ex.mesh("x")[0], 0.5 / 8)
    assert np.isclose(Ex.mesh("y")[0], 0.0)
    assert Ex.norm0() == 3.0
    # evolve still works after the write-back
    sim.evolve()


def test_particle_container_wrapper():
    sim = _sim()
    pc = particle_containers.ParticleContainerWrapper("electrons")
    n0 = pc.get_particle_count()
    assert n0 == 512
    assert pc.xp.shape == (n0,)
    assert np.all(pc.wp > 0)
    q = pc.get_species_charge_sum()
    assert np.isclose(q, -constants.q_e * float(pc.wp.sum()))
    # add two particles
    pc.add_particles(
        x=[0.1, 0.2], y=[0.3, 0.4], z=[0.5, 0.6],
        ux=1e5, uy=0.0, uz=0.0, w=[1e10, 2e10],
    )
    assert pc.get_particle_count() == n0 + 2
    assert np.isclose(sorted(pc.wp)[-1], 2e10) or 2e10 in pc.wp
    sim.evolve()
    assert pc.get_particle_count() == n0 + 2
