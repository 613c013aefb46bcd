"""Force-free pusher test (reference Examples/Tests/particle_pusher).

Ex = -Vy*Bz exactly cancels the magnetic force; x must stay ~0 over 10000
steps (the Boris pusher fails at 2321 m; Higuera-Cary passes at ~1.1e-4,
reference analysis tolerance 1e-3).  The checksum quantities here are
error-level (analytically zero), so cross-implementation comparison uses the
physics criterion."""

import os

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_3d_particle_pusher_force_free():
    deck = os.path.join(
        REFERENCE, "Examples/Tests/particle_pusher/inputs_test_3d_particle_pusher"
    )
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve()
    sp = sim.state.species["positron"]
    x = float(np.asarray(sp.x)[np.asarray(sp.alive)][0])
    assert abs(x) < 1e-3  # analysis.py tolerance; Boris would give 2321


def test_photon_free_streaming():
    """Photons (massless) free-stream at exactly c along u, momenta frozen
    (reference: PhotonParticleContainer::PushPX)."""
    import numpy as np
    import jax.numpy as jnp

    from warpx_tpu import constants
    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation

    geom = Geometry(3, (8, 8, 8), (0.0,) * 3, (8e-6,) * 3, (True,) * 3)
    ph = SpeciesConfig(
        name="photons", charge=0.0, mass=0.0, species_type="photon",
        injection_style="singleparticle",
        single_particle_pos=(1e-6, 1e-6, 1e-6),
        single_particle_u=(0.6, 0.0, 0.8),
        single_particle_weight=1.0,
    )
    dt = 1e-16
    cfg = SimConfig(geometry=geom, max_step=10, dt=dt, species=(ph,))
    sim = Simulation(cfg)
    sim.init()
    sp0 = sim.state.species["photons"]
    u0 = [float(np.asarray(a)[0]) for a in (sp0.ux, sp0.uy, sp0.uz)]
    sim.evolve(10)
    sp = sim.state.species["photons"]
    x = [float(np.asarray(p)[0]) for p in sp.positions(3)]
    # direction u/(|u|) = (0.6,0,0.8); distance = c*t
    t = 10 * dt
    assert abs(x[0] - (1e-6 + 0.6 * constants.c * t)) < 1e-12
    assert abs(x[2] - (1e-6 + 0.8 * constants.c * t)) < 1e-12
    u1 = [float(np.asarray(a)[0]) for a in (sp.ux, sp.uy, sp.uz)]
    assert u0 == u1  # momentum frozen


def test_thermal_particle_boundary():
    """Thermal walls re-emit particles with the prescribed u_th: the plasma
    temperature stays near the wall temperature and no particles are lost
    (reference: Examples/Tests/particle_thermal_boundary)."""
    import numpy as np

    from warpx_tpu import constants
    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.solvers.yee import compute_dt_yee

    uth = 0.05
    geom = Geometry(2, (16, 16), (0.0, 0.0), (2.5e-7, 2.5e-7), (False, False))
    sp = SpeciesConfig(
        name="electrons", charge=-constants.q_e, mass=constants.m_e,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(4, 4),
        profile="constant", density=1e26,
        momentum_distribution="gaussian",
        ux_th=uth, uy_th=uth, uz_th=uth,
        boundary_u_th=uth,
    )
    cfg = SimConfig(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.9),
        species=(sp,),
        field_bc_lo=("pec", "pec"), field_bc_hi=("pec", "pec"),
        particle_bc_lo=("thermal", "thermal"),
        particle_bc_hi=("thermal", "thermal"),
    )
    sim = Simulation(cfg)
    sim.init()
    n0 = int(np.asarray(sim.state.species["electrons"].alive).sum())
    sim.evolve(300)
    spo = sim.state.species["electrons"]
    alive = np.asarray(spo.alive)
    assert int(alive.sum()) == n0  # thermal walls never absorb
    # all particles stay in the box
    for d, (lo, hi) in enumerate(zip(geom.prob_lo, geom.prob_hi)):
        p = np.asarray(spo.positions(2)[d])[alive]
        assert (p >= lo).all() and (p <= hi).all()
    # temperature stays at the wall temperature scale
    u_rms = np.sqrt(np.mean(np.asarray(spo.ux)[alive] ** 2)) / constants.c
    assert 0.5 * uth < u_rms < 2.0 * uth, u_rms
