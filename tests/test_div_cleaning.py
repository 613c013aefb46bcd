"""Hyperbolic divergence cleaning (F/G) on a periodic domain.

Validates the scalar-field update relations the reference's own analyses
gate on (Examples/Tests/divb_cleaning/analysis.py:44-54: G_new - G_old ==
2*dt*c^2*divB to 10%), seeded through parse-style external grid fields
(warpx.B_ext_grid_init_style), plus the F counterpart dF/dt = divE - rho/eps0.
"""

import numpy as np
import pytest

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.solvers.yee import compute_div_b, compute_div_e, compute_dt_yee


def _geom():
    return Geometry(3, (16, 16, 16), (0.0,) * 3, (1e-5,) * 3, (True,) * 3)


def test_divb_cleaning_update_relation():
    geom = _geom()
    cfg = SimConfig(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.5),
        do_divb_cleaning=True,
        b_ext_grid=("parse", (
            "B0*sin(2*pi*x/Lx)", "0", "0",
        )),
        user_constants=(("B0", 1.0e-4), ("Lx", 1e-5)),
    )
    sim = Simulation(cfg)
    sim.init()
    assert float(np.abs(np.asarray(sim.state.fields.Bx)).max()) > 5e-5

    G, divB = [], []
    for _ in range(5):
        G.append(np.asarray(sim.state.fields.G))
        divB.append(np.asarray(compute_div_b(sim.state.fields, geom)))
        sim.evolve(1)
    dt, c2 = cfg.dt, constants.c**2
    x = G[3] - G[1]
    y = 2 * dt * c2 * divB[2]
    assert np.abs(y).max() > 0  # the seeded field is divergent
    rel = np.abs(x - y).max() / np.abs(y).max()
    assert rel < 1e-1, rel  # the reference's analysis gate


def test_dive_cleaning_update_relation():
    geom = _geom()
    cfg = SimConfig(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.5),
        do_dive_cleaning=True,
        e_ext_grid=("parse", ("E0*sin(2*pi*x/Lx)", "0", "0")),
        user_constants=(("E0", 1.0e3), ("Lx", 1e-5)),
    )
    sim = Simulation(cfg)
    sim.init()

    F, divE = [], []
    for _ in range(5):
        F.append(np.asarray(sim.state.fields.F))
        divE.append(np.asarray(compute_div_e(sim.state.fields, geom)))
        sim.evolve(1)
    dt = cfg.dt
    x = F[3] - F[1]
    y = 2 * dt * divE[2]  # rho = 0: dF/dt = divE
    rel = np.abs(x - y).max() / np.abs(y).max()
    assert rel < 1e-1, rel


def test_cleaning_inert_when_divergence_free():
    """G stays identically zero for a divergence-free B; fields match the
    no-cleaning run exactly."""
    geom = _geom()
    base = dict(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.5),
        b_ext_grid=("parse", ("0", "B0*sin(2*pi*x/Lx)", "0")),  # divB = 0
        user_constants=(("B0", 1.0e-4), ("Lx", 1e-5)),
    )
    sim_c = Simulation(SimConfig(**base, do_divb_cleaning=True))
    sim_c.init()
    sim_c.evolve(4)
    sim_p = Simulation(SimConfig(**base))
    sim_p.init()
    sim_p.evolve(4)
    assert float(np.abs(np.asarray(sim_c.state.fields.G)).max()) < 1e-18
    np.testing.assert_allclose(
        np.asarray(sim_c.state.fields.By), np.asarray(sim_p.state.fields.By),
        rtol=0, atol=1e-20,
    )
