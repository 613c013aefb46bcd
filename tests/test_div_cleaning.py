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


@pytest.mark.slow
def test_reference_dive_cleaning_deck_3d():
    """Examples/Tests/dive_cleaning (3D): starting from E=0 around a static
    gaussian charge, div-E cleaning must radiate the error away so E
    converges to the Gauss-law field (analysis.py:123, atol 0.165*max)."""
    import os

    from scipy.special import gammainc

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.diagnostics.fields import cell_centered_output

    from .conftest import REFERENCE

    deck = os.path.join(
        REFERENCE, "Examples/Tests/dive_cleaning/inputs_test_3d_dive_cleaning"
    )
    sim = Simulation.from_deck(
        deck,
        overrides=(
            "amr.n_cell = 32 32 32",  # half resolution: same physics
            "max_step = 64",
            "diagnostics.diags_names =",
        ),
    )
    sim.init()
    sim.evolve()
    out = cell_centered_output(sim.state, sim.cfg, sim.staggering)
    E = np.sqrt(out["Ex"] ** 2 + out["Ey"] ** 2 + out["Ez"] ** 2)

    Qtot, r0 = -1.0e-20, 2.0e-6
    n = 32
    lo, hi = -50e-6, 50e-6
    x = lo + (hi - lo) / n * (0.5 + np.arange(n))
    x3, y3, z3 = np.meshgrid(x, x, x, indexing="ij")
    r2 = x3**2 + y3**2 + z3**2
    factor = (
        Qtot / (4 * np.pi * constants.ep0 * r2**1.5)
        * gammainc(1.5, r2 / (2.0 * r0**2))
    )
    E_th = np.sqrt((factor * x3) ** 2 + (factor * y3) ** 2 + (factor * z3) ** 2)
    # at 32^3 the r0=2um beam core is under-resolved (dx=3.1um): gate the
    # resolved region (the reference's 0.165 gate is at 64^3); the far field
    # is where the cleaning has to build the correct Gauss-law E from zero
    dx = (hi - lo) / n
    mask = r2 > (2.5 * dx) ** 2
    rel = np.abs(E - E_th)[mask].max() / E_th[mask].max()
    assert rel < 0.05, rel


@pytest.mark.slow
def test_reference_divb_cleaning_deck_3d():
    """Examples/Tests/divb_cleaning (3D): dG/dt = c^2 divB to 10%
    (analysis.py:44-54) on the real deck (PML + parse external B)."""
    import os

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.diagnostics.fields import cell_centered_output

    from .conftest import REFERENCE

    deck = os.path.join(
        REFERENCE, "Examples/Tests/divb_cleaning/inputs_test_3d_divb_cleaning"
    )
    sim = Simulation.from_deck(
        deck,
        overrides=("max_step = 60", "diagnostics.diags_names ="),
    )
    sim.init()
    sim.evolve(57)
    G = []
    divB = []
    for _ in range(3):
        out = cell_centered_output(sim.state, sim.cfg, sim.staggering)
        G.append(out["G"])
        divB.append(out["divB"])
        sim.evolve(1)
    dt, c2 = sim.cfg.dt, constants.c**2
    x = G[2] - G[0]
    y = 2 * dt * c2 * divB[1]
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


def test_projection_divb_cleaner_external():
    """warpx.do_divb_cleaning_external: a loaded external B with nonzero
    discrete divergence is projected to div(B) = 0 at machine precision
    (ProjectionDivCleaner analog)."""
    import numpy as np
    import jax.numpy as jnp

    from warpx_tpu.core.config import SimConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.solvers.yee import compute_div_b, compute_dt_yee

    geom = Geometry(3, (16, 16, 16), (0.0,) * 3, (1.0,) * 3, (True,) * 3)
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=compute_dt_yee(geom, 0.9),
        b_ext_grid=("parse", ("sin(2*pi*x)", "cos(2*pi*y)*sin(2*pi*x)",
                              "0.3*sin(4*pi*z)")),
        do_divb_cleaning_external=True,
    )
    sim = Simulation(cfg)
    state = sim.init()
    div0 = compute_div_b(state.fields, geom)
    scale = max(float(jnp.abs(state.fields.Bx).max()), 1e-30)
    assert float(jnp.abs(div0).max()) < 1e-10 * scale / geom.dx[0]

    # control: without the cleaner the same field has big divergence
    import dataclasses

    cfg2 = dataclasses.replace(cfg, do_divb_cleaning_external=False)
    sim2 = Simulation(cfg2)
    state2 = sim2.init()
    div1 = compute_div_b(state2.fields, geom)
    assert float(jnp.abs(div1).max()) > 1e-2 * scale / geom.dx[0]
