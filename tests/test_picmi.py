"""PICMI front-end test: build and run the 3D Langmuir setup through the
PICMI-standard API (mirrors inputs_test_3d_langmuir_multi_picmi.py)."""

import numpy as np
import pytest

from warpx_tpu import picmi

from .conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_picmi_langmuir_small():
    c = picmi.constants.c
    uniform_plasma = picmi.UniformDistribution(
        density=1.0e25,
        upper_bound=[0.0, None, None],
        directed_velocity=[0.1 * c, 0.0, 0.0],
    )
    electrons = picmi.Species(
        particle_type="electron", name="electrons",
        initial_distribution=uniform_plasma,
    )
    grid = picmi.Cartesian3DGrid(
        number_of_cells=[16, 16, 16],
        lower_bound=[-20e-6, -20e-6, -20e-6],
        upper_bound=[20e-6, 20e-6, 20e-6],
        lower_boundary_conditions=["periodic"] * 3,
        upper_boundary_conditions=["periodic"] * 3,
        moving_window_velocity=[0.0, 0.0, 0.0],
    )
    solver = picmi.ElectromagneticSolver(grid=grid, cfl=1.0)
    sim = picmi.Simulation(solver=solver, max_steps=10, verbose=0)
    sim.add_species(
        electrons,
        layout=picmi.GriddedLayout(n_macroparticle_per_cell=[2, 2, 2], grid=grid),
    )
    sim.step(10)

    core = sim.extension
    assert int(core.state.step) == 10
    ez = np.asarray(core.state.fields.Ez)
    assert np.isfinite(ez).all()
    # half the box is filled (upper_bound x=0): plasma oscillations active
    assert float(np.abs(np.asarray(core.state.fields.Ex)).max()) > 0
