"""pywarpx-style input buckets (reference: Python/pywarpx/Bucket.py)."""

import numpy as np


def test_buckets_build_run_and_write(tmp_path):
    import importlib

    from warpx_tpu import pywarpx

    importlib.reload(pywarpx)  # fresh bucket state
    pywarpx.max_step = 3
    pywarpx.amr.n_cell = [8, 8, 8]
    pywarpx.geometry.dims = 3
    pywarpx.geometry.prob_lo = [-1e-5] * 3
    pywarpx.geometry.prob_hi = [1e-5] * 3
    pywarpx.boundary.field_lo = ["periodic"] * 3
    pywarpx.boundary.field_hi = ["periodic"] * 3
    pywarpx.warpx.cfl = 0.9
    pywarpx.warpx.use_filter = 0
    pywarpx.algo.particle_shape = 1
    pywarpx.particles.species_names = ["electrons"]
    el = pywarpx.Species("electrons")
    el.charge = "-q_e"
    el.mass = "m_e"
    el.injection_style = "NUniformPerCell"
    el.num_particles_per_cell_each_dim = [1, 1, 1]
    el.profile = "constant"
    el.density = 1e20
    el.momentum_distribution_type = "at_rest"

    path = pywarpx.write_input_file(str(tmp_path / "inputs"))
    text = open(path).read()
    assert "amr.n_cell = 8 8 8" in text
    assert "electrons.density = 1e+20" in text or "electrons.density = 1e20" in text

    sim = pywarpx.init(output_dir=str(tmp_path / "diags"))
    pywarpx.evolve()
    assert int(sim.state.step) == 3
    n = sum(int(np.asarray(s.alive).sum())
            for s in sim.state.species.values())
    assert n == 512
    # the written deck runs identically through the CLI deck path
    from warpx_tpu.core.simulation import Simulation

    sim2 = Simulation.from_deck(path, output_dir=str(tmp_path / "d2"))
    sim2.init()
    sim2.evolve()
    a = np.asarray(sim.state.fields.Ex)
    b = np.asarray(sim2.state.fields.Ex)
    np.testing.assert_array_equal(a, b)
    pywarpx.finalize()
