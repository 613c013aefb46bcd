"""Bounded/moving-window tile-binned fast path vs the slow reference path.

The bounded binned step (core/bounded_step.py ``step_binned``) runs the
fused Pallas kernel over SPACE-ANCHORED tiles while the moving-window grid
slides underneath; everything else (guard fills, PML, filter, particle
boundaries, continuous injection) reuses the slow path's closures.  These
tests pin it to the slow path's physics on CPU (Pallas interpret mode, f64)
— the BASELINE config-2 workload shape (laser + moving window + PML +
continuously injected plasma + beam, Examples/Physics_applications/
laser_acceleration/inputs_base_2d without MR).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.ops.tiling import TileSpec, fold_windows, fold_windows_open
from warpx_tpu.utils.parser import Deck


def test_fold_open_matches_periodic_when_wrapped():
    """Periodic fold == open fold wrapped back onto the torus."""
    n = (16, 24)
    spec = TileSpec.create(n, order=2, n_particles=1000, tile=(8, 8),
                           margin=1, interval=1, p_max=128)
    key = jax.random.PRNGKey(3)
    wr = jax.random.normal(key, (spec.n_tiles, spec.w, spec.w))
    per = fold_windows(wr, spec, n, axes=(0, 1))
    opn = fold_windows_open(wr, spec, axes=(0, 1))
    o = np.asarray(opn)
    acc = np.zeros(n)
    idx0 = (np.arange(o.shape[0]) - spec.off) % n[0]
    idx1 = (np.arange(o.shape[1]) - spec.off) % n[1]
    np.add.at(acc, np.ix_(idx0, idx1), o)
    assert np.abs(acc - np.asarray(per)).max() < 1e-10 * np.abs(acc).max()


_LWFA_2D = """
max_step = 12
amr.n_cell = 32 64
geometry.dims = 2
geometry.prob_lo = -15.e-6 -28.e-6
geometry.prob_hi =  15.e-6   6.e-6
boundary.field_lo = pml pml
boundary.field_hi = pml pml
warpx.cfl = 0.98
warpx.use_filter = 1
warpx.do_moving_window = 1
warpx.moving_window_dir = z
warpx.moving_window_v = 1.0
warpx.sort_intervals = 4
algo.particle_shape = 3
algo.maxwell_solver = yee
particles.species_names = electrons beam
electrons.species_type = electron
electrons.injection_style = NUniformPerCell
electrons.num_particles_per_cell_each_dim = 1 1 1
electrons.xmin = -12.e-6
electrons.xmax =  12.e-6
electrons.zmin = -20.e-6
electrons.profile = constant
electrons.density = 2.e23
electrons.momentum_distribution_type = at_rest
electrons.do_continuous_injection = 1
beam.species_type = electron
beam.injection_style = gaussian_beam
beam.x_rms = .5e-6
beam.y_rms = .5e-6
beam.z_rms = .5e-6
beam.x_m = 0.
beam.y_m = 0.
beam.z_m = -14.e-6
beam.npart = 100
beam.q_tot = -1.e-12
beam.momentum_distribution_type = gaussian
beam.ux_m = 0.0
beam.uy_m = 0.0
beam.uz_m = 500.
beam.ux_th = 2.
beam.uy_th = 2.
beam.uz_th = 50.
lasers.names = laser1
laser1.profile = Gaussian
laser1.position = 0. 0. -10.e-6
laser1.direction = 0. 0. 1.
laser1.polarization = 0. 1. 0.
laser1.e_max = 16.e12
laser1.profile_waist = 5.e-6
laser1.profile_duration = 15.e-15
laser1.profile_t_peak = 30.e-15
laser1.profile_focal_distance = 100.e-6
laser1.wavelength = 0.8e-6
"""


def _run(deck_text, tiled):
    deck = Deck.from_string(
        deck_text + f"\ntpu.tiled_particles = {tiled}\n"
    )
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve()
    return sim


def _compare(sim_a, sim_b, rtol=1e-9, skip=("divB", "divE")):
    cs_a, cs_b = sim_a.checksums(), sim_b.checksums()
    assert set(cs_a) == set(cs_b)
    for k in cs_a:
        for q in cs_a[k]:
            if q in skip:
                continue
            a, b = cs_a[k][q], cs_b[k][q]
            assert abs(a - b) <= rtol * abs(a) + 1e-300, (k, q, a, b)


def test_binned_lwfa_2d_matches_reference():
    """12 steps of the 2D LWFA shape (laser antenna + moving window + PML +
    continuous injection + beam + filter) on the binned path == slow path
    to 1e-9 on every checksum quantity."""
    sim_a = _run(_LWFA_2D, "off")
    sim_b = _run(_LWFA_2D, "on")
    assert sim_b.tile_spec is not None  # really took the fast path
    _compare(sim_a, sim_b)
    # the window really moved (the moving-window machinery was exercised)
    assert float(sim_b.state.aux["window_lo"]) > -28.0e-6


_PEC_3D = """
max_step = 8
amr.n_cell = 16 16 16
geometry.dims = 3
geometry.prob_lo = -8.e-6 -8.e-6 -8.e-6
geometry.prob_hi =  8.e-6  8.e-6  8.e-6
boundary.field_lo = periodic periodic pec
boundary.field_hi = periodic periodic pec
boundary.particle_lo = periodic periodic reflecting
boundary.particle_hi = periodic periodic reflecting
warpx.cfl = 0.98
algo.particle_shape = 2
particles.species_names = electrons protons
electrons.species_type = electron
electrons.injection_style = NUniformPerCell
electrons.num_particles_per_cell_each_dim = 1 1 1
electrons.profile = constant
electrons.density = 1.e24
electrons.momentum_distribution_type = gaussian
electrons.ux_th = 0.05
electrons.uy_th = 0.05
electrons.uz_th = 0.05
protons.species_type = proton
protons.injection_style = NUniformPerCell
protons.num_particles_per_cell_each_dim = 1 1 1
protons.profile = constant
protons.density = 1.e24
protons.momentum_distribution_type = at_rest
"""


@pytest.mark.slow
def test_binned_bounded_3d_pec_matches_reference():
    """3D PEC-z thermal plasma (periodic transverse, reflecting particles):
    binned == slow to 1e-9, exercising the mixed periodic/bounded guard
    handling and the periodic-dim wrap conventions."""
    sim_a = _run(_PEC_3D, "off")
    sim_b = _run(_PEC_3D, "on")
    assert sim_b.tile_spec is not None
    _compare(sim_a, sim_b)


def test_bounded_binned_gate():
    """Configs outside the coverage stay on the slow path under 'auto' and
    hard-error under 'on'."""
    from warpx_tpu.core.deck import config_from_deck
    from warpx_tpu.core.binned_step import bounded_binned_supported

    deck = Deck.from_string(_LWFA_2D)
    cfg = config_from_deck(deck)
    assert bounded_binned_supported(cfg)
    import dataclasses

    bad = dataclasses.replace(cfg, current_deposition="direct")
    assert not bounded_binned_supported(bad)
    bad = dataclasses.replace(cfg, moving_window_dir=0)
    assert not bounded_binned_supported(bad)
