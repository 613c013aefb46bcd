"""Dynamic load balancing (parallel/load_balance.py + DistSimulation hook).

The analog of the reference's cost-driven regrid
(Source/Parallelization/WarpXRegrid.cpp:74-160 LoadBalance: makeSFC /
makeKnapSack proposals adopted past an efficiency-ratio threshold, costs from
ComputeCostsHeuristic :316).  A deliberately imbalanced deck — all plasma in
one corner of a z-sharded domain — must (a) measure a low efficiency, (b)
adopt a near-balanced knapsack assignment, and (c) keep the physics identical
to the single-chip run after the repack.
"""

import numpy as np
import pytest

from warpx_tpu.core.deck import config_from_deck
from warpx_tpu.core.simulation import DistSimulation, Simulation
from warpx_tpu.parallel.load_balance import (
    assignment_efficiency,
    knapsack_assignment,
    morton_order,
    sfc_assignment,
)
from warpx_tpu.utils.parser import Deck

# all plasma sits in the lowest-z octant of a z-sharded periodic box: the
# static slab mapping puts every particle on chip 0
_CORNER_3D = """
max_step = 6
amr.n_cell = 16 16 64
geometry.dims = 3
geometry.prob_lo = -8e-6 -8e-6 -8e-6
geometry.prob_hi = 8e-6 8e-6 8e-6
boundary.field_lo = periodic periodic periodic
boundary.field_hi = periodic periodic periodic
algo.current_deposition = esirkepov
algo.particle_shape = 2
warpx.cfl = 0.9
warpx.verbose = 0
warpx.use_filter = 0
particles.species_names = electrons
electrons.charge = -q_e
electrons.mass = m_e
electrons.injection_style = nuniformpercell
electrons.num_particles_per_cell_each_dim = 2 1 1
electrons.profile = parse_density_function
electrons.density_function(x,y,z) = "if(z < -6.0e-6, 1.0e20, 0.0)"
electrons.momentum_distribution_type = gaussian
electrons.ux_th = 0.01
electrons.uy_th = 0.01
electrons.uz_th = 0.01
tpu.tiled_particles = off
"""


def test_knapsack_balances_skewed_costs():
    costs = np.array([100.0, 1.0, 1.0, 1.0, 50.0, 50.0, 1.0, 1.0])
    assign = knapsack_assignment(costs, 2)
    eff = assignment_efficiency(costs, assign, 2)
    # optimal split: {100, 1, 1} vs {50, 50, 1, 1, 1} -> 102.5/103
    assert eff > 0.98
    # nmax cap is honored when loose enough
    assign_capped = knapsack_assignment(costs, 4, nmax=2)
    counts = np.bincount(assign_capped, minlength=4)
    assert counts.max() <= 2


def test_sfc_split_is_contiguous_and_fair():
    rng = np.random.default_rng(0)
    costs = rng.uniform(1.0, 2.0, size=64)
    order = morton_order((4, 4, 4))
    assert sorted(order.tolist()) == list(range(64))
    assign = sfc_assignment(costs, order, 8)
    # every chip used; contiguous chunks along the curve
    chunks = assign[order]
    assert set(chunks.tolist()) == set(range(8))
    assert np.all(np.diff(chunks) >= 0)
    assert assignment_efficiency(costs, assign, 8) > 0.8


def test_efficiency_definition():
    costs = np.array([3.0, 1.0])
    assign = np.array([0, 1])
    # mean(3,1)/max(3,1) = 2/3 (amrex ComputeDistributionMappingEfficiency)
    assert assignment_efficiency(costs, assign, 2) == pytest.approx(2.0 / 3.0)


def _final_checksums(sim):
    out = {}
    f = sim.state.fields
    for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz", "jx", "jy", "jz"):
        out[name] = np.asarray(getattr(f, name)).astype(np.float64)
    return out


def test_corner_plasma_rebalances_and_matches_single_chip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    cfg = config_from_deck(Deck.from_string(_CORNER_3D))

    sim1 = Simulation(cfg)
    sim1.init()
    sim1.evolve()

    cfg_lb = config_from_deck(
        Deck.from_string(_CORNER_3D + "\nalgo.load_balance_intervals = 2\n")
    )
    simN = DistSimulation(cfg_lb, {"z": 8})
    simN.init()

    # before any rebalance every particle lives on chip 0
    _, _, chip_costs, _ = simN.measure_costs()
    cw = cfg_lb.costs_heuristic_cells_wt
    cells_per_chip = float(np.prod(cfg.geometry.n_cell)) / 8
    raw_eff = float(chip_costs.mean() / chip_costs.max())
    assert raw_eff < 0.4, "deck is supposed to start imbalanced"
    assert chip_costs.min() == pytest.approx(cw * cells_per_chip)

    simN.evolve()
    assert simN._balanced, "knapsack proposal should have been adopted"
    eff = float(simN.state.aux["lb_efficiency"])
    assert eff > 0.85, f"post-balance efficiency {eff}"
    # particle work really spread out: every chip owns some particles now
    _, _, chip_costs, _ = simN.measure_costs()
    assert float(chip_costs.mean() / chip_costs.max()) > 0.85

    # physics parity with the single-chip reference run
    cs1 = _final_checksums(sim1)
    csN = _final_checksums(simN)
    for name, a in cs1.items():
        b = csN[name]
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=1e-12, err_msg=name
        )
    s1 = sim1.state.species["electrons"]
    sN = simN.state.species["electrons"]
    a1 = np.asarray(s1.alive)
    aN = np.asarray(sN.alive)
    assert a1.sum() == aN.sum()
    for field in ("x", "y", "z", "ux", "uz", "w"):
        v1 = np.sort(np.asarray(getattr(s1, field))[a1])
        vN = np.sort(np.asarray(getattr(sN, field))[aN])
        scale = max(np.abs(v1).max(), 1e-30)
        np.testing.assert_allclose(
            v1 / scale, vN / scale, atol=1e-12, err_msg=field
        )


def test_threshold_prevents_pointless_rebalance():
    """A uniform plasma is already balanced: the proposal must NOT beat the
    ratio threshold, the step stays in slab mode."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")

    deck = _CORNER_3D.replace(
        'electrons.density_function(x,y,z) = "if(z < -6.0e-6, 1.0e20, 0.0)"',
        'electrons.density_function(x,y,z) = "1.0e20"',
    )
    cfg = config_from_deck(
        Deck.from_string(deck + "\nalgo.load_balance_intervals = 2\n")
    )
    sim = DistSimulation(cfg, {"z": 8})
    sim.init()
    sim.evolve(3)
    assert not sim._balanced
    assert float(sim.state.aux["lb_efficiency"]) > 0.95
