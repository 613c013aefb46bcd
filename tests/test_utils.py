"""Unit tests: deck parser, expression compiler, intervals, shape factors."""

import numpy as np
import pytest

from warpx_tpu import constants
from warpx_tpu.ops.shapes import esirkepov_weights, shape_weights, spline, start_index
from warpx_tpu.utils.expression import compile_expression, evaluate_constant
from warpx_tpu.utils.intervals import IntervalsParser
from warpx_tpu.utils.parser import Deck


def test_expression_constants():
    assert evaluate_constant("q_e") == constants.q_e
    assert evaluate_constant("sqrt(4.)*pi") == pytest.approx(2 * np.pi)
    assert evaluate_constant("2.*n0", {"n0": 3.0}) == 6.0


def test_expression_jax_fn():
    f = compile_expression("a0*sin(k*x)*cos(k*y)", ["x", "y"], {"a0": 2.0, "k": 3.0})
    x = np.array([0.1, 0.2])
    y = np.array([0.3, 0.4])
    np.testing.assert_allclose(
        np.asarray(f(x, y)), 2.0 * np.sin(3 * x) * np.cos(3 * y), rtol=1e-12
    )


def test_expression_conditionals():
    f = compile_expression("if(x>0, 1.0, 2.0)", ["x"])
    np.testing.assert_allclose(np.asarray(f(np.array([-1.0, 1.0]))), [2.0, 1.0])


def test_deck_parsing():
    deck = Deck.from_string(
        """
my_constants.n0 = 1.e24
my_constants.wp = sqrt(n0*q_e**2/(epsilon0*m_e))
max_step = 10   # trailing comment
geometry.prob_lo = -1. -2. -3.
s.momentum_function_ux(x,y,z) = "0.01*sin(x)"
flag = 1
"""
    )
    assert deck.get_int("max_step") == 10
    assert deck.get_reals("geometry.prob_lo") == [-1.0, -2.0, -3.0]
    assert deck.my_constants["wp"] == pytest.approx(
        np.sqrt(1e24 * constants.q_e**2 / (constants.ep0 * constants.m_e))
    )
    expr, variables = deck.get_expr_string("s", "momentum_function_ux")
    assert variables == ["x", "y", "z"]
    assert "sin" in expr
    assert deck.get_bool("flag") is True


def test_intervals():
    iv = IntervalsParser("10")
    assert iv.contains(10) and iv.contains(20) and not iv.contains(15)
    iv = IntervalsParser("300:600:100")
    assert iv.contains(300) and iv.contains(500) and not iv.contains(250)
    assert not iv.contains(700)
    iv = IntervalsParser("5,7")
    assert iv.contains(5) and iv.contains(7) and iv.contains(35)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_shape_partition_of_unity(order):
    x = np.linspace(3.0, 7.0, 57)
    i0, ws = shape_weights(x, order)
    total = sum(np.asarray(w) for w in ws)
    np.testing.assert_allclose(total, 1.0, atol=1e-14)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_shape_matches_reference_polynomials(order):
    """Check the centered-spline form against the reference xint polynomials
    (Source/Particles/ShapeFactors.H:40-66)."""
    x = np.array([5.37])
    i0, ws = shape_weights(x, order)
    if order == 1:
        j = int(np.floor(x[0]))
        xint = x[0] - j
        assert i0[0] == j
        np.testing.assert_allclose(
            [float(w[0]) for w in ws], [1 - xint, xint], rtol=1e-13
        )
    elif order == 2:
        j = int(np.floor(x[0] + 0.5))
        xint = x[0] - j
        assert i0[0] == j - 1
        expect = [
            0.5 * (0.5 - xint) ** 2,
            0.75 - xint**2,
            0.5 * (0.5 + xint) ** 2,
        ]
        np.testing.assert_allclose([float(w[0]) for w in ws], expect, rtol=1e-12)
    else:
        j = int(np.floor(x[0]))
        xint = x[0] - j
        assert i0[0] == j - 1
        expect = [
            (1 - xint) ** 3 / 6,
            2 / 3 - xint**2 * (1 - xint / 2),
            2 / 3 - (1 - xint) ** 2 * (1 - 0.5 * (1 - xint)),
            xint**3 / 6,
        ]
        np.testing.assert_allclose([float(w[0]) for w in ws], expect, rtol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_esirkepov_windows_charge_conservation(order):
    """Old and new weights on the common window each sum to 1 (discrete
    continuity prerequisite)."""
    x_new = np.array([4.2, 5.9, 3.01])
    x_old = x_new - np.array([0.4, -0.3, 0.05])
    i0, s_new, s_old = esirkepov_weights(x_new, x_old, order)
    np.testing.assert_allclose(sum(np.asarray(s) for s in s_new), 1.0, atol=1e-14)
    np.testing.assert_allclose(sum(np.asarray(s) for s in s_old), 1.0, atol=1e-14)


def test_start_index_negative():
    # floor semantics below zero (particles just outside the lower edge)
    assert start_index(np.array([-0.3]), 1)[0] == -1
    assert spline(np.array([2.5]), 3)[0] == 0.0


def test_callbacks_registry():
    """Callback hook points fire in evolve (pywarpx callbacks API:
    installcallback/uninstallcallback/isinstalled/decorators)."""
    import jax

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.models import uniform_plasma
    from warpx_tpu.utils.callbacks import (
        callfromafterstep, clear_callbacks, installcallback, isinstalled,
        uninstallcallback,
    )

    calls = []
    installcallback("beforestep", lambda: calls.append("b"))

    @callfromafterstep
    def after():
        calls.append("a")

    assert isinstalled("afterstep", after)
    cfg = uniform_plasma(n=8, ndim=2, max_step=2)
    sim = Simulation(cfg)
    sim.init()
    sim.evolve()
    assert calls == ["b", "a", "b", "a"]
    uninstallcallback("afterstep", after)
    assert not isinstalled("afterstep", after)
    clear_callbacks()


def test_boundary_scraping_buffer():
    """Absorbed particles are recorded into the per-face scraping buffer
    with weight/momentum/position/step (ParticleBoundaryBuffer analog)."""
    import numpy as np

    from warpx_tpu import constants
    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation

    geom = Geometry(2, (16, 16), (0.0, 0.0), (1e-5, 1e-5), (False, False))
    sp = SpeciesConfig(
        name="beam", charge=-constants.q_e, mass=constants.m_e,
        injection_style="nuniformpercell",
        num_particles_per_cell_each_dim=(1, 1),
        profile="constant", density=1e20,
        momentum_distribution="constant", uz=5.0,  # relativistic +z
        do_not_deposit=True, do_not_gather=True,
        save_particles_at=("zhi",),
    )
    from warpx_tpu.solvers.yee import compute_dt_yee

    cfg = SimConfig(
        geometry=geom, max_step=40, dt=compute_dt_yee(geom, 0.9),
        species=(sp,),
        field_bc_lo=("pec", "pec"), field_bc_hi=("pec", "pec"),
        particle_bc_lo=("absorbing", "absorbing"),
        particle_bc_hi=("absorbing", "absorbing"),
        use_filter=False,
    )
    sim = Simulation(cfg)
    sim.init()
    w0 = float(np.asarray(sim.state.species["beam"].w).sum())
    sim.evolve()
    got = sim.scraped_particles("beam", "zhi")
    alive = np.asarray(sim.state.species["beam"].alive)
    w_alive = float(
        np.asarray(sim.state.species["beam"].w)[alive].sum()
    )
    assert got["w"].size > 0
    # all scraped particles crossed the zhi face moving +z
    assert np.all(got["p1"] > 1e-5)
    assert np.all(got["uz"] > 0)
    assert np.all(got["step"] >= 0)
    # weight bookkeeping: scraped + alive == initial
    np.testing.assert_allclose(got["w"].sum() + w_alive, w0, rtol=1e-12)
