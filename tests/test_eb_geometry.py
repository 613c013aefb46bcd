"""eb2.* analytic geometry builder synthesis (reference: AMReX EB2 builders
used from WarpXInitEB.cpp:103-140).

Covers the advisor findings on the cylinder builder: per-axis center
pairing, finite height, required/validated direction, and the
warpx.eb_implicit_function precedence over eb2.*.
"""
import numpy as np
import pytest

from warpx_tpu.core.deck import _eb2_implicit_function
from warpx_tpu.utils.parser import Deck
from warpx_tpu.utils.expression import compile_expression


def _phi(expr, **coords):
    fn = compile_expression(expr, tuple(coords.keys()))
    return float(fn(*[np.float64(v) for v in coords.values()]))


def test_cylinder_x_direction_center_pairing():
    # x-aligned cylinder in 3D: transverse axes are (y, z) and must pair
    # with center[1], center[2] — not center[0], center[1]
    deck = Deck.from_string(
        "geometry.dims = 3\n"
        "eb2.geom_type = cylinder\n"
        "eb2.cylinder_direction = 0\n"
        "eb2.cylinder_center = 9.0 1.0 2.0\n"
        "eb2.cylinder_radius = 0.5\n"
    )
    expr = _eb2_implicit_function(deck)
    # on the cylinder axis (y=1, z=2): phi = -radius regardless of x
    assert _phi(expr, x=123.0, y=1.0, z=2.0) == pytest.approx(-0.5)
    # a point offset 0.5 in y from the axis sits on the surface
    assert _phi(expr, x=-7.0, y=1.5, z=2.0) == pytest.approx(0.0)
    # center[0]=9 must NOT appear as a transverse offset
    assert _phi(expr, x=9.0, y=0.0, z=0.0) == pytest.approx(
        np.hypot(1.0, 2.0) - 0.5)


def test_cylinder_finite_height():
    deck = Deck.from_string(
        "geometry.dims = 3\n"
        "eb2.geom_type = cylinder\n"
        "eb2.cylinder_direction = 2\n"
        "eb2.cylinder_center = 0.0 0.0 1.0\n"
        "eb2.cylinder_radius = 1.0\n"
        "eb2.cylinder_height = 4.0\n"
    )
    expr = _eb2_implicit_function(deck)
    # inside radially but beyond the cap (|z-1| > 2): outside
    assert _phi(expr, x=0.0, y=0.0, z=3.5) > 0.0
    # inside both: negative
    assert _phi(expr, x=0.0, y=0.0, z=2.5) < 0.0
    # cap surface
    assert _phi(expr, x=0.0, y=0.0, z=3.0) == pytest.approx(0.0)


def test_cylinder_direction_required_and_validated():
    base = (
        "eb2.geom_type = cylinder\n"
        "eb2.cylinder_center = 0.0 0.0 0.0\n"
        "eb2.cylinder_radius = 1.0\n"
    )
    with pytest.raises(ValueError):
        _eb2_implicit_function(
            Deck.from_string("geometry.dims = 3\n" + base))
    with pytest.raises(ValueError):
        _eb2_implicit_function(Deck.from_string(
            "geometry.dims = 2\n" + base + "eb2.cylinder_direction = 2\n"))


def test_parser_function_takes_precedence_over_eb2():
    # WarpXInitEB.cpp:103-114 — eb2.* ignored when the parser fn is set,
    # even eb2 geometries we cannot synthesize (stl)
    deck = Deck.from_string(
        "geometry.dims = 3\n"
        "warpx.eb_implicit_function = \"x*x+y*y-1\"\n"
        "eb2.geom_type = stl\n"
    )
    assert _eb2_implicit_function(deck) == ""
