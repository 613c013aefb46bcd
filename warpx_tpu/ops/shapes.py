"""Particle shape factors (B-spline weights), orders 0-4, vectorized.

Reimplements the reference's Compute_shape_factor / Compute_shifted_shape_factor
templates (reference: Source/Particles/ShapeFactors.H:27-155) in centered
B-spline form: the weight of grid point ``i`` for a particle at grid coordinate
``x`` is ``S_n(x - i)`` where S_n is the order-n centered B-spline.  This is
mathematically identical to the reference's xint polynomials and vectorizes
cleanly (no data-dependent array placement).

All positions are in grid units relative to the domain lower corner.  Indices
use floor semantics; the reference's int-cast truncation is equivalent because
its tile-local coordinates are always positive (guard-shifted).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["start_index", "spline", "shape_weights", "esirkepov_weights"]


def start_index(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """Leftmost grid index touched by an order-``order`` shape at position x.

    Matches the return values of Compute_shape_factor (ShapeFactors.H:36-77):
    order 0: floor(x+1/2); 1: floor(x); 2: floor(x+1/2)-1; 3: floor(x)-1;
    4: floor(x+1/2)-2.
    """
    if order % 2 == 0:
        base = jnp.floor(x + 0.5)
    else:
        base = jnp.floor(x)
    return base.astype(jnp.int32) - order // 2


def spline(xi: jnp.ndarray, order: int) -> jnp.ndarray:
    """Centered B-spline S_order evaluated at signed distance ``xi``.

    Piecewise polynomials identical (up to FP association) to the xint forms in
    ShapeFactors.H; evaluated branchlessly with jnp.where so they vectorize.
    Values outside the support evaluate to 0.
    """
    t = jnp.abs(xi)
    if order == 0:
        return jnp.where(t <= 0.5, 1.0, 0.0)
    if order == 1:
        return jnp.where(t < 1.0, 1.0 - t, 0.0)
    if order == 2:
        inner = 0.75 - t * t
        outer = 0.5 * (1.5 - t) ** 2
        return jnp.where(t <= 0.5, inner, jnp.where(t < 1.5, outer, 0.0))
    if order == 3:
        inner = 2.0 / 3.0 - t * t * (1.0 - 0.5 * t)
        outer = (2.0 - t) ** 3 / 6.0
        return jnp.where(t <= 1.0, inner, jnp.where(t < 2.0, outer, 0.0))
    if order == 4:
        t2 = t * t
        inner = (115.0 / 192.0) + t2 * (-0.625 + 0.25 * t2)
        mid = (55.0 + 20.0 * t - 120.0 * t2 + 80.0 * t2 * t - 16.0 * t2 * t2) / 96.0
        outer = (2.5 - t) ** 4 / 24.0
        return jnp.where(
            t <= 0.5, inner, jnp.where(t <= 1.5, mid, jnp.where(t < 2.5, outer, 0.0))
        )
    raise ValueError(f"Unsupported shape order {order}")


def shape_weights(x: jnp.ndarray, order: int):
    """(start_index, [w_0..w_order]) for gather/charge deposition.

    Weight m corresponds to grid point start+m.
    """
    i0 = start_index(x, order)
    ws = [spline(x - (i0.astype(x.dtype) + m), order) for m in range(order + 1)]
    return i0, ws


def esirkepov_weights(x_new: jnp.ndarray, x_old: jnp.ndarray, order: int):
    """Shape weights of x_new and x_old on the common (order+3)-point window.

    The window starts at ``start_index(x_new, order) - 1``; since the CFL limit
    guarantees |x_new - x_old| < 1 cell, both supports fit (reference:
    CurrentDeposition.H:754-771 sx_new/sx_old arrays of size depos_order+3).

    Returns (i0, s_new list, s_old list), each list of length order+3.
    """
    i0 = start_index(x_new, order) - 1
    base = i0.astype(x_new.dtype)
    s_new = [spline(x_new - (base + m), order) for m in range(order + 3)]
    s_old = [spline(x_old - (base + m), order) for m in range(order + 3)]
    return i0, s_new, s_old
