"""Field gather: staggered grid -> particle positions, shape orders 1-4.

Reimplements doGatherShapeN (reference: Source/Particles/Gather/FieldGather.H:38)
as a vectorized jnp interpolation.  Two modes:

* energy-conserving ("Galerkin", the reference default): the shape order is
  reduced by one along an E component's own axis and along a B component's two
  transverse axes (FieldGather.H:73-199 `sx_node_galerkin` selection logic);
* momentum-conserving: full order along every axis for every component.

Two index modes:
* wrap=True: periodic torus, taps wrap with modular indexing (equivalent to
  the reference's guard cells filled by periodic FillBoundary);
* wrap=False: guard-padded local shard arrays — indices are start+tap+offset
  with offset = number of guard cells; used inside shard_map after halo
  exchange.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import jax.numpy as jnp

from .shapes import shape_weights

__all__ = ["interp_to_points", "gather_eb"]

# Which (x,y,z) axes get the reduced-order "Galerkin" shape per component.
_GALERKIN_AXES = {
    "Ex": ("x",),
    "Ey": ("y",),
    "Ez": ("z",),
    "Bx": ("y", "z"),
    "By": ("x", "z"),
    "Bz": ("x", "y"),
}


def interp_to_points(
    field: jnp.ndarray,
    grid_coords: Sequence[jnp.ndarray],
    dim_orders: Sequence[int],
    dim_staggered: Sequence[bool],
    n_cell: Sequence[int],
    wrap: bool = True,
    offset: int = 0,
) -> jnp.ndarray:
    """Interpolate ``field`` to particle grid coordinates.

    grid_coords[d] is the particle coordinate in grid units (0 at the array
    origin, excluding guards).  dim_staggered[d]=True means the component
    lives at half-integer positions in dim d (evaluate shapes at coord - 1/2,
    like the reference's `x - 0.5_rt` cell-centered branch).
    """
    ndim = len(grid_coords)
    starts = []
    weights = []
    for d in range(ndim):
        xd = grid_coords[d] - 0.5 if dim_staggered[d] else grid_coords[d]
        i0, ws = shape_weights(xd, dim_orders[d])
        starts.append(i0 + offset)
        weights.append(ws)

    out = 0.0
    for taps in itertools.product(*[range(o + 1) for o in dim_orders]):
        w = weights[0][taps[0]]
        for d in range(1, ndim):
            w = w * weights[d][taps[d]]
        if wrap:
            idx = tuple(
                jnp.mod(starts[d] + taps[d], n_cell[d]) for d in range(ndim)
            )
        else:
            idx = tuple(starts[d] + taps[d] for d in range(ndim))
        out = out + w * field[idx]
    return out


def gather_eb(
    positions: Sequence[jnp.ndarray],
    field_arrays: dict,
    staggering: dict,
    geom,
    order: int,
    galerkin: bool = True,
    origin: Sequence | None = None,
    wrap: bool = True,
    offset: int = 0,
) -> Tuple[jnp.ndarray, ...]:
    """Gather (Ex,Ey,Ez,Bx,By,Bz) to particles.

    ``positions``: active-axis absolute coordinates; ``field_arrays``: name ->
    grid array (padded with ``offset`` guards per side when wrap=False);
    ``origin``: physical coordinate of index 0 (default: domain lower corner;
    pass the shard-local corner inside shard_map).
    """
    axes = geom.axis_names
    dx = geom.dx
    lo = origin if origin is not None else geom.prob_lo
    coords = [
        (positions[d] - lo[d]) * (1.0 / dx[d]) for d in range(geom.ndim)
    ]

    results = []
    for comp in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        flags = staggering[comp]
        dim_orders = []
        dim_staggered = []
        for d, ax in enumerate(axes):
            reduced = galerkin and (ax in _GALERKIN_AXES[comp])
            dim_orders.append(order - 1 if reduced else order)
            dim_staggered.append(flags[d] == 0)
        results.append(
            interp_to_points(
                field_arrays[comp], coords, dim_orders, dim_staggered,
                geom.n_cell, wrap=wrap, offset=offset,
            )
        )
    return tuple(results)
