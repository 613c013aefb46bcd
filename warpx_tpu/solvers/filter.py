"""Bilinear (binomial) smoothing filter for J and rho.

Reimplements the reference's BilinearFilter (Source/Filter/BilinearFilter.cpp:
each pass convolves [1/4, 1/2, 1/4] along one dimension; warpx.use_filter with
warpx.filter_npass_each_dir passes per dimension, applied to the deposited
current before the field solve and to rho for diagnostics
(Source/Parallelization/WarpXComm.cpp:1357 ApplyFilterJ)).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = ["bilinear_filter", "bilinear_filter_padded"]


def _pass_periodic(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    return 0.5 * arr + 0.25 * (jnp.roll(arr, 1, axis) + jnp.roll(arr, -1, axis))


def bilinear_filter(
    arr: jnp.ndarray, npass_each_dir: Sequence[int]
) -> jnp.ndarray:
    """Periodic-torus binomial filter (npass passes per dimension)."""
    out = arr
    for axis, npass in enumerate(npass_each_dir):
        for _ in range(npass):
            out = _pass_periodic(out, axis)
    return out


def _pass_padded(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """One binomial pass on an array with >=1 junk/guard layer per side;
    the outermost layer of the result is garbage (callers keep guards wide
    enough that only valid cells survive)."""
    lo = [slice(None)] * arr.ndim
    hi = [slice(None)] * arr.ndim
    lo[axis] = slice(0, -2)
    hi[axis] = slice(2, None)
    mid = [slice(None)] * arr.ndim
    mid[axis] = slice(1, -1)
    core = 0.5 * arr[tuple(mid)] + 0.25 * (arr[tuple(lo)] + arr[tuple(hi)])
    # keep shape: pad back one junk layer per side
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (1, 1)
    return jnp.pad(core, pad)


def bilinear_filter_padded(
    arr: jnp.ndarray, npass_each_dir: Sequence[int]
) -> jnp.ndarray:
    """Binomial filter on a guard-padded block (guards must be pre-filled;
    npass outermost layers of the result are invalid)."""
    out = arr
    for axis, npass in enumerate(npass_each_dir):
        for _ in range(npass):
            out = _pass_padded(out, axis)
    return out
