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


def nci_godfrey_stencil(cdtodz: float, coeff_set: str, nodal_gather: bool):
    """5-point symmetric z-stencil of the Godfrey NCI corrector.

    Reference: NCIGodfreyFilter.cpp:48-120 — table row selected by
    index=int(101*cdtodz) with the reference's own (slightly lopsided)
    residual weight, prestencil -> 9-point symmetric stencil coefficients
    (center coefficient returned pre-halved, as in DoFilter).
    coeff_set: "ExEyBz" | "BxByEz".
    """
    import numpy as np

    from . import nci_tables as tab

    tab_length = 101
    index = int(tab_length * cdtodz)
    index = max(0, min(index, tab_length - 2))
    weight_right = cdtodz - index / tab_length
    if nodal_gather:
        table = (
            tab.MOMENTUM_EX_EY_BZ if coeff_set == "ExEyBz"
            else tab.MOMENTUM_BX_BY_EZ
        )
    else:
        table = (
            tab.GALERKIN_EX_EY_BZ if coeff_set == "ExEyBz"
            else tab.GALERKIN_BX_BY_EZ
        )
    p = (1.0 - weight_right) * table[index] + weight_right * table[index + 1]
    s = np.empty(5)
    s[0] = (256 + 128 * p[0] + 96 * p[1] + 80 * p[2] + 70 * p[3]) / 256
    s[1] = -(64 * p[0] + 64 * p[1] + 60 * p[2] + 56 * p[3]) / 256
    s[2] = (16 * p[1] + 24 * p[2] + 28 * p[3]) / 256
    s[3] = -(4 * p[2] + 8 * p[3]) / 256
    s[4] = p[3] / 256
    s[0] /= 2.0  # DoFilter counts the center twice
    return s


def apply_z_stencil(arr, stencil, axis: int, periodic: bool = True):
    """Symmetric stencil along ``axis``: out = sum_k s_k (roll(+k)+roll(-k))
    (s_0 pre-halved).  For non-periodic (padded) arrays the rolls wrap into
    guard cells, which the caller crops."""
    out = jnp.zeros_like(arr)
    for k, s in enumerate(stencil):
        out = out + s * (jnp.roll(arr, k, axis) + jnp.roll(arr, -k, axis))
    return out
