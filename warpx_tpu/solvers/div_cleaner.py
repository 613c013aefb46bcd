"""Initialization projection divergence cleaner.

Reimplements the reference's ProjectionDivCleaner (reference:
Source/Initialization/DivCleaner/ProjectionDivCleaner.cpp, invoked from
WarpXInitData.cpp:589-591 under warpx.do_divb_cleaning_external): loaded
external B fields generally violate the discrete div(B)=0; the cleaner
solves div(grad phi) = div(B) and subtracts grad phi so the STAGGERED
divergence (compute_div_b's stencil) vanishes to machine precision.

The reference uses MLMG multigrid; on the periodic torus the same discrete
projection is exact in k-space: with the array up-difference symbol
s_d = (e^{i k_d d} - 1)/d used by both the staggered divergence and the
node->face gradient, phi_k = div_k / sum_d s_d^2 and B_k -= s_d phi_k
zeroes the discrete divergence identically.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.state import FieldState

__all__ = ["project_div_b"]


def project_div_b(fields: FieldState, geom) -> FieldState:
    """B -= grad(phi) with div(grad phi) = div(B) (periodic, staggered)."""
    ndim = geom.ndim
    B = [fields.Bx, fields.By, fields.Bz]
    axis_of = {1: {2: 0}, 2: {0: 0, 2: 1}, 3: {0: 0, 1: 1, 2: 2}}[ndim]

    shape = fields.Bx.shape
    ks = []
    for dd in range(ndim):
        k = 2.0 * np.pi * np.fft.fftfreq(shape[dd], geom.dx[dd])
        sym = (np.exp(1j * k * geom.dx[dd]) - 1.0) / geom.dx[dd]
        bshape = [1] * ndim
        bshape[dd] = shape[dd]
        ks.append(sym.reshape(bshape))

    div_k = 0.0
    b_k = {}
    for c_xyz, dd in axis_of.items():
        arr = jnp.fft.fftn(B[c_xyz])
        b_k[c_xyz] = arr
        div_k = div_k + jnp.asarray(ks[dd]) * arr
    lap = sum(k * k for k in ks)  # complex symbol of div(grad)
    lap = np.where(lap == 0.0, 1.0, lap)
    phi_k = div_k / jnp.asarray(lap)
    # zero-mode (and per-dim Nyquist-degenerate) divergence cannot be
    # projected; it is zero for any periodic physical field anyway
    out = {}
    names = {0: "Bx", 1: "By", 2: "Bz"}
    for c_xyz, dd in axis_of.items():
        cleaned = b_k[c_xyz] - jnp.asarray(ks[dd]) * phi_k
        out[names[c_xyz]] = jnp.real(jnp.fft.ifftn(cleaned))
    return fields.replace(**out)
