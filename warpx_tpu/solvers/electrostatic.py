"""Electrostatic field solvers: Poisson solve + E = -grad(phi).

Reimplements the reference's electrostatic branch (Source/FieldSolver/
ElectrostaticSolvers/): deposit rho, solve nabla^2 phi = -rho/eps0, derive the
staggered E (LabFrameExplicitES.H; ablastr/fields/PoissonSolver.H).  The
reference solves with MLMG geometric multigrid to self_fields_required_
precision (default 1e-11); here the SAME 2nd-order discrete Laplacian is
solved DIRECTLY by fast transforms — FFT along periodic dimensions and DST-I
(odd sine transform, which diagonalizes the Dirichlet 7-point operator
exactly) along bounded (PEC) dimensions — so results agree with the reference
to its solver tolerance, and the transform maps well onto TPU FFTs.

The relativistic solver (RelativisticExplicitES.H) solves per species in the
average rest frame: the Laplacian is scaled by (1 - beta_d^2) along each axis
and B = beta x E / c is added; for at-rest species it reduces to the lab-frame
solve.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..constants import ep0 as _ep0

__all__ = ["PoissonSolver", "phi_to_e"]


def _dst1(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """DST-I along ``axis`` via FFT of the odd extension.

    Input length m (interior nodes); output length m:
      X_k = sum_j x_j sin(pi (j+1)(k+1)/(m+1))
    """
    m = arr.shape[axis]
    n = m + 1
    zshape = list(arr.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, arr.dtype)
    rev = jnp.flip(arr, axis)
    ext = jnp.concatenate([zero, arr, zero, -rev], axis=axis)  # length 2n
    F = jnp.fft.fft(ext, axis=axis)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(1, n)
    return (-0.5) * jnp.imag(F[tuple(sl)])


def _idst1(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inverse DST-I: DST-I is its own inverse up to 2/(m+1)."""
    m = arr.shape[axis]
    return _dst1(arr, axis) * (2.0 / (m + 1))


class PoissonSolver:
    """Direct Poisson solve on mixed periodic/Dirichlet boundaries.

    rho is NODAL; phi is nodal with phi=0 at the Dirichlet wall nodes.  phi's
    shape matches rho's (interior values solved; wall layers zero).
    """

    def __init__(self, geom, periodic: Sequence[bool], beta2: Sequence[float] | None = None):
        self.geom = geom
        self.periodic = tuple(periodic)
        ndim = geom.ndim
        scale = beta2 or (0.0,) * ndim
        # eigenvalues of the 1D second-difference operator per dim
        self._eigs = []
        for d in range(ndim):
            n = geom.n_cell[d]
            dx = geom.dx[d]
            if self.periodic[d]:
                k = np.arange(n)
                lam = (2.0 - 2.0 * np.cos(2.0 * np.pi * k / n)) / (dx * dx)
            else:
                # interior nodes 1..n-1 -> m = n-1 Dirichlet modes
                k = np.arange(1, n)
                lam = (2.0 - 2.0 * np.cos(np.pi * k / n)) / (dx * dx)
            lam = lam * (1.0 - scale[d])
            shape = [1] * ndim
            shape[d] = lam.shape[0]
            self._eigs.append(lam.reshape(shape))

    def solve(self, rho: jnp.ndarray) -> jnp.ndarray:
        """phi from nodal rho (shape: n per periodic dim, n+1 per bounded)."""
        ndim = self.geom.ndim
        # extract interior along bounded dims
        x = rho
        for d in range(ndim):
            if not self.periodic[d]:
                sl = [slice(None)] * ndim
                sl[d] = slice(1, self.geom.n_cell[d])
                x = x[tuple(sl)]
        # forward transforms
        for d in range(ndim):
            if self.periodic[d]:
                x = jnp.fft.fft(x, axis=d)
            else:
                x = _dst1(x, d)
        denom = sum(self._eigs)
        denom = jnp.asarray(np.where(denom == 0.0, 1.0, denom))
        zero_mask = jnp.asarray(sum(self._eigs) == 0.0)
        x = jnp.where(zero_mask, 0.0, (x / _ep0) / denom)
        # inverse transforms
        for d in range(ndim):
            if self.periodic[d]:
                x = jnp.fft.ifft(x, axis=d)
            else:
                x = _idst1(x, d)
        x = jnp.real(x)
        # pad zeros back at Dirichlet walls
        for d in range(ndim):
            if not self.periodic[d]:
                pad = [(0, 0)] * ndim
                pad[d] = (1, 1)
                x = jnp.pad(x, pad)
        return x


def phi_to_e(phi: jnp.ndarray, geom, periodic: Sequence[bool]):
    """Staggered E = -grad(phi) (ablastr computeE: Ex_i+1/2 = -(phi_i+1 -
    phi_i)/dx; other dims stay nodal-aligned).

    Returns active-axis E components with the bounded-domain shapes
    (staggered: n along the grad dim; nodal dims sized like phi).
    """
    ndim = geom.ndim
    out = []
    for d in range(ndim):
        if periodic[d]:
            e = -(jnp.roll(phi, -1, axis=d) - phi) / geom.dx[d]
        else:
            sl_hi = [slice(None)] * ndim
            sl_lo = [slice(None)] * ndim
            sl_hi[d] = slice(1, None)
            sl_lo[d] = slice(0, -1)
            e = -(phi[tuple(sl_hi)] - phi[tuple(sl_lo)]) / geom.dx[d]
        out.append(e)
    return out
