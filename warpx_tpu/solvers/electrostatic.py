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

__all__ = [
    "PoissonSolver", "phi_to_e", "igf_greens_hat", "solve_open_igf",
    "phi_to_e_beta", "phi_to_b",
]


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

    def __init__(self, geom, periodic: Sequence[bool],
                 beta2: Sequence[float] | None = None,
                 stencil: str = "cross"):
        """stencil = 'cross' diagonalizes the reference's actual operator:
        ablastr PoissonSolver.H:371 uses amrex::MLNodeTensorLaplacian (no
        EB/RZ), whose constant-sigma diagonal part is the plain 7-point
        second-difference star — verified to 1e-13 particle parity on
        test_3d_electrostatic_sphere.  'fem' is the Q1 finite-element nodal
        Laplacian (MLNodeLaplacian, sum_d K_d prod M_d' with 1D stiffness
        [-1,2,-1]/h^2 and mass [1/6,2/3,1/6] factors), kept for reference.
        In 1D both coincide.
        """
        self.geom = geom
        self.periodic = tuple(periodic)
        self.stencil = stencil
        ndim = geom.ndim
        scale = beta2 or (0.0,) * ndim
        self._scale = tuple(scale)
        # per-dim 1D stiffness eigenvalues and mass factors on the shared
        # Fourier (periodic) / sine (Dirichlet) eigenbasis
        stiff, mass = [], []
        for d in range(ndim):
            n = geom.n_cell[d]
            dx = geom.dx[d]
            if self.periodic[d]:
                theta = 2.0 * np.pi * np.arange(n) / n
            else:
                # interior nodes 1..n-1 -> m = n-1 Dirichlet modes
                theta = np.pi * np.arange(1, n) / n
            lam = (2.0 - 2.0 * np.cos(theta)) / (dx * dx)
            lam = lam * (1.0 - scale[d])
            mu = (2.0 + np.cos(theta)) / 3.0
            shape = [1] * ndim
            shape[d] = lam.shape[0]
            stiff.append(lam.reshape(shape))
            mass.append(mu.reshape(shape))
        if stencil == "fem" and ndim > 1:
            import functools as _ft
            import operator as _op

            self._eigs = [
                _ft.reduce(
                    _op.mul,
                    [mass[d2] for d2 in range(ndim) if d2 != d],
                    stiff[d],
                )
                for d in range(ndim)
            ]
        else:
            self._eigs = stiff

    def _conv3(self, arr, d, w):
        """3-point stencil (w_m, w_0, w_p) along dim d; zero fill at
        non-periodic edges (only interior outputs are consumed)."""
        if self.periodic[d]:
            am = jnp.roll(arr, 1, axis=d)
            ap = jnp.roll(arr, -1, axis=d)
        else:
            zshape = list(arr.shape)
            zshape[d] = 1
            z = jnp.zeros(zshape, arr.dtype)
            sl_m = [slice(None)] * arr.ndim
            sl_m[d] = slice(0, -1)
            sl_p = [slice(None)] * arr.ndim
            sl_p[d] = slice(1, None)
            am = jnp.concatenate([z, arr[tuple(sl_m)]], axis=d)
            ap = jnp.concatenate([arr[tuple(sl_p)], z], axis=d)
        return w[0] * am + w[1] * arr + w[2] * ap

    def apply_op(self, phi: jnp.ndarray) -> jnp.ndarray:
        """Apply the discrete operator L (= -nabla.(sigma nabla), the one
        solve() inverts) to a full-shape nodal array.  Valid at interior
        nodes (edge outputs use zero extension)."""
        ndim = self.geom.ndim
        out = None
        for d in range(ndim):
            dx2 = self.geom.dx[d] ** 2
            s = (1.0 - self._scale[d]) / dx2
            term = self._conv3(phi, d, (-s, 2.0 * s, -s))
            if self.stencil == "fem" and ndim > 1:
                for d2 in range(ndim):
                    if d2 != d:
                        term = self._conv3(
                            term, d2, (1.0 / 6.0, 2.0 / 3.0, 1.0 / 6.0)
                        )
            out = term if out is None else out + term
        return out

    def solve(self, rho: jnp.ndarray,
              phi_b: jnp.ndarray | None = None) -> jnp.ndarray:
        """phi from nodal rho (shape: n per periodic dim, n+1 per bounded).

        phi_b: optional full-shape array of inhomogeneous Dirichlet values
        (nonzero only at wall layers); its operator image is moved to the
        RHS and its wall values appear in the returned phi.
        """
        ndim = self.geom.ndim
        # extract interior along bounded dims
        x = rho
        if phi_b is not None:
            x = x - _ep0 * self.apply_op(phi_b)
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
        if phi_b is not None:
            x = x + phi_b
        return x


def _integrated_potential(x, y, z):
    """Closed-form integral of 1/|r| over a cell corner (reference:
    IntegratedGreenFunctionSolver.H:37-50)."""
    r = np.sqrt(x * x + y * y + z * z)
    return (
        -0.5 * z * z * np.arctan(x * y / (z * r))
        - 0.5 * y * y * np.arctan(x * z / (y * r))
        - 0.5 * x * x * np.arctan(y * z / (x * r))
        + y * z * np.arcsinh(x / np.sqrt(y * y + z * z))
        + x * z * np.arcsinh(y / np.sqrt(x * x + z * z))
        + x * y * np.arcsinh(z / np.sqrt(x * x + y * y))
    )


def igf_greens_hat(n_nodes, cell, dtype=np.float64):
    """rfftn of the integrated Green function on the 2x zero-padding grid
    (reference: IntegratedGreenFunctionSolver.cpp:140-190 — mirror-symmetric
    fill; host-side, baked as a compile-time constant).

    n_nodes: nodal extents (nx, ny, nz); cell: (dx, dy, dz), possibly
    gamma-stretched for a relativistic solve (PoissonSolver.H:263-265).
    """
    dists = []
    for n, d in zip(n_nodes, cell):
        i = np.arange(2 * n)
        dists.append(np.minimum(i, 2 * n - i).astype(np.float64) * d)
    X = dists[0][:, None, None]
    Y = dists[1][None, :, None]
    Z = dists[2][None, None, :]
    dx, dy, dz = cell
    G = np.zeros((2 * n_nodes[0], 2 * n_nodes[1], 2 * n_nodes[2]))
    for sx in (+1, -1):
        for sy in (+1, -1):
            for sz in (+1, -1):
                G += (sx * sy * sz) * _integrated_potential(
                    X + sx * 0.5 * dx, Y + sy * 0.5 * dy, Z + sz * 0.5 * dz
                )
    G *= 1.0 / (4.0 * np.pi * _ep0)
    return np.fft.rfftn(G.astype(dtype))


def solve_open_igf(rho: jnp.ndarray, g_hat) -> jnp.ndarray:
    """Open-boundary (free-space) Poisson solve via Hockney-Eastwood
    zero-padded FFT convolution with the integrated Green function."""
    nx, ny, nz = rho.shape
    full = (2 * nx, 2 * ny, 2 * nz)
    pad = jnp.zeros(full, rho.dtype).at[:nx, :ny, :nz].set(rho)
    phi = jnp.fft.irfftn(jnp.fft.rfftn(pad) * jnp.asarray(g_hat), s=full)
    return phi[:nx, :ny, :nz].astype(rho.dtype)


def _stag_diff(phi, d, dx, periodic):
    """Staggered first difference of nodal phi along dim d (n+1 -> n for
    bounded dims; roll for periodic)."""
    if periodic:
        return (jnp.roll(phi, -1, axis=d) - phi) / dx
    hi = [slice(None)] * phi.ndim
    lo = [slice(None)] * phi.ndim
    hi[d] = slice(1, None)
    lo[d] = slice(0, -1)
    return (phi[tuple(hi)] - phi[tuple(lo)]) / dx


def _avg(arr, d, periodic):
    """Average adjacent values along d (node -> center)."""
    if periodic:
        return 0.5 * (arr + jnp.roll(arr, -1, axis=d))
    hi = [slice(None)] * arr.ndim
    lo = [slice(None)] * arr.ndim
    hi[d] = slice(1, None)
    lo[d] = slice(0, -1)
    return 0.5 * (arr[tuple(hi)] + arr[tuple(lo)])


def phi_to_e_beta(phi, geom, periodic, beta):
    """E = -(1 - beta beta^T) grad(phi) at the staggered E sites
    (reference: ElectrostaticSolver.cpp computeE:255-330)."""
    ndim = geom.ndim
    out = []
    for d in range(ndim):
        e = -(1.0 - beta[d] * beta[d]) * _stag_diff(
            phi, d, geom.dx[d], periodic[d]
        )
        for dp in range(ndim):
            if dp == d or beta[d] * beta[dp] == 0.0:
                continue
            g = _stag_diff(phi, dp, geom.dx[dp], periodic[dp])
            g = _avg(g, d, periodic[d])
            # re-center along dp: pad back to nodal extent by edge repeat
            if not periodic[dp]:
                pad = [(0, 0)] * ndim
                pad[dp] = (1, 0)
                g = jnp.pad(g, pad, mode="edge")
            else:
                g = 0.5 * (g + jnp.roll(g, 1, axis=dp))
            out_d_shape_fix = g
            e = e - beta[d] * beta[dp] * out_d_shape_fix
        out.append(e)
    return out


def phi_to_b(phi, geom, periodic, beta):
    """B = -(beta x grad(phi))/c at the staggered B sites
    (reference: ElectrostaticSolver.cpp computeB:384-460).

    Returns {comp_xyz_index: array or None}; only built for the active
    dims — transverse gradients of inactive dims are zero.
    """
    from ..constants import c as _c

    ndim = geom.ndim
    # active-axis index per xyz axis (None if inactive)
    axis_of = {1: {2: 0}, 2: {0: 0, 2: 1}, 3: {0: 0, 1: 1, 2: 2}}[ndim]

    def grad_at(b_axis_xyz, g_axis_xyz):
        """d(phi)/d(g_axis) averaged to the B_{b_axis} staggered site."""
        if g_axis_xyz not in axis_of:
            return None
        d = axis_of[g_axis_xyz]
        g = _stag_diff(phi, d, geom.dx[d], periodic[d])
        for other_xyz, od in axis_of.items():
            if other_xyz in (b_axis_xyz, g_axis_xyz):
                continue
            g = _avg(g, od, periodic[od])
        return g

    out = {}
    eps = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    for (i, j, k) in eps:
        t1 = grad_at(i, k)  # beta_j * dphi/dk
        t2 = grad_at(i, j)  # beta_k * dphi/dj
        # B_i = (1/c) * (-beta_j dphi/dk + beta_k dphi/dj)
        b = None
        if beta[j] != 0.0 and t1 is not None:
            b = -beta[j] * t1
        if beta[k] != 0.0 and t2 is not None:
            b = (0.0 if b is None else b) + beta[k] * t2
        out[i] = None if b is None else b / _c
    return out


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


def vector_potential_b(A3, geom, periodic):
    """B = curl(A) from NODAL vector-potential components onto the staggered
    B sites (reference: MagnetostaticSolver.cpp computeVectorPotential ->
    curl of the nodal A).  A3: three nodal arrays indexed by xyz."""
    ndim = geom.ndim
    axis_of = {1: {2: 0}, 2: {0: 0, 2: 1}, 3: {0: 0, 1: 1, 2: 2}}[ndim]

    def d_term(b_axis, a_axis, g_axis):
        """d(A_{a_axis})/d(g_axis) averaged to the B_{b_axis} site."""
        if g_axis not in axis_of:
            return None
        d = axis_of[g_axis]
        g = _stag_diff(A3[a_axis], d, geom.dx[d], periodic[d])
        for other_xyz, od in axis_of.items():
            if other_xyz in (b_axis, g_axis):
                continue
            g = _avg(g, od, periodic[od])
        return g

    out = {}
    for (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        t1 = d_term(i, k, j)   # dA_k/dx_j
        t2 = d_term(i, j, k)   # dA_j/dx_k
        b = None
        if t1 is not None:
            b = t1
        if t2 is not None:
            b = (-t2) if b is None else (b - t2)
        out[i] = b
    return out


def _centered_grad(phi, d, dx, periodic):
    """Centered gradient of nodal phi along d, SAME shape as phi (one-sided
    at non-periodic walls) — for collocated grids."""
    if periodic:
        return (jnp.roll(phi, -1, axis=d) - jnp.roll(phi, 1, axis=d)) / (
            2.0 * dx
        )
    n = phi.shape[d]

    def sl(a, b):
        idx = [slice(None)] * phi.ndim
        idx[d] = slice(a, b)
        return tuple(idx)

    interior = (phi[sl(2, n)] - phi[sl(0, n - 2)]) / (2.0 * dx)
    lo = (phi[sl(1, 2)] - phi[sl(0, 1)]) / dx
    hi = (phi[sl(n - 1, n)] - phi[sl(n - 2, n - 1)]) / dx
    return jnp.concatenate([lo, interior, hi], axis=d)


def phi_to_e_nodal(phi, geom, periodic, beta):
    """Collocated-grid E = -(1 - bb^T) grad(phi), all components nodal."""
    ndim = geom.ndim
    grads = [
        _centered_grad(phi, d, geom.dx[d], periodic[d]) for d in range(ndim)
    ]
    out = []
    for d in range(ndim):
        e = -(1.0 - beta[d] * beta[d]) * grads[d]
        for dp in range(ndim):
            if dp == d or beta[d] * beta[dp] == 0.0:
                continue
            e = e - beta[d] * beta[dp] * grads[dp]
        out.append(e)
    return out


def phi_to_b_nodal(phi, geom, periodic, beta):
    """Collocated-grid B = -(beta x grad phi)/c, all components nodal."""
    from ..constants import c as _c

    ndim = geom.ndim
    axis_of = {1: {2: 0}, 2: {0: 0, 2: 1}, 3: {0: 0, 1: 1, 2: 2}}[ndim]
    grads = {
        a: _centered_grad(phi, d, geom.dx[d], periodic[d])
        for a, d in axis_of.items()
    }
    out = {}
    for (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        t1 = grads.get(k)
        t2 = grads.get(j)
        b = None
        if beta[j] != 0.0 and t1 is not None:
            b = -beta[j] * t1
        if beta[k] != 0.0 and t2 is not None:
            b = (0.0 if b is None else b) + beta[k] * t2
        out[i] = None if b is None else b / _c
    return out
