"""Two-level electromagnetic mesh refinement (static fine patch).

Reimplements the reference's MR-PIC scheme (Vay's substitution method) the
way WarpX composes it, re-expressed as pure array ops on static shapes:

- One static fine patch (``warpx.fine_tag_lo/hi``) refined by ``amr.ref_ratio``.
  dt is set by the FINEST level's CFL (reference: WarpXComputeDt.cpp:57
  ``geom[max_level].CellSize()``; same dt on all levels without subcycling).
- Particles are injected at level 0 only and keep their level-0 sampling
  (reference: PhysicalParticleContainer::InitData "AddParticles(0)").
  Ownership is geometric: a particle inside the patch gathers from / deposits
  to the fine level unless it sits within the gather/deposition buffers of
  the coarse-fine interface (reference: WarpX::BuildBufferMasks,
  WarpX.cpp:3056 — buffer widths in FINE cells).
- The fine patch carries TWO solutions, both ringed by split-field PML
  (reference: WarpX::InitPML "if (max_level > 0) do_pml = 1",
  WarpXInitData.cpp:724): the fine-resolution solve (``fp``) driven by the
  fine-deposited current, and a coarse-resolution patch solve (``cp``)
  driven by the averaged-down current.
- Currents: J_cp = staggering-aware average-down of J_fp (reference:
  ablastr::coarsen::average via WarpX::SyncCurrent, WarpXComm.cpp:1213);
  the unfiltered J_cp is added into the coarse level's J before the
  per-level filters (WarpXComm.cpp:1180-1199).
- Gather fields: aux(1) = fp + I(aux(0) - cp) with the 2-point
  staggering-aware interpolation (reference:
  WarpX::UpdateAuxilaryDataSameType, WarpXComm.cpp:388; warpx_interp,
  WarpXComm_K.H:28-85).  Buffer particles gather aux(0) directly
  (Efield_cax parallel-copy of the coarse aux).
- Diagnostics at lev=1 read the aux fields over the valid patch box
  (FullDiagnostics.cpp:414 CellCenterFunctor on Efield_aux[lev]).

The PML on the patch rings is the split-field (Berenger) form with
exponentially-integrated damping, sigma(x) = sigma_max (depth/npml)^2 —
functionally equivalent to the reference's SigmaBox damping; the patch
arrays are periodic tori whose ring damping (~exp(-16)) makes the wrap
leakage negligible.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import c as _c
from ..constants import mu0 as _mu0
from .grid import Geometry

_c2 = _c * _c

__all__ = ["MRLayout", "make_mr_step", "mr_init_aux", "mr_output_fields"]


# curl structure: comp -> ((source comp, derivative axis (3D xyz), sign), ...)
# dB/dt = -curl E (upward differences); dE/dt = c^2 curl B - J/ep0 (downward)
_B_TERMS_3D = {
    "Bx": (("Ey", 2, +1.0), ("Ez", 1, -1.0)),
    "By": (("Ez", 0, +1.0), ("Ex", 2, -1.0)),
    "Bz": (("Ex", 1, +1.0), ("Ey", 0, -1.0)),
}
_E_TERMS_3D = {
    "Ex": (("Bz", 1, +1.0), ("By", 2, -1.0)),
    "Ey": (("Bx", 2, +1.0), ("Bz", 0, -1.0)),
    "Ez": (("By", 0, +1.0), ("Bx", 1, -1.0)),
}


def _active_terms(terms3d, ndim):
    """Project the 3D curl terms onto the active axes (2D: x,z; drop d/dy)."""
    # map 3D axis -> array axis; None = derivative vanishes
    if ndim == 3:
        amap = {0: 0, 1: 1, 2: 2}
    elif ndim == 2:
        amap = {0: 0, 1: None, 2: 1}
    else:
        amap = {0: None, 1: None, 2: 0}
    out = {}
    for comp, terms in terms3d.items():
        kept = []
        for src, ax3, sign in terms:
            ax = amap[ax3]
            if ax is not None:
                kept.append((src, ax, sign))
        out[comp] = tuple(kept)
    return out


class MRLayout:
    """Static index geometry of the fine patch (host-side, hashable-free:
    closed over in jit)."""

    def __init__(self, cfg, staggering):
        geom = cfg.geometry
        ndim = geom.ndim
        rv = cfg.ref_ratio or (2,) * ndim
        if isinstance(rv, int):
            rv = (rv,) * ndim
        rv = tuple(int(r) for r in rv)
        if any(r != 1 and r % 2 != 0 for r in rv):
            # odd ratios > 1 break the nodal average-down (r/2 taps);
            # r == 1 (no refinement along the axis) is the identity
            raise NotImplementedError("amr.ref_ratio must be even (or 1)")
        self.ndim = ndim
        self.rv = rv
        dxc = geom.dx
        lo = cfg.fine_tag_lo
        hi = cfg.fine_tag_hi
        if len(lo) != ndim or len(hi) != ndim:
            raise NotImplementedError(
                "amr.max_level > 0 requires warpx.fine_tag_lo/hi"
            )
        self.i0 = tuple(
            int(round((lo[d] - geom.prob_lo[d]) / dxc[d])) for d in range(ndim)
        )
        self.i1 = tuple(
            int(round((hi[d] - geom.prob_lo[d]) / dxc[d])) for d in range(ndim)
        )
        # AMReX blocking: the actual refined BoxArray snaps the tag box out
        # to amr.blocking_factor multiples in FINE cells (this is the box
        # refined injection and level-1 diagnostics see; a no-op when the
        # tag box is already aligned).  Snapped edges clamp to the domain
        # and stay coarse-aligned (bf is a power of two >= ref_ratio).
        bf = int(getattr(cfg, "blocking_factor", 8) or 8)
        i0b, i1b = [], []
        for d in range(ndim):
            r = rv[d]
            step = max(bf // r, 1)  # blocking in coarse units
            lo_c = (self.i0[d] // step) * step
            hi_c = -((-self.i1[d]) // step) * step
            i0b.append(max(0, lo_c))
            i1b.append(min(geom.n_cell[d], hi_c))
        self.i0 = tuple(i0b)
        self.i1 = tuple(i1b)
        self.nc = tuple(self.i1[d] - self.i0[d] for d in range(ndim))
        if any(n <= 0 for n in self.nc):
            raise ValueError("empty fine_tag box")
        # a patch covering the whole periodic domain gets no PML and no
        # buffers (reference InitPML: patch edges on the domain boundary
        # inherit the level-0 (periodic) treatment; BuildBufferMasks sees
        # no coarse-fine interface) — e.g. inputs_test_2d_nci_corrector_mr
        self.full_domain = all(
            self.i0[d] == 0 and self.i1[d] == geom.n_cell[d]
            for d in range(ndim)
        )
        # per-axis interiority: an axis the (blocked) patch SPANS entirely
        # carries no coarse-fine interface there — the patch edge follows
        # the domain boundary treatment (its PML ring doubles as the
        # domain's absorbing wall); partially-touching boxes stay gated
        self.spanning = tuple(
            self.i0[d] == 0 and self.i1[d] == geom.n_cell[d]
            for d in range(ndim)
        )
        if not self.full_domain and any(
            (self.i0[d] < 1 or self.i1[d] > geom.n_cell[d] - 1)
            and not self.spanning[d]
            for d in range(ndim)
        ):
            raise NotImplementedError(
                "fine patch partially touching a level-0 boundary"
            )
        self.nf = tuple(n * r for n, r in zip(self.nc, rv))
        self.npml_f = 0 if self.full_domain else int(cfg.pml_ncell)
        self.npml_c = 0 if self.full_domain else int(cfg.pml_ncell)
        self.patch_lo = tuple(
            geom.prob_lo[d] + self.i0[d] * dxc[d] for d in range(ndim)
        )
        self.patch_hi = tuple(
            geom.prob_lo[d] + self.i1[d] * dxc[d] for d in range(ndim)
        )
        dxf = tuple(d / r for d, r in zip(dxc, rv))
        self.dxf = dxf
        self.n_fext = tuple(n + 2 * self.npml_f for n in self.nf)
        self.n_cext = tuple(n + 2 * self.npml_c for n in self.nc)
        self.geom_f_ext = Geometry(
            ndim=ndim,
            n_cell=self.n_fext,
            prob_lo=tuple(
                self.patch_lo[d] - self.npml_f * dxf[d] for d in range(ndim)
            ),
            prob_hi=tuple(
                self.patch_hi[d] + self.npml_f * dxf[d] for d in range(ndim)
            ),
            periodic=(True,) * ndim,
        )
        self.geom_c_ext = Geometry(
            ndim=ndim,
            n_cell=self.n_cext,
            prob_lo=tuple(
                self.patch_lo[d] - self.npml_c * dxc[d] for d in range(ndim)
            ),
            prob_hi=tuple(
                self.patch_hi[d] + self.npml_c * dxc[d] for d in range(ndim)
            ),
            periodic=(True,) * ndim,
        )
        # global index offsets of the ext grids
        self.f_off = tuple(
            self.i0[d] * rv[d] - self.npml_f for d in range(ndim)
        )
        self.c_off = tuple(self.i0[d] - self.npml_c for d in range(ndim))
        self.n0 = geom.n_cell
        self.gather_buf = int(cfg.n_field_gather_buffer)
        self.dep_buf = int(cfg.n_current_deposition_buffer)
        self._b_terms = _active_terms(_B_TERMS_3D, ndim)
        self._e_terms = _active_terms(_E_TERMS_3D, ndim)

    # -------------------------------------------------- particle level masks
    def fine_mask(self, positions, nbuf):
        """True where the particle's FINE cell is >= nbuf fine cells from
        every patch edge (BuildBufferMasksInBox: all cells within nbuf must
        be interior)."""
        if self.full_domain:
            return jnp.ones(positions[0].shape, bool)
        ok = None
        for d in range(self.ndim):
            if self.spanning[d]:
                continue  # no coarse-fine interface along this axis
            idx = jnp.floor(
                (positions[d] - self.patch_lo[d]) / self.dxf[d]
            ).astype(jnp.int32)
            in_d = (idx >= nbuf) & (idx <= self.nf[d] - 1 - nbuf)
            ok = in_d if ok is None else (ok & in_d)
        if ok is None:
            ok = jnp.ones(positions[0].shape, bool)
        return ok

    # -------------------------------------------------- sigma (PML) profiles
    def _sigma_1d(self, axis, nodal, fine):
        """1/time damping profile along ``axis`` on the ext grid."""
        npml = self.npml_f if fine else self.npml_c
        n_int = self.nf[axis] if fine else self.nc[axis]
        dx = self.dxf[axis] if fine else (self.dxf[axis] * self.rv[axis])
        n_ext = n_int + 2 * npml
        if npml == 0:
            return np.zeros(n_ext)
        pos = np.arange(n_ext, dtype=np.float64) + (0.0 if nodal else 0.5)
        depth = np.maximum(npml - pos, pos - (npml + n_int))
        depth = np.clip(depth, 0.0, npml)
        # sigma_max from the standard R0 reflection target (m=2, R0=1e-8)
        sigma_max = 3.0 * (-math.log(1e-8)) * _c / (2.0 * npml * dx)
        return sigma_max * (depth / npml) ** 2

    def damping_tables(self, staggering, tau_b, tau_e, fine, dtype):
        """Per (component, split part): (decay, source_coef) arrays shaped to
        broadcast along the part's damping axis.  decay = exp(-sigma tau),
        coef = (1-decay)/sigma (-> tau as sigma -> 0); B parts use tau_b,
        E parts tau_e."""
        out = {}
        for comp, terms, tau in (
            [(c, t, tau_b) for c, t in self._b_terms.items()]
            + [(c, t, tau_e) for c, t in self._e_terms.items()]
        ):
            flags = staggering[comp]
            for i, (_src, ax, _sign) in enumerate(terms):
                sig = self._sigma_1d(ax, flags[ax] == 1, fine)
                decay = np.exp(-sig * tau)
                coef = np.where(sig > 0, -np.expm1(-sig * tau)
                                / np.where(sig > 0, sig, 1.0), tau)
                shape = [1] * self.ndim
                shape[ax] = -1
                out[f"{comp}:{i}"] = (
                    jnp.asarray(decay.reshape(shape), dtype),
                    jnp.asarray(coef.reshape(shape), dtype),
                )
        return out

    # ------------------------------------------------------- index tables
    def coarsen_tables(self, flags, fine_shape):
        """Per-axis (idx, weights, valid) for staggering-aware average-down
        (ablastr::coarsen::average): cc axis averages r fine cells; nodal
        axis uses (1/2, 1, ..., 1, 1/2)/r over r+1 fine nodes."""
        tabs = []
        for d in range(self.ndim):
            r = self.rv[d]
            n_out = self.n_cext[d]
            cg = np.arange(n_out) + self.c_off[d]  # global coarse index
            if flags[d] == 1:
                if r == 1:
                    taps = np.array([0])
                    w = np.array([1.0])
                else:
                    taps = np.arange(-r // 2, r // 2 + 1)
                    w = np.full(len(taps), 1.0 / r)
                    w[0] = w[-1] = 0.5 / r
                fidx = cg[:, None] * r + taps[None, :] - self.f_off[d]
            else:
                taps = np.arange(r)
                w = np.full(r, 1.0 / r)
                fidx = cg[:, None] * r + taps[None, :] - self.f_off[d]
            if self.full_domain:
                tabs.append((fidx % fine_shape[d], w, None))
            else:
                valid = (fidx >= 0) & (fidx < fine_shape[d])
                tabs.append(
                    (np.clip(fidx, 0, fine_shape[d] - 1), w, valid)
                )
        return tabs

    def interp_tables(self, flags):
        """Per-axis (idx(2), weights(2)) for the 2-point coarse->fine interp
        (warpx_interp, WarpXComm_K.H:28): output on the fine ext grid,
        source on the coarse ext grid, zero-padded out of range."""
        tabs = []
        for d in range(self.ndim):
            r = self.rv[d]
            jf = np.arange(self.n_fext[d])
            jg = jf + self.f_off[d]  # global fine index
            h = 0.0 if flags[d] == 1 else 0.5
            if flags[d] == 1:
                jc = np.floor_divide(jg, r)
            else:
                jc = np.floor_divide(jg - r // 2, r)
            idx = np.stack([jc, jc + 1], axis=1)  # global coarse
            w = np.empty_like(idx, dtype=np.float64)
            for t in range(2):
                w[:, t] = (
                    r - np.abs(jg + h - (idx[:, t] + h) * r)
                ) / r
            w = np.clip(w, 0.0, None)
            cidx = idx - self.c_off[d]
            if self.full_domain:
                cidx = cidx % self.n_cext[d]
            else:
                valid = (cidx >= 0) & (cidx < self.n_cext[d])
                w = w * valid
                cidx = np.clip(cidx, 0, self.n_cext[d] - 1)
            tabs.append((cidx, w))
        return tabs

    def window_indices(self):
        """Level-0 (periodic) indices covering the coarse ext grid."""
        return [
            (np.arange(self.n_cext[d]) + self.c_off[d]) % self.n0[d]
            for d in range(self.ndim)
        ]

    def patch_slices(self, flags, grid):
        """(dst level-0 slices, src ext slices) over the valid patch box.
        grid: 'c' (coarse ext) or 'f' (fine ext crop)."""
        dst, src = [], []
        npml = self.npml_c if grid == "c" else self.npml_f
        nvals = self.nc if grid == "c" else self.nf
        for d in range(self.ndim):
            extra = (
                1 if (flags[d] == 1 and not self.full_domain) else 0
            )
            dst.append(slice(self.i0[d], self.i1[d] + extra))
            src.append(slice(npml, npml + nvals[d] + extra))
        return tuple(dst), tuple(src)


def _axis_apply(arr, axis, idx, w, valid=None):
    """out[..., j, ...] = sum_t w[j,t] arr[..., idx[j,t], ...] along axis."""
    taken = jnp.take(arr, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = (
        arr.shape[:axis] + idx.shape + arr.shape[axis + 1:]
    )
    taken = taken.reshape(new_shape)
    wgt = w if valid is None else (w * valid)
    wshape = [1] * taken.ndim
    wshape[axis] = idx.shape[0]
    wshape[axis + 1] = idx.shape[1]
    wgt = jnp.asarray(wgt).reshape(wshape).astype(arr.dtype)
    return jnp.sum(taken * wgt, axis=axis + 1)


def _take_window(arr, win_idx):
    for d, idx in enumerate(win_idx):
        arr = jnp.take(arr, jnp.asarray(idx), axis=d)
    return arr


def make_patch_advance(layout: MRLayout, staggering, algo, tau_b, tau_e,
                       fine, dtype):
    """Composable B/E sub-steps on a patch ext grid with split-field PML
    (exponential damping; reference PML.cpp SigmaBox semantics).

    Returns (b_step, e_step): b_step advances every B split part by tau_b
    from the current E; e_step advances E parts by tau_e with the current J.
    The standard FDTD step is b_step; e_step; b_step with tau_b = dt/2,
    tau_e = dt; the subcycled coarse patch composes them as [B,E] / [E,B]
    with tau_b = tau_e = dt_fine (OneStep_sub1, WarpXEvolve.cpp:928,:1000).
    """
    geom = layout.geom_f_ext if fine else layout.geom_c_ext
    ndim = layout.ndim
    inv_d = [1.0 / dx for dx in geom.dx]
    damp = layout.damping_tables(staggering, tau_b, tau_e, fine, dtype)
    b_terms = layout._b_terms
    e_terms = layout._e_terms

    if algo == "ckc":
        from ..solvers.yee import _ckc_coefs, _up_ckc

        coefs = _ckc_coefs(geom)
        names = {3: "xyz", 2: "xz", 1: "z"}[ndim]

        def dup(F, ax):
            return _up_ckc(F, ax, coefs, geom, names[ax])
    else:
        def dup(F, ax):
            return (jnp.roll(F, -1, ax) - F) * inv_d[ax]

    def ddown(F, ax):
        return (F - jnp.roll(F, 1, ax)) * inv_d[ax]

    def total(parts, comp, terms):
        tot = parts[f"{comp}:0"]
        for i in range(1, len(terms[comp])):
            tot = tot + parts[f"{comp}:{i}"]
        return tot

    def b_step(parts):
        parts = dict(parts)
        E = {c: total(parts, c, e_terms) for c in ("Ex", "Ey", "Ez")}
        for comp, terms in b_terms.items():
            for i, (src, ax, sign) in enumerate(terms):
                key = f"{comp}:{i}"
                decay, coef = damp[key]
                rhs = sign * dup(E[src], ax)
                parts[key] = decay * parts[key] + coef * rhs
        return parts

    def e_step(parts, j3):
        parts = dict(parts)
        B = {c: total(parts, c, b_terms) for c in ("Bx", "By", "Bz")}
        jmap = {"Ex": j3[0], "Ey": j3[1], "Ez": j3[2]}
        for comp, terms in e_terms.items():
            for i, (src, ax, sign) in enumerate(terms):
                key = f"{comp}:{i}"
                decay, coef = damp[key]
                rhs = _c2 * sign * ddown(B[src], ax)
                if i == 0:
                    rhs = rhs - _c2 * _mu0 * jmap[comp]
                parts[key] = decay * parts[key] + coef * rhs
        return parts

    return b_step, e_step


def _part_keys(layout):
    keys = []
    for comp, terms in list(layout._b_terms.items()) + list(
        layout._e_terms.items()
    ):
        for i in range(len(terms)):
            keys.append(f"{comp}:{i}")
    return keys


def mr_init_aux(cfg, layout: MRLayout, dtype) -> Dict:
    aux = {}
    for key in _part_keys(layout):
        aux[f"mr:f:{key}"] = jnp.zeros(layout.n_fext, dtype)
        aux[f"mr:c:{key}"] = jnp.zeros(layout.n_cext, dtype)
    for jn in ("jx", "jy", "jz"):
        aux[f"mr:j:{jn}"] = jnp.zeros(layout.n_fext, dtype)
    return aux


def _patch_totals(aux, layout, prefix):
    """comp -> total field on the given patch grid ('f' or 'c')."""
    terms = dict(layout._b_terms)
    terms.update(layout._e_terms)
    out = {}
    for comp, tl in terms.items():
        tot = aux[f"mr:{prefix}:{comp}:0"]
        for i in range(1, len(tl)):
            tot = tot + aux[f"mr:{prefix}:{comp}:{i}"]
        out[comp] = tot
    return out


def compute_aux1(farr0, aux, layout: MRLayout, staggering):
    """aux(1) = fp + I(aux(0) - cp) on the fine ext grid
    (UpdateAuxilaryDataSameType, WarpXComm.cpp:388)."""
    fp = _patch_totals(aux, layout, "f")
    cp = _patch_totals(aux, layout, "c")
    win = layout.window_indices()
    out = {}
    for comp in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        flags = staggering[comp]
        dF = _take_window(farr0[comp], win) - cp[comp]
        tabs = layout.interp_tables(flags)
        interp = dF
        for d, (idx, w) in enumerate(tabs):
            interp = _axis_apply(interp, d, idx, w)
        out[comp] = fp[comp] + interp
    return out


def coarsen_field(arr_f, flags, layout: MRLayout):
    """Staggering-aware average-down fine ext -> coarse ext."""
    tabs = layout.coarsen_tables(flags, arr_f.shape)
    out = arr_f
    for d, (idx, w, valid) in enumerate(tabs):
        out = _axis_apply(out, d, idx, np.broadcast_to(w, idx.shape), valid)
    return out


def make_mr_step(cfg, staggering):
    """The two-level PIC step (OneStep_nosub with MR sync/aux plumbing)."""
    from ..ops.deposit import deposit_current_esirkepov
    from ..ops.gather import gather_eb
    from ..ops.push import PUSHERS, position_step
    from .step import (
        _apply_nci, _field_dict, advance_fields, wrap_positions,
    )

    layout = MRLayout(cfg, staggering)
    geom = cfg.geometry
    dt = cfg.dt
    algo = cfg.em_solver
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    sub = bool(cfg.do_subcycling)
    if sub and (cfg.do_dive_cleaning or cfg.do_divb_cleaning):
        raise NotImplementedError("subcycling with divergence cleaning")
    mc_gather = cfg.field_gathering == "momentum-conserving"
    nodal_stag = {k: (1,) * geom.ndim for k in staggering}

    def _to_nodal(farr):
        """Average staggered fields to nodal on the periodic torus
        (UpdateAuxilaryDataStagToNodal, WarpXComm.cpp:94)."""
        out = {}
        for nm, a in farr.items():
            for d, flag in enumerate(staggering[nm]):
                if flag == 0:
                    a = 0.5 * (a + jnp.roll(a, 1, axis=d))
            out[nm] = a
        return out
    # fine-level timestep: dt/ref_ratio under subcycling (ComputeDt with
    # do_subcycling: dt[lev] = dt[lev+1] * refRatio), same dt otherwise
    dt_f = dt / layout.rv[0] if sub else dt
    bf, ef = make_patch_advance(
        layout, staggering, algo, 0.5 * dt_f, dt_f, True, dtype)
    bc, ec = make_patch_advance(
        layout, staggering, algo,
        dt_f if sub else 0.5 * dt, dt_f if sub else dt, False, dtype)

    def adv_f(parts, j3):
        return bf(ef(bf(parts), j3))

    def adv_c(parts, j3):
        return bc(ec(bc(parts), j3))

    def _apply_nci_fine(farr):
        """Godfrey corrector on the fine aux (UpdateAuxilaryData applies the
        NCI filter per level with the level's own c dt/dz)."""
        from ..solvers.filter import apply_z_stencil, nci_godfrey_stencil

        zax = geom.ndim - 1
        cdtodz = _c * dt_f / layout.dxf[zax]
        nodal = cfg.field_gathering == "momentum-conserving"
        s1 = nci_godfrey_stencil(cdtodz, "ExEyBz", nodal)
        s2 = nci_godfrey_stencil(cdtodz, "BxByEz", nodal)
        out = dict(farr)
        for nm in ("Ex", "Ey", "Bz"):
            out[nm] = apply_z_stencil(out[nm], s1, zax)
        for nm in ("Bx", "By", "Ez"):
            out[nm] = apply_z_stencil(out[nm], s2, zax)
        return out

    def gather_both(pos, farr0, aux1, mask_g):
        gstag = staggering
        if mc_gather:
            farr0 = _to_nodal(farr0)
            aux1 = _to_nodal(aux1)
            gstag = nodal_stag
        e6c = gather_eb(
            pos, farr0, gstag, geom, cfg.particle_shape, cfg.galerkin,
        )
        e6f = gather_eb(
            pos, aux1, gstag, layout.geom_f_ext, cfg.particle_shape,
            cfg.galerkin,
        )
        return tuple(
            jnp.where(mask_g, f, c) for f, c in zip(e6f, e6c)
        )

    def mr_step(state):
        farr0 = _field_dict(state.fields)
        aux1 = compute_aux1(farr0, state.aux, layout, staggering)
        if cfg.use_nci_corr:
            farr0 = _apply_nci(farr0, cfg)
            aux1 = _apply_nci_fine(aux1)

        jf = tuple(
            jnp.zeros(layout.n_fext, state.fields.Ex.dtype) for _ in range(3)
        )
        j0 = tuple(
            jnp.zeros(geom.n_cell, state.fields.Ex.dtype) for _ in range(3)
        )
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            pos = sp.positions(geom.ndim)
            mask_g = layout.fine_mask(pos, layout.gather_buf)
            mask_d = layout.fine_mask(pos, layout.dep_buf)
            if sp_cfg.do_not_gather:
                z = jnp.zeros_like(sp.ux)
                e6 = (z, z, z, z, z, z)
            else:
                e6 = gather_both(pos, farr0, aux1, mask_g)
            if sp_cfg.do_not_push:
                ux, uy, uz = sp.ux, sp.uy, sp.uz
                new_pos = pos
            else:
                pusher = PUSHERS[sp_cfg.pusher]
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, *e6,
                    sp_cfg.charge, sp_cfg.mass, dt,
                )
                new_pos = position_step(pos, ux, uy, uz, dt, geom.ndim)
            if not sp_cfg.do_not_deposit:
                w = jnp.where(sp.alive, sp.w, 0.0)
                w_f = jnp.where(mask_d, w, 0.0)
                w_c = jnp.where(mask_d, 0.0, w)
                jf_sp = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_f, sp_cfg.charge,
                    layout.geom_f_ext, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
                j0_sp = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_c, sp_cfg.charge,
                    geom, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
                jf = tuple(a + b for a, b in zip(jf, jf_sp))
                j0 = tuple(a + b for a, b in zip(j0, j0_sp))
            sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
            sp_new = sp_new.with_positions(geom.ndim, new_pos)
            new_species[sp_cfg.name] = wrap_positions(sp_new, geom)

        # SyncCurrent: J_cp = average-down(J_fp); the raw J_cp is added to
        # the coarse J; filters are applied per level afterwards
        jnames = ("jx", "jy", "jz")
        jcp = tuple(
            coarsen_field(a, staggering[nm], layout)
            for a, nm in zip(jf, jnames)
        )
        j0s = []
        for a, b, nm in zip(j0, jcp, jnames):
            dst, src = layout.patch_slices(staggering[nm], "c")
            j0s.append(a.at[dst].add(b[src]))
        j0 = tuple(j0s)

        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            jf = tuple(bilinear_filter(a, npass) for a in jf)
            jcp = tuple(bilinear_filter(a, npass) for a in jcp)

        # level-0 solve (advance_fields filters j0 internally)
        fields = advance_fields(
            state.fields, cfg, j0, None, None, None, None,
        )
        # patch solves
        parts_f = {
            k[len("mr:f:"):]: v for k, v in state.aux.items()
            if k.startswith("mr:f:")
        }
        parts_c = {
            k[len("mr:c:"):]: v for k, v in state.aux.items()
            if k.startswith("mr:c:")
        }
        parts_f = adv_f(parts_f, jf)
        parts_c = adv_c(parts_c, jcp)
        aux_new = dict(state.aux)
        for k, v in parts_f.items():
            aux_new[f"mr:f:{k}"] = v
        for k, v in parts_c.items():
            aux_new[f"mr:c:{k}"] = v
        for nm, arr in zip(jnames, jf):
            aux_new[f"mr:j:{nm}"] = arr

        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
            aux=aux_new,
        )

    def _lev0_half(fields, j3, first):
        """Half-coarse-step mother-grid advance (OneStep_sub1: EvolveB/E
        (coarse_lev, fine, 0.5*dt) — [B,E] on the first half, [E,B] on the
        second, WarpXEvolve.cpp:936-946,:1022-1031)."""
        from ..solvers import yee

        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            j3 = tuple(bilinear_filter(a, npass) for a in j3)
        fields = fields.replace(jx=j3[0], jy=j3[1], jz=j3[2])
        algo0 = "nodal" if cfg.grid_type == "collocated" else cfg.em_solver
        h = 0.5 * dt
        if first:
            fields = yee.evolve_b(fields, geom, h, algo0)
            fields = yee.evolve_e(fields, geom, h, algo0)
        else:
            fields = yee.evolve_e(fields, geom, h, algo0)
            fields = yee.evolve_b(fields, geom, h, algo0)
        return fields

    def _add_patch_j(j0_t, jcp_t):
        """AddCurrentFromFineLevelandSumBoundary: restricted fine current
        added into the level-0 J over the patch footprint."""
        jnames = ("jx", "jy", "jz")
        out = []
        for a, b, nm in zip(j0_t, jcp_t, jnames):
            dst, src = layout.patch_slices(staggering[nm], "c")
            out.append(a.at[dst].add(b[src]))
        return tuple(out)

    def _sub_deposit(pos_new, ux, uy, uz, w_f, w_b, sp_cfg):
        """Fine-substep deposits: patch current (fine grid) from non-buffer
        fine-level particles, buffer current (level-0 grid) from
        deposition-buffer particles — both over a dt_f trajectory."""
        jf_sp = deposit_current_esirkepov(
            pos_new, ux, uy, uz, w_f, sp_cfg.charge,
            layout.geom_f_ext, dt_f, cfg.particle_shape,
            chunk_size=cfg.deposit_chunk_size,
        )
        jb_sp = deposit_current_esirkepov(
            pos_new, ux, uy, uz, w_b, sp_cfg.charge,
            geom, dt_f, cfg.particle_shape,
            chunk_size=cfg.deposit_chunk_size,
        )
        return jf_sp, jb_sp

    def mr_step_sub(state):
        """OneStep_sub1 (WarpXEvolve.cpp:856): two fine substeps (dt/2 each)
        bracketing a split coarse advance; fine-level particles (those inside
        the patch box) push twice with dt/2, level-0 particles once with dt;
        each mother-grid half-step is driven by its own substep's restricted
        fine current."""
        zero_f = lambda: tuple(
            jnp.zeros(layout.n_fext, state.fields.Ex.dtype) for _ in range(3)
        )
        zero_0 = lambda: tuple(
            jnp.zeros(geom.n_cell, state.fields.Ex.dtype) for _ in range(3)
        )

        # ---------------- substep 1: gather at t^n, fine push dt/2 /
        # coarse push dt (PushParticlesandDeposit fine FirstHalf + coarse)
        farr0 = _field_dict(state.fields)
        aux1 = compute_aux1(farr0, state.aux, layout, staggering)
        if cfg.use_nci_corr:
            farr0 = _apply_nci(farr0, cfg)
            aux1 = _apply_nci_fine(aux1)

        jf1, jb1, j0 = zero_f(), zero_0(), zero_0()
        mid_species = {}
        lev_masks = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                mid_species[sp_cfg.name] = sp
                continue
            pos = sp.positions(geom.ndim)
            lev = layout.fine_mask(pos, 0)  # particle-level assignment
            lev_masks[sp_cfg.name] = lev
            mask_g = layout.fine_mask(pos, layout.gather_buf)
            mask_d = layout.fine_mask(pos, layout.dep_buf)
            if sp_cfg.do_not_gather:
                z = jnp.zeros_like(sp.ux)
                e6 = (z, z, z, z, z, z)
            else:
                e6 = gather_both(pos, farr0, aux1, mask_g)
            if sp_cfg.do_not_push:
                ux, uy, uz = sp.ux, sp.uy, sp.uz
                new_pos = pos
            else:
                pusher = PUSHERS[sp_cfg.pusher]
                # per-particle dt: dt/2 on the fine level, dt on level 0
                dt_p = jnp.where(lev, dt_f, dt)
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, *e6,
                    sp_cfg.charge, sp_cfg.mass, dt_p,
                )
                new_pos = position_step(pos, ux, uy, uz, dt_p, geom.ndim)
            if not sp_cfg.do_not_deposit:
                w = jnp.where(sp.alive, sp.w, 0.0)
                w_f = jnp.where(lev & mask_d, w, 0.0)
                w_b = jnp.where(lev & ~mask_d, w, 0.0)
                w_c = jnp.where(lev, 0.0, w)
                jf_sp, jb_sp = _sub_deposit(
                    new_pos, ux, uy, uz, w_f, w_b, sp_cfg)
                j0_sp = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_c, sp_cfg.charge,
                    geom, dt, cfg.particle_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
                jf1 = tuple(a + b for a, b in zip(jf1, jf_sp))
                jb1 = tuple(a + b for a, b in zip(jb1, jb_sp))
                j0 = tuple(a + b for a, b in zip(j0, j0_sp))
            sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
            sp_new = sp_new.with_positions(geom.ndim, new_pos)
            mid_species[sp_cfg.name] = wrap_positions(sp_new, geom)

        jnames = ("jx", "jy", "jz")
        jcp1 = tuple(
            coarsen_field(a, staggering[nm], layout)
            for a, nm in zip(jf1, jnames)
        )
        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            jf1 = tuple(bilinear_filter(a, npass) for a in jf1)
            jcp1f = tuple(bilinear_filter(a, npass) for a in jcp1)
        else:
            jcp1f = jcp1

        # fine patch: full B/E/B step with dt/2 halves, then the coarse
        # patch [B,E] leg and the mother-grid first half with J0+buf+cp
        parts_f = {
            k[len("mr:f:"):]: v for k, v in state.aux.items()
            if k.startswith("mr:f:")
        }
        parts_c = {
            k[len("mr:c:"):]: v for k, v in state.aux.items()
            if k.startswith("mr:c:")
        }
        parts_f = adv_f(parts_f, jf1)
        parts_c = ec(bc(parts_c), jcp1f)
        j_half1 = _add_patch_j(
            tuple(a + b for a, b in zip(j0, jb1)), jcp1)
        fields = _lev0_half(state.fields, j_half1, first=True)

        # ---------------- aux at t^n + dt/2 (UpdateAuxilaryData between
        # the substeps), then substep 2 for fine-level particles only
        aux_mid = dict(state.aux)
        for k, v in parts_f.items():
            aux_mid[f"mr:f:{k}"] = v
        for k, v in parts_c.items():
            aux_mid[f"mr:c:{k}"] = v
        farr_h = _field_dict(fields)
        aux1b = compute_aux1(farr_h, aux_mid, layout, staggering)
        if cfg.use_nci_corr:
            farr_h = _apply_nci(farr_h, cfg)
            aux1b = _apply_nci_fine(aux1b)

        jf2, jb2 = zero_f(), zero_0()
        new_species = {}
        for sp_cfg in cfg.species:
            sp = mid_species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            lev = lev_masks[sp_cfg.name]
            pos = sp.positions(geom.ndim)
            mask_g = layout.fine_mask(pos, layout.gather_buf)
            mask_d = layout.fine_mask(pos, layout.dep_buf)
            if sp_cfg.do_not_gather:
                z = jnp.zeros_like(sp.ux)
                e6 = (z, z, z, z, z, z)
            else:
                e6 = gather_both(pos, farr_h, aux1b, mask_g)
            if sp_cfg.do_not_push:
                ux, uy, uz = sp.ux, sp.uy, sp.uz
                new_pos = pos
            else:
                pusher = PUSHERS[sp_cfg.pusher]
                ux2, uy2, uz2 = pusher(
                    sp.ux, sp.uy, sp.uz, *e6,
                    sp_cfg.charge, sp_cfg.mass, dt_f,
                )
                pos2 = position_step(pos, ux2, uy2, uz2, dt_f, geom.ndim)
                ux = jnp.where(lev, ux2, sp.ux)
                uy = jnp.where(lev, uy2, sp.uy)
                uz = jnp.where(lev, uz2, sp.uz)
                new_pos = tuple(
                    jnp.where(lev, p2, p) for p2, p in zip(pos2, pos)
                )
            if not sp_cfg.do_not_deposit:
                w = jnp.where(sp.alive, sp.w, 0.0)
                w_f = jnp.where(lev & mask_d, w, 0.0)
                w_b = jnp.where(lev & ~mask_d, w, 0.0)
                jf_sp, jb_sp = _sub_deposit(
                    new_pos, ux, uy, uz, w_f, w_b, sp_cfg)
                jf2 = tuple(a + b for a, b in zip(jf2, jf_sp))
                jb2 = tuple(a + b for a, b in zip(jb2, jb_sp))
            sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
            sp_new = sp_new.with_positions(geom.ndim, new_pos)
            new_species[sp_cfg.name] = wrap_positions(sp_new, geom)

        jcp2 = tuple(
            coarsen_field(a, staggering[nm], layout)
            for a, nm in zip(jf2, jnames)
        )
        if cfg.use_filter:
            from ..solvers.filter import bilinear_filter

            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            jf2 = tuple(bilinear_filter(a, npass) for a in jf2)
            jcp2f = tuple(bilinear_filter(a, npass) for a in jcp2)
        else:
            jcp2f = jcp2

        parts_f = adv_f(parts_f, jf2)
        parts_c = bc(ec(parts_c, jcp2f))
        j_half2 = _add_patch_j(
            tuple(a + b for a, b in zip(j0, jb2)), jcp2)
        fields = _lev0_half(fields, j_half2, first=False)

        aux_new = dict(state.aux)
        for k, v in parts_f.items():
            aux_new[f"mr:f:{k}"] = v
        for k, v in parts_c.items():
            aux_new[f"mr:c:{k}"] = v
        for nm, arr in zip(jnames, jf2):
            aux_new[f"mr:j:{nm}"] = arr

        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
            aux=aux_new,
        )

    def mr_half_push(state, dt_half):
        """PushP with the MR aux gather (sync/desync around diagnostics)."""
        farr0 = _field_dict(state.fields)
        aux1 = compute_aux1(farr0, state.aux, layout, staggering)
        if cfg.use_nci_corr:
            farr0 = _apply_nci(farr0, cfg)
            aux1 = _apply_nci_fine(aux1)
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if (sp_cfg.do_not_push or sp.capacity == 0
                    or sp_cfg.mass == 0.0):
                new_species[sp_cfg.name] = sp
                continue
            pos = sp.positions(geom.ndim)
            mask_g = layout.fine_mask(pos, layout.gather_buf)
            e6 = gather_both(pos, farr0, aux1, mask_g)
            pusher = PUSHERS[sp_cfg.pusher]
            if sub:
                # synchronization uses each level's own dt (Evolve.cpp
                # PushP(lev, 0.5*dt[lev])): half of dt/2 on the fine level
                lev = layout.fine_mask(pos, 0)
                dt_p = jnp.where(lev, dt_half / layout.rv[0], dt_half)
            else:
                dt_p = dt_half
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass,
                dt_p,
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    return (mr_step_sub if sub else mr_step), mr_half_push, layout


def mr_output_fields(state, cfg, staggering, layout: MRLayout,
                     farr0=None):
    """lev=1 diagnostics matching the reference checksum convention: the
    golden sums are over a yt ``covering_grid(level=1, left_edge=patch_lo,
    dims=domain_dimensions)`` (Regression/Checksum/checksum.py:110) — a
    fine-resolution window of n_cell(0) cells anchored at the patch corner,
    filled with replicated coarse data beyond the patch.  The fine data are
    the aux fields / fine current, cell-centered (FullDiagnostics.cpp
    CellCenterFunctor on Efield_aux[lev] / current_fp[lev])."""
    from ..diagnostics.fields import cell_center
    from .step import _field_dict

    if farr0 is None:
        farr0 = _field_dict(state.fields)
        farr0.update(
            jx=state.fields.jx, jy=state.fields.jy, jz=state.fields.jz
        )
        if farr0["Ex"].shape[0] != layout.n0[0]:
            # bounded level-0 arrays carry PML strips + nodal tops: crop
            # to the plain domain frame the covering-grid tables index
            from .domain import DomainLayout

            lay = DomainLayout.from_config(cfg)
            farr0 = {
                nm: arr[tuple(
                    slice(lay.ext_lo(d), lay.ext_lo(d) + layout.n0[d])
                    for d in range(layout.ndim)
                )]
                for nm, arr in farr0.items()
            }
    aux1 = compute_aux1(farr0, state.aux, layout, staggering)
    ndim = layout.ndim
    n0 = layout.n0
    nf = layout.nf
    grids = np.meshgrid(
        *[np.arange(n0[d]) for d in range(ndim)], indexing="ij"
    )
    valid = np.ones([n0[d] for d in range(ndim)], bool)
    for d, g in enumerate(grids):
        valid &= g < nf[d]
    f_idx = tuple(
        np.clip(g, 0, nf[d] - 1) for d, g in enumerate(grids)
    )
    c_idx = tuple(
        ((layout.i0[d] * layout.rv[d] + g) // layout.rv[d]) % n0[d]
        for d, g in enumerate(grids)
    )

    def covering(fine_cc, coarse_cc):
        return np.where(valid, fine_cc[f_idx], coarse_cc[c_idx])

    out = {}
    for comp in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        flags = staggering[comp]
        _dst, src = layout.patch_slices(flags, "f")
        fine_cc = np.asarray(cell_center(aux1[comp][src], flags, nf))
        coarse_cc = np.asarray(
            cell_center(farr0[comp], flags, n0)
        )
        out[comp] = covering(fine_cc, coarse_cc)
    for nm in ("jx", "jy", "jz"):
        flags = staggering[nm]
        _dst, src = layout.patch_slices(flags, "f")
        fine_cc = np.asarray(
            cell_center(state.aux[f"mr:j:{nm}"][src], flags, nf)
        )
        coarse_cc = np.asarray(cell_center(farr0[nm], flags, n0))
        out[nm] = covering(fine_cc, coarse_cc)

    # rho: fine-level deposit from the deep-patch particles (the fine
    # level's own particles in the reference's per-level RhoFunctor),
    # covering-filled with the level-0 diag rho beyond the patch
    import jax.numpy as jnp

    from ..diagnostics.fields import deposit_total_rho
    from ..ops.deposit import deposit_rho as _dep_rho

    origin_f = list(layout.geom_f_ext.prob_lo)
    patch_lo_dyn = list(layout.patch_lo)
    if cfg.do_moving_window and "window_lo" in state.aux:
        wd = cfg.moving_window_dir
        ws = state.aux["window_lo"] - cfg.geometry.prob_lo[wd]
        origin_f[wd] = origin_f[wd] + ws
        patch_lo_dyn[wd] = patch_lo_dyn[wd] + ws
    rho_f = jnp.zeros(layout.n_fext, state.fields.Ex.dtype)
    for sp_cfg in cfg.species:
        sp = state.species[sp_cfg.name]
        if sp.capacity == 0 or sp_cfg.do_not_deposit:
            continue
        pos = sp.positions(ndim)
        mask = None
        for d in range(ndim):
            if layout.spanning[d]:
                continue
            idx = jnp.floor(
                (pos[d] - patch_lo_dyn[d]) / layout.dxf[d]
            ).astype(jnp.int32)
            in_d = (idx >= layout.dep_buf) & (
                idx <= layout.nf[d] - 1 - layout.dep_buf
            )
            mask = in_d if mask is None else mask & in_d
        if mask is None:
            mask = jnp.ones(pos[0].shape, bool)
        w_eff = jnp.where(sp.alive & mask, sp.w, 0.0)
        rho_f = _dep_rho(
            pos, w_eff, sp_cfg.charge, layout.geom_f_ext,
            cfg.particle_shape, out=rho_f, origin=origin_f,
        )
    nodal = (1,) * ndim
    _dst, src = layout.patch_slices(nodal, "f")
    fine_cc = np.asarray(cell_center(rho_f[src], nodal, nf))
    rho0 = np.asarray(deposit_total_rho(state, cfg))
    coarse_cc = np.asarray(cell_center(rho0, nodal, n0))
    out["rho"] = covering(fine_cc, coarse_cc)
    return out
