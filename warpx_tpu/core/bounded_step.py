"""PIC step on bounded (non-periodic) domains with moving window.

Extends the periodic step to the full Evolve semantics of the reference
(Source/Evolve/WarpXEvolve.cpp + Source/Utils/WarpXMovingWindow.cpp):

* per-face field boundaries (periodic | pec) as guard fills on ng-padded
  blocks (WarpX_PEC.cpp mirror rules, core/boundaries.py);
* AMReX-faithful nodal layout: a component NODAL in a bounded dimension
  stores n+1 valid values including both wall nodes;
* deposition guards at non-periodic faces are DROPPED like the reference's
  explicit EM path (SumBoundary folds only the periodic directions,
  WarpXComm.cpp:1552; ApplyJfieldBoundary image folds are hybrid-only);
* bilinear filtering of J before the field solve (WarpXComm.cpp:1357);
* laser antennas as prescribed-motion particle species depositing current
  (LaserParticleContainer::Evolve);
* moving window: traced-cell-count shift of all field arrays, incrementally
  accumulated domain edges, continuous plasma injection into newly uncovered
  cells (WarpXMovingWindow.cpp:139-479);
* absorbing/reflecting particle boundaries.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..constants import c as _c
from ..constants import ep0 as _ep0
from ..constants import mu0 as _mu0
from ..ops.deposit import deposit_current_direct, deposit_current_esirkepov
from ..ops.gather import gather_eb
from ..ops.push import PUSHERS, position_step
from ..solvers.filter import bilinear_filter_padded
from ..utils.expression import compile_expression
from .boundaries import fill_guards_pec, is_tangential
from .config import SimConfig
from .domain import DomainLayout
from .laser import update_antenna
from .state import SimState

__all__ = ["make_bounded_kernels", "guard_width", "field_shapes"]

_COMP_AXIS = {"x": 0, "y": 1, "z": 2}
_c2 = _c * _c

# Yee curl terms: output comp -> [(coef, input comp, diff xyz-axis, up|dn)]
_B_TERMS = {
    "Bx": [(+1.0, "Ey", "z", "up"), (-1.0, "Ez", "y", "up")],
    "By": [(+1.0, "Ez", "x", "up"), (-1.0, "Ex", "z", "up")],
    "Bz": [(+1.0, "Ex", "y", "up"), (-1.0, "Ey", "x", "up")],
}
_E_TERMS = {
    "Ex": [(+1.0, "Bz", "y", "dn"), (-1.0, "By", "z", "dn")],
    "Ey": [(+1.0, "Bx", "z", "dn"), (-1.0, "Bz", "x", "dn")],
    "Ez": [(+1.0, "By", "x", "dn"), (-1.0, "Bx", "y", "dn")],
}
# divergence-cleaning scalars and their gradient feedback (EvolveF.cpp /
# EvolveG.cpp; EvolveE.cpp:218-240, EvolveB.cpp:192-209).  In the PML the
# gradient terms become extra Berenger split components keyed by their own
# direction (the reference PML's third E component when F is present).
_F_TERMS = {
    "F": [(+1.0, "Ex", "x", "dn"), (+1.0, "Ey", "y", "dn"),
          (+1.0, "Ez", "z", "dn")],
}
_G_TERMS = {
    "G": [(+1.0, "Bx", "x", "up"), (+1.0, "By", "y", "up"),
          (+1.0, "Bz", "z", "up")],
}
_GRADF_TERMS = {
    "Ex": [(+1.0, "F", "x", "up")],
    "Ey": [(+1.0, "F", "y", "up")],
    "Ez": [(+1.0, "F", "z", "up")],
}
_GRADG_TERMS = {
    "Bx": [(+1.0, "G", "x", "dn")],
    "By": [(+1.0, "G", "y", "dn")],
    "Bz": [(+1.0, "G", "z", "dn")],
}


def guard_width(cfg: SimConfig) -> int:
    ng = cfg.particle_shape + 3
    if cfg.use_filter:
        ng += max(cfg.filter_npass_each_dir or (1,))
    return ng


def field_shapes(cfg, staggering) -> Dict[str, tuple]:
    """Per-component allocated shapes (PML strips + wall nodes included)."""
    return DomainLayout.from_config(cfg).field_shapes(staggering)


def make_bounded_kernels(cfg: SimConfig, staggering: Dict, dtype,
                         tile_spec=None, psum_axis=None, slow_species=()):
    """Build (step_main, step_window, half_push, solve_es) jitted kernels.

    With ``psum_axis`` set (a mesh axis name), the kernels run under the
    particle-decomposition SPMD mode (core/particle_dist.py): fields are
    replicated, each shard owns a slice of every species' slot axis, and
    the deposited sources are ``psum``-reduced over the axis at the
    deposit->advance seam so the (replicated) field update is identical on
    all shards.  Continuous injection partitions its candidate band by
    candidate index so each new particle materializes on exactly one shard.

    With ``tile_spec`` set (a TileSpec from core/binned_step.make_tile_spec;
    config pre-validated by binned_step.bounded_binned_supported), the
    returned step_main is the tile-binned fast variant: the per-particle
    gather+push+deposit block runs through the fused Pallas kernel
    (ops/pallas_pic.py) over SPACE-ANCHORED tiles — tiles bind to physical
    positions at each rebin while the moving-window grid slides under them
    by whole cells — and everything else (guard fills, filtering, field
    advance, PML, particle boundaries, injection) reuses the closures
    below, so wall/window behavior is identical to the slow path."""
    geom = cfg.geometry
    ndim = geom.ndim
    dt = cfg.dt
    order = cfg.particle_shape
    ng = guard_width(cfg)
    n_cell = geom.n_cell
    dxs = geom.dx
    axes = geom.axis_names

    bc_lo = cfg.field_bc_lo or ("periodic",) * ndim
    bc_hi = cfg.field_bc_hi or ("periodic",) * ndim
    pbc_lo = cfg.particle_bc_lo or ("periodic",) * ndim
    pbc_hi = cfg.particle_bc_hi or ("periodic",) * ndim
    wdir = cfg.moving_window_dir
    bounded = [bc_lo[d] != "periodic" for d in range(ndim)]

    is_psatd = cfg.em_solver == "psatd"
    if is_psatd:
        # bounded PSATD: periodic, damped (DampFieldsInGuards,
        # WarpXPushFieldsEM.cpp:1276) and pml (PsatdAlgorithmPml split-field
        # spectral push) field boundaries
        for d in range(ndim):
            for bc in (bc_lo[d], bc_hi[d]):
                if bc not in ("periodic", "damped", "pml"):
                    raise NotImplementedError(
                        f"PSATD with field boundary '{bc}' "
                        "(only periodic|damped|pml implemented)"
                    )
    layout = DomainLayout.from_config(cfg)
    shapes = layout.field_shapes(staggering)
    ext_lo = [layout.ext_lo(d) for d in range(ndim)]
    # allocated cell extent per dim (staggered comps), nodal gets +1
    n_ext = [n_cell[d] + ext_lo[d] + layout.ext_hi(d) for d in range(ndim)]
    # common deposition target: covers the nodal top in bounded dims
    big_shape = tuple(
        n_ext[d] + (1 if bounded[d] else 0) + 2 * ng for d in range(ndim)
    )
    static_origin = layout.static_origin()

    # Galilean PSATD: per-dim grid-drift velocity on the active axes; every
    # gather/deposit origin gains v_gal * (its own source time) — see the
    # periodic path's derivation (core/step.py) and WarpX::LowerCorner.
    _gal_ax = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    v_gal_act = [cfg.psatd_v_galilean[_gal_ax[d]] for d in range(ndim)]
    is_galilean = any(v != 0.0 for v in v_gal_act)
    if is_galilean and not is_psatd:
        raise NotImplementedError("psatd.v_galilean without the PSATD solver")

    def gal_origin_at(origin, state, frac):
        """Origin shifted by the galilean drift at t^n + frac*dt."""
        if not is_galilean:
            return origin
        t = state.time + frac * dt
        return [o + v * t for o, v in zip(origin, v_gal_act)]

    if is_psatd:
        from ..solvers.psatd import PsatdSolver
        from .grid import Geometry as _Geometry

        ext_geom = _Geometry(
            ndim=ndim,
            n_cell=tuple(n_ext),
            prob_lo=tuple(static_origin),
            prob_hi=tuple(
                static_origin[d] + n_ext[d] * dxs[d] for d in range(ndim)
            ),
            periodic=(True,) * ndim,
        )
        psatd_b = PsatdSolver(
            ext_geom, staggering, dt,
            n_order=cfg.psatd_order,
            collocated_grid=(cfg.grid_type == "collocated"),
            update_with_rho=cfg.psatd_update_with_rho,
            current_correction=cfg.psatd_current_correction,
            v_galilean=cfg.psatd_v_galilean,
            v_comoving=cfg.psatd_v_comoving,
            single_box=True,
            vay_deposition=(cfg.current_deposition == "vay"),
            time_averaging=cfg.psatd_time_averaging,
            dive_cleaning=cfg.do_dive_cleaning,
            divb_cleaning=cfg.do_divb_cleaning,
            dtype=dtype,
        )
        psatd_need_rho = (
            cfg.psatd_update_with_rho or cfg.psatd_current_correction
        )
        # damped-BC profiles: sin^2 ramp over the OUTER HALF of each damp
        # zone (damp_field_in_guards + constrain_tilebox_to_guards,
        # WarpXPushFieldsEM_K.H:78-120)
        _damp_1d = []
        for d in range(ndim):
            prof = np.ones(n_ext[d])
            ngd = layout.damp_ncell
            if bc_lo[d] == "damped":
                i = np.arange(ngd // 2)
                prof[: ngd // 2] = np.sin(np.pi * i / ngd) ** 2
            if bc_hi[d] == "damped":
                i = np.arange(ngd // 2)
                prof[n_ext[d] - ngd // 2:] = (
                    np.sin(np.pi * i / ngd) ** 2)[::-1]
            _damp_1d.append(prof)
        _prof_nd = np.ones(tuple(n_ext))
        for d in range(ndim):
            shape_d = [1] * ndim
            shape_d[d] = n_ext[d]
            _prof_nd = _prof_nd * _damp_1d[d].reshape(shape_d)
        damp_profile = jnp.asarray(_prof_nd, dtype)

        def crop_to_ext(arr):
            """Drop the extra wall node of nodal comps on bounded dims."""
            for d in range(ndim):
                if arr.shape[d] == n_ext[d] + 1:
                    arr = jax.lax.slice_in_dim(arr, 0, n_ext[d], axis=d)
            return arr

        def restore_shape(arr, comp_name):
            """Re-append the (damped-to-zero) wall node where needed."""
            for d in range(ndim):
                want = shapes[comp_name][d]
                if arr.shape[d] == want - 1:
                    zshape = list(arr.shape)
                    zshape[d] = 1
                    arr = jnp.concatenate(
                        [arr, jnp.zeros(zshape, arr.dtype)], axis=d
                    )
            return arr

        # --- spectral PML (PsatdAlgorithmPml): split fields over the same
        # extended box, re-fed from the regular fields in the interior every
        # step (the single-box analog of PML::Exchange), pushed spectrally,
        # damped in real space (DampPML), and summed back into the strips.
        psatd_pml = None
        if layout.has_pml:
            from ..solvers.psatd import PsatdPmlSolver

            psatd_pml = PsatdPmlSolver(
                ext_geom, staggering, dt,
                n_order=cfg.psatd_order,
                collocated_grid=(cfg.grid_type == "collocated"),
                v_galilean=cfg.psatd_v_galilean,
                dive_cleaning=cfg.do_pml_dive_cleaning,
                divb_cleaning=cfg.do_pml_divb_cleaning,
                dtype=dtype,
            )
            pml_comps = ["Ex", "Ey", "Ez", "Bx", "By", "Bz"]
            if psatd_pml.cleaning:
                pml_comps += ["F", "G"]

            def _strip_mask_ext(flags):
                """1.0 where the split solver owns the site (PML strips)."""
                m = np.zeros(tuple(n_ext))
                for d in range(ndim):
                    nodal = flags[d] == 1
                    idx = np.arange(n_ext[d]) - ext_lo[d]
                    top = n_cell[d] if nodal else n_cell[d] - 1
                    outside = np.zeros(n_ext[d], bool)
                    if bc_lo[d] == "pml":
                        outside |= idx < 0
                    if bc_hi[d] == "pml":
                        outside |= idx > top
                    sh = [1] * ndim
                    sh[d] = n_ext[d]
                    m = np.maximum(m, outside.reshape(sh).astype(float))
                return m

            pml_mask_ext = {
                nm: jnp.asarray(_strip_mask_ext(staggering[nm]), dtype)
                for nm in pml_comps
            }
            _sig_pairs = {d: layout.sigma_factors(d, dt) for d in range(ndim)}
            pml_damp = {}
            for nm in pml_comps:
                for ax in psatd_pml.split_dirs(nm):
                    if ax not in axes:
                        continue  # e.g. the y split in 2D: no damping
                    dd = axes.index(ax)
                    arr = _sig_pairs[dd][0 if staggering[nm][dd] == 1 else 1]
                    sh = [1] * ndim
                    sh[dd] = n_ext[dd]
                    pml_damp[(nm, ax)] = jnp.asarray(
                        arr[: n_ext[dd]].reshape(sh), dtype
                    )

    # --- PML machinery: split-field ownership masks and damping factors
    has_pml = layout.has_pml
    if has_pml:
        eb_names = ["Ex", "Ey", "Ez", "Bx", "By", "Bz"]
        if cfg.do_dive_cleaning:
            eb_names.append("F")
        if cfg.do_divb_cleaning:
            eb_names.append("G")
        pml_mask = {
            nm: jnp.asarray(layout.in_pml_mask(staggering[nm]))
            for nm in eb_names
        }
        sig_node, sig_star = {}, {}
        for d in range(ndim):
            fn, fs = layout.sigma_factors(d, dt)
            sig_node[d], sig_star[d] = fn, fs

        def damp_factor(comp, dd):
            """exp(-sigma dt) broadcast along dim dd for split comp:dd
            (warpx_damp_pml_*: staggered in dd -> star, nodal -> node)."""
            nodal = staggering[comp][dd] == 1
            arr = sig_node[dd] if nodal else sig_star[dd]
            cnt = shapes[comp][dd]
            v = arr[:cnt]
            shape = [1] * ndim
            shape[dd] = cnt
            return jnp.asarray(v.reshape(shape))

    # --- Silver-Mueller absorbing boundary: one stateful guard cell per
    # side; transverse B guards evolve ONLY via the first-order absorbing
    # relation (ApplySilverMuellerBoundary.cpp:185-330), applied once per
    # step after the first half B push with full-dt coefficients
    # (WarpXFieldBoundaries.cpp:136-140).
    import numpy as _np

    sm_lo = [bc_lo[d] == "absorbing_silver_mueller" for d in range(ndim)]
    sm_hi = [bc_hi[d] == "absorbing_silver_mueller" for d in range(ndim)]
    any_sm = any(sm_lo) or any(sm_hi)
    if any_sm:
        if has_pml:
            raise NotImplementedError("mixing PML and Silver-Mueller")
        sm_mask = {}
        for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
            m = _np.zeros(shapes[nm], bool)
            for d in range(ndim):
                if sm_lo[d]:
                    m[(slice(None),) * d + (0,)] = True
                if sm_hi[d]:
                    m[(slice(None),) * d + (shapes[nm][d] - 1,)] = True
            sm_mask[nm] = jnp.asarray(m)
        sm_c1, sm_c2 = {}, {}
        for d in range(ndim):
            cdt = _c * dt / dxs[d]
            sm_c1[d] = (1.0 - cdt) / (1.0 + cdt)
            sm_c2[d] = 2.0 * cdt / (1.0 + cdt) / _c

        def _levi(i, j, k):
            return ((i - j) * (j - k) * (k - i)) // 2  # +1 cyclic, -1 anti

        def apply_silver_mueller(fields):
            upd = {nm: getattr(fields, nm) for nm in ("Bx", "By", "Bz")}
            for d in range(ndim):
                if not (sm_lo[d] or sm_hi[d]):
                    continue
                ia = _COMP_AXIS[axes[d]]
                for it in range(3):
                    if it == ia:
                        continue
                    ip = 3 - ia - it
                    sgn_hi = -float(_levi(ia, it, ip))
                    tname = "B" + "xyz"[it]
                    pname = "E" + "xyz"[ip]
                    B = upd[tname]
                    E = getattr(fields, pname)

                    def at(i, arr):
                        sl = [slice(None)] * ndim
                        sl[d] = i
                        return tuple(sl)

                    if sm_hi[d]:
                        gi = B.shape[d] - 1
                        ei = E.shape[d] - 2  # wall node inside the guard
                        B = B.at[at(gi, B)].set(
                            sm_c1[d] * B[at(gi, B)]
                            + sgn_hi * sm_c2[d] * E[at(ei, E)]
                        )
                    if sm_lo[d]:
                        B = B.at[at(0, B)].set(
                            sm_c1[d] * B[at(0, B)]
                            - sgn_hi * sm_c2[d] * E[at(1, E)]
                        )
                    upd[tname] = B
            return fields.replace(**upd)

    attr_fns = {}
    for sp_cfg in cfg.species:
        attr_fns[sp_cfg.name] = [
            (
                aname,
                compile_expression(
                    expr,
                    ["x", "y", "z", "ux", "uy", "uz", "t"],
                    dict(sp_cfg.user_constants),
                ),
                is_int,
            )
            for (aname, expr, is_int) in sp_cfg.attributes
        ]

    # ---------------------------------------------------------------- helpers
    # --- embedded boundary (staircase level set): covered-edge E and
    # covered-face B components are FROZEN (the reference's Yee-EB skips
    # their update when the edge length / face area is zero,
    # EvolveE.cpp "lx(i,j,k) <= 0" / EvolveB.cpp face-area branch); the
    # implicit function is sampled at each component's staggered points.
    has_eb = bool(cfg.eb_implicit_function)
    if has_eb:
        if is_psatd:
            raise NotImplementedError("embedded boundaries with PSATD")
        if cfg.do_moving_window:
            raise NotImplementedError(
                "embedded boundaries with a moving window"
            )
        _eb_fn = compile_expression(
            cfg.eb_implicit_function, ("x", "y", "z"),
            dict(cfg.user_constants or ()),
        )
        _axes3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]

        def _eb_phi_at(coords_active):
            xyz = [0.0, 0.0, 0.0]
            for d in range(ndim):
                xyz[_axes3[d]] = coords_active[d]
            return _eb_fn(*xyz)

        eb_mask = {}
        for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
            coords = []
            for d in range(ndim):
                n_pts = shapes[nm][d]
                off = 0.0 if staggering[nm][d] == 1 else 0.5
                coords.append(
                    static_origin[d]
                    + (np.arange(n_pts) + off) * dxs[d]
                )
            mesh = np.meshgrid(*coords, indexing="ij")
            phi = np.asarray(_eb_phi_at([jnp.asarray(m) for m in mesh]))
            # evolve where NOT covered (phi <= 0: regular or boundary)
            eb_mask[nm] = jnp.asarray(phi <= 0.0)

        # --- ECT conformal solver (EvolveBCartesianECT): cut-cell B update
        # with area borrowing; E keeps the standard Yee curl, frozen only
        # on fully covered edges (EvolveE.cpp "lx <= 0")
        is_ect = cfg.em_solver == "ect"
        ect_evolve_b = None
        if is_ect:
            bad_bc = [
                b for b in tuple(bc_lo) + tuple(bc_hi)
                if b not in ("pec", "periodic", "none")
            ]
            if bad_bc:
                raise NotImplementedError(f"ECT with {bad_bc[0]} boundaries")
            if cfg.do_dive_cleaning or cfg.do_divb_cleaning:
                raise NotImplementedError("ECT with F/G div cleaning")
            from ..solvers.ect import cached_ect_geometry, make_ect_evolve_b

            geo_ect = cached_ect_geometry(
                cfg.eb_implicit_function, tuple(cfg.user_constants or ()),
                geom, tuple(geom.prob_lo),
            )
            for nm in ("Ex", "Ey", "Ez"):
                eb_mask[nm] = jnp.asarray(geo_ect["edges"][nm] > 0.0)
            # conformally-updated B faces must not be staircase-frozen
            for nm in (("Bx", "By", "Bz") if ndim == 3 else ("By",)):
                eb_mask.pop(nm, None)
            ect_evolve_b = make_ect_evolve_b(geo_ect, dtype)
    else:
        is_ect = False
        ect_evolve_b = None

    def _shard_key(k):
        """Decorrelate per-shard random draws under particle decomposition
        (each shard holds different particles, so identical keys would
        re-emit the same thermal-wall sequence on every shard); the stored
        state.rng split chain itself stays replicated."""
        if psum_axis is None:
            return k
        return jax.random.fold_in(k, jax.lax.axis_index(psum_axis))

    def origin_of(state):
        """Array-origin coordinates (index 0, including PML strips)."""
        out = list(static_origin)
        if cfg.do_moving_window:
            out[wdir] = (
                state.aux["window_lo"] - ext_lo[wdir] * dxs[wdir]
            )
        return out

    def phys_lo_of(state):
        out = list(geom.prob_lo)
        if cfg.do_moving_window:
            out[wdir] = state.aux["window_lo"]
        if is_galilean:
            # the grid (and so the physical coverage) drifts with v_gal
            # (ShiftGalileanBoundary moves prob_lo/hi)
            out = [o + v * state.time for o, v in zip(out, v_gal_act)]
        return out

    def domain_hi_of(state):
        out = list(geom.prob_hi)
        if cfg.do_moving_window:
            out[wdir] = state.aux["window_hi"]
        if is_galilean:
            out = [o + v * state.time for o, v in zip(out, v_gal_act)]
        return out

    def pad_eb(arr, comp_name):
        """Pad one E/B component (or F/G scalar) with ng BC-filled guards
        per side; F/G get zero guards at non-periodic faces."""
        scalar = comp_name in ("F", "G")
        comp_axis = None if scalar else _COMP_AXIS[comp_name[-1].lower()]
        kind = comp_name[0]
        out = arr
        for d in range(ndim):
            n_val = out.shape[d]
            sl_lo = [slice(None)] * out.ndim
            sl_hi = [slice(None)] * out.ndim
            sl_lo[d] = slice(0, ng)
            sl_hi[d] = slice(n_val - ng, n_val)
            if bc_lo[d] == "periodic":
                lo_guard = out[tuple(sl_hi)]
                hi_guard = out[tuple(sl_lo)]
            else:
                zshape = list(out.shape)
                zshape[d] = ng
                lo_guard = jnp.zeros(zshape, out.dtype)
                hi_guard = jnp.zeros(zshape, out.dtype)
            out = jnp.concatenate([lo_guard, out, hi_guard], axis=d)
        if scalar:
            return out
        for d in range(ndim):
            axis_xyz = _COMP_AXIS[axes[d]]
            nodal = staggering[comp_name][d] == 1
            tang = is_tangential(comp_axis, axis_xyz)
            if kind == "E":
                zero_wall = tang and nodal
                mirror_tang = tang
            else:
                zero_wall = (not tang) and nodal
                mirror_tang = not tang
            if bc_lo[d] == "pec":
                out = fill_guards_pec(
                    out, d, ng, n_ext[d], nodal, mirror_tang, "lo", zero_wall
                )
            if bc_hi[d] == "pec":
                out = fill_guards_pec(
                    out, d, ng, n_ext[d], nodal, mirror_tang, "hi", zero_wall
                )
        return out

    def fold_and_crop(padded, comp_name):
        """Fold periodic guards, drop bounded guards; crop to comp shape."""
        out = padded
        for d in reversed(range(ndim)):
            nv = shapes[comp_name][d]

            def sl(a, b, d=d):
                idx = [slice(None)] * out.ndim
                idx[d] = slice(a, b)
                return tuple(idx)

            if bc_lo[d] == "periodic":
                n_tot = out.shape[d]
                low = out[sl(0, ng)]
                high = out[sl(n_tot - ng, n_tot)]
                valid = out[sl(ng, n_tot - ng)]
                valid = valid.at[sl(nv - ng, nv)].add(low)
                valid = valid.at[sl(0, ng)].add(high)
                out = valid
            else:
                out = out[sl(ng, ng + nv)]
        return out

    # CKC extended stencil for the UPWARD (B-push) differences
    # (CartesianCKCAlgorithm.H; EvolveB uses it, EvolveE keeps plain Yee)
    is_ckc = cfg.em_solver == "ckc" and cfg.grid_type != "collocated"
    if is_ckc:
        from ..solvers.yee import _ckc_coefs

        ckc = _ckc_coefs(geom)

    def _ckc_up(P, dd, dd_xyz):
        """CKC upward difference of the padded array (already includes the
        1/dx factor through the alpha/beta/gamma coefficients)."""
        base = jnp.roll(P, -1, dd) - P
        pfx = dd_xyz
        if ndim == 3:
            others = [a for a in range(3) if a != dd]
            a, b = others
            term = ckc["alpha" + pfx] * base
            term = term + ckc["beta" + pfx + "xyz"[a]] * (
                jnp.roll(base, -1, a) + jnp.roll(base, 1, a)
            )
            term = term + ckc["beta" + pfx + "xyz"[b]] * (
                jnp.roll(base, -1, b) + jnp.roll(base, 1, b)
            )
            term = term + ckc["gamma" + pfx] * (
                jnp.roll(jnp.roll(base, -1, a), -1, b)
                + jnp.roll(jnp.roll(base, 1, a), -1, b)
                + jnp.roll(jnp.roll(base, -1, a), 1, b)
                + jnp.roll(jnp.roll(base, 1, a), 1, b)
            )
            return term
        if ndim == 2:
            other = 1 - dd
            alpha = ckc["alpha" + ("x" if dd == 0 else "z")]
            beta = ckc["betaxz"] if dd == 0 else ckc["betazx"]
            return alpha * base + beta * (
                jnp.roll(base, -1, other) + jnp.roll(base, 1, other)
            )
        return ckc["alphaz"] * base

    def curl_term(out_name, term, pads, coef):
        """One curl contribution (sgn * coef * d(in)/d(dd)) for out_name."""
        (sgn, in_name, dd_xyz, kind) = term
        nv = shapes[out_name]
        dd = axes.index(dd_xyz)
        P = pads[in_name]
        if is_ckc and kind == "up" and in_name[0] == "E":
            # CKC applies to the E-curl in the B push only
            G = _ckc_up(P, dd, "xz"[dd] if ndim == 2 else dd_xyz)
            sl = tuple(slice(ng, ng + nv[d]) for d in range(ndim))
            return (sgn * coef) * G[sl]
        sl_a = []
        sl_b = []
        for d in range(ndim):
            cnt = nv[d]
            if d == dd:
                if kind == "up":
                    a, b = ng + 1, ng
                else:
                    a, b = ng, ng - 1
            else:
                a = b = ng
            sl_a.append(slice(a, a + cnt))
            sl_b.append(slice(b, b + cnt))
        diff = P[tuple(sl_a)] - P[tuple(sl_b)]
        return (sgn * coef / dxs[dd]) * diff

    def curl_terms(out_name, terms, pads, coef):
        """Accumulate curl contributions for output comp ``out_name``."""
        total = jnp.zeros(shapes[out_name], dtype)
        for term in terms:
            if term[2] not in axes:
                continue
            total = total + curl_term(out_name, term, pads, coef)
        return total

    def enforce_walls(fields):
        """Zero tangential-E / normal-B wall nodes at PEC faces."""
        upd = {}
        for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
            arr = getattr(fields, name)
            comp_axis = _COMP_AXIS[name[-1].lower()]
            for d in range(ndim):
                nodal = staggering[name][d] == 1
                tang = is_tangential(comp_axis, _COMP_AXIS[axes[d]])
                zero_wall = (
                    (tang and nodal) if name[0] == "E" else ((not tang) and nodal)
                )
                if not zero_wall:
                    continue
                if bc_lo[d] == "pec":
                    sl = [slice(None)] * ndim
                    sl[d] = 0
                    arr = arr.at[tuple(sl)].set(0.0)
                if bc_hi[d] == "pec":
                    sl = [slice(None)] * ndim
                    sl[d] = arr.shape[d] - 1
                    arr = arr.at[tuple(sl)].set(0.0)
            upd[name] = arr
        return fields.replace(**upd)

    is_laser = {sp.name: sp.injection_style == "laser" for sp in cfg.species}
    laser_cfg = {l.name: l for l in cfg.lasers}
    is_es = cfg.electrostatic != "none"
    mc_gather = cfg.field_gathering == "momentum-conserving"
    nodal_stag = {k: (1,) * ndim for k in staggering}

    def mc_aux_pads(farr_pad):
        """Average padded staggered fields to nodal for momentum-conserving
        gathering (UpdateAuxilaryDataStagToNodal on the padded block; the
        first entry along each averaged dim is junk, covered by guards)."""
        out = {}
        for name, P in farr_pad.items():
            a = P
            for d, flag in enumerate(staggering[name]):
                if flag == 0:
                    lo = [slice(None)] * a.ndim
                    hi = [slice(None)] * a.ndim
                    lo[d] = slice(0, -1)
                    hi[d] = slice(1, None)
                    core = 0.5 * (a[tuple(lo)] + a[tuple(hi)])
                    pad = [(0, 0)] * a.ndim
                    pad[d] = (1, 0)
                    a = jnp.pad(core, pad)
            out[name] = a
        return out

    # ------------------------------------------------------------- step_main
    # ------------------------------------------------ bounded mesh refinement
    # Two-level MR inside the bounded stack (PML level-0 walls + moving
    # window + lasers): the fine/coarse PATCH machinery is the periodic MR
    # module's (core/mr.py — patch advances with their own PML ring,
    # staggering-aware average-down, 2-pt aux interpolation, buffer-mask
    # particle ownership); level-0 runs through the closures here.  The
    # refined box is FIXED in level-0 index space, so it rides the moving
    # window: MoveWindow shifts the patch arrays along (shiftMF at every
    # level, WarpXMovingWindow.cpp:139-479) and the patch's PHYSICAL bounds
    # gain the accumulated window offset for particle masks and patch-frame
    # gather/deposit origins.
    has_mr = cfg.max_level > 0
    if has_mr:
        from .mr import (
            MRLayout, coarsen_field, compute_aux1, make_patch_advance,
        )

        if is_psatd:
            raise NotImplementedError("bounded MR with PSATD")
        if cfg.do_subcycling:
            raise NotImplementedError("bounded MR with subcycling")
        if is_galilean or is_es or cfg.evolve_scheme != "explicit":
            raise NotImplementedError("bounded MR outside explicit EM")
        if cfg.use_nci_corr:
            raise NotImplementedError(
                "bounded MR with the NCI corrector (periodic MR covers it)"
            )
        mrl = MRLayout(cfg, staggering)
        _mr_bf, _mr_ef = make_patch_advance(
            mrl, staggering, cfg.em_solver, 0.5 * dt, dt, True, dtype
        )
        _mr_bc, _mr_ec = make_patch_advance(
            mrl, staggering, cfg.em_solver, 0.5 * dt, dt, False, dtype
        )
        _mr_comps = ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
        _mr_jnames = ("jx", "jy", "jz")

        def _mr_adv(parts, j3, fine):
            b, e = (_mr_bf, _mr_ef) if fine else (_mr_bc, _mr_ec)
            return b(e(b(parts), j3))

        def _mr_wshift(state):
            """Physical window offset the (index-fixed) patch has ridden."""
            if not cfg.do_moving_window:
                return 0.0
            return state.aux["window_lo"] - geom.prob_lo[wdir]

        def _mr_origin_f(state):
            o = list(mrl.geom_f_ext.prob_lo)
            if cfg.do_moving_window:
                o[wdir] = o[wdir] + _mr_wshift(state)
            return o

        def _mr_mask(state, positions, nbuf):
            """fine_mask with the window-ridden patch bounds."""
            ws = _mr_wshift(state)
            ok = None
            for d in range(ndim):
                if mrl.spanning[d]:
                    continue  # no coarse-fine interface along this axis
                lo = mrl.patch_lo[d] + (
                    ws if (cfg.do_moving_window and d == wdir) else 0.0
                )
                idx = jnp.floor(
                    (positions[d] - lo) / mrl.dxf[d]
                ).astype(jnp.int32)
                in_d = (idx >= nbuf) & (idx <= mrl.nf[d] - 1 - nbuf)
                ok = in_d if ok is None else ok & in_d
            if ok is None:
                ok = jnp.ones(positions[0].shape, bool)
            return ok

        def _mr_crop0(state):
            """Level-0 components cropped to the plain (n_cell) domain frame
            the MR window tables index (drop PML strips + nodal top)."""
            out = {}
            for nm in _mr_comps:
                arr = getattr(state.fields, nm)
                sl = tuple(
                    slice(ext_lo[d], ext_lo[d] + n_cell[d])
                    for d in range(ndim)
                )
                out[nm] = arr[sl]
            return out

        def _mr_patch_parts(aux, prefix):
            tag = f"mr:{prefix}:"
            return {
                k[len(tag):]: v for k, v in aux.items() if k.startswith(tag)
            }

        def _mr_to_nodal(aux1):
            """Momentum-conserving gather: average the staggered fine aux
            to nodal on the patch torus (UpdateAuxilaryDataStagToNodal,
            WarpXComm.cpp:94 — 2-point centering)."""
            out = {}
            for nm, a in aux1.items():
                for d, flag in enumerate(staggering[nm]):
                    if flag == 0:
                        a = 0.5 * (a + jnp.roll(a, 1, axis=d))
                out[nm] = a
            return out

    def step_main(state: SimState) -> SimState:
        origin = gal_origin_at(origin_of(state), state, 0.0)
        use_avg = (
            is_psatd and cfg.psatd_time_averaging
            and state.fields.Ex_avg is not None
        )
        farr_pad = {
            name: pad_eb(
                getattr(state.fields, name + "_avg" if use_avg else name),
                name,
            )
            for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
        }
        gather_stag = staggering
        if cfg.use_nci_corr:
            from .step import _apply_nci

            farr_pad = _apply_nci(farr_pad, cfg)
        if mc_gather:
            farr_pad = mc_aux_pads(farr_pad)
            gather_stag = nodal_stag

        # collisions before ionization (WarpXEvolve.cpp doCollisions /
        # doFieldIonization ordering, as in the periodic path)
        if any(c.kind == "background_mcc" for c in cfg.collisions):
            from ..ops.mcc import mcc_collision_update

            state = mcc_collision_update(state, cfg, cfg.dt)
        if any(c.kind == "background_stopping" for c in cfg.collisions):
            from ..ops.stopping import stopping_collision_update

            state = stopping_collision_update(state, cfg, cfg.dt)

        ionizable = [sp for sp in cfg.species if sp.do_field_ionization]
        if ionizable:
            from ..ops.ionization import (
                IONIZATION_ENERGIES, adk_coefficients, apply_ionization,
            )

            species_mut = dict(state.species)
            rng = state.rng
            for sp_cfg2 in ionizable:
                ion = species_mut[sp_cfg2.name]
                prod = species_mut[sp_cfg2.ionization_product_species]
                coeffs = adk_coefficients(sp_cfg2.physical_element, dt)
                z_max = len(IONIZATION_ENERGIES[sp_cfg2.physical_element])
                e6_i = gather_eb(
                    ion.positions(ndim), farr_pad, gather_stag, geom, order,
                    cfg.galerkin, origin=origin, wrap=False, offset=ng,
                )
                ion, prod, rng = apply_ionization(
                    rng, ion, prod, e6_i, coeffs, z_max
                )
                species_mut[sp_cfg2.name] = ion
                species_mut[sp_cfg2.ionization_product_species] = prod
            state = state.replace(species=species_mut, rng=rng)

        j_total = None
        rho_old_pad = rho_new_pad = None
        new_species = {}
        aux_updates = {}
        if has_mr:
            # aux(1) = fp + I(aux(0) - cp) gather fields on the fine patch
            # (UpdateAuxilaryDataSameType, WarpXComm.cpp:388)
            mr_aux1 = compute_aux1(
                _mr_crop0(state), state.aux, mrl, staggering
            )
            if mc_gather:
                mr_aux1 = _mr_to_nodal(mr_aux1)
            mr_jf = tuple(
                jnp.zeros(mrl.n_fext, state.fields.Ex.dtype)
                for _ in range(3)
            )
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            if is_laser[sp_cfg.name]:
                laser = laser_cfg[sp_cfg.name]
                # boosted runs: mobility / gamma (LaserParticleContainer:775)
                mobility = 0.05 / laser.e_max / cfg.gamma_boost
                sp_new = update_antenna(
                    sp, laser, geom, mobility, state.time, dt,
                    gamma_boost=cfg.gamma_boost, z0_lab=laser.z0_lab,
                )
                ux, uy, uz = sp_new.ux, sp_new.uy, sp_new.uz
                new_pos = sp_new.positions(ndim)
                q_eff = 1.0
            else:
                pos = sp.positions(ndim)
                if sp_cfg.do_not_gather:
                    zeros = jnp.zeros_like(sp.ux)
                    e6 = (zeros,) * 6
                else:
                    from .step import _add_ext

                    e6 = gather_eb(
                        pos, farr_pad, gather_stag, geom, order,
                        cfg.galerkin, origin=origin, wrap=False, offset=ng,
                    )
                    if has_mr:
                        # particles deep inside the patch gather from the
                        # fine aux instead (buffer-mask ownership)
                        mask_g = _mr_mask(state, pos, mrl.gather_buf)
                        e6f = gather_eb(
                            pos, mr_aux1, gather_stag, mrl.geom_f_ext,
                            order, cfg.galerkin,
                            origin=_mr_origin_f(state), wrap=False,
                        )
                        e6 = tuple(
                            jnp.where(mask_g, f, c)
                            for f, c in zip(e6f, e6)
                        )
                    e6 = _add_ext(
                        e6, cfg, pos=pos, u3=(sp.ux, sp.uy, sp.uz)
                    )
                if sp_cfg.do_not_push:
                    ux, uy, uz = sp.ux, sp.uy, sp.uz
                    new_pos = pos
                elif sp_cfg.species_type == "photon":
                    from ..ops.push import photon_position_step

                    ux, uy, uz = sp.ux, sp.uy, sp.uz
                    new_pos = photon_position_step(
                        pos, ux, uy, uz, dt, ndim
                    )
                else:
                    rigid = sp_cfg.zinject_plane is not None
                    if rigid:
                        from .step import (
                            rigid_scale_fields, rigid_undo_push,
                        )

                        v_boost = (
                            math.sqrt(1.0 - 1.0 / cfg.gamma_boost**2)
                            * 299792458.0
                            if cfg.gamma_boost > 1.0 else 0.0
                        )
                        zp_prev = state.aux[f"zinject:{sp_cfg.name}"]
                        zp_new = zp_prev - dt * v_boost
                        vz_ave = state.aux[f"vzave:{sp_cfg.name}"]
                        e6 = rigid_scale_fields(
                            e6, pos[ndim - 1], zp_prev, vz_ave, v_boost, dt
                        )
                    pusher = PUSHERS[sp_cfg.pusher]
                    ux, uy, uz = pusher(
                        sp.ux, sp.uy, sp.uz, *e6,
                        sp_cfg.charge, sp_cfg.mass, dt,
                    )
                    new_pos = position_step(pos, ux, uy, uz, dt, ndim)
                    if rigid:
                        new_pos, (ux, uy, uz) = rigid_undo_push(
                            pos, (sp.ux, sp.uy, sp.uz), new_pos,
                            (ux, uy, uz), zp_new, vz_ave, dt,
                            sp_cfg.rigid_advance, ndim,
                        )
                        aux_updates[f"zinject:{sp_cfg.name}"] = zp_new
                sp_new = sp.replace(ux=ux, uy=uy, uz=uz).with_positions(
                    ndim, new_pos
                )
                q_eff = sp_cfg.charge

            need_rho_b = cfg.do_dive_cleaning or (
                is_psatd and psatd_need_rho
            )
            if need_rho_b and not sp_cfg.do_not_deposit and not is_es:
                # start/end-of-step charge density for EvolveF / PSATD rho
                # (rho_fp components 0/1; WarpXPushFieldsEM.cpp:1041); with
                # galilean PSATD each rho is deposited with the origin at
                # ITS OWN time (LowerCorner icomp==0 ? 0 : dt)
                from ..ops.deposit import deposit_rho

                w_eff0 = jnp.where(sp.alive, sp.w, 0.0)
                rho_old_pad = deposit_rho(
                    sp.positions(ndim), w_eff0, q_eff, geom, order,
                    out=rho_old_pad, origin=origin, wrap=False, offset=ng,
                    out_shape=big_shape,
                )
                w_eff1 = jnp.where(sp_new.alive, sp_new.w, 0.0)
                rho_new_pad = deposit_rho(
                    sp_new.positions(ndim), w_eff1, q_eff, geom, order,
                    out=rho_new_pad,
                    origin=gal_origin_at(origin_of(state), state, 1.0),
                    wrap=False, offset=ng,
                    out_shape=big_shape,
                )
            if not sp_cfg.do_not_deposit and not is_es:
                w_eff = jnp.where(sp.alive, sp_new.w, 0.0)
                if has_mr and not is_laser[sp_cfg.name]:
                    # deposition buffer split: deep-patch particles deposit
                    # on the fine grid, the rest (incl. the buffer ring) on
                    # level 0 (PartitionParticlesInBuffers)
                    mask_d = _mr_mask(state, new_pos, mrl.dep_buf)
                    w_fine = jnp.where(mask_d, w_eff, 0.0)
                    w_eff = jnp.where(mask_d, 0.0, w_eff)
                    jf_sp = deposit_current_esirkepov(
                        new_pos, ux, uy, uz, w_fine, q_eff,
                        mrl.geom_f_ext, dt, order,
                        origin=_mr_origin_f(state), wrap=False,
                        out_shape=mrl.n_fext,
                        chunk_size=cfg.deposit_chunk_size,
                    )
                    mr_jf = tuple(
                        a + b for a, b in zip(mr_jf, jf_sp)
                    )
                origin_j = gal_origin_at(origin_of(state), state, 0.5)
                if cfg.current_deposition == "esirkepov":
                    jx, jy, jz = deposit_current_esirkepov(
                        new_pos, ux, uy, uz, w_eff, q_eff, geom, dt, order,
                        origin=origin_j, wrap=False, offset=ng,
                        out_shape=big_shape,
                        chunk_size=cfg.deposit_chunk_size,
                    )
                else:
                    jx, jy, jz = deposit_current_direct(
                        new_pos, ux, uy, uz, w_eff, q_eff, geom,
                        staggering, dt, order,
                        origin=origin_j, wrap=False, offset=ng,
                        out_shape=big_shape,
                    )
                j_total = (
                    (jx, jy, jz)
                    if j_total is None
                    else tuple(a + b for a, b in zip(j_total, (jx, jy, jz)))
                )

            wrapped = []
            for d in range(ndim):
                p = sp_new.positions(ndim)[d]
                if pbc_lo[d] == "periodic":
                    lo_g, hi_g = geom.prob_lo[d], geom.prob_hi[d]
                    p = lo_g + jnp.mod(p - lo_g, hi_g - lo_g)
                wrapped.append(p)
            new_species[sp_cfg.name] = sp_new.with_positions(ndim, wrapped)

        if is_es:
            # electrostatic: no deposition / field advance inside the step;
            # the field solve happens after particle boundaries
            # (WarpXEvolve.cpp:269-283)
            return state.replace(
                species=new_species,
                step=state.step + 1,
                time=state.time + dt,
                aux={**state.aux, **aux_updates} if aux_updates
                else state.aux,
            )

        if has_mr:
            # SyncCurrent: average-down the fine J and add it into level-0
            # over the (index-static) patch box; big-frame index = domain
            # cell + ext_lo + ng (the deposition block's kbase convention)
            jcp = tuple(
                coarsen_field(a, staggering[nm], mrl)
                for a, nm in zip(mr_jf, _mr_jnames)
            )
            if j_total is None:
                j_total = tuple(
                    jnp.zeros(big_shape, state.fields.Ex.dtype)
                    for _ in range(3)
                )
            j0s = []
            for a, b, nm in zip(j_total, jcp, _mr_jnames):
                dst, src = mrl.patch_slices(staggering[nm], "c")
                dst = tuple(
                    slice(s.start + ext_lo[d] + ng, s.stop + ext_lo[d] + ng)
                    for d, s in enumerate(dst)
                )
                j0s.append(a.at[dst].add(b[src]))
            j_total = tuple(j0s)

            jf_adv = mr_jf
            if cfg.use_filter:
                from ..solvers.filter import bilinear_filter

                npass = cfg.filter_npass_each_dir or (1,) * ndim
                jf_adv = tuple(bilinear_filter(a, npass) for a in jf_adv)
            parts_f = _mr_adv(
                _mr_patch_parts(state.aux, "f"), jf_adv, True
            )
            parts_c = _mr_adv(
                _mr_patch_parts(state.aux, "c"),
                tuple(
                    bilinear_filter(a, npass) for a in jcp
                ) if cfg.use_filter else jcp,
                False,
            )
            for k, v in parts_f.items():
                aux_updates[f"mr:f:{k}"] = v
            for k, v in parts_c.items():
                aux_updates[f"mr:c:{k}"] = v
            for nm, arr in zip(_mr_jnames, jf_adv):
                aux_updates[f"mr:j:{nm}"] = arr

        return _field_tail(
            state, new_species, j_total, rho_old_pad, rho_new_pad,
            aux_updates,
        )

    # ------------------------------------------------------ shared field tail
    def _field_tail(state, new_species, j_total, rho_old_pad, rho_new_pad,
                    aux_updates):
        """J filter/fold + rho handling + field advance + PML/boundary
        machinery shared by the slow step and the tile-binned fast step
        (both produce guard-padded J blocks in the same big_shape frame)."""
        if psum_axis is not None:
            # particle-decomposition seam (SyncCurrent analog over the
            # particle shards): reduce per-shard partial sources so the
            # replicated field advance sees the global deposit
            if j_total is not None:
                j_total = jax.lax.psum(j_total, psum_axis)
            if rho_old_pad is not None:
                rho_old_pad = jax.lax.psum(rho_old_pad, psum_axis)
            if rho_new_pad is not None:
                rho_new_pad = jax.lax.psum(rho_new_pad, psum_axis)
        if j_total is None:
            j_valid = tuple(
                jnp.zeros(shapes[nm], dtype) for nm in ("jx", "jy", "jz")
            )
        else:
            if cfg.use_filter:
                npass = cfg.filter_npass_each_dir or (1,) * ndim
                j_total = tuple(
                    bilinear_filter_padded(a, npass) for a in j_total
                )
            j_valid = tuple(
                fold_and_crop(a, name)
                for a, name in zip(j_total, ("jx", "jy", "jz"))
            )

        fields = state.fields.replace(
            jx=j_valid[0], jy=j_valid[1], jz=j_valid[2]
        )

        rho_old = rho_new = None
        if cfg.do_dive_cleaning or (is_psatd and psatd_need_rho):
            if rho_old_pad is None:
                rho_old = rho_new = jnp.zeros(shapes["rho"], dtype)
            else:
                if cfg.use_filter:
                    npass = cfg.filter_npass_each_dir or (1,) * ndim
                    rho_old_pad = bilinear_filter_padded(rho_old_pad, npass)
                    rho_new_pad = bilinear_filter_padded(rho_new_pad, npass)
                rho_old = fold_and_crop(rho_old_pad, "rho")
                rho_new = fold_and_crop(rho_new_pad, "rho")

        if is_psatd:
            # --- spectral field advance on the extended (damp/PML-zone) box:
            # periodic FFT over the stored arrays (finite-order stencils keep
            # the update local so the damped zones isolate the wrap-around),
            # then sin^2 damping of the outer half of each damped zone
            # (PushPSATD + DampFieldsInGuards)
            f = fields
            crop_names = ["Ex", "Ey", "Ez", "Bx", "By", "Bz",
                          "jx", "jy", "jz"]
            if cfg.do_dive_cleaning:
                crop_names.append("F")
            if cfg.do_divb_cleaning:
                crop_names.append("G")
            fs_ext = f.replace(
                **{nm: crop_to_ext(getattr(f, nm)) for nm in crop_names}
            )
            rho_pair = None
            if psatd_need_rho:
                rho_pair = (crop_to_ext(rho_old), crop_to_ext(rho_new))
            aux = dict(state.aux)
            aux.update(aux_updates)
            new_splits = None
            if psatd_pml is not None:
                # feed the interior splits from the t^n fields: first split
                # component := regular field, others := 0 (PML::Exchange,
                # PML.cpp:1180-1196); strip values keep their history
                splits = {}
                for nm in pml_comps:
                    reg = getattr(fs_ext, nm) if nm in crop_names else None
                    m = pml_mask_ext[nm]
                    for i, ax in enumerate(psatd_pml.split_dirs(nm)):
                        cur = aux[f"pml:{nm}:{ax}"]
                        if i == 0 and reg is not None:
                            splits[(nm, ax)] = jnp.where(m > 0, cur, reg)
                        else:
                            splits[(nm, ax)] = cur * m
                new_splits = psatd_pml.push(splits)
            out = psatd_b.push(fs_ext, rho_pair)
            if new_splits is not None:
                # DampPML (per-split damping along its own direction) and
                # Exchange back: the strips take the split totals
                tot = {}
                for (nm, ax), arr in new_splits.items():
                    dmp = pml_damp.get((nm, ax))
                    if dmp is not None:
                        arr = arr * dmp
                    aux[f"pml:{nm}:{ax}"] = arr
                    tot[nm] = arr if nm not in tot else tot[nm] + arr
                merged = {}
                for nm in pml_comps:
                    if nm in ("F", "G") and getattr(out, nm) is None:
                        continue
                    merged[nm] = jnp.where(
                        pml_mask_ext[nm] > 0, tot[nm], getattr(out, nm)
                    )
                out = out.replace(**merged)
            upd_psatd = {}
            for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
                arr = getattr(out, nm) * damp_profile
                upd_psatd[nm] = restore_shape(arr, nm)
            for nm in ("F", "G"):
                if nm in crop_names:
                    upd_psatd[nm] = restore_shape(getattr(out, nm), nm)
            for nm in ("Ex_avg", "Ey_avg", "Ez_avg",
                       "Bx_avg", "By_avg", "Bz_avg"):
                arr = getattr(out, nm)
                if arr is not None:
                    upd_psatd[nm] = restore_shape(arr, nm[:2])
            fields = fields.replace(**upd_psatd)
            return state.replace(
                fields=fields,
                species=new_species,
                step=state.step + 1,
                time=state.time + dt,
                aux=aux,
            )

        # --- field advance: B half, E full, B half; PML strips evolve the
        # Berenger split fields (EvolveBPML.cpp/EvolveEPML.cpp: each split
        # part integrates one curl term of the TOTAL fields) and are damped
        # once per step (DampPML); the totals in the strips are the split
        # sums, realizing the reference's domain<->PML Exchange via shared
        # storage.
        aux = dict(state.aux)
        aux.update(aux_updates)

        def advance(fields, out_names, terms_map, in_names, coef, dth,
                    with_j=False, extra=None, source=None):
            """Advance out comps by dth*coef*(their curl/div terms).

            extra: additional terms per comp (grad F / grad G feedback) —
            in the PML these become their own Berenger split components.
            source: per-comp array added as dth*source (the -rho/eps0 of
            EvolveF), applied to the regular region only.
            """
            pad_names = set(in_names)
            if extra:
                for ts in extra.values():
                    pad_names.update(t[1] for t in ts)
            pads = {nm: pad_eb(getattr(fields, nm), nm) for nm in pad_names}
            jmap = dict(zip(("Ex", "Ey", "Ez"), ("jx", "jy", "jz")))
            upd = {}
            for nm in out_names:
                terms = list(terms_map[nm]) + list((extra or {}).get(nm, []))
                reg = getattr(fields, nm) + dth * curl_terms(
                    nm, terms, pads, coef
                )
                if with_j:
                    reg = reg - dth * _c2 * _mu0 * getattr(fields, jmap[nm])
                if source and nm in source:
                    reg = reg + dth * source[nm]
                if has_pml:
                    tot = jnp.zeros(shapes[nm], dtype)
                    for term in terms:
                        if term[2] not in axes:
                            continue
                        key = f"pml:{nm}:{term[2]}"
                        split = pml_mask[nm] * (
                            aux[key] + dth * curl_term(nm, term, pads, coef)
                        )
                        aux[key] = split
                        tot = tot + split
                    upd[nm] = jnp.where(pml_mask[nm] > 0, tot, reg)
                else:
                    upd[nm] = reg
                if any_sm and nm in sm_mask:
                    # Silver-Mueller guard cells never evolve via curls
                    upd[nm] = jnp.where(
                        sm_mask[nm], getattr(fields, nm), upd[nm]
                    )
                if has_eb and nm in eb_mask:
                    # covered components frozen (staircase EB)
                    upd[nm] = jnp.where(
                        eb_mask[nm], upd[nm], getattr(fields, nm)
                    )
            return fields.replace(**upd)

        dive = cfg.do_dive_cleaning
        divb = cfg.do_divb_cleaning
        e_comps = ("Ex", "Ey", "Ez")
        b_comps = ("Bx", "By", "Bz")

        def advance_b(fields, dth):
            """Faraday half step: ECT conformal faces when enabled
            (EvolveBCartesianECT), standard curls otherwise; in 2D XZ only
            By is conformal and the in-plane Bx/Bz keep the staircase
            path."""
            if not is_ect:
                return advance(
                    fields, b_comps, _B_TERMS, e_comps, 1.0, dth,
                    extra=_GRADG_TERMS if divb else None,
                )
            B3 = ect_evolve_b(
                fields.Ex, fields.Ey, fields.Ez,
                (fields.Bx, fields.By, fields.Bz), dth,
            )
            if ndim == 2:
                f2 = advance(fields, ("Bx", "Bz"), _B_TERMS, e_comps,
                             1.0, dth)
                return fields.replace(Bx=f2.Bx, By=B3[1], Bz=f2.Bz)
            return fields.replace(Bx=B3[0], By=B3[1], Bz=B3[2])
        if dive:
            fields = advance(
                fields, ("F",), _F_TERMS, e_comps, 1.0, 0.5 * dt,
                source={"F": -rho_old / _ep0},
            )
        if divb:
            fields = advance(fields, ("G",), _G_TERMS, b_comps, _c2, 0.5 * dt)
        fields = advance_b(fields, 0.5 * dt)
        if any_sm:
            fields = apply_silver_mueller(fields)
        fields = advance(
            fields, e_comps, _E_TERMS, b_comps, _c2, dt, with_j=True,
            extra=_GRADF_TERMS if dive else None,
        )
        if dive:
            fields = advance(
                fields, ("F",), _F_TERMS, e_comps, 1.0, 0.5 * dt,
                source={"F": -rho_new / _ep0},
            )
        if divb:
            fields = advance(fields, ("G",), _G_TERMS, b_comps, _c2, 0.5 * dt)
        fields = advance_b(fields, 0.5 * dt)

        if has_pml:
            # DampPML: damp each split along its own direction, refresh totals
            # (split keys in aux are static; group them by component)
            split_dirs: Dict[str, list] = {}
            for key in aux:
                if key.startswith("pml:"):
                    _, nm, ax = key.split(":")
                    split_dirs.setdefault(nm, []).append(ax)
            upd = {}
            for nm, dirs in split_dirs.items():
                tot = jnp.zeros(shapes[nm], dtype)
                for ax in sorted(dirs):
                    key = f"pml:{nm}:{ax}"
                    dd = axes.index(ax)
                    aux[key] = aux[key] * damp_factor(nm, dd)
                    tot = tot + aux[key]
                upd[nm] = jnp.where(
                    pml_mask[nm] > 0, tot, getattr(fields, nm)
                )
            fields = fields.replace(**upd)

        fields = enforce_walls(fields)

        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
            aux=aux,
        )

    # ----------------------------------------------------------- step_window
    max_shift = (
        int(math.ceil(
            abs(cfg.moving_window_v * _c
                - (v_gal_act[wdir] if is_galilean else 0.0))
            * dt / dxs[wdir]
        )) + 1
        if cfg.do_moving_window
        else 0
    )

    def shift_field(arr, num_shift):
        n_val = arr.shape[wdir]
        rolled = jnp.roll(arr, -num_shift, axis=wdir)
        idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, wdir)
        return jnp.where(idx >= n_val - num_shift, 0.0, rolled)

    def continuous_injection(state, sp_cfg, sp, phys_lo, new_hi):
        """Inject plasma into newly uncovered whole cells at the window top
        (WarpXMovingWindow.cpp:395-440 + AddPlasma layout)."""
        key = f"inject_pos:{sp_cfg.name}"
        cur_pos = state.aux[key]
        dz = dxs[wdir]
        # (new_hi - cur_pos) is a whole number of cells for an at-rest
        # plasma (both move in dz quanta) — nudge the floor so float
        # accumulation error can't drop the newest column for a step
        new_pos = cur_pos + jnp.floor(
            (new_hi[wdir] - cur_pos) / dz + 1e-9
        ) * dz

        # injected band size: with the tile-binned step, injection is
        # batched to pre-rebin steps (the window edge outruns anything
        # physical, so an `interval`-step batch is physically safe), so the
        # band must cover a whole interval's worth of window motion
        K = max(
            max_shift * (2 if tile_spec is None else tile_spec.interval + 2),
            4,
        )
        from .injection import _regular_unit_positions

        unit = _regular_unit_positions(
            sp_cfg.num_particles_per_cell_each_dim, ndim
        )
        ppc_tot = unit.shape[0]
        if ndim == 1:
            unit_active = unit[:, [2]]
        elif ndim == 2:
            unit_active = unit[:, [0, 2]]
        else:
            unit_active = unit

        grids = []
        for d in range(ndim):
            if d == wdir:
                cell_idx = jnp.arange(n_cell[wdir] - K, n_cell[wdir])
                grids.append(phys_lo[wdir] + cell_idx.astype(dtype) * dz)
            else:
                grids.append(
                    geom.prob_lo[d]
                    + jnp.arange(n_cell[d]).astype(dtype) * dxs[d]
                )
        mesh = jnp.meshgrid(*grids, indexing="ij")
        cell_lo = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
        npart = cell_lo.shape[0] * ppc_tot
        pos = (
            cell_lo[:, None, :]
            + jnp.asarray(unit_active, dtype) * jnp.asarray(dxs, dtype)
        ).reshape(npart, ndim)
        scale_vec = jnp.full(npart, geom.cell_volume / ppc_tot, dtype)
        refine = (
            has_mr and cfg.refine_plasma and sp_cfg.do_continuous_injection
        )
        if refine:
            # warpx.refine_plasma (findRefinedInjectionBox,
            # PhysicalParticleContainer.cpp:3260): cells whose TRANSVERSE
            # coarse index falls in the refined box's footprint (the box
            # extends to +/- infinity along the window direction) inject on
            # the FINE lattice instead — r-times more streams at 1/prod(r)
            # the weight
            def _in_footprint(p):
                m = jnp.ones(p.shape[0], bool)
                for d in range(ndim):
                    if d == wdir:
                        continue
                    ci = jnp.floor(
                        (p[:, d] - geom.prob_lo[d]) / dxs[d]
                    ).astype(jnp.int32)
                    m &= (ci >= mrl.i0[d]) & (ci < mrl.i1[d])
                return m

            rv = mrl.rv
            R = int(np.prod(rv))
            dxf_vec = jnp.asarray(
                [dxs[d] / rv[d] for d in range(ndim)], dtype
            )
            subs = jnp.meshgrid(
                *[
                    jnp.arange(rv[d]).astype(dtype) * (dxs[d] / rv[d])
                    for d in range(ndim)
                ],
                indexing="ij",
            )
            sub = jnp.stack([s.reshape(-1) for s in subs], axis=-1)
            pos_f = (
                cell_lo[:, None, None, :]
                + sub[None, :, None, :]
                + jnp.asarray(unit_active, dtype) * dxf_vec
            ).reshape(-1, ndim)
            n_f = pos_f.shape[0]
            in_c = _in_footprint(pos)
            in_f = _in_footprint(pos_f)
            scale_vec = jnp.concatenate([
                jnp.where(in_c, 0.0, scale_vec),
                jnp.where(
                    in_f, geom.cell_volume / (R * ppc_tot), 0.0
                ).astype(dtype),
            ])
            pos = jnp.concatenate([pos, pos_f], axis=0)
            npart = npart + n_f

        pz = pos[:, wdir]
        sel = (pz > cur_pos) & (pz < new_pos)
        if psum_axis is not None:
            # particle decomposition: each candidate lands on exactly one
            # shard; round-robin by rank WITHIN the selected set (sel is
            # replicated here) so every injection batch spreads evenly over
            # the shards regardless of the candidate grid's ordering —
            # raw-index round-robin can alias with the band stride and
            # pile whole rows onto one shard until its free slots run out
            n_sh = jax.lax.psum(1, psum_axis)
            me = jax.lax.axis_index(psum_axis)
            sel &= ((jnp.cumsum(sel) - 1) % n_sh) == me

        xyz = [jnp.zeros(npart, dtype) for _ in range(3)]
        if ndim == 1:
            xyz[2] = pos[:, 0]
        elif ndim == 2:
            xyz[0], xyz[2] = pos[:, 0], pos[:, 1]
        else:
            xyz = [pos[:, 0], pos[:, 1], pos[:, 2]]

        # boosted frame: profiles/bounds are lab quantities at t_lab=0 —
        # ballistic correction z -> z0_lab at the (traced) boosted time
        # (PhysicalParticleContainer.cpp applyBallisticCorrection)
        gb = cfg.gamma_boost
        if gb > 1.0:
            from .injection import _bulk_momentum

            bb = math.sqrt(1.0 - 1.0 / gb**2)
            import numpy as _np_

            ub = _bulk_momentum(sp_cfg)
            betaz_bulk = float(ub[2] / _np_.sqrt(1.0 + ub @ ub))
            xyz[2] = gb * (
                xyz[2] * (1.0 - bb * betaz_bulk)
                - _c * state.time * (betaz_bulk - bb)
            )

        axes3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        for d in range(ndim):
            if sp_cfg.bounds_lo:
                coord = xyz[axes3[d]]
                sel &= (coord >= sp_cfg.bounds_lo[d]) & (
                    coord <= sp_cfg.bounds_hi[d]
                )

        if sp_cfg.profile == "constant":
            dens = jnp.full(npart, sp_cfg.density, dtype)
        else:
            fn = compile_expression(
                sp_cfg.density_expr, ["x", "y", "z"],
                dict(sp_cfg.user_constants),
            )
            dens = jnp.asarray(fn(*xyz), dtype)
        w_new = jnp.where(sel, dens * scale_vec, 0.0)
        sel &= w_new > 0

        if sp_cfg.momentum_distribution in ("at_rest", "none"):
            u_new = [jnp.zeros(npart, dtype) for _ in range(3)]
        elif sp_cfg.momentum_distribution == "constant":
            u_new = [
                jnp.full(npart, v * _c, dtype)
                for v in (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)
            ]
        elif sp_cfg.momentum_distribution == "parse_momentum_function":
            fns = [
                compile_expression(
                    e, ["x", "y", "z"], dict(sp_cfg.user_constants)
                )
                for e in sp_cfg.momentum_exprs
            ]
            u_new = [jnp.asarray(f(*xyz), dtype) * _c for f in fns]
        elif sp_cfg.momentum_distribution == "gaussian":
            key_inj = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step),
                abs(hash(sp_cfg.name)) % (2**31),
            )
            ks = jax.random.split(key_inj, 3)
            means = (sp_cfg.ux, sp_cfg.uy, sp_cfg.uz)
            ths = (sp_cfg.ux_th or 0.0, sp_cfg.uy_th or 0.0,
                   sp_cfg.uz_th or 0.0)
            u_new = [
                (mu + th * jax.random.normal(k, (npart,), dtype)) * _c
                for mu, th, k in zip(means, ths, ks)
            ]
        else:
            raise NotImplementedError(
                f"continuous injection with {sp_cfg.momentum_distribution}"
            )

        if gb > 1.0:
            # lab -> boosted momenta and flux factor (AddPlasma:1243-1246)
            bb = math.sqrt(1.0 - 1.0 / gb**2)
            gam_lab = jnp.sqrt(
                1.0
                + (u_new[0] ** 2 + u_new[1] ** 2 + u_new[2] ** 2) / (_c * _c)
            )
            betaz_lab = u_new[2] / (gam_lab * _c)
            w_new = w_new * gb * (1.0 - bb * betaz_lab)
            u_new[2] = gb * (u_new[2] - bb * gam_lab * _c)
            sel &= w_new > 0

        extra_new = {}
        for (aname, fn, is_int) in attr_fns[sp_cfg.name]:
            val = fn(*xyz, u_new[0], u_new[1], u_new[2], state.time)
            extra_new[aname] = (
                jnp.round(val).astype(jnp.int32) if is_int else val.astype(dtype)
            )

        cap = sp.capacity
        free_idx = jnp.nonzero(~sp.alive, size=npart, fill_value=cap)[0]
        # compact: the j-th SELECTED candidate takes the j-th free slot —
        # pairing by raw candidate index would burn one free slot per
        # unselected candidate (and under particle decomposition each shard
        # selects only 1/n of the band, so it would need n x the free slots
        # it actually fills)
        rank = jnp.cumsum(sel) - 1
        slot = free_idx[jnp.clip(rank, 0, npart - 1)]
        placeable = sel & (slot < cap)
        tgt = jnp.where(placeable, slot, cap)

        def put(arr, vals):
            return arr.at[tgt].set(jnp.asarray(vals, arr.dtype), mode="drop")

        sp = sp.replace(
            w=put(sp.w, w_new),
            ux=put(sp.ux, u_new[0]),
            uy=put(sp.uy, u_new[1]),
            uz=put(sp.uz, u_new[2]),
            alive=sp.alive.at[tgt].set(True, mode="drop"),
        )
        new_pos_arrays = list(sp.positions(ndim))
        for d in range(ndim):
            new_pos_arrays[d] = put(new_pos_arrays[d], pos[:, d])
        sp = sp.with_positions(ndim, new_pos_arrays)
        if extra_new:
            extra = dict(sp.extra)
            for aname, vals in extra_new.items():
                extra[aname] = put(extra[aname], vals)
            sp = sp.replace(extra=extra)
        aux = dict(state.aux)
        aux[key] = new_pos
        return state.replace(aux=aux), sp

    def step_window(state: SimState, move_j) -> SimState:
        if cfg.do_moving_window:
            aux = dict(state.aux)
            # the injection front rides with the plasma bulk velocity
            # (boost-transformed), so the injected band covers ALL newly
            # exposed grid cells (UpdateInjectionPosition,
            # WarpXMovingWindow.cpp:61-134)
            for sp_cfg in cfg.species:
                if not sp_cfg.do_continuous_injection or is_laser[sp_cfg.name]:
                    continue
                from .injection import _bulk_momentum

                ub = _bulk_momentum(sp_cfg)
                u_d = float(ub[{1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim][wdir]])
                v_shift = _c * u_d / math.sqrt(1.0 + u_d * u_d)
                if cfg.gamma_boost > 1.0:
                    bb = math.sqrt(1.0 - 1.0 / cfg.gamma_boost**2)
                    v_shift = (v_shift - _c * bb) / (
                        1.0 - v_shift * bb / _c
                    )
                key_ip = f"inject_pos:{sp_cfg.name}"
                aux[key_ip] = aux[key_ip] + v_shift * dt
            v = cfg.moving_window_v * _c
            window_x = aux["window_x"] + v * dt
            dz = dxs[wdir]
            # with Galilean PSATD the grid itself drifts at v_gal: the array
            # shift count is the window motion RELATIVE to the drifting grid
            # (WarpXMovingWindow.cpp:171 uses the galilean-shifted
            # current_lo); state.time is already t^{n+1} here
            gal_off = (
                v_gal_act[wdir] * state.time if is_galilean else 0.0
            )
            num_shift = jnp.floor(
                (window_x - (aux["window_lo"] + gal_off)) / dz
            ).astype(jnp.int32)
            num_shift = jnp.clip(num_shift, 0, max_shift)
            aux["window_x"] = window_x
            aux["window_offset"] = state.aux["window_offset"] + num_shift
            shift_len = num_shift.astype(dtype) * dz
            aux["window_lo"] = state.aux["window_lo"] + shift_len
            aux["window_hi"] = state.aux["window_hi"] + shift_len

            f = state.fields
            shift_names = ["Ex", "Ey", "Ez", "Bx", "By", "Bz"]
            if f.F is not None:
                shift_names.append("F")
            if f.G is not None:
                shift_names.append("G")
            if f.Ex_avg is not None:
                shift_names += ["Ex_avg", "Ey_avg", "Ez_avg",
                                "Bx_avg", "By_avg", "Bz_avg"]
            upd = {
                name: shift_field(getattr(f, name), num_shift)
                for name in shift_names
            }
            for key in list(aux):
                if key.startswith("pml:"):
                    aux[key] = shift_field(aux[key], num_shift)
                elif key.startswith(("mr:f:", "mr:j:")):
                    # the refined box is index-fixed: fine patch data
                    # shifts by ref_ratio fine cells per coarse cell
                    # (shiftMF on every level, WarpXMovingWindow.cpp:479)
                    aux[key] = shift_field(
                        aux[key], num_shift * mrl.rv[wdir]
                    )
                elif key.startswith("mr:c:"):
                    aux[key] = shift_field(aux[key], num_shift)
            jx, jy, jz = jax.lax.cond(
                move_j,
                lambda js: tuple(shift_field(a, num_shift) for a in js),
                lambda js: js,
                (f.jx, f.jy, f.jz),
            )
            upd.update(jx=jx, jy=jy, jz=jz)
            state = state.replace(fields=f.replace(**upd), aux=aux)
            new_phys_lo = phys_lo_of(state)
            new_hi = domain_hi_of(state)

            new_species = dict(state.species)
            for sp_cfg in cfg.species:
                if not sp_cfg.do_continuous_injection or is_laser[sp_cfg.name]:
                    continue
                if tile_spec is None:
                    state, sp = continuous_injection(
                        state, sp_cfg, new_species[sp_cfg.name],
                        new_phys_lo, new_hi
                    )
                else:
                    # binned mode: new particles land in arbitrary dead
                    # slots, which only the rebin can re-sort — inject only
                    # when the NEXT step_main rebins (state.step is already
                    # t^{n+1} here; rebin fires on step % interval == 0)
                    due = (state.step % tile_spec.interval) == 0

                    def _inj(op, sp_cfg=sp_cfg):
                        st, s = op
                        return continuous_injection(
                            st, sp_cfg, s, new_phys_lo, new_hi
                        )

                    state, sp = jax.lax.cond(
                        due, _inj, lambda op: op,
                        (state, new_species[sp_cfg.name]),
                    )
                new_species[sp_cfg.name] = sp
            state = state.replace(species=new_species)

        origin = phys_lo_of(state)
        hi = domain_hi_of(state)
        new_species = {}
        scrape_aux = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            alive = sp.alive
            pos = sp.positions(ndim)
            # boundary scraping buffer: record absorbed particles per face
            # (ParticleBoundaryBuffer; <sp>.save_particles_at_*)
            for face in sp_cfg.save_particles_at:
                if face == "eb":
                    if not has_eb:
                        continue
                    coords3 = [jnp.zeros_like(pos[0])] * 3
                    _a3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
                    for dd in range(ndim):
                        coords3[_a3[dd]] = pos[dd]
                    crossed = alive & (_eb_fn(*coords3) > 0.0)
                elif face[0] not in axes:
                    continue
                else:
                    d = axes.index(face[0])
                    is_lo = face.endswith("lo")
                    if (pbc_lo[d] if is_lo else pbc_hi[d]) != "absorbing":
                        continue
                    crossed = alive & (
                        pos[d] < origin[d] if is_lo else pos[d] > hi[d]
                    )
                pref = f"scrape:{sp_cfg.name}:{face}"
                n0 = state.aux[f"{pref}:n"]
                buf_cap = state.aux[f"{pref}:w"].shape[0]
                order = jnp.cumsum(crossed) - 1
                tgt = jnp.where(
                    crossed, n0 + order, buf_cap
                ).astype(jnp.int32)
                recs = [("w", sp.w), ("ux", sp.ux), ("uy", sp.uy),
                        ("uz", sp.uz)]
                recs += [(f"p{dd}", pos[dd]) for dd in range(ndim)]
                recs.append((
                    "step",
                    jnp.full(sp.capacity, 0, jnp.int32) + state.step,
                ))
                for fld, arr in recs:
                    key = f"{pref}:{fld}"
                    base = scrape_aux.get(key, state.aux[key])
                    scrape_aux[key] = base.at[tgt].set(
                        arr.astype(base.dtype), mode="drop"
                    )
                scrape_aux[f"{pref}:n"] = n0 + jnp.sum(
                    crossed, dtype=n0.dtype
                )
            for d in range(ndim):
                if pbc_lo[d] == "absorbing":
                    alive = alive & (pos[d] >= origin[d])
                if pbc_hi[d] == "absorbing":
                    alive = alive & (pos[d] <= hi[d])
            if has_eb:
                # scrape particles inside the EB body
                # (EmbeddedBoundary/ParticleScraper.H)
                coords3 = [jnp.zeros_like(pos[0])] * 3
                _a3 = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
                for dd in range(ndim):
                    coords3[_a3[dd]] = pos[dd]
                alive = alive & ~(_eb_fn(*coords3) > 0.0)
            upd_pos = list(pos)
            u = {"x": sp.ux, "y": sp.uy, "z": sp.uz}
            rng_loc = state.rng

            def thermalize(ref, d, side_sign):
                """Thermal wall re-emission (ParticleBoundaries_K.H:82-90):
                tangential u ~ c*N(0,uth); normal u ~ c*fluxGaussian(0,uth)
                directed into the domain."""
                nonlocal rng_loc, u
                from .flux_injection import sample_gaussian_flux

                uth = sp_cfg.boundary_u_th
                if uth <= 0.0:
                    for ax2 in ("x", "y", "z"):
                        u[ax2] = jnp.where(ref, 0.0, u[ax2])
                    return
                cap_loc = sp.capacity
                rng_loc, k1, k2, k3 = jax.random.split(rng_loc, 4)
                ax_n = axes[d]
                un = sample_gaussian_flux(
                    _shard_key(k1), cap_loc, 0.0, uth, dtype
                ) * _c
                u[ax_n] = jnp.where(ref, side_sign * un, u[ax_n])
                ks = [k2, k3]
                for ax2 in ("x", "y", "z"):
                    if ax2 == ax_n:
                        continue
                    kk = ks.pop()
                    u[ax2] = jnp.where(
                        ref,
                        uth * _c * jax.random.normal(
                            _shard_key(kk), (cap_loc,), dtype
                        ),
                        u[ax2],
                    )

            for d in range(ndim):
                ax = axes[d]
                if pbc_lo[d] in ("reflecting", "thermal"):
                    ref = upd_pos[d] < origin[d]
                    upd_pos[d] = jnp.where(
                        ref, 2 * origin[d] - upd_pos[d], upd_pos[d]
                    )
                    if pbc_lo[d] == "thermal":
                        thermalize(ref, d, +1.0)
                    else:
                        u[ax] = jnp.where(ref, -u[ax], u[ax])
                if pbc_hi[d] in ("reflecting", "thermal"):
                    ref = upd_pos[d] > hi[d]
                    upd_pos[d] = jnp.where(
                        ref, 2 * hi[d] - upd_pos[d], upd_pos[d]
                    )
                    if pbc_hi[d] == "thermal":
                        thermalize(ref, d, -1.0)
                    else:
                        u[ax] = jnp.where(ref, -u[ax], u[ax])
            state = state.replace(rng=rng_loc)
            sp = sp.replace(alive=alive, ux=u["x"], uy=u["y"], uz=u["z"])
            sp = sp.with_positions(ndim, upd_pos)
            new_species[sp_cfg.name] = sp
        return state.replace(
            species=new_species,
            aux={**state.aux, **scrape_aux} if scrape_aux else state.aux,
        )

    # ------------------------------------------------------------- half push
    def half_push(state: SimState, dt_half) -> SimState:
        origin = gal_origin_at(origin_of(state), state, 0.0)
        farr_pad = {
            name: pad_eb(getattr(state.fields, name), name)
            for name in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
        }
        gather_stag = staggering
        if mc_gather:
            farr_pad = mc_aux_pads(farr_pad)
            gather_stag = nodal_stag
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if (sp_cfg.do_not_push or sp.capacity == 0
                    or is_laser[sp_cfg.name]
                    or sp_cfg.species_type == "photon"
                    or sp_cfg.mass == 0.0):
                new_species[sp_cfg.name] = sp
                continue
            pos = sp.positions(ndim)
            if tile_spec is not None:
                # binned layouts leave positions unwrapped between rebins so
                # window coordinates stay continuous; wrap the GATHER
                # coordinate on periodic dims (state positions untouched)
                pos = list(pos)
                for d in range(ndim):
                    if pbc_lo[d] == "periodic":
                        lo_g, hi_g = geom.prob_lo[d], geom.prob_hi[d]
                        pos[d] = lo_g + jnp.mod(pos[d] - lo_g, hi_g - lo_g)
                pos = tuple(pos)
            from .step import _add_ext

            e6 = gather_eb(
                pos, farr_pad, gather_stag, geom, order,
                cfg.galerkin, origin=origin, wrap=False, offset=ng,
            )
            if has_mr:
                mask_g = _mr_mask(state, pos, mrl.gather_buf)
                aux1 = compute_aux1(
                    _mr_crop0(state), state.aux, mrl, staggering
                )
                if mc_gather:
                    aux1 = _mr_to_nodal(aux1)
                e6f = gather_eb(
                    pos, aux1, gather_stag, mrl.geom_f_ext, order,
                    cfg.galerkin, origin=_mr_origin_f(state), wrap=False,
                )
                e6 = tuple(
                    jnp.where(mask_g, f, c) for f, c in zip(e6f, e6)
                )
            e6 = _add_ext(e6, cfg, pos=pos, u3=(sp.ux, sp.uy, sp.uz))
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, *e6, sp_cfg.charge, sp_cfg.mass, dt_half
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    # ------------------------------------------------------------ ES solve
    # Build per-solve groups at trace time: labframe = one solve over all
    # species with beta=0 (LabFrameExplicitES); relativistic = one solve per
    # species in its average rest frame (RelativisticExplicitES.H), beta from
    # the configured mean momentum.  warpx.poisson_solver=fft with open
    # boundaries uses the integrated-Green-function free-space solve.
    es_groups = []
    poisson_igf = False
    if is_es:
        import numpy as _np

        periodic_t = tuple(bc_lo[d] == "periodic" for d in range(ndim))
        all_open = all(
            b == "open" for b in tuple(bc_lo) + tuple(bc_hi)
        )
        poisson_igf = cfg.poisson_solver == "fft"
        if poisson_igf and not (all_open and ndim == 3):
            raise NotImplementedError(
                "poisson_solver=fft requires 3D open boundaries"
            )
        if all_open and not poisson_igf:
            raise NotImplementedError(
                "open field boundaries need warpx.poisson_solver = fft"
            )
        sp_es = [s for s in cfg.species if not s.do_not_deposit]
        relativistic = cfg.electrostatic == "relativistic"
        magnetostatic = cfg.electrostatic == "labframe-electromagnetostatic"
        if magnetostatic:
            from ..solvers.electrostatic import PoissonSolver as _PS

            ms_solver = _PS(geom, periodic_t)
        groups = [[s] for s in sp_es] if relativistic else [sp_es]
        active_xyz = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
        for grp in groups:
            beta3 = _np.zeros(3)
            if relativistic and grp and grp[0].momentum_distribution in (
                "constant", "gaussian"
            ):
                u = _np.array([grp[0].ux, grp[0].uy, grp[0].uz], float)
                beta3 = u / math.sqrt(1.0 + float(u @ u))
            beta_active = tuple(float(beta3[a]) for a in active_xyz)
            if poisson_igf:
                from ..solvers.electrostatic import igf_greens_hat

                cell_scaled = tuple(
                    dxs[d] / math.sqrt(1.0 - beta_active[d] ** 2)
                    for d in range(ndim)
                )
                g_hat = igf_greens_hat(shapes["rho"], cell_scaled)
                es_groups.append(
                    ([s.name for s in grp], beta3, beta_active, g_hat)
                )
            else:
                from ..solvers.electrostatic import PoissonSolver

                solver = PoissonSolver(
                    geom, periodic_t,
                    beta2=tuple(b * b for b in beta_active),
                )
                es_groups.append(
                    ([s.name for s in grp], beta3, beta_active, solver)
                )

    # Dirichlet boundary potentials f(t) (PoissonBoundaryHandler analog)
    bpot_fns = None
    if is_es and cfg.boundary_potentials:
        from ..utils.expression import compile_expression as _ce

        _uc = dict(cfg.user_constants or ())
        bpot_fns = []
        for d in range(ndim):
            lo_e, hi_e = cfg.boundary_potentials[d]
            bpot_fns.append((
                _ce(lo_e, ("t",), _uc) if lo_e else None,
                _ce(hi_e, ("t",), _uc) if hi_e else None,
            ))

    def solve_es(state: SimState) -> SimState:
        """ComputeSpaceChargeField (WarpXSolveFieldsES.cpp:16): deposit rho,
        Poisson solve per group, E = -(1-bb^T)grad(phi), B = -(b x grad)/c."""
        from ..diagnostics.fields import deposit_total_rho
        from ..solvers.electrostatic import (
            phi_to_b, phi_to_b_nodal, phi_to_e_beta, phi_to_e_nodal,
            solve_open_igf,
        )

        collocated = cfg.grid_type == "collocated"

        periodic = tuple(bc_lo[d] == "periodic" for d in range(ndim))
        names = {1: ["Ez"], 2: ["Ex", "Ez"], 3: ["Ex", "Ey", "Ez"]}[ndim]
        upd = {
            nm: jnp.zeros(shapes[nm], dtype)
            for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
        }
        phi_b = None
        if bpot_fns is not None:
            phi_b = jnp.zeros(shapes["rho"], dtype)
            for d, (fl, fh) in enumerate(bpot_fns):
                if periodic[d]:
                    continue
                if fl is not None:
                    sl = [slice(None)] * ndim
                    sl[d] = 0
                    phi_b = phi_b.at[tuple(sl)].set(
                        fl(state.time).astype(dtype)
                    )
                if fh is not None:
                    sl = [slice(None)] * ndim
                    sl[d] = -1
                    phi_b = phi_b.at[tuple(sl)].set(
                        fh(state.time).astype(dtype)
                    )
        phi_tot = None
        for gi, (grp_names, beta3, beta_active, backend) in enumerate(
            es_groups
        ):
            rho = deposit_total_rho(state, cfg, only=grp_names)
            if psum_axis is not None:
                rho = jax.lax.psum(rho, psum_axis)
            if poisson_igf:
                phi = solve_open_igf(rho, backend)
            else:
                # boundary potential enters one solve only (the summed E
                # must satisfy the wall BC once)
                phi = backend.solve(rho, phi_b if gi == 0 else None)
            phi_tot = phi if phi_tot is None else phi_tot + phi
            if collocated:
                e_active = phi_to_e_nodal(phi, geom, periodic, beta_active)
            else:
                e_active = phi_to_e_beta(phi, geom, periodic, beta_active)
            for nm, e in zip(names, e_active):
                upd[nm] = upd[nm] + e.astype(dtype)
            if any(b != 0.0 for b in beta3):
                b_fn = phi_to_b_nodal if collocated else phi_to_b
                b_map = b_fn(phi, geom, periodic, tuple(beta3))
                for xyz_i, arr in b_map.items():
                    if arr is not None:
                        bn = "B" + "xyz"[xyz_i]
                        upd[bn] = upd[bn] + arr.astype(dtype)

        if magnetostatic:
            # magnetostatic: solve nabla^2 A = -mu0 J (nodal), B = curl A
            # (reference: MagnetostaticSolver.cpp ComputeMagnetostaticField)
            from ..constants import c as _c_l, ep0 as _ep0_l
            from ..ops.deposit import deposit_rho
            from ..solvers.electrostatic import vector_potential_b

            mu0_ep0 = 1.0 / (_c_l * _c_l * _ep0_l) * _ep0_l  # mu0*ep0
            A3 = {}
            for xyz_i, uc in ((0, "ux"), (1, "uy"), (2, "uz")):
                Jn = jnp.zeros(shapes["rho"], dtype)
                for sp_cfg in cfg.species:
                    sp = state.species[sp_cfg.name]
                    if sp.capacity == 0 or sp_cfg.do_not_deposit:
                        continue
                    u = getattr(sp, uc)
                    gam = jnp.sqrt(
                        1.0
                        + (sp.ux**2 + sp.uy**2 + sp.uz**2) / (_c_l * _c_l)
                    )
                    w_eff = jnp.where(sp.alive, sp.w * u / gam, 0.0)
                    Jn = deposit_rho(
                        sp.positions(ndim), w_eff, sp_cfg.charge, geom,
                        cfg.particle_shape, out=Jn,
                        wrap=all(periodic_t),
                    )
                # PoissonSolver.solve returns L^-1(x/ep0); feed mu0*ep0*J
                A3[xyz_i] = ms_solver.solve(Jn * mu0_ep0)
            b_map = vector_potential_b(A3, geom, periodic_t)
            for xyz_i, arr in b_map.items():
                if arr is not None:
                    bn = "B" + "xyz"[xyz_i]
                    upd[bn] = upd[bn] + arr.astype(dtype)
        if phi_tot is not None:
            upd["phi"] = phi_tot.astype(dtype)
        return state.replace(fields=state.fields.replace(**upd))

    # --------------------------------------- tile-binned bounded fast path
    step_binned = None
    if tile_spec is not None:
        spec = tile_spec
        from ..ops.pallas_pic import binned_push_deposit
        from ..ops.tiling import fold_windows_open
        from ..ops.tiling import rebin as _tile_rebin
        from .binned_step import _FOLD_AXES

        interpret = jax.default_backend() == "cpu"
        smax = max_shift * spec.interval if cfg.do_moving_window else 0
        waxis = wdir if cfg.do_moving_window else -1
        # per-axis base of the kernel frame inside the ng-padded blocks:
        # kernel index t*tile + a on axis d reads padded index
        # kbase[d] + t*tile - off + a (minus the accumulated window shift
        # on the window axis)
        kbase = [ext_lo[d] + ng - spec.off for d in range(ndim)]
        kext = [n_cell[d] + spec.w - spec.tile[d] for d in range(ndim)]
        wrap_dims = tuple(pbc_lo[d] == "periodic" for d in range(ndim))
        stag_items = tuple(
            sorted((k, tuple(v)) for k, v in staggering.items())
        )
        nt, pmax = spec.n_tiles, spec.p_max

        def _to_kernel_frame(farr_pad):
            """Slice the guard-padded component blocks to the kernel's
            window-aligned layout (the bounded analog of pad_fields); the
            window axis keeps ``smax`` slack below so the in-kernel lane
            rotation (z0 = t*tz + smax - shift) stays in range for any
            accumulated shift in [0, smax].  Out-of-block rows zero-fill —
            they are only reachable by particles beyond the margin, which
            the violation counter flags as a hard error anyway."""
            outs = []
            for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
                a = farr_pad[nm]
                for d in range(ndim):
                    lo_i = kbase[d] - (smax if d == waxis else 0)
                    ext = kext[d] + (smax if d == waxis else 0)
                    pad_lo = max(0, -lo_i)
                    pad_hi = max(0, lo_i + ext - a.shape[d])
                    if pad_lo or pad_hi:
                        pw = [(0, 0)] * ndim
                        pw[d] = (pad_lo, pad_hi)
                        a = jnp.pad(a, pw)
                    a = jax.lax.slice_in_dim(
                        a, lo_i + pad_lo, lo_i + pad_lo + ext, axis=d
                    )
                zex = (-a.shape[ndim - 1]) % 128
                if zex:
                    pw = [(0, 0)] * (ndim - 1) + [(0, zex)]
                    a = jnp.pad(a, tuple(pw))
                outs.append(a)
            return tuple(outs)

        def _embed_folded(F, shift):
            """Add an open-folded anchor-frame J window sum (extent
            n + w - tile per dim, index p <-> anchor-frame cell p - off)
            into a zeroed big_shape guard block at the same base the gather
            frame uses; slack keeps the dynamic offset non-negative."""
            slack_lo, slack_hi = [], []
            for d in range(ndim):
                base_min = kbase[d] - (smax if d == waxis else 0)
                slack_lo.append(max(0, -base_min))
                slack_hi.append(
                    max(0, kbase[d] + F.shape[d] - big_shape[d])
                )
            padded = jnp.zeros(
                tuple(big_shape[d] + slack_lo[d] + slack_hi[d]
                      for d in range(ndim)),
                F.dtype,
            )
            starts = []
            for d in range(ndim):
                s = kbase[d] + slack_lo[d]
                if d == waxis:
                    s = s - shift
                starts.append(jnp.asarray(s, jnp.int32))
            padded = jax.lax.dynamic_update_slice(padded, F, tuple(starts))
            sl = tuple(
                slice(slack_lo[d], slack_lo[d] + big_shape[d])
                for d in range(ndim)
            )
            return padded[sl]

        def step_binned(state: SimState) -> SimState:
            f = state.fields.Ex.dtype
            do_rebin = (state.step % spec.interval) == 0
            aux_updates = {}
            if cfg.do_moving_window:
                # tiles re-anchor to the current window edge at each rebin;
                # between rebins the grid slides under them by whole cells
                anchor = jnp.where(
                    do_rebin, state.aux["window_lo"],
                    state.aux["tile_anchor"],
                )
                aux_updates["tile_anchor"] = anchor
                shift = jnp.round(
                    (state.aux["window_lo"] - anchor) / dxs[wdir]
                ).astype(jnp.int32)
            else:
                anchor = None
                shift = jnp.zeros((), jnp.int32)
            origin_t = list(geom.prob_lo)
            if cfg.do_moving_window:
                origin_t[wdir] = anchor
            anchors_vec = jnp.stack(
                [jnp.asarray(o, f) for o in origin_t]
            )

            # --- rebin (dead particles garbage-collect here: absorbed
            # slots sort to the overflow bucket and free up) --------------
            overflow = state.aux.get(
                "tile_overflow", jnp.zeros((), jnp.int32)
            )
            species = dict(state.species)
            for sp_cfg in cfg.species:
                if is_laser[sp_cfg.name] or sp_cfg.name in slow_species:
                    continue
                sp = species[sp_cfg.name]

                def _rb(s):
                    new, ovf = _tile_rebin(
                        s, geom, spec, origin=tuple(origin_t),
                        wrap_dims=wrap_dims,
                    )
                    return new, ovf.astype(jnp.int32)

                def _keep(s):
                    return s, jnp.zeros((), jnp.int32)

                sp, ovf = jax.lax.cond(do_rebin, _rb, _keep, sp)
                overflow = overflow + ovf
                species[sp_cfg.name] = sp

            # --- guard-padded fields -> kernel frame ----------------------
            farr_pad = {
                nm: pad_eb(getattr(state.fields, nm), nm)
                for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
            }
            if cfg.use_nci_corr:
                from .step import _apply_nci

                farr_pad = _apply_nci(farr_pad, cfg)
            fields6 = _to_kernel_frame(farr_pad)

            # --- fused gather+push+deposit (one launch per pusher) --------
            jw_tot = None
            violations = state.aux.get(
                "tile_violations", jnp.zeros((), jnp.int32)
            )
            new_species = {}
            groups: Dict[str, list] = {}
            for sp_cfg in cfg.species:
                if is_laser[sp_cfg.name] or sp_cfg.name in slow_species:
                    continue
                groups.setdefault(sp_cfg.pusher, []).append(sp_cfg)
            for pusher_name, sps in groups.items():
                n_pin = 7 if ndim == 3 else 6
                cols = [[] for _ in range(n_pin)]
                cnts = []
                for sp_cfg in sps:
                    sp = species[sp_cfg.name]
                    w_eff = jnp.where(sp.alive, sp.w, jnp.zeros((), f))
                    arrs = (
                        (sp.x, sp.y, sp.z, sp.ux, sp.uy, sp.uz, w_eff)
                        if ndim == 3
                        else (sp.x, sp.z, sp.ux, sp.uy, sp.uz, w_eff)
                    )
                    for ci, a in enumerate(arrs):
                        cols[ci].append(a.reshape(nt, pmax))
                    cnts.append(
                        sp.alive.reshape(nt, pmax).sum(axis=1)
                        .astype(jnp.int32)
                    )
                parts7 = tuple(
                    c[0] if len(c) == 1 else jnp.concatenate(c, axis=0)
                    for c in cols
                )
                counts = (
                    cnts[0] if len(cnts) == 1 else jnp.concatenate(cnts)
                )
                params = jnp.array(
                    [[sp_cfg.charge, sp_cfg.mass, *cfg.e_ext_particle,
                      *cfg.b_ext_particle] for sp_cfg in sps], f,
                )
                newp, jw, viol = binned_push_deposit(
                    params, fields6, parts7, anchors_vec, shift,
                    counts=counts,
                    spec=spec, geom=geom, order=order,
                    galerkin=cfg.galerkin, pusher_name=pusher_name, dt=dt,
                    stag_items=stag_items, mxu=cfg.tile_mxu, smax=smax,
                    interpret=interpret,
                )
                jw_tot = jw if jw_tot is None else tuple(
                    a + b for a, b in zip(jw_tot, jw)
                )
                violations = violations + jnp.sum(viol)
                for k, sp_cfg in enumerate(sps):
                    sp = species[sp_cfg.name]
                    sl = slice(k * nt, (k + 1) * nt)
                    flat = [a[sl].reshape(-1) for a in newp]
                    if ndim == 3:
                        new_species[sp_cfg.name] = sp.replace(
                            x=flat[0], y=flat[1], z=flat[2],
                            ux=flat[3], uy=flat[4], uz=flat[5],
                        )
                    else:
                        new_species[sp_cfg.name] = sp.replace(
                            x=flat[0], z=flat[1],
                            ux=flat[2], uy=flat[3], uz=flat[4],
                        )

            # --- open fold into the big_shape guard frame -----------------
            j_total = None
            if jw_tot is not None:
                j_total = tuple(
                    _embed_folded(
                        fold_windows_open(
                            jw_tot[i], spec, axes=_FOLD_AXES[ndim][i]
                        ),
                        shift,
                    )
                    for i in range(3)
                )

            # --- small static species ride the slow per-particle path ----
            # (compact layout, no rebin; deposit into a thin slab around
            # their mean window-axis position added into the big J frame)
            origin = origin_of(state)
            for sp_cfg in cfg.species:
                if sp_cfg.name not in slow_species:
                    continue
                sp = state.species[sp_cfg.name]
                if sp.capacity == 0:
                    new_species[sp_cfg.name] = sp
                    continue
                pos = sp.positions(ndim)
                e6 = gather_eb(
                    pos, farr_pad, staggering, geom, order,
                    cfg.galerkin, origin=origin, wrap=False, offset=ng,
                )
                from .step import _add_ext

                e6 = _add_ext(e6, cfg, pos=pos, u3=(sp.ux, sp.uy, sp.uz))
                pusher = PUSHERS[sp_cfg.pusher]
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, *e6,
                    sp_cfg.charge, sp_cfg.mass, dt,
                )
                new_pos = position_step(pos, ux, uy, uz, dt, ndim)
                sp_new = sp.replace(ux=ux, uy=uy, uz=uz).with_positions(
                    ndim, new_pos
                )
                new_species[sp_cfg.name] = sp_new
                if sp_cfg.do_not_deposit:
                    continue
                w_eff = jnp.where(sp.alive, sp_new.w, 0.0)
                wax = wdir if cfg.do_moving_window else ndim - 1
                # beams have finite extent: give them a generous slab
                # (anything outside still hard-fails via the violation
                # counter below)
                nzslab = min(128 + 2 * (order + 3), big_shape[wax])
                alive_f = sp_new.alive.astype(f)
                zc = jnp.sum(new_pos[wax] * alive_f) / jnp.maximum(
                    jnp.sum(alive_f), 1.0
                )
                idx_big = jnp.floor(
                    (zc - origin[wax]) / dxs[wax]
                ).astype(jnp.int32) + ng
                base = jnp.clip(
                    idx_big - nzslab // 2, 0, big_shape[wax] - nzslab
                )
                slab_shape = tuple(
                    nzslab if d == wax else big_shape[d]
                    for d in range(ndim)
                )
                origin_slab = list(origin)
                origin_slab[wax] = origin[wax] + base.astype(f) * dxs[wax]
                # any particle outside the slab's safe interior would be
                # silently clipped — count it as a hard violation instead
                reach = (nzslab // 2 - (order + 3)) * dxs[wax]
                out_of_slab = jnp.sum(
                    ((jnp.abs(new_pos[wax] - zc) > reach) & sp_new.alive)
                    .astype(jnp.int32)
                )
                violations = violations + out_of_slab
                jslab = deposit_current_esirkepov(
                    new_pos, ux, uy, uz, w_eff, sp_cfg.charge, geom, dt,
                    order, origin=origin_slab, wrap=False, offset=ng,
                    out_shape=slab_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
                if j_total is None:
                    j_total = tuple(
                        jnp.zeros(big_shape, f) for _ in range(3)
                    )
                starts = tuple(
                    base if d == wax else jnp.zeros((), jnp.int32)
                    for d in range(ndim)
                )
                j_total = tuple(
                    jax.lax.dynamic_update_slice(
                        a,
                        jax.lax.dynamic_slice(a, starts, slab_shape) + s,
                        starts,
                    )
                    for a, s in zip(j_total, jslab)
                )

            # --- laser antennas ride the slow deposit alongside -----------
            for sp_cfg in cfg.species:
                if not is_laser[sp_cfg.name]:
                    continue
                sp = state.species[sp_cfg.name]
                if sp.capacity == 0:
                    new_species[sp_cfg.name] = sp
                    continue
                laser = laser_cfg[sp_cfg.name]
                mobility = 0.05 / laser.e_max / cfg.gamma_boost
                sp_new = update_antenna(
                    sp, laser, geom, mobility, state.time, dt,
                    gamma_boost=cfg.gamma_boost, z0_lab=laser.z0_lab,
                )
                w_eff = jnp.where(sp.alive, sp_new.w, 0.0)
                # the antenna is a PLANE: deposit into a thin slab around
                # its (window-dependent) index along the window axis, then
                # add the slab into the big J frame — the full-grid scatter
                # was ~11 ms/step of the LWFA bench (tools/profile_lwfa.py)
                wax = wdir if cfg.do_moving_window else ndim - 1
                nzslab = min(2 * (order + 3) + 6, big_shape[wax])
                # the antenna plane's current coordinate along the slab
                # axis, from the particles themselves (robust to whether
                # the antenna rides the window)
                alive_f = sp_new.alive.astype(state.fields.Ex.dtype)
                zs = sp_new.positions(ndim)[wax]
                z0_l = jnp.sum(zs * alive_f) / jnp.maximum(
                    jnp.sum(alive_f), 1.0
                )
                idx_big = jnp.floor(
                    (z0_l - origin[wax]) / dxs[wax]
                ).astype(jnp.int32) + ng
                base = jnp.clip(
                    idx_big - nzslab // 2, 0, big_shape[wax] - nzslab
                )
                slab_shape = tuple(
                    nzslab if d == wax else big_shape[d]
                    for d in range(ndim)
                )
                # only the slab axis' origin shifts (slab row = big row -
                # base); transverse dims keep the big frame's offset=ng so
                # their shape weights are bitwise identical to a full-frame
                # deposit
                origin_slab = list(origin)
                origin_slab[wax] = origin[wax] + base.astype(
                    state.fields.Ex.dtype
                ) * dxs[wax]
                jslab = deposit_current_esirkepov(
                    sp_new.positions(ndim), sp_new.ux, sp_new.uy,
                    sp_new.uz, w_eff, 1.0, geom, dt, order,
                    origin=origin_slab, wrap=False, offset=ng,
                    out_shape=slab_shape,
                    chunk_size=cfg.deposit_chunk_size,
                )
                if j_total is None:
                    j_total = tuple(
                        jnp.zeros(big_shape, state.fields.Ex.dtype)
                        for _ in range(3)
                    )
                starts = tuple(
                    base if d == wax else jnp.zeros((), jnp.int32)
                    for d in range(ndim)
                )
                j_total = tuple(
                    jax.lax.dynamic_update_slice(
                        a,
                        jax.lax.dynamic_slice(a, starts, slab_shape) + s,
                        starts,
                    )
                    for a, s in zip(j_total, jslab)
                )
                new_species[sp_cfg.name] = sp_new

            aux_updates["tile_overflow"] = overflow
            aux_updates["tile_violations"] = violations
            return _field_tail(
                state, new_species, j_total, None, None, aux_updates
            )

    return (
        jax.jit(step_binned if tile_spec is not None else step_main),
        jax.jit(step_window),
        jax.jit(half_push, static_argnames=("dt_half",)),
        jax.jit(solve_es) if is_es else None,
    )
