"""PICMI-standard Python front end (subset).

Mirrors the surface of the reference's ``pywarpx.picmi``
(Python/pywarpx/picmi.py, the PICMI-standard implementation): users construct
grids/solvers/species/lasers/diagnostics and call ``Simulation.step(n)``; the
objects map onto warpx_tpu's SimConfig (the analog of the reference mapping
onto ParmParse buckets, picmi.py:2976 initialize_warpx).
"""

from __future__ import annotations

import dataclasses
import math
from types import SimpleNamespace
from typing import List, Optional, Sequence

from .. import constants as _const
from ..core.config import LaserConfig, SimConfig, SpeciesConfig, SPECIES_TYPES
from ..core.grid import Geometry

__all__ = [
    "constants", "Species", "UniformDistribution", "AnalyticDistribution",
    "GaussianBunchDistribution", "PseudoRandomLayout", "GriddedLayout",
    "Cartesian1DGrid", "Cartesian2DGrid", "Cartesian3DGrid",
    "ElectromagneticSolver", "ElectrostaticSolver", "GaussianLaser",
    "LaserAntenna", "FieldDiagnostic", "ParticleDiagnostic", "Checkpoint",
    "Simulation",
]

constants = SimpleNamespace(
    c=_const.c, ep0=_const.ep0, mu0=_const.mu0, q_e=_const.q_e,
    m_e=_const.m_e, m_p=_const.m_p, kb=_const.kb,
)


class UniformDistribution:
    def __init__(self, density, lower_bound=None, upper_bound=None,
                 directed_velocity=None, rms_velocity=None, fill_in=None):
        self.density = density
        self.lower_bound = lower_bound or [None] * 3
        self.upper_bound = upper_bound or [None] * 3
        self.directed_velocity = directed_velocity or [0.0] * 3
        self.rms_velocity = rms_velocity or [0.0] * 3
        self.fill_in = fill_in


class AnalyticDistribution:
    def __init__(self, density_expression, lower_bound=None, upper_bound=None,
                 directed_velocity=None, momentum_expressions=None,
                 rms_velocity=None, fill_in=None, **user_vars):
        self.density_expression = density_expression
        self.lower_bound = lower_bound or [None] * 3
        self.upper_bound = upper_bound or [None] * 3
        self.directed_velocity = directed_velocity or [0.0] * 3
        self.momentum_expressions = momentum_expressions
        self.rms_velocity = rms_velocity or [0.0] * 3
        self.fill_in = fill_in
        self.user_vars = user_vars


class GaussianBunchDistribution:
    def __init__(self, n_physical_particles, rms_bunch_size,
                 rms_velocity=None, centroid_position=None,
                 centroid_velocity=None, velocity_divergence=None):
        self.n_physical_particles = n_physical_particles
        self.rms_bunch_size = rms_bunch_size
        self.rms_velocity = rms_velocity or [0.0] * 3
        self.centroid_position = centroid_position or [0.0] * 3
        self.centroid_velocity = centroid_velocity or [0.0] * 3


class PseudoRandomLayout:
    def __init__(self, n_macroparticles=None, n_macroparticles_per_cell=None,
                 seed=None):
        self.n_macroparticles = n_macroparticles
        self.n_macroparticles_per_cell = n_macroparticles_per_cell
        self.seed = seed


class GriddedLayout:
    def __init__(self, n_macroparticle_per_cell, grid=None):
        self.n_macroparticle_per_cell = n_macroparticle_per_cell
        self.grid = grid


class Species:
    def __init__(self, particle_type=None, name=None, charge=None, mass=None,
                 initial_distribution=None, particle_shape=None, **kw):
        self.particle_type = particle_type
        self.name = name
        q, m = SPECIES_TYPES.get(particle_type or "", (None, None))
        self.charge = charge if charge is not None else q
        self.mass = mass if mass is not None else m
        self.initial_distribution = initial_distribution
        self.extra = kw


class _Grid:
    ndim = 3

    def __init__(self, number_of_cells, lower_bound, upper_bound,
                 lower_boundary_conditions, upper_boundary_conditions,
                 moving_window_velocity=None, **kw):
        self.number_of_cells = list(number_of_cells)
        self.lower_bound = list(lower_bound)
        self.upper_bound = list(upper_bound)
        self.lower_boundary_conditions = list(lower_boundary_conditions)
        self.upper_boundary_conditions = list(upper_boundary_conditions)
        self.moving_window_velocity = moving_window_velocity
        self.kw = kw

    def geometry(self) -> Geometry:
        bc = [b.lower() for b in self.lower_boundary_conditions]
        periodic = tuple(b == "periodic" for b in bc)
        return Geometry(
            ndim=self.ndim,
            n_cell=tuple(self.number_of_cells),
            prob_lo=tuple(self.lower_bound),
            prob_hi=tuple(self.upper_bound),
            periodic=periodic,
        )

    @staticmethod
    def _map_bc(b):
        b = b.lower()
        return {"open": "pml", "dirichlet": "pec", "neumann": "pec"}.get(b, b)

    def field_bcs(self):
        lo = tuple(self._map_bc(b) for b in self.lower_boundary_conditions)
        hi = tuple(self._map_bc(b) for b in self.upper_boundary_conditions)
        return lo, hi


class Cartesian3DGrid(_Grid):
    ndim = 3


class Cartesian2DGrid(_Grid):
    ndim = 2


class Cartesian1DGrid(_Grid):
    ndim = 1


class ElectromagneticSolver:
    def __init__(self, grid, method="Yee", cfl=None, source_smoother=None,
                 **kw):
        self.source_smoother = source_smoother
        self.grid = grid
        self.method = (method or "Yee").lower()
        self.cfl = cfl if cfl is not None else 0.999
        self.kw = kw


class ElectrostaticSolver:
    def __init__(self, grid, method="Multigrid", required_precision=None, **kw):
        self.grid = grid
        self.method = method
        self.kw = kw
        self.cfl = None


class GaussianLaser:
    def __init__(self, wavelength, waist, duration, focal_position=None,
                 centroid_position=None, propagation_direction=None,
                 polarization_direction=None, E0=None, a0=None, **kw):
        self.wavelength = wavelength
        self.waist = waist
        self.duration = duration
        self.focal_position = focal_position or [0, 0, 0]
        self.centroid_position = centroid_position or [0, 0, 0]
        self.propagation_direction = propagation_direction or [0, 0, 1]
        self.polarization_direction = polarization_direction or [1, 0, 0]
        if E0 is None and a0 is not None:
            E0 = a0 * 2 * math.pi * _const.m_e * _const.c**2 / (
                _const.q_e * wavelength
            )
        self.E0 = E0


class LaserAntenna:
    def __init__(self, position, normal_vector=None):
        self.position = position
        self.normal_vector = normal_vector or [0, 0, 1]


class FieldDiagnostic:
    def __init__(self, grid, period, name=None, data_list=None, **kw):
        self.grid = grid
        self.period = period
        self.name = name or "diag1"
        self.data_list = data_list


class ParticleDiagnostic:
    def __init__(self, period, species=None, name=None, data_list=None, **kw):
        self.period = period
        self.species = species
        self.name = name or "diag1"
        self.data_list = data_list


class Checkpoint:
    def __init__(self, period, name=None, **kw):
        self.period = period
        self.name = name or "chk"


class CoulombCollisions:
    """Pairwise Coulomb collisions (reference picmi: CoulombCollisions)."""

    def __init__(self, name, species, CoulombLog=None, ndt=None, **kw):
        self.name = name
        self.species = species  # [sp1, sp2]
        self.CoulombLog = CoulombLog
        self.ndt = ndt or 1


class ConstantAppliedField:
    def __init__(self, Ex=None, Ey=None, Ez=None, Bx=None, By=None, Bz=None,
                 **kw):
        self.E = (Ex or 0.0, Ey or 0.0, Ez or 0.0)
        self.B = (Bx or 0.0, By or 0.0, Bz or 0.0)


class AnalyticInitialField:
    """Initial grid fields from expressions (reference picmi:
    AnalyticInitialField / LoadInitialField)."""

    def __init__(self, Ex_expression=None, Ey_expression=None,
                 Ez_expression=None, Bx_expression=None, By_expression=None,
                 Bz_expression=None, **kw):
        self.E_expr = (Ex_expression, Ey_expression, Ez_expression)
        self.B_expr = (Bx_expression, By_expression, Bz_expression)
        self.user_vars = kw


class BinomialSmoother:
    def __init__(self, n_pass=None, **kw):
        if n_pass is None:
            n_pass = 1
        self.n_pass = n_pass if isinstance(n_pass, (list, tuple)) else None
        self.n_pass_scalar = None if self.n_pass else int(n_pass)


class ReducedDiagnostic:
    """Reduced diagnostics (reference picmi: ReducedDiagnostic)."""

    def __init__(self, diag_type, name=None, period=1, species=None, **kw):
        self.type = diag_type
        self.name = name or diag_type
        self.period = period
        self.species = getattr(species, "name", species)
        self.kw = kw


class UniformFluxDistribution:
    """Plane flux emission (reference picmi: UniformFluxDistribution)."""

    def __init__(self, flux, surface_flux_position, flux_normal_axis,
                 flux_direction, rms_velocity=None, directed_velocity=None,
                 gaussian_flux_momentum_distribution=True, **kw):
        self.flux = flux
        self.surface_flux_position = surface_flux_position
        self.flux_normal_axis = flux_normal_axis
        self.flux_direction = flux_direction
        self.rms_velocity = rms_velocity or [0.0, 0.0, 0.0]
        self.directed_velocity = directed_velocity or [0.0, 0.0, 0.0]


class Simulation:
    """PICMI Simulation: collects components, builds SimConfig, steps."""

    def __init__(self, solver=None, max_steps=None, max_time=None,
                 verbose=None, particle_shape="linear", warpx_current_deposition_algo=None,
                 warpx_field_gathering_algo=None, warpx_use_filter=None, **kw):
        self.solver = solver
        self.max_steps = max_steps
        self.verbose = verbose
        shape_map = {"linear": 1, "quadratic": 2, "cubic": 3, "quartic": 4,
                     "NGP": 0, 1: 1, 2: 2, 3: 3, 4: 4}
        self.particle_shape = shape_map.get(particle_shape, 1)
        self.current_deposition = warpx_current_deposition_algo
        self.field_gathering = warpx_field_gathering_algo
        self.use_filter = warpx_use_filter
        self.species: List = []
        self.layouts: List = []
        self.lasers: List = []
        self.laser_injections: List = []
        self.diagnostics: List = []
        self._sim = None
        self.applied_fields = list(kw.pop("applied_fields", []) or [])
        self.collisions = list(kw.pop("collisions", []) or [])

    def add_species(self, species, layout=None, initialize_self_field=False):
        self.species.append(species)
        self.layouts.append(layout)

    def add_laser(self, laser, injection_method=None):
        self.lasers.append(laser)
        self.laser_injections.append(injection_method)

    def add_applied_field(self, field):
        self.applied_fields.append(field)

    def add_diagnostic(self, diag):
        self.diagnostics.append(diag)

    # ----------------------------------------------------------------- build
    def _build_config(self) -> SimConfig:
        grid = self.solver.grid
        geom = grid.geometry()
        ndim = geom.ndim
        bc_lo, bc_hi = grid.field_bcs()
        species_cfgs = []
        for sp, layout in zip(self.species, self.layouts):
            dist = sp.initial_distribution
            ppc = None
            if isinstance(layout, GriddedLayout):
                ppc = tuple(layout.n_macroparticle_per_cell)
            elif isinstance(layout, PseudoRandomLayout):
                ppc = None
            inf = math.inf
            kw = dict(
                name=sp.name, charge=sp.charge, mass=sp.mass,
                pusher="boris",
            )
            if isinstance(dist, (UniformDistribution, AnalyticDistribution)):
                lo = [v if v is not None else -inf for v in dist.lower_bound]
                hi = [v if v is not None else inf for v in dist.upper_bound]
                axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
                kw.update(
                    injection_style="nuniformpercell",
                    num_particles_per_cell_each_dim=ppc or (1,) * ndim,
                    bounds_lo=tuple(lo[a] for a in axes),
                    bounds_hi=tuple(hi[a] for a in axes),
                )
                v = dist.directed_velocity
                inv_c = 1.0 / _const.c
                if isinstance(dist, UniformDistribution):
                    kw.update(profile="constant", density=dist.density)
                else:
                    kw.update(
                        profile="parse_density_function",
                        density_expr=dist.density_expression,
                        user_constants=tuple(
                            sorted(dist.user_vars.items())
                        ),
                    )
                if any(dist.rms_velocity):
                    kw.update(
                        momentum_distribution="gaussian",
                        ux=v[0] * inv_c, uy=v[1] * inv_c, uz=v[2] * inv_c,
                        ux_th=dist.rms_velocity[0] * inv_c,
                        uy_th=dist.rms_velocity[1] * inv_c,
                        uz_th=dist.rms_velocity[2] * inv_c,
                    )
                elif any(v):
                    kw.update(
                        momentum_distribution="constant",
                        ux=v[0] * inv_c, uy=v[1] * inv_c, uz=v[2] * inv_c,
                    )
                else:
                    kw.update(momentum_distribution="at_rest")
            elif isinstance(dist, UniformFluxDistribution):
                inv_c = 1.0 / _const.c
                v = dist.directed_velocity
                axn = (
                    dist.flux_normal_axis
                    if isinstance(dist.flux_normal_axis, str)
                    else "xyz"[dist.flux_normal_axis]
                )
                kw.update(
                    injection_style="nfluxpercell",
                    num_particles_per_cell=(
                        layout.n_macroparticle_per_cell[0]
                        if isinstance(layout, GriddedLayout)
                        else (getattr(layout, "n_macroparticles_per_cell", None) or 2)
                    ),
                    flux=dist.flux,
                    surface_flux_pos=dist.surface_flux_position,
                    flux_normal_axis=axn,
                    flux_direction=int(dist.flux_direction),
                    momentum_distribution="gaussianflux",
                    ux=v[0] * inv_c, uy=v[1] * inv_c, uz=v[2] * inv_c,
                    ux_th=dist.rms_velocity[0] * inv_c,
                    uy_th=dist.rms_velocity[1] * inv_c,
                    uz_th=dist.rms_velocity[2] * inv_c,
                )
            elif isinstance(dist, GaussianBunchDistribution):
                n_mac = layout.n_macroparticles if layout else 100
                inv_c = 1.0 / _const.c
                kw.update(
                    injection_style="gaussian_beam",
                    npart=n_mac,
                    q_tot=dist.n_physical_particles * sp.charge,
                    x_rms=dist.rms_bunch_size[0],
                    y_rms=dist.rms_bunch_size[1],
                    z_rms=dist.rms_bunch_size[2],
                    x_m=dist.centroid_position[0],
                    y_m=dist.centroid_position[1],
                    z_m=dist.centroid_position[2],
                    momentum_distribution="gaussian",
                    ux=dist.centroid_velocity[0] * inv_c,
                    uy=dist.centroid_velocity[1] * inv_c,
                    uz=dist.centroid_velocity[2] * inv_c,
                    ux_th=dist.rms_velocity[0] * inv_c,
                    uy_th=dist.rms_velocity[1] * inv_c,
                    uz_th=dist.rms_velocity[2] * inv_c,
                )
            species_cfgs.append(SpeciesConfig(**kw))

        lasers = []
        for laser, inj in zip(self.lasers, self.laser_injections):
            pos = inj.position if inj is not None else [0, 0, 0]
            focal_dist = 0.0
            if laser.focal_position and pos:
                focal_dist = sum(
                    (laser.focal_position[i] - pos[i])
                    * laser.propagation_direction[i]
                    for i in range(3)
                )
            centroid_dist = sum(
                (pos[i] - laser.centroid_position[i])
                * laser.propagation_direction[i]
                for i in range(3)
            )
            lasers.append(
                LaserConfig(
                    name=f"laser{len(lasers)+1}",
                    profile="gaussian",
                    position=tuple(pos),
                    direction=tuple(laser.propagation_direction),
                    polarization=tuple(laser.polarization_direction),
                    e_max=laser.E0,
                    wavelength=laser.wavelength,
                    profile_waist=laser.waist,
                    profile_duration=laser.duration,
                    profile_t_peak=centroid_dist / _const.c,
                    profile_focal_distance=focal_dist,
                )
            )
        laser_species = tuple(
            SpeciesConfig(name=l.name, charge=1.0, mass=0.0,
                          injection_style="laser")
            for l in lasers
        )

        es = isinstance(self.solver, ElectrostaticSolver)
        em_solver = "none" if es else (
            "psatd" if self.solver.method == "psatd" else self.solver.method
        )
        window = (
            grid.moving_window_velocity
            and any(grid.moving_window_velocity)
        )
        wdir = -1
        wv = 1.0
        if window:
            axes = {1: ["z"], 2: ["x", "z"], 3: ["x", "y", "z"]}[ndim]
            for i3, nm in zip((0, 1, 2), ("x", "y", "z")):
                if grid.moving_window_velocity[i3]:
                    if nm in axes:
                        wdir = axes.index(nm)
                        wv = grid.moving_window_velocity[i3] / _const.c
        from ..solvers.yee import compute_dt_ckc, compute_dt_yee

        cfl = self.solver.cfl or 0.999
        if es:
            dt = 1e-30  # must be overridden via max_time logic; ES needs const dt
        elif em_solver == "psatd":
            dt = cfl * min(geom.dx) / _const.c
        elif em_solver == "ckc":
            dt = compute_dt_ckc(geom, cfl)
        else:
            dt = compute_dt_yee(geom, cfl)

        dep_default = "direct" if (es or em_solver == "psatd") else "esirkepov"
        from ..core.config import CollisionConfig

        collision_cfgs = tuple(
            CollisionConfig(
                name=c.name,
                species=tuple(getattr(x, "name", x) for x in c.species),
                coulomb_log=c.CoulombLog if c.CoulombLog else -1.0,
                ndt=c.ndt,
            )
            for c in self.collisions
        )
        e_ext = (0.0, 0.0, 0.0)
        b_ext = (0.0, 0.0, 0.0)
        e_grid = b_grid = None
        for af in self.applied_fields:
            if isinstance(af, ConstantAppliedField):
                e_ext = tuple(a + b for a, b in zip(e_ext, af.E))
                b_ext = tuple(a + b for a, b in zip(b_ext, af.B))
            elif isinstance(af, AnalyticInitialField):
                if any(e is not None for e in af.E_expr):
                    e_grid = ("parse", tuple(e or "0" for e in af.E_expr))
                if any(e is not None for e in af.B_expr):
                    b_grid = ("parse", tuple(e or "0" for e in af.B_expr))
        smoother = getattr(self.solver, "source_smoother", None)
        filter_npass = ()
        use_filter = bool(self.use_filter)
        if smoother is not None:
            use_filter = True
            if smoother.n_pass:
                filter_npass = tuple(smoother.n_pass)[:ndim]
            else:
                filter_npass = (smoother.n_pass_scalar,) * ndim
        return SimConfig(
            geometry=geom,
            max_step=self.max_steps or 0,
            dt=dt,
            particle_shape=self.particle_shape,
            em_solver=em_solver if not es else "none",
            electrostatic="labframe" if es else "none",
            current_deposition=self.current_deposition or dep_default,
            field_gathering=self.field_gathering or "energy-conserving",
            use_filter=use_filter,
            filter_npass_each_dir=filter_npass,
            collisions=collision_cfgs,
            e_ext_particle=e_ext,
            b_ext_particle=b_ext,
            e_ext_grid=e_grid,
            b_ext_grid=b_grid,
            species=tuple(species_cfgs) + laser_species,
            cfl=cfl,
            field_bc_lo=bc_lo,
            field_bc_hi=bc_hi,
            particle_bc_lo=tuple(
                "periodic" if b == "periodic" else "absorbing" for b in bc_lo
            ),
            particle_bc_hi=tuple(
                "periodic" if b == "periodic" else "absorbing" for b in bc_hi
            ),
            do_moving_window=bool(window),
            moving_window_dir=wdir,
            moving_window_v=wv,
            lasers=tuple(lasers),
        )

    def _ensure_sim(self):
        if self._sim is None:
            from ..core.simulation import Simulation as CoreSim

            self._sim = CoreSim(self._build_config())
            self._sim.init()
        return self._sim

    def step(self, nsteps: int = -1):
        sim = self._ensure_sim()
        sim.evolve(nsteps)

    def write_input_file(self, file_name="inputs"):
        """Emit a ParmParse-style deck (subset) for the CLI runner."""
        cfg = self._build_config()
        lines = [f"max_step = {cfg.max_step}"]
        g = cfg.geometry
        lines.append(f"amr.n_cell = {' '.join(str(n) for n in g.n_cell)}")
        lines.append(f"geometry.dims = {g.ndim}")
        lines.append(
            "geometry.prob_lo = " + " ".join(repr(v) for v in g.prob_lo)
        )
        lines.append(
            "geometry.prob_hi = " + " ".join(repr(v) for v in g.prob_hi)
        )
        with open(file_name, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    @property
    def extension(self):
        return self._ensure_sim()
