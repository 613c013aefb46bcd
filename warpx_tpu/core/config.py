"""Resolved static simulation configuration (from an input deck or PICMI).

Replaces the reference's ~200 static flags on the WarpX god-object
(Source/WarpX.H) and its algorithm-selection enums
(Source/Utils/WarpXAlgorithmSelection.H:32-139) with plain dataclasses that are
hashable/static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .grid import Geometry

__all__ = ["SpeciesConfig", "SimConfig"]


# species_type -> (charge, mass) in SI (reference: Source/Particles/SpeciesPhysicalProperties.cpp)
_QE = 1.602176634e-19
_ME = 9.1093837015e-31
_MU = 1.66053906660e-27  # atomic mass unit (ablastr m_u)

SPECIES_TYPES = {
    "electron": (-_QE, _ME),
    "positron": (_QE, _ME),
    "muon": (-_QE, 206.7682830 * _ME),
    "antimuon": (_QE, 206.7682830 * _ME),
    "photon": (0.0, 0.0),
    "neutron": (0.0, 1.0013784193052508 * 1.67262192369e-27),
    "proton": (_QE, 1.67262192369e-27),
    "hydrogen": (_QE, 1.00797 * _MU),
    "hydrogen1": (_QE, 1.00782503223 * _MU),
    "hydrogen2": (_QE, 2.01410177812 * _MU),
    "hydrogen3": (_QE, 3.0160492779 * _MU),
    "helium": (2 * _QE, 4.002602 * _MU),
    "helium3": (2 * _QE, 3.0160293201 * _MU),
    "helium4": (2 * _QE, 4.00260325413 * _MU),
    "alpha": (2 * _QE, 4.001506179127 * _MU),
    "lithium": (3 * _QE, 6.967 * _MU),
    "lithium6": (3 * _QE, 6.0151228874 * _MU),
    "lithium7": (3 * _QE, 7.0160034366 * _MU),
    "beryllium": (4 * _QE, 9.0121831 * _MU),
    "beryllium9": (4 * _QE, 9.012183065 * _MU),
    "boron": (5 * _QE, 10.813 * _MU),
    "boron10": (5 * _QE, 10.01293695 * _MU),
    "boron11": (5 * _QE, 11.00930536 * _MU),
    "carbon": (6 * _QE, 12.0106 * _MU),
    "carbon12": (6 * _QE, 12.0 * _MU),
    "carbon13": (6 * _QE, 13.00335483507 * _MU),
    "carbon14": (6 * _QE, 14.0032419884 * _MU),
    "nitrogen": (7 * _QE, 14.00685 * _MU),
    "nitrogen14": (7 * _QE, 14.00307400443 * _MU),
    "nitrogen15": (7 * _QE, 15.00010889888 * _MU),
    "oxygen": (8 * _QE, 15.999 * _MU),
    "oxygen16": (8 * _QE, 15.99491461957 * _MU),
    "oxygen17": (8 * _QE, 16.9991317565 * _MU),
    "oxygen18": (8 * _QE, 17.99915961286 * _MU),
    "fluorine": (9 * _QE, 18.998403163 * _MU),
    "fluorine19": (9 * _QE, 18.99840316273 * _MU),
    "neon": (10 * _QE, 20.1797 * _MU),
    "neon20": (10 * _QE, 19.9924401762 * _MU),
    "neon21": (10 * _QE, 20.993846685 * _MU),
    "neon22": (10 * _QE, 21.991385114 * _MU),
    "aluminium": (13 * _QE, 26.98153853 * _MU),
    "argon": (18 * _QE, 39.948 * _MU),
    "copper": (29 * _QE, 63.546 * _MU),
    "xenon": (54 * _QE, 131.293 * _MU),
    "gold": (79 * _QE, 196.966569 * _MU),
}

# Alias names accepted by the reference's species_type parser
# (SpeciesPhysicalProperties.cpp:36-40): protium/deuterium/tritium map onto
# the hydrogen isotopes.  Normalize with normalize_species_type() before
# lookups so fusion-kind resolution sees canonical names.
SPECIES_TYPE_ALIASES = {
    "protium": "hydrogen1",
    "deuterium": "hydrogen2",
    "tritium": "hydrogen3",
}


def normalize_species_type(name):
    name = (name or "").lower()
    return SPECIES_TYPE_ALIASES.get(name, name)


@dataclasses.dataclass(frozen=True)
class LaserConfig:
    """One laser antenna (reference: Source/Laser/LaserProfiles.H &
    Source/Particles/LaserParticleContainer.H)."""

    name: str
    profile: str = "gaussian"
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    direction: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    polarization: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    e_max: float = 0.0
    wavelength: float = 1e-6
    profile_waist: float = 1e-6
    profile_duration: float = 1e-15
    profile_t_peak: float = 0.0
    profile_focal_distance: float = 0.0
    phi0: float = 0.0
    zeta: float = 0.0
    beta: float = 0.0
    phi2: float = 0.0
    theta_stc: float = 0.0
    do_continuous_injection: bool = False
    # lab-frame plane coordinate along the normal (boosted runs)
    z0_lab: float = 0.0
    # profile = from_file (lasy): LaserProfileFromFile.cpp
    lasy_file_name: str = ""
    delay: float = 0.0


@dataclasses.dataclass(frozen=True)
class SpeciesConfig:
    name: str
    charge: float
    mass: float
    injection_style: str = "none"  # nuniformpercell | nrandompercell | none
    num_particles_per_cell_each_dim: Tuple[int, ...] = ()
    num_particles_per_cell: int = 0
    profile: str = "constant"  # constant | parse_density_function | predefined
    density: float = 0.0
    density_expr: Optional[str] = None
    momentum_distribution: str = "at_rest"
    # constant momentum (units of gamma*beta, multiplied by c at injection)
    ux: float = 0.0
    uy: float = 0.0
    uz: float = 0.0
    # gaussian momentum spread
    ux_th: float = 0.0
    uy_th: float = 0.0
    uz_th: float = 0.0
    momentum_exprs: Optional[Tuple[str, str, str]] = None
    # maxwell_boltzmann / maxwell_juttner (theta = kT/mc^2)
    theta: float = 0.0
    beta_bulk: float = 0.0
    bulk_vel_dir: str = "x"
    # spatially-varying temperature / bulk velocity
    # (<sp>.theta_distribution_type = parser + theta_function(x,y,z),
    #  beta_distribution_type = parser + beta_function(x,y,z))
    theta_expr: Optional[str] = None
    beta_expr: Optional[str] = None
    # momentum_distribution_type = uniform: cuboid in u-space
    # (InjectorMomentum.H uniform branch, ux_min..uz_max)
    u_min: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    u_max: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # gaussian_parse_momentum_function: per-position mean/spread expressions
    momentum_th_exprs: Optional[Tuple[str, str, str]] = None
    # SingleParticle injection
    single_particle_pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    single_particle_u: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    single_particle_weight: float = 0.0
    # MultipleParticles injection: per-particle (x, y, z, ux, uy, uz, w)
    # columns (PhysicalParticleContainer.cpp multiple_particles_* keys)
    multiple_particles: Tuple[Tuple[float, ...], ...] = ()
    # external_file injection (PlasmaInjector::setupExternalFile,
    # AddPlasmaFromFile PhysicalParticleContainer.cpp:680): openPMD file
    # holding one species; charge/mass come from the file unless the deck
    # specifies them; z_shift translates the loaded z positions
    injection_file: Optional[str] = None
    z_shift: float = 0.0
    # boundary scraping: faces whose absorbed particles are recorded
    # (reference: <species>.save_particles_at_xlo/... ->
    # ParticleBoundaryBuffer); face names like "xlo", "zhi"
    save_particles_at: Tuple[str, ...] = ()
    # rigid injection (reference: RigidInjectedParticleContainer): the
    # species ballistically advances at its mean vz until it crosses the
    # (boost-frame) injection plane
    zinject_plane: Optional[float] = None
    rigid_advance: bool = True
    # flip u_z after the boost transform (backward-propagating driver in
    # boosted-frame runs; PhysicalParticleContainer.cpp:487-489)
    do_backward_propagation: bool = False
    # QED processes (reference: <species>.do_qed_quantum_sync /
    # do_qed_breit_wheeler and product-species keys)
    do_qed_quantum_sync: bool = False
    qed_product: str = ""  # quantum_sync_phot_product_species
    do_qed_breit_wheeler: bool = False
    qed_bw_ele_product: str = ""
    qed_bw_pos_product: str = ""
    # injection bounds (SI); +-inf when unbounded
    bounds_lo: Tuple[float, ...] = ()
    bounds_hi: Tuple[float, ...] = ()
    do_not_push: bool = False
    do_not_gather: bool = False
    do_not_deposit: bool = False
    pusher: str = "boris"  # boris | vay | higuera
    # deck my_constants visible inside this species' parsed expressions
    user_constants: Tuple[Tuple[str, float], ...] = ()
    do_continuous_injection: bool = False
    # gaussian beam injection
    x_rms: float = 0.0
    y_rms: float = 0.0
    z_rms: float = 0.0
    x_m: float = 0.0
    y_m: float = 0.0
    z_m: float = 0.0
    npart: int = 0
    q_tot: float = 0.0
    z_cut: float = float("inf")
    # runtime attributes: (name, expression(x,y,z,ux,uy,uz,t), is_integer)
    attributes: Tuple[Tuple[str, str, bool], ...] = ()
    # physical species type ("photon" switches to the massless pusher)
    species_type: str = ""
    # thermal particle-boundary re-emission velocity (boundary.<sp>.u_th)
    boundary_u_th: float = 0.0
    # flux injection (reference: PlasmaInjector flux keys; AddPlasmaFlux)
    surface_flux_pos: float = 0.0
    flux_normal_axis: str = "z"
    flux_direction: int = 1
    flux: float = 0.0
    flux_expr: str = ""
    flux_tmin: float = -1.0
    flux_tmax: float = -1.0
    # resampling (reference: Resampling.cpp / ResamplingTrigger.cpp)
    do_resampling: bool = False
    resampling_algorithm: str = "leveling_thinning"
    resampling_trigger_intervals: Tuple[str, ...] = ("0",)
    resampling_trigger_max_avg_ppc: float = float("inf")
    resampling_target_ratio: float = 1.5
    resampling_min_ppc: int = 1
    resampling_velocity_grid_type: str = "spherical"
    resampling_delta_ur: float = 0.0
    resampling_n_theta: int = 1
    resampling_n_phi: int = 1
    resampling_delta_u: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # extra particle capacity headroom factor for continuous injection
    capacity_factor: float = 1.0
    # RZ: random per-cell theta offset at injection (reference default true,
    # PhysicalParticleContainer.cpp:300 <species>.random_theta)
    random_theta: bool = True
    # ADK field ionization (reference: PhysicalParticleContainer ionization)
    do_field_ionization: bool = False
    physical_element: str = ""
    ionization_initial_level: int = 0
    ionization_product_species: str = ""

    @property
    def qm(self) -> float:
        return self.charge / self.mass


@dataclasses.dataclass(frozen=True)
class MCCProcessConfig:
    """One background-MCC scattering pathway (reference: ScatteringProcess.H).

    energies: uniform eV grid; sigmas: m^2 (clamped outside the range)."""

    kind: str  # elastic | back | charge_exchange | excitation | ionization
    energy_penalty: float = 0.0  # eV
    energies: Tuple[float, ...] = ()
    sigmas: Tuple[float, ...] = ()


@dataclasses.dataclass(frozen=True)
class CollisionConfig:
    """One binary-collision pairing (reference: CollisionHandler.H)."""

    name: str
    species: Tuple[str, str]
    kind: str = "pairwisecoulomb"
    coulomb_log: float = -1.0  # <=0: computed per pair
    ndt: int = 1
    # background MCC (reference: BackgroundMCCCollision.H)
    background_density: str = ""  # expr f(x,y,z,t), m^-3
    background_temperature: str = ""  # expr f(x,y,z,t), K
    background_mass: float = -1.0  # kg; -1 -> species/secondary mass
    max_background_density: float = 0.0
    ionization_species: str = ""
    processes: Tuple[MCCProcessConfig, ...] = ()
    # background stopping (reference: BackgroundStopping.H)
    background_type: str = "electrons"  # electrons | ions
    background_charge_state: float = 0.0
    # nuclear fusion (reference: NuclearFusionFunc.H:61-79)
    product_species: Tuple[str, ...] = ()
    fusion_kind: str = ""  # protonboron | dt | ddp | ddn | dhe
    fusion_multiplier: float = 1.0
    fusion_probability_threshold: float = 0.02
    fusion_probability_target_value: float = 0.002


@dataclasses.dataclass(frozen=True)
class SimConfig:
    geometry: Geometry
    max_step: int
    dt: float
    particle_shape: int = 1
    em_solver: str = "yee"  # yee | ckc | psatd | none
    current_deposition: str = "esirkepov"  # esirkepov | direct | vay
    field_gathering: str = "energy-conserving"  # or momentum-conserving
    grid_type: str = "staggered"  # staggered | collocated | hybrid
    # staggered->nodal interpolation order per active dim for MC gathering
    # (warpx.field_centering_no*; default 2, hybrid grids default 8)
    field_centering_no: Tuple[int, ...] = ()
    use_filter: bool = False
    filter_npass_each_dir: Tuple[int, ...] = ()
    # Godfrey NCI corrector applied to the gather fields
    # (reference: warpx.use_fdtd_nci_corr; NCIGodfreyFilter.cpp)
    use_nci_corr: bool = False
    species: Tuple[SpeciesConfig, ...] = ()
    cfl: float = 0.999
    verbose: bool = False
    seed: int = 0
    # bound peak memory of deposition tap intermediates (None = no chunking)
    deposit_chunk_size: int | None = 2_000_000
    # per-dim field boundaries on the active axes: periodic | pec | pml | none
    field_bc_lo: Tuple[str, ...] = ()
    field_bc_hi: Tuple[str, ...] = ()
    # per-dim particle boundaries: periodic | absorbing | reflecting
    particle_bc_lo: Tuple[str, ...] = ()
    particle_bc_hi: Tuple[str, ...] = ()
    # moving window (reference: WarpXMovingWindow.cpp)
    do_moving_window: bool = False
    moving_window_dir: int = -1  # active-axis index
    moving_window_v: float = 1.0  # units of c
    start_moving_window_step: int = 0
    end_moving_window_step: int = -1
    lasers: Tuple[LaserConfig, ...] = ()
    collisions: Tuple["CollisionConfig", ...] = ()
    # cold relativistic fluid species (reference: fluids.species_names,
    # WarpXFluidContainer) — reuses the SpeciesConfig profile fields
    fluids: Tuple[SpeciesConfig, ...] = ()
    pml_ncell: int = 10
    # mesh refinement (reference: amr.max_level, warpx.fine_tag_lo/hi;
    # one static fine patch, Vay substitution scheme — see core/mr.py)
    max_level: int = 0
    # per-active-dim refinement ratio (amr.ref_ratio / amr.ref_ratio_vect)
    ref_ratio: Tuple[int, ...] = ()
    fine_tag_lo: Tuple[float, ...] = ()
    fine_tag_hi: Tuple[float, ...] = ()
    # the refined box is the tag box GROWN to amr.blocking_factor multiples
    # in fine cells (AMReX BoxArray blocking; ParticleBoxArray(1)
    # minimalBox is what refined injection and diagnostics actually see)
    blocking_factor: int = 8
    # inject r-times finer particle streams where the transverse footprint
    # of the refined box covers the cell (warpx.refine_plasma;
    # PhysicalParticleContainer::findRefinedInjectionBox — the box extends
    # to +/- infinity along the moving-window direction)
    refine_plasma: bool = False
    # particles within this many FINE cells of the patch edge gather from /
    # deposit to the coarse level (reference: WarpX::BuildBufferMasks)
    n_field_gather_buffer: int = 3
    n_current_deposition_buffer: int = 2
    # fine-level time subcycling (warpx.do_subcycling; OneStep_sub1)
    do_subcycling: bool = False
    # constant external fields applied to particles during gather
    # (reference: particles.E_ext_particle_init_style = constant)
    e_ext_particle: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    b_ext_particle: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # macroscopic Maxwell medium (reference: algo.em_solver_medium,
    # MacroscopicProperties.cpp; sigma/epsilon/mu constant or parsed)
    em_solver_medium: str = "vacuum"  # vacuum | macroscopic
    macroscopic_sigma_method: str = "backwardeuler"  # | laxwendroff
    macro_sigma: float | None = None
    macro_sigma_function: str = ""
    macro_epsilon: float | None = None
    macro_epsilon_function: str = ""
    macro_mu: float | None = None
    macro_mu_function: str = ""
    # electrostatic solver (reference: ElectrostaticSolverAlgo)
    electrostatic: str = "none"  # none | labframe | relativistic
    # Poisson solver backend (reference: warpx.poisson_solver): multigrid
    # (here: direct transform) | fft (open-boundary integrated Green fn)
    poisson_solver: str = "multigrid"
    # hyperbolic divergence cleaning (reference: warpx.do_dive_cleaning /
    # do_divb_cleaning; EvolveF.cpp / EvolveG.cpp)
    do_dive_cleaning: bool = False
    do_divb_cleaning: bool = False
    # split-field cleaning inside the PML (warpx.do_pml_dive_cleaning /
    # do_pml_divb_cleaning; defaults true for PSATD, WarpX.cpp:848-870)
    do_pml_dive_cleaning: bool = False
    do_pml_divb_cleaning: bool = False
    # initialization projection div(B) cleaner for loaded external fields
    # (reference: warpx.do_divb_cleaning_external, ProjectionDivCleaner)
    do_divb_cleaning_external: bool = False
    # initial grid fields (reference: warpx.B_ext_grid_init_style):
    # None | ("constant", (vx,vy,vz)) | ("parse", (expr_x, expr_y, expr_z))
    e_ext_grid: Tuple | None = None
    b_ext_grid: Tuple | None = None
    # deck my_constants, for expression evaluation at init
    user_constants: Tuple = ()
    # embedded boundary: implicit function f(x,y,z), >0 covered (reference:
    # warpx.eb_implicit_function, Source/EmbeddedBoundary/; staircase
    # level-set realization: covered-edge E / covered-face B frozen like the
    # reference's Yee-EB skip-update, EvolveE.cpp lx<=0 branch)
    eb_implicit_function: str = ""
    # hybrid QED Maxwell (reference: warpx.use_hybrid_QED + quantum_xi,
    # WarpX_QED_Field_Pushers.cpp; requires collocated grid + PSATD)
    use_hybrid_qed: bool = False
    quantum_xi_c2: float = 1.1728865132395492e-35
    # PSATD knobs (reference: WarpX.cpp:1409-1520)
    psatd_order: int = 16  # -1 = infinite order (periodic single box)
    psatd_update_with_rho: bool = False
    psatd_current_correction: bool = False
    # averaged Galilean PSATD (psatd.do_time_averaging)
    psatd_time_averaging: bool = False
    psatd_periodic_single_box: bool = False
    # boosted frame (reference: warpx.gamma_boost / boost_direction;
    # geometry given in LAB coordinates and converted at parse time)
    gamma_boost: float = 1.0
    boost_direction: str = "z"
    # multi-J: J time dependence (reference: psatd.J_in_time, warpx.do_multi_J)
    psatd_j_in_time: str = "constant"
    # multi-J sub-depositions per step (warpx.do_multi_J_n_depositions)
    multi_j_n_depositions: int = 1
    # psatd.solution_type: second-order | first-order
    # (PsatdAlgorithmFirstOrder.cpp for the latter)
    psatd_solution_type: str = "second-order"
    # psatd.rho_in_time: linear | constant (constant only with first-order
    # multi-J, WarpX.cpp:1454-1459)
    psatd_rho_in_time: str = "linear"
    # Galilean frame velocity [m/s] (reference: psatd.v_galilean * c)
    psatd_v_galilean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # comoving-PSATD velocity [m/s] (reference: psatd.v_comoving * c /
    # psatd.use_default_v_comoving, WarpX.cpp:1534-1551)
    psatd_v_comoving: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # implicit evolve schemes (reference: algo.evolve_scheme,
    # Source/FieldSolver/ImplicitSolvers/): explicit | theta_implicit_em |
    # semi_implicit_em, with the Picard nonlinear solver
    # RZ: number of azimuthal modes (reference: warpx.n_rz_azimuthal_modes)
    n_rz_modes: int = 1
    # Dirichlet boundary potentials per active dim: ((lo_expr, hi_expr),...)
    # as f(t) strings, "" when unset (reference: boundary.potential_lo_x
    # etc., ElectrostaticSolver.cpp PoissonBoundaryHandler)
    boundary_potentials: Tuple = ()
    # accelerator lattice: ("quad"|"plasmalens", zs, ze, dEdx, dBdx) tuples
    # laid out sequentially from z=0 (reference: Source/AcceleratorLattice/)
    lattice_elements: Tuple = ()
    # hybrid-PIC (Ohm's law) model parameters (reference:
    # hybrid_pic_model.* keys, HybridPICModel.H:152-180)
    hybrid_substeps: int = 10
    hybrid_elec_temp: float = 0.0  # eV
    hybrid_n0_ref: float = 1.0
    hybrid_gamma: float = 5.0 / 3.0
    hybrid_n_floor: float = 1.0
    hybrid_eta: str = "0"  # plasma_resistivity(rho,J) expression, Ohm*m
    hybrid_eta_h: float = 0.0  # hyper-resistivity
    hybrid_resistivity_has_J: bool = False
    hybrid_j_ext: Tuple[str, str, str] = ("", "", "")
    # Schwinger pair production (reference: warpx.do_qed_schwinger +
    # qed_schwinger.* keys, MultiParticleContainer::doQEDSchwinger)
    do_qed_schwinger: bool = False
    qed_schwinger_ele: str = ""
    qed_schwinger_pos: str = ""
    qed_schwinger_y_size: float = 0.0  # 2D transverse size
    qed_schwinger_threshold: float = 25.0  # Poisson->Gaussian crossover
    # activation region (qed_schwinger.{x,y,z}{min,max}), +-inf if unset
    qed_schwinger_bounds_lo: Tuple[float, float, float] = (
        float("-inf"),) * 3
    qed_schwinger_bounds_hi: Tuple[float, float, float] = (
        float("inf"),) * 3
    evolve_scheme: str = "explicit"
    implicit_theta: float = 0.5
    implicit_nonlinear: str = "picard"  # picard | newton
    picard_max_iterations: int = 100
    picard_rtol: float = 1.0e-6
    picard_atol: float = 0.0
    implicit_max_particle_iterations: int = 1
    # Newton/JFNK (reference: NewtonSolver.H:118-136, JacobianFunctionMF
    # GMRES; the Jacobian-vector product here is the exact jax.jvp rather
    # than the reference's finite-difference approximation)
    newton_max_iterations: int = 100
    newton_rtol: float = 1.0e-6
    newton_atol: float = 0.0
    gmres_max_iterations: int = 1000
    gmres_restart: int = 30
    gmres_rtol: float = 1.0e-4
    gmres_atol: float = 0.0
    # --- dynamic load balancing (algo.load_balance_*, WarpXRegrid.cpp:74) ---
    load_balance_intervals: str = "0"  # IntervalsParser string; "0" = never
    load_balance_with_sfc: bool = False  # SFC split instead of knapsack
    load_balance_knapsack_factor: float = 1.24  # max tiles/chip = ceil(T/n*f)
    load_balance_efficiency_ratio_threshold: float = 1.1
    load_balance_costs_update: str = "heuristic"  # heuristic | timers
    costs_heuristic_cells_wt: float = 0.1   # WarpX.cpp:417 (non-GPU default)
    costs_heuristic_particles_wt: float = 0.9
    # --- TPU tile-binned hot path (ops/tiling.py + ops/pallas_pic.py) ---
    # "auto" enables the fused Pallas gather+push+deposit kernel on TPU for
    # supported configurations (3D periodic explicit EM, Esirkepov);
    # the analog of the reference's binned shared-memory deposition
    # (WarpXParticleContainer.cpp:490-548) + SortParticlesByBin cadence
    # (WarpXEvolve.cpp:575-580, warpx.sort_intervals).
    tiled_particles: str = "auto"  # auto | on | off
    tile_size: Tuple[int, int, int] = (8, 8, 8)
    sort_interval: int = 4
    sort_margin: int = 0  # 0 = auto: ceil(interval * c*dt/min(dx))
    tile_headroom: float = 2.0
    # MXU operand precision in the fused kernel: 'f32' full precision;
    # 'mixed' rounds the gather operands to bf16 (interpolation rounding
    # ~0.4%, far below macro-particle noise; deposit stays f32 so charge
    # conservation holds to roundoff); 'bf16' rounds the deposit too.
    tile_mxu: str = "f32"  # f32 | mixed | bf16

    @property
    def galerkin(self) -> bool:
        """Reduced-order gather along staggered axes.

        Mirrors the reference's galerkin_interpolation flag (WarpX.cpp:154,
        967, 1207-1214): disabled for collocated grids, momentum-conserving
        gathering, and for direct current deposition with an EM solver."""
        if self.grid_type == "collocated":
            return False
        if self.field_gathering == "momentum-conserving":
            return False
        if self.current_deposition == "direct" and self.em_solver not in (
            "none",
            "hybrid",
        ):
            return False
        return True
