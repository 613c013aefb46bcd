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
    # injection bounds (SI); +-inf when unbounded
    bounds_lo: Tuple[float, ...] = ()
    bounds_hi: Tuple[float, ...] = ()
    do_not_push: bool = False
    do_not_gather: bool = False
    do_not_deposit: bool = False
    pusher: str = "boris"  # boris | vay | higuera
    # deck my_constants visible inside this species' parsed expressions
    user_constants: Tuple[Tuple[str, float], ...] = ()

    @property
    def qm(self) -> float:
        return self.charge / self.mass


@dataclasses.dataclass(frozen=True)
class SimConfig:
    geometry: Geometry
    max_step: int
    dt: float
    particle_shape: int = 1
    em_solver: str = "yee"  # yee | ckc | psatd | none
    current_deposition: str = "esirkepov"  # esirkepov | direct | vay
    field_gathering: str = "energy-conserving"  # or momentum-conserving
    grid_type: str = "staggered"  # staggered | collocated
    use_filter: bool = False
    filter_npass_each_dir: Tuple[int, ...] = ()
    species: Tuple[SpeciesConfig, ...] = ()
    cfl: float = 0.999
    verbose: bool = False
    seed: int = 0

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
