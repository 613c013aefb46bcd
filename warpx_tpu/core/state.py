"""Simulation state pytrees.

The reference keeps all state in a singleton god-object (Source/WarpX.H:1747);
here state is an immutable pytree threaded through a pure step function:
``SimState{fields, species, step, time}``.  Static configuration lives outside
the pytree (see warpx_tpu.core.config) and is closed over by jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _register(cls, data_fields, meta_fields=()):
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )
    return cls


@dataclasses.dataclass(frozen=True)
class FieldState:
    """Per-level electromagnetic grid state.

    Arrays hold the unique (valid-region) values per component on the periodic
    torus; guard-cell semantics are realized with modular indexing / halo
    exchange at the use sites.  Mirrors the fp registry entries
    Efield_fp/Bfield_fp/current_fp/rho_fp (reference: Source/Fields.H:28-81).
    """

    Ex: jnp.ndarray
    Ey: jnp.ndarray
    Ez: jnp.ndarray
    Bx: jnp.ndarray
    By: jnp.ndarray
    Bz: jnp.ndarray
    jx: jnp.ndarray
    jy: jnp.ndarray
    jz: jnp.ndarray
    F: Optional[jnp.ndarray] = None
    G: Optional[jnp.ndarray] = None
    # nodal electrostatic potential from the last Poisson solve (ES runs
    # only; reference: phi_fp registry entry, diag "phi")
    phi: Optional[jnp.ndarray] = None
    # time-averaged fields (averaged Galilean PSATD: Efield_avg_fp)
    Ex_avg: Optional[jnp.ndarray] = None
    Ey_avg: Optional[jnp.ndarray] = None
    Ez_avg: Optional[jnp.ndarray] = None
    Bx_avg: Optional[jnp.ndarray] = None
    By_avg: Optional[jnp.ndarray] = None
    Bz_avg: Optional[jnp.ndarray] = None
    # hybrid-PIC temporaries: rho^n and J_i^{n-1/2} carried between steps
    # (reference: hybrid_rho_fp_temp / hybrid_current_fp_temp)
    hrho: Optional[jnp.ndarray] = None
    hjx: Optional[jnp.ndarray] = None
    hjy: Optional[jnp.ndarray] = None
    hjz: Optional[jnp.ndarray] = None
    # Silver-Mueller guard-cell B state (RZ bounded path: the innermost
    # guard layer outside an absorbing wall is DYNAMIC state — it evolves
    # only via the first-order absorbing recurrence,
    # ApplySilverMuellerBoundary.cpp:37-175; the Cartesian bounded path
    # stores guards inside its extended arrays instead)
    smg: Optional[Dict[str, jnp.ndarray]] = None

    def e(self):
        return (self.Ex, self.Ey, self.Ez)

    def b(self):
        return (self.Bx, self.By, self.Bz)

    def j(self):
        return (self.jx, self.jy, self.jz)

    def replace(self, **kw) -> "FieldState":
        return dataclasses.replace(self, **kw)


_register(
    FieldState,
    ["Ex", "Ey", "Ez", "Bx", "By", "Bz", "jx", "jy", "jz", "F", "G", "phi",
     "Ex_avg", "Ey_avg", "Ez_avg", "Bx_avg", "By_avg", "Bz_avg",
     "hrho", "hjx", "hjy", "hjz", "smg"],
)


@dataclasses.dataclass(frozen=True)
class ParticleState:
    """Fixed-capacity SoA particle arrays for one species.

    The reference's dynamic per-box tiles (WarpXParticleContainer SoA, PIdx
    attributes x,y,z,w,ux,uy,uz) become fixed-capacity arrays with an `alive`
    validity mask, as TPUs require static shapes.  Positions are absolute SI
    coordinates; `ux,uy,uz` are proper velocities gamma*v [m/s] like the
    reference.  2D runs carry x,z (y inactive); 1D runs carry z only; inactive
    position arrays are None.
    """

    w: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    uz: jnp.ndarray
    alive: jnp.ndarray  # bool
    x: Optional[jnp.ndarray] = None
    y: Optional[jnp.ndarray] = None
    z: Optional[jnp.ndarray] = None
    extra: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.w.shape[0]

    def positions(self, ndim: int):
        if ndim == 1:
            return (self.z,)
        if ndim == 2:
            return (self.x, self.z)
        return (self.x, self.y, self.z)

    def with_positions(self, ndim: int, pos) -> "ParticleState":
        if ndim == 1:
            return dataclasses.replace(self, z=pos[0])
        if ndim == 2:
            return dataclasses.replace(self, x=pos[0], z=pos[1])
        return dataclasses.replace(self, x=pos[0], y=pos[1], z=pos[2])

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)


_register(ParticleState, ["w", "ux", "uy", "uz", "alive", "x", "y", "z", "extra"])


@dataclasses.dataclass(frozen=True)
class SimState:
    """Complete simulation state advanced by the step function.

    ``aux`` carries traced scalars that evolve with the run outside the field/
    particle arrays: moving-window position and cell offset, per-species
    continuous-injection positions (reference: WarpX::moving_window_x and
    WarpXParticleContainer::m_current_injection_position).
    """

    fields: FieldState
    species: Dict[str, ParticleState]
    step: jnp.ndarray  # int32 scalar
    time: jnp.ndarray  # float scalar
    rng: jnp.ndarray  # PRNG key
    aux: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)


_register(SimState, ["fields", "species", "step", "time", "rng", "aux"])
