"""Device-mesh spatial decomposition.

Replaces the reference's BoxArray + DistributionMapping domain decomposition
(reference: Source/Parallelization/, amrex AmrCore) with a jax.sharding.Mesh
whose axes are spatial dimensions: one equal-size block per device, halos via
ppermute over ICI (SURVEY.md section 2.5 mapping).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.grid import Geometry

__all__ = ["SpatialMesh"]


@dataclasses.dataclass(frozen=True)
class SpatialMesh:
    """A device mesh over a subset of the spatial axes.

    ``shape`` maps axis name ('x','y','z') -> number of shards.  Axis names
    must be active axes of the geometry; unlisted axes are unsharded.
    """

    mesh: Mesh
    axis_shards: Tuple[Tuple[str, int], ...]  # ordered (axis, n_shards)

    @classmethod
    def create(cls, shape: Dict[str, int], devices=None) -> "SpatialMesh":
        devices = devices if devices is not None else jax.devices()
        items = tuple(shape.items())
        n = int(np.prod([s for _, s in items])) if items else 1
        if n > len(devices):
            raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
        dev_array = np.array(devices[:n]).reshape([s for _, s in items] or [1])
        axis_names = [a for a, _ in items] or ["_dummy"]
        return cls(mesh=Mesh(dev_array, axis_names), axis_shards=items)

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return tuple(a for a, _ in self.axis_shards)

    def n_shards(self, axis: str) -> int:
        for a, s in self.axis_shards:
            if a == axis:
                return s
        return 1

    @property
    def total_shards(self) -> int:
        return int(np.prod([s for _, s in self.axis_shards])) if self.axis_shards else 1

    # ------------------------------------------------------------- shardings
    def field_pspec(self, geom: Geometry) -> P:
        """PartitionSpec for a grid array laid out on the active axes."""
        names = []
        for ax in geom.axis_names:
            names.append(ax if self.n_shards(ax) > 1 or ax in self.axis_names else None)
        return P(*names)

    def field_sharding(self, geom: Geometry) -> NamedSharding:
        return NamedSharding(self.mesh, self.field_pspec(geom))

    def particle_pspec(self) -> P:
        """Particles are blocked over all mesh axes jointly along their one axis."""
        if not self.axis_shards:
            return P(None)
        return P(tuple(self.axis_names))

    def particle_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.particle_pspec())

    def local_n_cell(self, geom: Geometry) -> Tuple[int, ...]:
        out = []
        for d, ax in enumerate(geom.axis_names):
            s = self.n_shards(ax)
            if geom.n_cell[d] % s:
                raise ValueError(
                    f"n_cell[{ax}]={geom.n_cell[d]} not divisible by {s} shards"
                )
            out.append(geom.n_cell[d] // s)
        return tuple(out)
