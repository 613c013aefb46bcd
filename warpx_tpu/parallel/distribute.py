"""Distribute an initial SimState onto a SpatialMesh.

Host-side analog of the reference's initial DistributionMapping: particles are
binned by owning spatial block (one block per device) and packed into equal
fixed-capacity per-shard segments of one global array, so that
``shard_map``'s blocked partitioning hands every device exactly its own
particles.
"""

from __future__ import annotations

import numpy as np
import jax

from ..core.grid import Geometry
from ..core.state import ParticleState, SimState
from .topology import SpatialMesh

__all__ = ["distribute_state", "shard_capacity", "pack_by_owner"]


def shard_capacity(count_max: int, headroom: float = 1.5, multiple: int = 8) -> int:
    cap = int(np.ceil(count_max * headroom / multiple) * multiple)
    return max(cap, multiple)


def _owner_index(pos_active: np.ndarray, geom: Geometry, smesh: SpatialMesh):
    """Flattened shard index (C-order over mesh axes) per particle."""
    idx = np.zeros(pos_active.shape[0], dtype=np.int64)
    for ax, s in smesh.axis_shards:
        d = geom.axis_names.index(ax)
        ext = (geom.prob_hi[d] - geom.prob_lo[d]) / s
        block = np.clip(
            ((pos_active[:, d] - geom.prob_lo[d]) // ext).astype(np.int64), 0, s - 1
        )
        idx = idx * s + block
    return idx


def pack_by_owner(
    ps: ParticleState, owner: np.ndarray, n_shards: int, cap: int,
    geom: Geometry,
) -> ParticleState:
    """Repack particles into per-shard segments of width ``cap`` by the
    given owner index (-1 = dead slot, dropped).  Host-side analog of a
    Redistribute after a new DistributionMapping is adopted
    (reference: WarpXRegrid.cpp:146 RemakeLevel -> Redistribute)."""
    ndim = geom.ndim
    counts = np.bincount(owner[owner >= 0], minlength=n_shards)
    if counts.size and int(counts.max()) > cap:
        raise RuntimeError(
            f"load-balance repack overflow: a chip was assigned "
            f"{int(counts.max())} particles > segment capacity {cap}; "
            "increase headroom"
        )
    pos = np.stack([np.asarray(p) for p in ps.positions(ndim)], axis=-1)

    def pack(arr, fill=0.0):
        arr = np.asarray(arr)
        out = np.full((n_shards * cap,) + arr.shape[1:], fill, dtype=arr.dtype)
        for s in range(n_shards):
            sel = np.nonzero(owner == s)[0]
            out[s * cap : s * cap + sel.size] = arr[sel]
        return out

    new_alive = np.zeros(n_shards * cap, dtype=bool)
    for s in range(n_shards):
        new_alive[s * cap : s * cap + counts[s]] = True

    kw = dict(
        w=pack(ps.w),
        ux=pack(ps.ux),
        uy=pack(ps.uy),
        uz=pack(ps.uz),
        alive=new_alive,
        extra={k: pack(v) for k, v in ps.extra.items()},
    )
    pos_names = {1: ["z"], 2: ["x", "z"], 3: ["x", "y", "z"]}[ndim]
    # park dead slots mid-domain; the sharded step re-parks per-block anyway
    for d, nm in enumerate(pos_names):
        center = 0.5 * (geom.prob_lo[d] + geom.prob_hi[d])
        kw[nm] = pack(pos[:, d], fill=center)
    return ParticleState(**kw)


def distribute_particles(
    ps: ParticleState, geom: Geometry, smesh: SpatialMesh, headroom: float = 1.5
) -> ParticleState:
    ndim = geom.ndim
    n_shards = smesh.total_shards
    pos = np.stack([np.asarray(p) for p in ps.positions(ndim)], axis=-1)
    alive = np.asarray(ps.alive)
    owner = _owner_index(pos, geom, smesh)
    owner = np.where(alive, owner, -1)

    counts = np.bincount(owner[owner >= 0], minlength=n_shards)
    cap = shard_capacity(int(counts.max()) if counts.size else 0, headroom)
    return pack_by_owner(ps, owner, n_shards, cap, geom)


def distribute_state(
    state: SimState, geom: Geometry, smesh: SpatialMesh, headroom: float = 1.5
) -> SimState:
    """Re-layout state and device_put with the mesh shardings."""
    species = {
        name: distribute_particles(sp, geom, smesh, headroom)
        for name, sp in state.species.items()
    }
    fsh = smesh.field_sharding(geom)
    psh = smesh.particle_sharding()
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(smesh.mesh, P())

    def put_tree(tree, sharding):
        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, sharding), tree
        )

    fields = put_tree(state.fields, fsh)
    species = {name: put_tree(sp, psh) for name, sp in species.items()}
    return state.replace(
        fields=fields,
        species=species,
        step=jax.device_put(state.step, rep),
        time=jax.device_put(state.time, rep),
        rng=jax.device_put(state.rng, rep),
    )
