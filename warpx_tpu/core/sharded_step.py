"""Multi-chip SPMD PIC step under shard_map.

The reference's one-step + communication pattern (OneStep_nosub with
FillBoundary / SyncCurrent / Redistribute, Source/Evolve/WarpXEvolve.cpp:354,
Source/Parallelization/WarpXComm.cpp) expressed TPU-natively: each device owns
one spatial block of the fields and the particles inside it; guard cells are
materialized per step by ppermute halo exchange, deposition guards are folded
back additively, and out-of-block particles ride fixed-size ppermute buffers.
Everything below runs inside one jit-ted shard_map — XLA overlaps the ICI
collectives with local compute.

Guard width ng = shape_order + 3 covers the widest stencil: the Esirkepov
window plus one cell of CFL drift (cf. guardCellManager::Init rules,
reference: Source/Parallelization/GuardCellManager.cpp:38-210).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.deposit import deposit_current_direct, deposit_current_esirkepov
from ..ops.gather import gather_eb
from ..ops.push import PUSHERS, position_step
from ..parallel.halo import accumulate_guards, exchange_halos
from ..parallel.particles import exchange_particles
from ..parallel.topology import SpatialMesh
from ..solvers.yee_padded import evolve_b_padded, evolve_e_padded
from .config import SimConfig
from .state import SimState

__all__ = [
    "make_sharded_step", "make_balanced_step", "make_balanced_half_push",
    "guard_cells_for",
]


def guard_cells_for(order: int) -> int:
    return order + 3


def make_sharded_step(cfg: SimConfig, staggering: Dict, smesh: SpatialMesh):
    """Build the jitted SPMD step function state -> state."""
    geom = cfg.geometry
    ndim = geom.ndim
    dt = cfg.dt
    order = cfg.particle_shape
    ng = guard_cells_for(order)
    local_nc = smesh.local_n_cell(geom)
    for d, nc in enumerate(local_nc):
        if nc < ng:
            raise ValueError(
                f"local block {local_nc} smaller than guard width {ng}"
            )
    # mesh axis name per array dim (None -> unsharded, in-shard periodic wrap)
    dim_axes = [
        ax if smesh.n_shards(ax) > 1 else None for ax in geom.axis_names
    ]
    padded_shape = tuple(n + 2 * ng for n in local_nc)
    exchange_K = max(64, (max(local_nc) ** (ndim - 1)) * 4)

    field_spec = smesh.field_pspec(geom)
    particle_spec = smesh.particle_pspec()

    def local_domain():
        lo, hi = [], []
        for d, ax in enumerate(geom.axis_names):
            idx = lax.axis_index(ax) if smesh.n_shards(ax) > 1 else 0
            ext = local_nc[d] * geom.dx[d]
            lo.append(geom.prob_lo[d] + idx * ext)
            hi.append(geom.prob_lo[d] + (idx + 1) * ext)
        return lo, hi

    def step_local(state: SimState) -> SimState:
        fields = state.fields
        local_lo, local_hi = local_domain()

        # --- halo-exchange E,B once with ng guards: serves gather
        farr_pad = {
            name: exchange_halos(arr, ng, dim_axes)
            for name, arr in (
                ("Ex", fields.Ex), ("Ey", fields.Ey), ("Ez", fields.Ez),
                ("Bx", fields.Bx), ("By", fields.By), ("Bz", fields.Bz),
            )
        }

        j_total = None
        new_species = {}
        total_lost = jnp.zeros((), jnp.int32)
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            # park dead slots at the local block center (safe indices)
            center = [0.5 * (local_lo[d] + local_hi[d]) for d in range(ndim)]
            pos = [
                jnp.where(sp.alive, p, center[d])
                for d, p in enumerate(sp.positions(ndim))
            ]

            if sp_cfg.do_not_gather:
                zeros = jnp.zeros_like(sp.ux)
                ex = ey = ez = bx = by = bz = zeros
            else:
                ex, ey, ez, bx, by, bz = gather_eb(
                    pos, farr_pad, staggering, geom, order,
                    cfg.galerkin, origin=local_lo, wrap=False, offset=ng,
                )
            if sp_cfg.do_not_push:
                ux, uy, uz = sp.ux, sp.uy, sp.uz
                new_pos = pos
            else:
                pusher = PUSHERS[sp_cfg.pusher]
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                    sp_cfg.charge, sp_cfg.mass, dt,
                )
                new_pos = position_step(pos, ux, uy, uz, dt, ndim)

            if not sp_cfg.do_not_deposit:
                w_eff = jnp.where(sp.alive, sp.w, 0.0)
                if cfg.current_deposition == "esirkepov":
                    jx, jy, jz = deposit_current_esirkepov(
                        new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                        geom, dt, order,
                        origin=local_lo, wrap=False, offset=ng,
                        out_shape=padded_shape,
                        chunk_size=cfg.deposit_chunk_size,
                    )
                else:
                    jx, jy, jz = deposit_current_direct(
                        new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                        geom, staggering, dt, order,
                        origin=local_lo, wrap=False, offset=ng,
                        out_shape=padded_shape,
                    )
                j_total = (
                    (jx, jy, jz)
                    if j_total is None
                    else tuple(a + b for a, b in zip(j_total, (jx, jy, jz)))
                )

            sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
            sp_new = sp_new.with_positions(ndim, new_pos)
            # neighbor exchange with unwrapped positions, then global wrap
            sp_new, lost = exchange_particles(
                sp_new, ndim, dim_axes, local_lo, local_hi, exchange_K
            )
            total_lost = total_lost + lost
            wrapped = []
            for d in range(ndim):
                lo_g, hi_g = geom.prob_lo[d], geom.prob_hi[d]
                wrapped.append(
                    lo_g + jnp.mod(sp_new.positions(ndim)[d] - lo_g, hi_g - lo_g)
                )
            new_species[sp_cfg.name] = sp_new.with_positions(ndim, wrapped)

        if j_total is None:
            jx = jy = jz = jnp.zeros(local_nc, fields.Ex.dtype)
        else:
            jx, jy, jz = (
                accumulate_guards(a, ng, dim_axes) for a in j_total
            )
        fields = fields.replace(jx=jx, jy=jy, jz=jz)

        # --- field advance with 1-cell halos: B half, E full, B half
        def pad1(arrs):
            return tuple(exchange_halos(a, 1, dim_axes) for a in arrs)

        Bx, By, Bz = evolve_b_padded(
            fields.b(), pad1(fields.e()), geom.dx, ndim, 0.5 * dt
        )
        Ex, Ey, Ez = evolve_e_padded(
            fields.e(), pad1((Bx, By, Bz)), (jx, jy, jz), geom.dx, ndim, dt
        )
        Bx, By, Bz = evolve_b_padded(
            (Bx, By, Bz), pad1((Ex, Ey, Ez)), geom.dx, ndim, 0.5 * dt
        )
        fields = fields.replace(Ex=Ex, Ey=Ey, Ez=Ez, Bx=Bx, By=By, Bz=Bz)

        # surface exchange-buffer overflow: cumulative, replicated count the
        # host asserts on at flush (parallel/particles.py contract)
        shard_axes = tuple(ax for ax in dim_axes if ax is not None)
        if shard_axes:
            total_lost = lax.psum(total_lost, shard_axes)
        aux = dict(state.aux)
        aux["lost"] = aux.get("lost", jnp.zeros((), jnp.int32)) + total_lost

        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
            aux=aux,
        )

    # --- shard_map wrapping: fields sharded spatially, particles blocked
    state_specs = _state_pspecs(cfg, field_spec, particle_spec)
    wrapped = shard_map(
        step_local,
        mesh=smesh.mesh,
        in_specs=(state_specs,),
        out_specs=state_specs,
    )
    return jax.jit(wrapped)


def make_balanced_step(cfg: SimConfig, staggering: Dict, smesh: SpatialMesh):
    """Balanced-mode SPMD step: particles ride their ASSIGNED chip.

    After a dynamic load balance (parallel/load_balance.py, the analog of
    WarpXRegrid.cpp:74-160 makeKnapSack/makeSFC + RemakeLevel) particles no
    longer live with their slab owner, so gather reads from an all-gathered
    global E,B copy and deposition emits a global J that is psum'd once and
    sliced back to the slab owner.  Field work stays on the even slab
    sharding (the Maxwell update is per-cell uniform — already balanced);
    particle work follows the knapsack map.  The all_gather+psum pair is
    the price of balance, adopted only when the measured efficiency gain
    beats load_balance_efficiency_ratio_threshold, exactly like the
    reference's doLoadBalance test (WarpXRegrid.cpp:119-124).
    """
    geom = cfg.geometry
    ndim = geom.ndim
    dt = cfg.dt
    order = cfg.particle_shape
    local_nc = smesh.local_n_cell(geom)
    dim_axes = [
        ax if smesh.n_shards(ax) > 1 else None for ax in geom.axis_names
    ]
    shard_axes = tuple(ax for ax in dim_axes if ax is not None)

    def to_global(arr):
        for d, ax in enumerate(dim_axes):
            if ax is not None:
                arr = lax.all_gather(arr, ax, axis=d, tiled=True)
        return arr

    def slab_slice(arr):
        starts = [
            (lax.axis_index(ax) * local_nc[d]).astype(jnp.int32)
            if ax is not None else jnp.zeros((), jnp.int32)
            for d, ax in enumerate(dim_axes)
        ]
        return lax.dynamic_slice(arr, starts, local_nc)

    center = [
        0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(ndim)
    ]

    def step_local(state: SimState) -> SimState:
        fields = state.fields
        farr = {
            name: to_global(arr)
            for name, arr in (
                ("Ex", fields.Ex), ("Ey", fields.Ey), ("Ez", fields.Ez),
                ("Bx", fields.Bx), ("By", fields.By), ("Bz", fields.Bz),
            )
        }
        j_total = None
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            pos = [
                jnp.where(sp.alive, p, center[d])
                for d, p in enumerate(sp.positions(ndim))
            ]
            if sp_cfg.do_not_gather:
                zeros = jnp.zeros_like(sp.ux)
                ex = ey = ez = bx = by = bz = zeros
            else:
                ex, ey, ez, bx, by, bz = gather_eb(
                    pos, farr, staggering, geom, order, cfg.galerkin,
                )
            if sp_cfg.do_not_push:
                ux, uy, uz = sp.ux, sp.uy, sp.uz
                new_pos = pos
            else:
                pusher = PUSHERS[sp_cfg.pusher]
                ux, uy, uz = pusher(
                    sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                    sp_cfg.charge, sp_cfg.mass, dt,
                )
                new_pos = position_step(pos, ux, uy, uz, dt, ndim)

            if not sp_cfg.do_not_deposit:
                w_eff = jnp.where(sp.alive, sp.w, 0.0)
                if cfg.current_deposition == "esirkepov":
                    j3 = deposit_current_esirkepov(
                        new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                        geom, dt, order,
                        chunk_size=cfg.deposit_chunk_size,
                    )
                else:
                    j3 = deposit_current_direct(
                        new_pos, ux, uy, uz, w_eff, sp_cfg.charge,
                        geom, staggering, dt, order,
                    )
                j_total = (
                    j3 if j_total is None
                    else tuple(a + b for a, b in zip(j_total, j3))
                )

            sp_new = sp.replace(ux=ux, uy=uy, uz=uz)
            wrapped = []
            for d in range(ndim):
                lo_g, hi_g = geom.prob_lo[d], geom.prob_hi[d]
                wrapped.append(
                    lo_g + jnp.mod(new_pos[d] - lo_g, hi_g - lo_g)
                )
            new_species[sp_cfg.name] = sp_new.with_positions(ndim, wrapped)

        if j_total is None:
            jx = jy = jz = jnp.zeros(local_nc, fields.Ex.dtype)
        else:
            if shard_axes:
                j_total = tuple(lax.psum(a, shard_axes) for a in j_total)
            jx, jy, jz = (slab_slice(a) for a in j_total)
        fields = fields.replace(jx=jx, jy=jy, jz=jz)

        def pad1(arrs):
            return tuple(exchange_halos(a, 1, dim_axes) for a in arrs)

        Bx, By, Bz = evolve_b_padded(
            fields.b(), pad1(fields.e()), geom.dx, ndim, 0.5 * dt
        )
        Ex, Ey, Ez = evolve_e_padded(
            fields.e(), pad1((Bx, By, Bz)), (jx, jy, jz), geom.dx, ndim, dt
        )
        Bx, By, Bz = evolve_b_padded(
            (Bx, By, Bz), pad1((Ex, Ey, Ez)), geom.dx, ndim, 0.5 * dt
        )
        fields = fields.replace(Ex=Ex, Ey=Ey, Ez=Ez, Bx=Bx, By=By, Bz=Bz)

        return state.replace(
            fields=fields,
            species=new_species,
            step=state.step + 1,
            time=state.time + dt,
        )

    state_specs = _state_pspecs(
        cfg, smesh.field_pspec(geom), smesh.particle_pspec()
    )
    wrapped = shard_map(
        step_local,
        mesh=smesh.mesh,
        in_specs=(state_specs,),
        out_specs=state_specs,
    )
    return jax.jit(wrapped)


def make_balanced_half_push(cfg: SimConfig, staggering: Dict,
                            smesh: SpatialMesh):
    """Sharded PushP for balanced mode: gather from all-gathered fields so
    off-slab (knapsack-assigned) particles see correct E,B."""
    geom = cfg.geometry
    ndim = geom.ndim
    order = cfg.particle_shape
    dim_axes = [
        ax if smesh.n_shards(ax) > 1 else None for ax in geom.axis_names
    ]
    center = [
        0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(ndim)
    ]

    def to_global(arr):
        for d, ax in enumerate(dim_axes):
            if ax is not None:
                arr = lax.all_gather(arr, ax, axis=d, tiled=True)
        return arr

    def push_local(state: SimState, dt_half) -> SimState:
        fields = state.fields
        farr = {
            name: to_global(arr)
            for name, arr in (
                ("Ex", fields.Ex), ("Ey", fields.Ey), ("Ez", fields.Ez),
                ("Bx", fields.Bx), ("By", fields.By), ("Bz", fields.Bz),
            )
        }
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp_cfg.do_not_push or sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            pos = [
                jnp.where(sp.alive, p, center[d])
                for d, p in enumerate(sp.positions(ndim))
            ]
            ex, ey, ez, bx, by, bz = gather_eb(
                pos, farr, staggering, geom, order, cfg.galerkin,
            )
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                sp_cfg.charge, sp_cfg.mass, dt_half,
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    state_specs = _state_pspecs(
        cfg, smesh.field_pspec(geom), smesh.particle_pspec()
    )
    wrapped = shard_map(
        push_local,
        mesh=smesh.mesh,
        in_specs=(state_specs, P()),
        out_specs=state_specs,
    )
    return jax.jit(wrapped)


def make_sharded_half_push(cfg: SimConfig, staggering: Dict, smesh: SpatialMesh):
    """Sharded PushP (synchronization half momentum push)."""
    geom = cfg.geometry
    ndim = geom.ndim
    order = cfg.particle_shape
    ng = guard_cells_for(order)
    local_nc = smesh.local_n_cell(geom)
    dim_axes = [
        ax if smesh.n_shards(ax) > 1 else None for ax in geom.axis_names
    ]

    def push_local(state: SimState, dt_half) -> SimState:
        fields = state.fields
        lo, hi = [], []
        for d, ax in enumerate(geom.axis_names):
            idx = lax.axis_index(ax) if smesh.n_shards(ax) > 1 else 0
            ext = local_nc[d] * geom.dx[d]
            lo.append(geom.prob_lo[d] + idx * ext)
            hi.append(geom.prob_lo[d] + (idx + 1) * ext)
        farr_pad = {
            name: exchange_halos(arr, ng, dim_axes)
            for name, arr in (
                ("Ex", fields.Ex), ("Ey", fields.Ey), ("Ez", fields.Ez),
                ("Bx", fields.Bx), ("By", fields.By), ("Bz", fields.Bz),
            )
        }
        new_species = {}
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp_cfg.do_not_push or sp.capacity == 0:
                new_species[sp_cfg.name] = sp
                continue
            center = [0.5 * (lo[d] + hi[d]) for d in range(ndim)]
            pos = [
                jnp.where(sp.alive, p, center[d])
                for d, p in enumerate(sp.positions(ndim))
            ]
            ex, ey, ez, bx, by, bz = gather_eb(
                pos, farr_pad, staggering, geom, order,
                cfg.galerkin, origin=lo, wrap=False, offset=ng,
            )
            pusher = PUSHERS[sp_cfg.pusher]
            ux, uy, uz = pusher(
                sp.ux, sp.uy, sp.uz, ex, ey, ez, bx, by, bz,
                sp_cfg.charge, sp_cfg.mass, dt_half,
            )
            new_species[sp_cfg.name] = sp.replace(ux=ux, uy=uy, uz=uz)
        return state.replace(species=new_species)

    field_spec = smesh.field_pspec(geom)
    particle_spec = smesh.particle_pspec()
    state_specs = _state_pspecs(cfg, field_spec, particle_spec)
    wrapped = shard_map(
        push_local,
        mesh=smesh.mesh,
        in_specs=(state_specs, P()),
        out_specs=state_specs,
    )
    return jax.jit(wrapped)


def _state_pspecs(cfg: SimConfig, field_spec, particle_spec,
                  aux_keys=("lost", "lb_efficiency")):
    """PartitionSpec pytree matching SimState."""
    from .state import FieldState, ParticleState, SimState

    fs = FieldState(
        Ex=field_spec, Ey=field_spec, Ez=field_spec,
        Bx=field_spec, By=field_spec, Bz=field_spec,
        jx=field_spec, jy=field_spec, jz=field_spec,
    )
    species = {}
    ndim = cfg.geometry.ndim
    for sp_cfg in cfg.species:
        kw = dict(
            w=particle_spec, ux=particle_spec, uy=particle_spec,
            uz=particle_spec, alive=particle_spec,
        )
        if ndim >= 2:
            kw["x"] = particle_spec
        if ndim == 3:
            kw["y"] = particle_spec
        kw["z"] = particle_spec
        species[sp_cfg.name] = ParticleState(**kw)
    return SimState(
        fields=fs, species=species, step=P(), time=P(), rng=P(),
        aux={k: P() for k in aux_keys},
    )
