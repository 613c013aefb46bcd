"""Tile-binned particle layout for the TPU-native hot path.

The reference keeps particles bin-sorted by tile for its GPU shared-memory
deposition (reference: Source/Particles/Sorting/SortingUtils.H,
WarpXParticleContainer.cpp:490-548 shared-mem binned deposition,
WarpXEvolve.cpp:575-580 periodic SortParticlesByBin).  Here the same idea is
TPU-native: particles live in a fixed-capacity padded layout of
``n_tiles x p_max`` slots, re-sorted every ``interval`` steps, so that the
fused Pallas gather+push+deposit kernel (ops/pallas_pic.py) can process one
tile per grid step entirely in VMEM with dense one-hot/matmul arithmetic
instead of random-access gather/scatter.

Pieces:
  * TileSpec       — static tiling geometry (tile shape, window width, margin)
  * rebin          — sort particles into the padded tile layout (+ overflow)
  * extract_windows— grid -> per-tile field windows (periodic, dense takes)
  * fold_windows   — per-tile J windows -> grid (periodic overlap-add, rolls)
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["TileSpec", "rebin", "extract_windows", "fold_windows",
           "fold_windows_open"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """Static tile/window geometry for the binned hot path (2D XZ or 3D).

    ``w`` is the per-dim window width: every index an order-``order``
    Esirkepov deposition (T = order+3 taps, start index floor(x)-s_lo) or
    shape-``order`` gather can touch for any particle that was inside the
    tile at the last rebin and has drifted at most ``margin`` cells since.
    Window start (grid units) for tile t is ``t*tile - off``.
    """

    tile: Tuple[int, ...]
    tiles_per_dim: Tuple[int, ...]
    p_max: int
    order: int
    margin: int
    interval: int
    w: int
    off: int

    @property
    def ndim(self) -> int:
        return len(self.tile)

    @property
    def n_tiles(self) -> int:
        return int(np.prod(self.tiles_per_dim))

    @property
    def capacity(self) -> int:
        return self.n_tiles * self.p_max

    @classmethod
    def create(
        cls,
        n_cell: Tuple[int, ...],
        order: int,
        n_particles: int,
        tile: Tuple[int, ...] = (8, 8, 8),
        margin: int = 1,
        interval: int = 1,
        headroom: float = 2.0,
        p_max: int | None = None,
    ) -> "TileSpec":
        if len(n_cell) not in (2, 3):
            raise NotImplementedError("tiled layout is 2D/3D-only")
        tile = tuple(tile)[-len(n_cell):] if len(tile) != len(n_cell) \
            else tuple(tile)
        tiles_per_dim = []
        for n, t in zip(n_cell, tile):
            if n % t:
                raise ValueError(f"n_cell {n} not divisible by tile {t}")
            tiles_per_dim.append(n // t)
        n_tiles = int(np.prod(tiles_per_dim))
        if p_max is None:
            # 128-granular: the kernel's (S, 128) particle planes make slot
            # occupancy (mean/p_max) a direct multiplier on every VPU op
            mean = max(1, n_particles // n_tiles)
            p_max = _round_up(int(math.ceil(mean * headroom)), 128)
        taps = order + 3
        s_lo = (order + 1) // 2 + 1  # window reaches floor(x) - s_lo + 1
        # lo side: start index >= t*tile - margin - s_lo
        # hi side: last tap  <= t*tile + tile-1 + margin - s_lo + taps - 1
        off = margin + s_lo
        w_min = tile[0] + taps + 2 * margin + 1
        w = _round_up(w_min, 8)
        return cls(
            tile=tuple(tile),
            tiles_per_dim=tuple(tiles_per_dim),
            p_max=int(p_max),
            order=order,
            margin=margin,
            interval=interval,
            w=w,
            off=off,
        )


def tile_ids(positions, geom, spec: TileSpec, origin=None):
    """Linear tile id per particle from (already wrapped) positions.

    ``origin`` overrides the per-dim tiling origin (may contain traced
    scalars — the moving-window binned path anchors tiles in space at the
    last rebin, so the origin is the dynamic anchor, not prob_lo)."""
    lo_all = geom.prob_lo if origin is None else origin
    ids = 0
    for d in range(spec.ndim):
        gd = (positions[d] - lo_all[d]) * (1.0 / geom.dx[d])
        idx = jnp.clip(
            jnp.floor(gd).astype(jnp.int32) // spec.tile[d],
            0,
            spec.tiles_per_dim[d] - 1,
        )
        ids = ids * spec.tiles_per_dim[d] + idx
    return ids


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


def _ragged_expand_kernel(blk_ref, res_ref, src_ref, out_ref, scratch, sem,
                          *, tb, ex, p_max, n_rows):
    """Per-tile HBM->VMEM DMA slot expansion (see _ragged_expand)."""
    t0 = pl.program_id(0) * tb

    def start(i):
        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(blk_ref[t0 + i] * 128, ex)],
            scratch.at[i % 2], sem.at[i % 2],
        ).start()

    start(0)

    def body(i, _):
        @pl.when(i + 1 < tb)
        def _():
            start(i + 1)

        pltpu.make_async_copy(
            src_ref.at[:, pl.ds(blk_ref[t0 + i] * 128, ex)],
            scratch.at[i % 2], sem.at[i % 2],
        ).wait()
        # residual sub-128 shift: Mosaic's dynamic lane roll is only correct
        # for power-of-two lane counts, hence ex = next_pow2(p_max + 128)
        rolled = pltpu.roll(scratch[i % 2], -res_ref[t0 + i], 1)
        out_ref[:, pl.ds(i * p_max, p_max)] = rolled[:, :p_max]
        return 0

    jax.lax.fori_loop(0, tb, body, 0, unroll=True)


def _ragged_expand(payload_sorted, offsets, n_tiles, p_max):
    """Expand tile-sorted ragged segments into the padded slot layout:

        out[:, t*p_max + s] = payload_sorted[:, offsets[t] + s]

    (callers mask s >= counts[t] afterwards).  XLA lowers the equivalent
    gather at ~6 ns/element on TPU (~60x off HBM bandwidth); this Pallas
    kernel instead DMAs each tile's contiguous segment from a 128-aligned
    lane base straight into its slot block and applies the sub-128 residual
    shift with an in-VMEM lane roll — ~18x faster at LWFA shapes
    (tools/profile_rebin_lwfa.py: 175 -> 9.6 ms at 8192 tiles x 512 slots).
    """
    n_attr, cap = payload_sorted.shape
    ex = _next_pow2(p_max + 128)
    rows = _round_up(n_attr, 8)
    # tiles per program: amortizes grid/launch overhead; must divide n_tiles
    tb = 16
    while n_tiles % tb:
        tb //= 2
    psp = jnp.pad(
        payload_sorted,
        ((0, rows - n_attr), (0, (-cap) % 128 + ex + 128)),
    )
    blk = offsets // 128
    res = offsets - blk * 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (rows, tb * p_max), lambda g, blk, res: (0, g),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, ex), payload_sorted.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _ragged_expand_kernel, tb=tb, ex=ex, p_max=p_max, n_rows=rows,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (rows, n_tiles * p_max), payload_sorted.dtype
        ),
        grid_spec=grid_spec,
    )(blk, res, psp)
    return out[:n_attr]


def rebin(sp, geom, spec: TileSpec, origin=None, wrap_dims=None):
    """Sort a species into the padded (n_tiles, p_max) tile layout.

    Positions are wrapped into the periodic domain first (between rebins the
    step function deliberately leaves positions unwrapped so window-relative
    coordinates stay continuous across the boundary).  Dead slots get
    weight 0, zero momentum, and the center position of their tile.

    ``origin`` (per-dim, may be traced) overrides the tiling origin for the
    bounded/moving-window path; ``wrap_dims`` selects which dims get the
    periodic wrap (default: all).  On non-wrapped dims out-of-domain
    particles clip into the edge tiles — callers must have absorbed them
    (weight 0) beforehand.

    Returns (new ParticleState with capacity n_tiles*p_max, overflow count):
    ``overflow`` counts alive particles that did not fit in their tile's
    p_max slots — the caller must treat overflow > 0 as a hard error.
    """
    cap_in = sp.capacity
    ndim = spec.ndim
    n_tiles, p_max = spec.n_tiles, spec.p_max
    if wrap_dims is None:
        wrap_dims = (True,) * ndim
    lo_all = geom.prob_lo if origin is None else origin
    pos = list(sp.positions(ndim))
    for d in range(ndim):
        if not wrap_dims[d]:
            continue
        lo = lo_all[d]
        hi = lo + (geom.prob_hi[d] - geom.prob_lo[d])
        pos[d] = lo + jnp.mod(pos[d] - lo, hi - lo)
    tid = jnp.where(sp.alive, tile_ids(pos, geom, spec, origin=lo_all),
                    n_tiles)

    payload = jnp.stack(
        list(pos)
        + [
            sp.ux, sp.uy, sp.uz, sp.w,
            sp.alive.astype(sp.w.dtype),
        ]
        + [sp.extra[k] for k in sorted(sp.extra)],
        axis=0,
    )
    # multi-operand sort: the payload rides the sorting network (one fused
    # TPU sort) instead of a random gather through a permutation — the
    # remaining slot gather below has near-monotonic indices
    sorted_all = jax.lax.sort(
        [tid.astype(jnp.int32)] + [payload[i] for i in range(payload.shape[0])],
        num_keys=1,
    )
    key_sorted = sorted_all[0]
    payload_sorted = jnp.stack(sorted_all[1:], axis=0)
    # slot (t, s) takes sorted particle offsets[t] + s when s < count[t]
    offsets = jnp.searchsorted(key_sorted, jnp.arange(n_tiles, dtype=jnp.int32))
    counts = (
        jnp.searchsorted(
            key_sorted, jnp.arange(1, n_tiles + 1, dtype=jnp.int32)
        )
        - offsets
    )
    overflow = jnp.sum(jnp.maximum(counts - p_max, 0))

    # per-slot quantities in broadcastable (n_tiles, p_max) form: a per-slot
    # table gather (counts[slot_t] etc.) is a 6 ns/element random access on
    # TPU — at LWFA capacity that one gather costs more than the whole sort
    slot_s2 = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, p_max), 1)
    valid = (slot_s2 < counts[:, None]).reshape(-1)
    if jax.default_backend() == "tpu" and p_max % 128 == 0:
        gathered = _ragged_expand(payload_sorted, offsets, n_tiles, p_max)
    else:
        src = jnp.clip(
            (offsets[:, None] + slot_s2).reshape(-1), 0, cap_in - 1
        )
        gathered = payload_sorted[:, src]  # (n_attr, n_tiles*p_max)

    # dead-slot fills: tile center position, zero momentum/weight
    centers = []
    tile_i = jnp.arange(n_tiles, dtype=jnp.int32)
    for d in range(ndim):
        stride = int(np.prod(spec.tiles_per_dim[d + 1:], initial=1))
        idx_d = (tile_i // stride) % spec.tiles_per_dim[d]
        ctr = (
            lo_all[d]
            + (idx_d.astype(sp.w.dtype) + 0.5) * (spec.tile[d] * geom.dx[d])
        )
        centers.append(
            jnp.broadcast_to(ctr[:, None], (n_tiles, p_max)).reshape(-1)
        )

    def sel(row, fill):
        return jnp.where(valid, gathered[row], fill)

    pos_kw = dict(
        zip(("x", "z") if ndim == 2 else ("x", "y", "z"),
            (sel(d, centers[d]) for d in range(ndim)))
    )
    new = sp.replace(
        **pos_kw,
        ux=sel(ndim, 0.0),
        uy=sel(ndim + 1, 0.0),
        uz=sel(ndim + 2, 0.0),
        w=sel(ndim + 3, 0.0),
        alive=jnp.where(valid, gathered[ndim + 4] > 0.5, False),
        extra={
            k: sel(ndim + 5 + i, 0.0)
            for i, k in enumerate(sorted(sp.extra))
        },
    )
    return new, overflow


def extract_windows(grid: jnp.ndarray, spec: TileSpec) -> jnp.ndarray:
    """Per-tile periodic windows: (n_tiles, W, W*W) with layout (x, (y,z))
    in 3D, (n_tiles, W, W) with layout (x, z) in 2D.

    windows[t, a, b*W+c] = grid[(t_x*tx - off + a) % nx,
                                (t_y*ty - off + b) % ny,
                                (t_z*tz - off + c) % nz]
    — the dense analog of FillBoundary guard cells feeding the tile-local
    gather; the fused (y,z) axis is last so the kernel's MXU contraction
    over it reads the window as the natural (M=W, K=W*W) operand.
    """
    w, off = spec.w, spec.off
    ndim = spec.ndim
    out = grid
    for d in range(ndim):
        nt = spec.tiles_per_dim[d]
        tile = spec.tile[d]
        ax = 2 * d
        if w % tile == 0:
            # roll-based: window = concat of k=W/tile tile-aligned chunks of
            # the off-rolled grid — pure shifts, no gather
            rolled = jnp.roll(out, off, axis=ax)
            tv = rolled.reshape(
                out.shape[:ax] + (nt, tile) + out.shape[ax + 1:]
            )
            out = jnp.concatenate(
                [jnp.roll(tv, -j, axis=ax) for j in range(w // tile)],
                axis=ax + 1,
            )
        else:
            n = out.shape[ax]
            idx = (
                (jnp.arange(nt, dtype=jnp.int32)[:, None] * tile - off)
                + jnp.arange(w, dtype=jnp.int32)[None, :]
            ) % n
            out = jnp.take(out, idx.reshape(-1), axis=ax)
            out = out.reshape(
                out.shape[:ax] + (nt, w) + out.shape[ax + 1:]
            )
    if ndim == 2:
        # (ntx, Wx, ntz, Wz) -> (ntx, ntz, Wx, Wz)
        out = out.transpose(0, 2, 1, 3)
        return out.reshape(spec.n_tiles, w, w)
    # out: (ntx, Wx, nty, Wy, ntz, Wz) -> (ntx, nty, ntz, Wx, Wy, Wz)
    out = out.transpose(0, 2, 4, 1, 3, 5)
    return out.reshape(spec.n_tiles, w, w * w)


def fold_windows(
    windows: jnp.ndarray, spec: TileSpec, n_cell, axes=(0, 1, 2)
) -> jnp.ndarray:
    """Overlap-add per-tile windows back onto the periodic grid.

    The additive counterpart of extract_windows (the analog of SumBoundary
    guard-cell accumulation after deposition, WarpXComm.cpp:1074 SyncCurrent):
    grid[(t*tile - off + a) % n] += windows[t, a].  ``axes`` names the spatial
    axis of each of the three window dims (the deposition kernel emits each J
    component with a different axis order).  ``windows`` is (n_tiles, W, W*W)
    or any shape reshapeable to (ntx, nty, ntz, w, w, w).
    """
    w, off = spec.w, spec.off
    ndim = spec.ndim
    arr = windows.reshape(*spec.tiles_per_dim, *((w,) * ndim))
    if axes != tuple(range(ndim)):
        inv = [0] * ndim
        for pos_, ax in enumerate(axes):
            inv[ax] = ndim + pos_
        arr = arr.transpose(*range(ndim), *inv)
    if all(w % t == 0 for t in spec.tile):
        # roll-based overlap-add (the adjoint of the roll-based extract):
        # chunk j of the window axis adds into tile t+j; then un-roll by off
        out = arr  # (nt..., w...)
        for d in reversed(range(ndim)):
            tile = spec.tile[d]
            k = w // tile
            t_ax, w_ax = d, ndim + d
            chunks = [
                jnp.roll(
                    jax.lax.slice_in_dim(out, j * tile, (j + 1) * tile, axis=w_ax),
                    j, axis=t_ax,
                )
                for j in range(k)
            ]
            out = sum(chunks[1:], chunks[0])
            # merge (nt, tile) -> n and shift back by off
            moved = jnp.moveaxis(out, w_ax, t_ax + 1)
            ms = list(moved.shape)
            merged = moved.reshape(
                ms[:t_ax] + [n_cell[d]] + ms[t_ax + 2:]
            )
            out = jnp.roll(merged, -off, axis=t_ax)
        return out
    if ndim == 2:
        px, pz = (
            jnp.asarray(
                _placement(spec.tiles_per_dim[d], spec.tile[d], w, off,
                           n_cell[d]),
                arr.dtype,
            )
            for d in range(2)
        )
        out = jnp.einsum("abxv,bvn->axn", arr, pz)
        return jnp.einsum("axn,axg->gn", out, px)
    # general fallback: fold each (tile axis, window axis) pair with a 0/1
    # placement matrix P[(t,a), g] = [(t*tile - off + a) mod n == g] — the
    # overlap-add becomes three MXU contractions
    px, py, pz = (
        jnp.asarray(
            _placement(spec.tiles_per_dim[d], spec.tile[d], w, off,
                       n_cell[d]),
            arr.dtype,
        )
        for d in range(3)
    )
    out = jnp.einsum("abcxyv,cvn->abnxy", arr, pz)
    out = jnp.einsum("abnxu,bum->amnx", out, py)
    return jnp.einsum("amnx,axg->gmn", out, px)


def fold_windows_open(
    windows: jnp.ndarray, spec: TileSpec, axes=None
) -> jnp.ndarray:
    """OPEN (non-periodic) overlap-add of per-tile windows.

    The bounded-domain counterpart of ``fold_windows``: no wrap-around —
    returns an array of extent ``n_d + w - tile_d`` per dim whose index p
    corresponds to (anchor-frame) grid index ``p - off``.  The caller embeds
    it into the guard-padded deposition block at the appropriate offset
    (minus the moving-window shift on the window axis), after which the
    slow path's guard handling (periodic fold / bounded drop) applies
    unchanged.  Requires the roll-friendly layout (w % tile == 0).
    """
    w = spec.w
    ndim = spec.ndim
    if axes is None:
        axes = tuple(range(ndim))
    arr = windows.reshape(*spec.tiles_per_dim, *((w,) * ndim))
    if axes != tuple(range(ndim)):
        inv = [0] * ndim
        for pos_, ax in enumerate(axes):
            inv[ax] = ndim + pos_
        arr = arr.transpose(*range(ndim), *inv)
    if not all(w % t == 0 for t in spec.tile):
        raise NotImplementedError("fold_windows_open needs w % tile == 0")
    out = arr
    for d in reversed(range(ndim)):
        tile = spec.tile[d]
        k = w // tile
        t_ax, w_ax = d, ndim + d
        nt = spec.tiles_per_dim[d]
        # chunk j of the window axis adds into padded tile slot t + j:
        # the tile axis grows to nt + k - 1 (extent n + w - tile)
        total = None
        for j in range(k):
            c = jax.lax.slice_in_dim(out, j * tile, (j + 1) * tile,
                                     axis=w_ax)
            pw = [(0, 0)] * c.ndim
            pw[t_ax] = (j, k - 1 - j)
            c = jnp.pad(c, pw)
            total = c if total is None else total + c
        moved = jnp.moveaxis(total, w_ax, t_ax + 1)
        ms = list(moved.shape)
        out = moved.reshape(
            ms[:t_ax] + [(nt + k - 1) * tile] + ms[t_ax + 2:]
        )
    return out


def _placement(nt, tile, w, off, n):
    p = np.zeros((nt, w, n), np.float64)
    t = np.arange(nt)[:, None]
    a = np.arange(w)[None, :]
    g = (t * tile - off + a) % n
    p[t, a, g] = 1.0
    return p
