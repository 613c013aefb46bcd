#!/usr/bin/env python
"""Perf lab: micro-benchmarks for binned-path variants (TPU).

Times isolated pieces of the binned step under candidate restructurings:
  * extract_windows: current vs transpose-first (v2)
  * fused kernel: f32 vs bf16 MXU operands
Run on the real TPU; every span closed by a scalar pull (tunnel-safe).
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def pull(arr):
    idx = (0,) * arr.ndim
    return float(arr[idx])


def timeit(fn, *args, rtt=0.02):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ndim")]
    pull(leaves[0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    pull([x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ndim")][0])
    rough = max((time.perf_counter() - t0) / 3, 1e-5)
    reps = max(5, min(400, int((10 * max(rtt, 0.02)) / rough)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        pull([x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim")][0])
        best = min(best, (time.perf_counter() - t0 - rtt) / reps)
    return best, out


def extract_windows_v2(grid, spec):
    """Transpose-first window extraction: split+transpose the SMALL field,
    then window-build with leading tile-axis rolls (contiguous moves)."""
    w, off = spec.w, spec.off
    tx, ty, tz = spec.tile
    ntx, nty, ntz = spec.tiles_per_dim
    r = jnp.roll(grid, (off, off, off), axis=(0, 1, 2))
    t = r.reshape(ntx, tx, nty, ty, ntz, tz).transpose(0, 2, 4, 1, 3, 5)
    # windows: concat of k_d=w//tile_d neighbor chunks per axis
    out = t
    for d, (tile, k) in enumerate(((tx, w // tx), (ty, w // ty),
                                   (tz, w // tz))):
        out = jnp.concatenate(
            [jnp.roll(out, -j, axis=d) for j in range(k)], axis=3 + d
        )
    return out.reshape(spec.n_tiles, w, w * w)


def _placement(nt, tile, w, off, n, dtype):
    p = np.zeros((nt, w, n), np.float32)
    t = np.arange(nt)[:, None]
    a = np.arange(w)[None, :]
    g = (t * tile - off + a) % n
    p[t, a, g] = 1.0
    return jnp.asarray(p, dtype)


def extract_windows_mxu(grid, spec, px, py, pz, precision):
    """Windows via placement-matrix contractions on the MXU."""
    w = spec.w
    out = jnp.einsum("xyz,tax,jby,icz->tjiabc", grid, px, py, pz,
                     precision=precision)
    return out.reshape(spec.n_tiles, w, w * w)


def fold_windows_mxu(windows, spec, n_cell, px, py, pz, precision):
    ntx, nty, ntz = spec.tiles_per_dim
    w = spec.w
    arr = windows.reshape(ntx, nty, ntz, w, w, w)
    return jnp.einsum("tjiabc,tax,jby,icz->xyz", arr, px, py, pz,
                      precision=precision)


def main():
    from warpx_tpu.ops.tiling import TileSpec, extract_windows, fold_windows

    n = 64
    spec = TileSpec.create((n, n, n), order=1, n_particles=n**3 * 4,
                           tile=(8, 8, 8), margin=1, interval=40)
    print(f"spec: tile={spec.tile} W={spec.w} p_max={spec.p_max} "
          f"n_tiles={spec.n_tiles} off={spec.off}")
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(n, n, n)), jnp.float32)

    ex1 = jax.jit(functools.partial(extract_windows, spec=spec))
    ex2 = jax.jit(functools.partial(extract_windows_v2, spec=spec))
    t1, w1 = timeit(ex1, grid)
    t2, w2 = timeit(ex2, grid)
    diff = float(jnp.abs(w1 - w2).max())
    print(f"extract v1: {t1*1e3:.3f} ms   v2: {t2*1e3:.3f} ms   "
          f"max|diff|={diff:.2e}")

    # six components at once (shared relayouts might fuse)
    grids6 = tuple(jnp.asarray(rng.normal(size=(n, n, n)), jnp.float32)
                   for _ in range(6))
    six1 = jax.jit(lambda gs: tuple(extract_windows(g, spec) for g in gs))
    six2 = jax.jit(lambda gs: tuple(extract_windows_v2(g, spec) for g in gs))
    t1, _ = timeit(six1, grids6)
    t2, _ = timeit(six2, grids6)
    print(f"extract x6 v1: {t1*1e3:.3f} ms   v2: {t2*1e3:.3f} ms")

    # --- placement-matmul extract/fold ---------------------------------
    pms = tuple(
        _placement(spec.tiles_per_dim[d], spec.tile[d], spec.w, spec.off,
                   n, jnp.float32)
        for d in range(3)
    )
    for prec in ("highest", "default"):
        exm = jax.jit(functools.partial(
            extract_windows_mxu, spec=spec, px=pms[0], py=pms[1],
            pz=pms[2], precision=prec))
        tm, wm = timeit(exm, grid)
        diff = float(jnp.abs(w1 - wm).max())
        sixm = jax.jit(lambda gs: tuple(exm(g) for g in gs))
        t6, _ = timeit(sixm, grids6)
        print(f"extract mxu[{prec}]: {tm*1e3:.3f} ms  x6: {t6*1e3:.3f} ms"
              f"  max|diff|={diff:.2e}")

    wnd = jnp.asarray(rng.normal(size=(spec.n_tiles, spec.w, spec.w**2)),
                      jnp.float32)
    f1 = jax.jit(functools.partial(fold_windows, spec=spec,
                                   n_cell=(n, n, n)))
    tf1, g1 = timeit(f1, wnd)
    for prec in ("highest", "default"):
        f2 = jax.jit(functools.partial(
            fold_windows_mxu, spec=spec, n_cell=(n, n, n), px=pms[0],
            py=pms[1], pz=pms[2], precision=prec))
        tf2, g2 = timeit(f2, wnd)
        rel = float(jnp.abs(g1 - g2).max() / jnp.abs(g1).max())
        print(f"fold v1: {tf1*1e3:.3f} ms  mxu[{prec}]: {tf2*1e3:.3f} ms"
              f"  rel|diff|={rel:.2e}")

    # --- rebin sort cost anatomy ---------------------------------------
    npart = spec.n_tiles * spec.p_max
    key = jnp.asarray(rng.integers(0, spec.n_tiles, npart), jnp.int32)
    cols = [jnp.asarray(rng.random(npart), jnp.float32) for _ in range(11)]
    for k in (1, 2, 11):
        srt = jax.jit(functools.partial(
            lambda key, cs: jax.lax.sort([key] + list(cs), num_keys=1),
        ))
        ts, _ = timeit(srt, key, cols[:k - 1] if k > 1 else [])
        print(f"sort 1 key + {k-1} payload ops ({npart/1e6:.1f}M): "
              f"{ts*1e3:.3f} ms")
    # key+index sort, then take
    def sort_take(key, cs):
        idx = jnp.arange(npart, dtype=jnp.int32)
        _, perm = jax.lax.sort([key, idx], num_keys=1)
        return [c[perm] for c in cs]
    st = jax.jit(sort_take)
    ts, _ = timeit(st, key, cols)
    print(f"sort key+idx then take x11: {ts*1e3:.3f} ms")


if __name__ == "__main__":
    main()
