#!/usr/bin/env python
"""On-device breakdown of the tile-binned PIC step.

Times each phase of binned_pic_step separately (kernel, extract, fold, rebin,
Maxwell) so the optimization target is measured, not guessed.  Every timed
span is closed with a scalar D2H pull (the axon tunnel's block_until_ready
returns early; see bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def pull(arr):
    idx = (0,) * arr.ndim
    return float(arr[idx])


def timeit(fn, *args, reps=None, rtt=0.0):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim") and x.dtype != bool]
    pull(leaves[0])
    # calibrate reps so the span is >> rtt noise
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ndim") and x.dtype != bool]
    pull(leaves[0])
    rough = max((time.perf_counter() - t0) / 3, 1e-5)
    if reps is None:
        reps = max(5, min(400, int((10 * max(rtt, 0.02)) / rough)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ndim") and x.dtype != bool]
        pull(leaves[0])
        best = min(best, max(time.perf_counter() - t0 - rtt, 1e-9) / reps)
    return best


def main():
    from bench import _build_sim
    n = int(os.environ.get("BENCH_NCELL", 64))
    ppc = int(os.environ.get("BENCH_PPC", 2))
    sim, n_particles = _build_sim(n, ppc)
    state = sim.init()
    state = sim._step(state)
    pull(state.fields.Ex)
    rtt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); pull(state.fields.Ex)
        rtt = min(rtt, time.perf_counter() - t0)
    print(f"device={jax.devices()[0]} n={n} ppc={ppc} particles={n_particles} rtt={rtt*1e3:.2f}ms")

    spec = sim.tile_spec
    cfg = sim.cfg
    print(f"tilespec: tile={spec.tile} W={spec.w} p_max={spec.p_max} n_tiles={spec.n_tiles} off={spec.off} interval={spec.interval}")

    t_step = timeit(sim._step, state, rtt=rtt)
    print(f"full step: {t_step*1e3:.3f} ms  -> {t_step/n_particles*1e9:.2f} ns/particle  ({n_particles/t_step/1e6:.1f} M pushes/s)")

    from warpx_tpu.ops.tiling import fold_windows, rebin
    from warpx_tpu.ops.pallas_pic import binned_push_deposit, pad_fields
    from warpx_tpu.core.binned_step import _FOLD_AXES
    from warpx_tpu.core.step import advance_fields

    geom = cfg.geometry
    farr = state.fields
    f = farr.Ex.dtype
    stag_items = tuple(sorted((k, tuple(v)) for k, v in sim.staggering.items()))

    def pad6(fs, mxu="f32"):
        return pad_fields((fs.Ex, fs.Ey, fs.Ez, fs.Bx, fs.By, fs.Bz),
                          spec, mxu)

    t_ex = timeit(jax.jit(pad6), farr, rtt=rtt)
    print(f"pad_fields x6: {t_ex*1e3:.3f} ms ({t_ex/n_particles*1e9:.2f} ns/p)")

    sp_cfg = cfg.species[0]
    sp = state.species[sp_cfg.name]
    nt, pmax = spec.n_tiles, spec.p_max
    w_eff = jnp.where(sp.alive, sp.w, jnp.zeros((), f))
    parts7 = tuple(a.reshape(nt, pmax) for a in (sp.x, sp.y, sp.z, sp.ux, sp.uy, sp.uz, w_eff))
    params = jnp.array([[sp_cfg.charge, sp_cfg.mass, 0., 0., 0., 0., 0., 0.]], f)

    nsp = n_particles // 2  # one species
    for mxu in ("f32", "mixed", "bf16"):
        fields6 = jax.jit(pad6, static_argnums=1)(farr, mxu)

        def run_kernel(fields6, parts7, mxu=mxu):
            return binned_push_deposit(
                params, fields6, parts7, spec=spec, geom=geom,
                order=cfg.particle_shape, galerkin=cfg.galerkin,
                pusher_name=sp_cfg.pusher, dt=cfg.dt, stag_items=stag_items,
                mxu=mxu)

        t_k = timeit(run_kernel, fields6, parts7, rtt=rtt)
        print(f"fused kernel[{mxu}] (1 species, {nsp} parts): {t_k*1e3:.3f} ms ({t_k/nsp*1e9:.2f} ns/p)  x2 species = {2*t_k/n_particles*1e9:.2f} ns/p-total")

    fields6 = jax.jit(pad6)(farr)

    def run_kernel(fields6, parts7):
        return binned_push_deposit(
            params, fields6, parts7, spec=spec, geom=geom,
            order=cfg.particle_shape, galerkin=cfg.galerkin,
            pusher_name=sp_cfg.pusher, dt=cfg.dt, stag_items=stag_items)

    _, jw, _ = run_kernel(fields6, parts7)
    fold3 = jax.jit(lambda jw: tuple(
        fold_windows(jw[i], spec, geom.n_cell, axes=_FOLD_AXES[3][i])
        for i in range(3)))
    t_f = timeit(fold3, jw, rtt=rtt)
    print(f"fold_windows x3: {t_f*1e3:.3f} ms ({t_f/n_particles*1e9:.2f} ns/p)")

    j3 = fold3(jw)
    adv = jax.jit(lambda fs, j3: advance_fields(fs, cfg, j3, None, None, None, sim.psatd))
    t_a = timeit(adv, farr, j3, rtt=rtt)
    print(f"advance_fields: {t_a*1e3:.3f} ms ({t_a/n_particles*1e9:.2f} ns/p)")

    reb = jax.jit(lambda s: rebin(s, geom, spec))
    t_r = timeit(reb, sp, rtt=rtt)
    print(f"rebin (1 species): {t_r*1e3:.3f} ms; /interval={spec.interval} x2 species -> {2*t_r/spec.interval/n_particles*1e9:.2f} ns/p amortized")

    total = t_ex + 2*t_k + t_f + t_a + 2*t_r/spec.interval
    print(f"sum of phases: {total*1e3:.3f} ms vs full step {t_step*1e3:.3f} ms")


if __name__ == "__main__":
    main()
