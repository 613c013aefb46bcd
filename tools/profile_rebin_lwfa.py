#!/usr/bin/env python
"""Time the actual LWFA rebin (and its internal phases) at bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.ops.tiling import rebin
    from warpx_tpu.utils.parser import Deck

    deck = Deck.from_string(bench._LWFA_2D_DECK.format(
        nx=256, nz=2048, ppcx=2, ppcz=2, interval=16, max_step=1344,
        mxu="mixed",
    ))
    sim = Simulation.from_deck(deck)
    sim.init()
    sim.evolve(2)
    spec = sim.tile_spec
    geom = sim.cfg.geometry
    sp = sim.state.species["electrons"]
    print(f"capacity={sp.capacity} n_tiles={spec.n_tiles} p_max={spec.p_max} "
          f"alive={int(jnp.sum(sp.alive))} extra={sorted(sp.extra)}")

    wrap_dims = (False, False)
    origin = tuple(geom.prob_lo)

    @jax.jit
    def full(s):
        new, ovf = rebin(s, geom, spec, origin=origin, wrap_dims=wrap_dims)
        return new.x, ovf

    def timeit(f, *a, n=5):
        out = f(*a)
        bench._pull(out[0])
        t0 = time.perf_counter()
        bench._pull(out[0])
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        bench._pull(out[0])
        return max(time.perf_counter() - t0 - rtt, 1e-9) / n

    print(f"rebin full: {timeit(full, sp)*1e3:.2f} ms")

    # phases
    import numpy as np
    cap = sp.capacity
    n_attr = 2 + 5 + len(sp.extra)
    rng = np.random.default_rng(0)
    tid = jnp.asarray(rng.integers(0, spec.n_tiles, cap), jnp.int32)
    payload = jnp.asarray(
        rng.standard_normal((n_attr, cap)).astype(np.float32))

    @jax.jit
    def sort_only(tid, payload):
        out = jax.lax.sort(
            [tid] + [payload[i] for i in range(n_attr)], num_keys=1)
        return out[1], out[0]

    @jax.jit
    def slot_gather(payload_sorted, key_sorted):
        nt, pmax = spec.n_tiles, spec.p_max
        offsets = jnp.searchsorted(
            key_sorted, jnp.arange(nt, dtype=jnp.int32))
        counts = jnp.searchsorted(
            key_sorted, jnp.arange(1, nt + 1, dtype=jnp.int32)) - offsets
        slot_s = jnp.tile(jnp.arange(pmax, dtype=jnp.int32), nt)
        slot_t = jnp.repeat(jnp.arange(nt, dtype=jnp.int32), pmax,
                            total_repeat_length=nt * pmax)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        return payload_sorted[src], src

    ps, ks = sort_only(tid, payload)
    ps_full = jnp.asarray(
        rng.standard_normal((n_attr, cap)).astype(np.float32))

    @jax.jit
    def slot_gather_all(payload_sorted, key_sorted):
        nt, pmax = spec.n_tiles, spec.p_max
        offsets = jnp.searchsorted(
            key_sorted, jnp.arange(nt, dtype=jnp.int32))
        counts = jnp.searchsorted(
            key_sorted, jnp.arange(1, nt + 1, dtype=jnp.int32)) - offsets
        slot_s = jnp.tile(jnp.arange(pmax, dtype=jnp.int32), nt)
        slot_t = jnp.repeat(jnp.arange(nt, dtype=jnp.int32), pmax,
                            total_repeat_length=nt * pmax)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[None], payload_sorted[:, src], 0.0)

    print(f"sort_only({n_attr} attrs, cap {cap}): "
          f"{timeit(sort_only, tid, payload)*1e3:.2f} ms")
    print(f"slot_gather_all: "
          f"{timeit(slot_gather_all, ps_full, ks)*1e3:.2f} ms")


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    variants()
elif __name__ == "__main__":
    main()


def variants():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    cap = 4_194_304
    n_attr = 7
    nt, pmax = 8192, 512
    cap_out = nt * pmax
    rng = np.random.default_rng(0)
    tid = jnp.sort(jnp.asarray(rng.integers(0, nt, cap), jnp.int32))
    payload = jnp.asarray(rng.standard_normal((n_attr, cap)).astype(np.float32))

    def timeit(f, *a, n=5):
        out = f(*a)
        bench._pull(out)
        t0 = time.perf_counter()
        bench._pull(out)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        bench._pull(out)
        return max(time.perf_counter() - t0 - rtt, 1e-9) / n

    slot_s = jnp.tile(jnp.arange(pmax, dtype=jnp.int32), nt)
    slot_t = jnp.repeat(jnp.arange(nt, dtype=jnp.int32), pmax,
                        total_repeat_length=cap_out)

    def prelude(key_sorted):
        offsets = jnp.searchsorted(key_sorted, jnp.arange(nt, dtype=jnp.int32))
        counts = jnp.searchsorted(
            key_sorted, jnp.arange(1, nt + 1, dtype=jnp.int32)) - offsets
        return offsets, counts

    @jax.jit
    def v_base(ps, ks):
        offsets, counts = prelude(ks)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[None], ps[:, src], 0.0)

    @jax.jit
    def v_mono(ps, ks):
        offsets, counts = prelude(ks)
        nxt = jnp.concatenate(
            [offsets[1:], jnp.full((1,), cap, jnp.int32)])
        src = jnp.minimum(offsets[slot_t] + slot_s, nxt[slot_t])
        src = jnp.minimum(src, cap - 1)
        valid = slot_s < counts[slot_t]
        g = ps.at[:, src].get(indices_are_sorted=True, unique_indices=False)
        return jnp.where(valid[None], g, 0.0)

    @jax.jit
    def v_rowT(psT, ks):
        offsets, counts = prelude(ks)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[:, None], psT[src, :], 0.0)

    @jax.jit
    def v_scatter(ps, ks):
        offsets, counts = prelude(ks)
        rank = jnp.arange(cap, dtype=jnp.int32) - offsets[ks]
        dest = jnp.where(rank < pmax, ks * pmax + rank, cap_out)
        out = jnp.zeros((n_attr, cap_out + 1), ps.dtype)
        out = out.at[:, dest].set(
            ps, indices_are_sorted=True, unique_indices=True, mode="drop")
        return out[:, :cap_out]

    print(f"v_base    {timeit(v_base, payload, tid)*1e3:8.2f} ms")
    print(f"v_mono    {timeit(v_mono, payload, tid)*1e3:8.2f} ms")
    print(f"v_rowT    {timeit(v_rowT, payload.T, tid)*1e3:8.2f} ms")
    print(f"v_scatter {timeit(v_scatter, payload, tid)*1e3:8.2f} ms")
    a = v_base(payload, tid)
    c = v_mono(payload, tid)
    d = v_scatter(payload, tid)
    print("mono err", float(jnp.abs(a - c).max()),
          "scatter err", float(jnp.abs(a - d).max()))


def variants2():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    cap = 4_194_304
    n_attr = 7
    nt, pmax = 8192, 512
    cap_out = nt * pmax
    rng = np.random.default_rng(0)
    tid = jnp.sort(jnp.asarray(rng.integers(0, nt, cap), jnp.int32))
    payload = jnp.asarray(rng.standard_normal((n_attr, cap)).astype(np.float32))

    def timeit(f, *a, n=5):
        out = f(*a)
        bench._pull(out)
        t0 = time.perf_counter()
        bench._pull(out)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        bench._pull(out)
        return max(time.perf_counter() - t0 - rtt, 1e-9) / n

    slot_s = jnp.tile(jnp.arange(pmax, dtype=jnp.int32), nt)
    slot_t = jnp.repeat(jnp.arange(nt, dtype=jnp.int32), pmax,
                        total_repeat_length=cap_out)

    def prelude(key_sorted):
        offsets = jnp.searchsorted(key_sorted, jnp.arange(nt, dtype=jnp.int32))
        counts = jnp.searchsorted(
            key_sorted, jnp.arange(1, nt + 1, dtype=jnp.int32)) - offsets
        return offsets, counts

    @jax.jit
    def v_dynslice(ps, ks):
        offsets, counts = prelude(ks)
        pad = jnp.zeros((n_attr, pmax), ps.dtype)
        psp = jnp.concatenate([ps, pad], axis=1)

        def one(o):
            return jax.lax.dynamic_slice(psp, (0, o), (n_attr, pmax))

        tiles = jax.vmap(one)(offsets)            # (nt, n_attr, pmax)
        g = tiles.transpose(1, 0, 2).reshape(n_attr, cap_out)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[None], g, 0.0)

    @jax.jit
    def v_base(ps, ks):
        offsets, counts = prelude(ks)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[None], ps[:, src], 0.0)

    t = timeit(v_dynslice, payload, tid)
    print(f"v_dynslice {t*1e3:8.2f} ms")
    a = v_base(payload, tid)
    b = v_dynslice(payload, tid)
    print("err", float(jnp.abs(a - b).max()))


def variants3():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench

    cap = 4_194_304
    n_attr = 7
    nt, pmax = 8192, 512
    cap_out = nt * pmax
    rng = np.random.default_rng(0)
    tid = jnp.sort(jnp.asarray(rng.integers(0, nt, cap), jnp.int32))
    payload = jnp.asarray(rng.standard_normal((n_attr, cap)).astype(np.float32))

    def timeit(f, *a, n=5):
        out = f(*a)
        bench._pull(out)
        t0 = time.perf_counter()
        bench._pull(out)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        bench._pull(out)
        return max(time.perf_counter() - t0 - rtt, 1e-9) / n

    def prelude(key_sorted):
        offsets = jnp.searchsorted(key_sorted, jnp.arange(nt, dtype=jnp.int32))
        counts = jnp.searchsorted(
            key_sorted, jnp.arange(1, nt + 1, dtype=jnp.int32)) - offsets
        return offsets, counts

    TB = 16  # tiles per program

    def kern(off_ref, src_ref, out_ref, sem):
        t0 = pl.program_id(0) * TB

        def body(i, _):
            dma = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(off_ref[t0 + i], pmax)],
                out_ref.at[:, pl.ds(i * pmax, pmax)],
                sem.at[i],
            )
            dma.start()
            return 0

        jax.lax.fori_loop(0, TB, body, 0)

        def wbody(i, _):
            pltpu.make_async_copy(
                src_ref.at[:, pl.ds(off_ref[t0 + i], pmax)],
                out_ref.at[:, pl.ds(i * pmax, pmax)],
                sem.at[i],
            ).wait()
            return 0

        jax.lax.fori_loop(0, TB, wbody, 0)

    @jax.jit
    def v_pallas(ps, ks):
        offsets, counts = prelude(ks)
        pad = jnp.zeros((n_attr, pmax), ps.dtype)
        psp = jnp.concatenate([ps, pad], axis=1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt // TB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (n_attr, TB * pmax), lambda g, off: (0, g),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((TB,))],
        )
        g = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_attr, cap_out), ps.dtype),
            grid_spec=grid_spec,
        )(offsets, psp)
        slot_s = jax.lax.broadcasted_iota(jnp.int32, (nt, pmax), 1)
        valid = (slot_s < counts[:, None]).reshape(-1)
        return jnp.where(valid[None], g, 0.0)

    @jax.jit
    def v_base(ps, ks):
        offsets, counts = prelude(ks)
        slot_s = jnp.tile(jnp.arange(pmax, dtype=jnp.int32), nt)
        slot_t = jnp.repeat(jnp.arange(nt, dtype=jnp.int32), pmax,
                            total_repeat_length=cap_out)
        src = jnp.clip(offsets[slot_t] + slot_s, 0, cap - 1)
        valid = slot_s < counts[slot_t]
        return jnp.where(valid[None], ps[:, src], 0.0)

    t = timeit(v_pallas, payload, tid)
    print(f"v_pallas {t*1e3:8.2f} ms")
    a = v_base(payload, tid)
    b = v_pallas(payload, tid)
    print("err", float(jnp.abs(a - b).max()))
