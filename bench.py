#!/usr/bin/env python
"""Headline benchmark: particle-pushes/sec on a 3D uniform-plasma PIC step.

Runs the full explicit EM PIC step (Esirkepov + Boris + order-1 gather + Yee)
in single precision through the tile-binned fused Pallas path
(warpx_tpu/core/binned_step.py) on the available accelerator.

Baseline: the WarpX-on-A100 ballpark for 3D FDTD PIC (~1e9 particle
pushes/sec/GPU, the SC22 Gordon Bell class of measurements; the reference
repo publishes no numbers — see BASELINE.md).

Measurement methodology (IMPORTANT — this environment's TPU tunnel lies):
  * ``jax.block_until_ready`` on the axon-tunnel TPU returns before device
    execution completes, so every timed span here is closed by a scalar
    device->host pull, which provably forces completion.
  * The pull itself costs a tunnel round trip (measured separately as
    ``pull_rtt_s`` and subtracted once per span).
  * A matmul calibration (``matmul_tflops``) is emitted in ``detail`` so a
    degraded tunnel/device is distinguishable from slow framework code in
    the artifact itself.
  * A two-point size sweep (``sweep``) shows the time-vs-particles slope.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REFERENCE_PUSHES_PER_SEC = 1.0e9


def _pull(arr):
    """Force completion of everything enqueued before this, via one D2H."""
    idx = (0,) * arr.ndim
    return float(arr[idx])


def calibrate():
    """Chained bf16 matmuls closed by a pull: device health in the artifact."""
    import jax
    import jax.numpy as jnp

    n = 4096
    x = jnp.full((n, n), 1.0 / n, jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a) * (1.0 / n))
    y = f(x)
    _pull(y)
    t0 = time.perf_counter()
    rtt = None
    _pull(y)
    rtt = time.perf_counter() - t0
    reps = 50
    t0 = time.perf_counter()
    z = x
    for _ in range(reps):
        z = f(z)
    _pull(z)
    span = time.perf_counter() - t0
    per = max(span - rtt, 1e-9) / reps
    return {
        "matmul_tflops": 2 * n**3 / per / 1e12,
        "pull_rtt_s": rtt,
    }


def _build_sim(n, ppc):
    import jax
    import jax.numpy as jnp

    from warpx_tpu.core.config import SimConfig, SpeciesConfig
    from warpx_tpu.core.grid import Geometry
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.solvers.yee import compute_dt_yee

    lx = 40e-6
    geom = Geometry(
        ndim=3, n_cell=(n, n, n), prob_lo=(-lx / 2,) * 3,
        prob_hi=(lx / 2,) * 3, periodic=(True,) * 3,
    )
    species = tuple(
        SpeciesConfig(
            name=nm, charge=q, mass=9.1093837015e-31,
            injection_style="nuniformpercell",
            num_particles_per_cell_each_dim=(ppc, 1, 1),
            profile="constant", density=2.0e24,
            momentum_distribution="gaussian",
            ux_th=0.01, uy_th=0.01, uz_th=0.01,
        )
        for nm, q in (("electrons", -1.602176634e-19),
                      ("ions", 1.602176634e-19))
    )
    # thermal plasma: drift ~0.01 cells/step, so margin 1 supports a long
    # sort interval; the tile_violations counter verifies this post-hoc
    cfg = SimConfig(
        geometry=geom, max_step=10**9, dt=compute_dt_yee(geom, 0.999),
        particle_shape=1, species=species,
        tiled_particles=os.environ.get("BENCH_TILED", "auto"),
        sort_interval=int(os.environ.get("BENCH_SORT_INTERVAL", 40)), sort_margin=1,
        # quiet-start thermal plasma: per-tile counts stay within a few
        # sqrt(N) of the mean, so a slim slot buffer suffices; the
        # tile_overflow counter hard-fails the bench if it ever overflows
        tile_headroom=float(os.environ.get("BENCH_HEADROOM", 1.25)),
        # 'mixed' is the TPU-native operating point: gather operands ride the
        # MXU's native bf16 pass (interpolation rounding ~0.4%, far below
        # macro-particle sampling noise) while the Esirkepov deposit runs at
        # true f32 (3-pass) so discrete charge conservation holds to f32
        # roundoff.  'f32' (everything 3-pass) and 'bf16' (deposit single-pass
        # too) are measured alongside in detail.mxu_modes.
        tile_mxu=os.environ.get("BENCH_MXU", "mixed"),
    )
    sim = Simulation(cfg, dtype=jnp.float32)
    n_particles = 2 * ppc * n**3
    return sim, n_particles


def run_uniform(n, ppc, steps):
    import jax

    sim, n_particles = _build_sim(n, ppc)
    state = sim.init()
    state = sim._step(state)  # compile + warm
    _pull(state.fields.Ex)
    t0 = time.perf_counter()
    _pull(state.fields.Ex)
    rtt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        # adaptive span: keep doubling the step count until the timed span
        # dominates the tunnel round trip, else the rtt subtraction can
        # swallow the whole measurement
        n_steps = steps
        while True:
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state = sim._step(state)
            _pull(state.fields.Ex)
            span = time.perf_counter() - t0
            if span >= max(5.0 * rtt, 0.25):
                break
            n_steps *= 2
        best = min(best, max(span - rtt, 1e-9) / n_steps)
    sim.state = state
    if sim.tile_spec is not None:
        ovf = int(state.aux["tile_overflow"])
        vio = int(state.aux["tile_violations"])
        if ovf or vio:
            raise RuntimeError(f"tile invariants violated: {ovf}, {vio}")
    per_step = best
    return {
        "n_cell": n,
        "n_particles": n_particles,
        "per_step_seconds": per_step,
        "steps_per_sec": 1.0 / per_step,
        "pushes_per_sec": n_particles / per_step,
        "path": "binned-pallas" if sim.tile_spec is not None else "reference",
        "pull_rtt_s": rtt,
    }


def main():
    import jax

    n = int(os.environ.get("BENCH_NCELL", 64))
    ppc = int(os.environ.get("BENCH_PPC", 2))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    detail = {"device": str(jax.devices()[0])}
    try:
        detail["calibration"] = calibrate()
    except Exception as e:  # noqa: BLE001
        detail["calibration"] = {"error": str(e)[:200]}

    results, last_err = [], None
    for spec in ((n, ppc, steps), (n // 2, ppc, steps), (32, 1, 10)):
        try:
            print(f"bench: attempting {spec}", file=sys.stderr, flush=True)
            results.append(run_uniform(*spec))
            if len(results) == 2:
                break
        except Exception as e:  # noqa: BLE001
            print(f"bench: {spec} failed: {e}", file=sys.stderr, flush=True)
            last_err = e
    if results and "BENCH_MXU" not in os.environ:
        modes = {}
        for m in ("f32", "bf16"):
            try:
                os.environ["BENCH_MXU"] = m
                r = run_uniform(n, ppc, steps)
                modes[m] = r["pushes_per_sec"]
            except Exception as e:  # noqa: BLE001
                modes[m] = str(e)[:120]
        del os.environ["BENCH_MXU"]
        detail["mxu_modes"] = modes
    if not results:
        print(json.dumps({
            "metric": "particle_pushes_per_sec_per_chip", "value": 0.0,
            "unit": "pushes/s", "vs_baseline": 0.0,
            "error": str(last_err)[:300], "detail": detail,
        }), flush=True)
        return
    head = results[0]
    detail.update(head)
    if len(results) > 1:
        detail["sweep"] = results[1:]
    value = head["pushes_per_sec"]
    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": value,
        "unit": "pushes/s",
        "vs_baseline": value / A100_REFERENCE_PUSHES_PER_SEC,
        "detail": detail,
    }), flush=True)


if __name__ == "__main__":
    main()
