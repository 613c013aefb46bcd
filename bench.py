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
        sort_interval=int(os.environ.get("BENCH_SORT_INTERVAL", 60)), sort_margin=1,
        # quiet-start thermal plasma: per-tile counts stay within a few
        # sqrt(N) of the mean, so a slim slot buffer suffices; the
        # tile_overflow counter hard-fails the bench if it ever overflows
        tile_headroom=float(os.environ.get("BENCH_HEADROOM", 1.125)),
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


_LWFA_2D_DECK = """
max_step = {max_step}
amr.n_cell = {nx} {nz}
geometry.dims = 2
geometry.prob_lo = -30.e-6 -56.e-6
geometry.prob_hi =  30.e-6  12.e-6
boundary.field_lo = pml pml
boundary.field_hi = pml pml
warpx.verbose = 0
warpx.use_filter = 1
warpx.cfl = 0.98
warpx.do_moving_window = 1
warpx.moving_window_dir = z
warpx.moving_window_v = 1.0
warpx.sort_intervals = {interval}
tpu.tiled_particles = on
tpu.tile_mxu = {mxu}
algo.particle_shape = 3
algo.maxwell_solver = yee
particles.species_names = electrons beam
electrons.species_type = electron
electrons.injection_style = NUniformPerCell
electrons.num_particles_per_cell_each_dim = {ppcx} {ppcz} 1
electrons.xmin = -20.e-6
electrons.xmax =  20.e-6
electrons.zmin = -56.e-6
electrons.profile = constant
electrons.density = 2.e23
electrons.momentum_distribution_type = at_rest
electrons.do_continuous_injection = 1
beam.species_type = electron
beam.injection_style = gaussian_beam
beam.x_rms = .5e-6
beam.y_rms = .5e-6
beam.z_rms = .5e-6
beam.x_m = 0.
beam.y_m = 0.
beam.z_m = -28.e-6
beam.npart = 100
beam.q_tot = -1.e-12
beam.momentum_distribution_type = gaussian
beam.ux_m = 0.0
beam.uy_m = 0.0
beam.uz_m = 500.
beam.ux_th = 2.
beam.uy_th = 2.
beam.uz_th = 50.
lasers.names = laser1
laser1.profile = Gaussian
laser1.position = 0. 0. 9.e-6
laser1.direction = 0. 0. 1.
laser1.polarization = 0. 1. 0.
laser1.e_max = 16.e12
laser1.profile_waist = 5.e-6
laser1.profile_duration = 15.e-15
laser1.profile_t_peak = 30.e-15
laser1.profile_focal_distance = 100.e-6
laser1.wavelength = 0.8e-6
"""


def run_lwfa(nx, nz, ppc, steps):
    """BASELINE config-2 workload: 2D LWFA (Gaussian laser + moving window
    + PML + continuously injected plasma + relativistic beam), the shape of
    Examples/Physics_applications/laser_acceleration/inputs_base_2d (no MR),
    run on the bounded tile-binned Pallas path.  The plasma pre-fills the
    window (zmin = prob_lo) so the measurement reflects the in-plasma steady
    state rather than the vacuum lead-in of the stock deck."""
    import jax.numpy as jnp

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.utils.parser import Deck

    # sort interval 16: the rebin is the dominant LWFA cost at interval 4
    # (tools/profile_lwfa.py: 123.6 -> 64.6 ms/step); the margin grows with
    # the interval (space-anchored tiles pay only physical drift) but the
    # kernel's W-cost grows slower than the amortized rebin shrinks
    interval = int(os.environ.get("BENCH_LWFA_SORT_INTERVAL", 16))
    # bounded horizon: continuous-injection slot capacity scales with
    # max_step, so give the run a finite but generous budget
    budget = 2 * interval + 64 * max(steps, interval)
    deck = Deck.from_string(_LWFA_2D_DECK.format(
        nx=nx, nz=nz, ppcx=ppc, ppcz=ppc, interval=interval,
        max_step=budget,
        mxu=os.environ.get("BENCH_MXU", "mixed"),
    ))
    sim = Simulation.from_deck(deck)
    sim.init()

    def alive_count(state):
        return sum(
            int(jnp.sum(p.alive)) for p in state.species.values()
        )

    # warm: compile the rebin and steady step variants + window shift
    sim.evolve(2 * interval)
    _pull(sim.state.fields.Ex)
    t0 = time.perf_counter()
    _pull(sim.state.fields.Ex)
    rtt = time.perf_counter() - t0
    n0 = alive_count(sim.state)
    n_steps = max(steps, interval)
    while True:
        t0 = time.perf_counter()
        sim.evolve(n_steps)
        _pull(sim.state.fields.Ex)
        span = time.perf_counter() - t0
        remaining = budget - int(sim.state.step)
        if span >= max(5.0 * rtt, 0.25) or remaining < 2 * n_steps:
            break
        n_steps *= 2
    n1 = alive_count(sim.state)
    ovf = int(sim.state.aux["tile_overflow"])
    vio = int(sim.state.aux["tile_violations"])
    if ovf or vio:
        raise RuntimeError(f"tile invariants violated: {ovf}, {vio}")
    per_step = max(span - rtt, 1e-9) / n_steps
    n_mean = 0.5 * (n0 + n1)
    return {
        "n_cell": [nx, nz],
        "n_particles": n_mean,
        "per_step_seconds": per_step,
        "steps_per_sec": 1.0 / per_step,
        "pushes_per_sec": n_mean / per_step,
        "path": "binned-pallas-bounded",
        "sort_interval": interval,
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
    if results and os.environ.get("BENCH_LWFA", "1") != "0":
        try:
            detail["lwfa_2d"] = run_lwfa(
                int(os.environ.get("BENCH_LWFA_NX", 256)),
                int(os.environ.get("BENCH_LWFA_NZ", 2048)),
                int(os.environ.get("BENCH_LWFA_PPC", 2)),
                steps,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bench: lwfa failed: {e}", file=sys.stderr, flush=True)
            detail["lwfa_2d"] = {"error": str(e)[:300]}
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
