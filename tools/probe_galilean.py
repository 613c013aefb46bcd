#!/usr/bin/env python
"""Galilean PSATD NCI bisection probes (round-3, NOTES_r3 follow-up).

Runs the reference 2D Galilean NCI deck under controlled sign flips to
localize the inconsistent leg of the deposit->solve->gather loop:

  base   : as-is (round-2 growth ~0.19/step)
  solver-: negate w_c in the spectral operator only (T2 etc -> conj)
  origin-: negate the real-space grid drift only (gather/deposit origin)
  vgal0  : v_galilean = 0 control (plain-PSATD NCI ~0.037/step)

If base is internally consistent, both single-leg flips must be worse or
equal; if one flip stabilizes the run, that pair was inconsistent.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the env var; the config call is authoritative
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

MODE = sys.argv[1] if len(sys.argv) > 1 else "base"
STEPS = int(os.environ.get("PROBE_STEPS", 240))
EVERY = 30

DECK = "/root/reference/Examples/Tests/nci_psatd_stability/inputs_test_2d_galilean_psatd"


def field_energy(state):
    f = state.fields
    return float(
        sum(jnp.sum(jnp.square(a)) for a in (f.Ex, f.Ey, f.Ez))
        + 299792458.0**2
        * sum(jnp.sum(jnp.square(a)) for a in (f.Bx, f.By, f.Bz))
    )


def main():
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.core.step import pic_step

    overrides = ["diagnostics.diags_names =", f"max_step = {STEPS}"]
    if MODE == "vgal0":
        overrides.append("psatd.v_galilean = 0. 0. 0.")
    ovr = os.environ.get("PROBE_OVERRIDE", "none")
    print(f"OVR={ovr}", flush=True)
    if ovr != "none":
        for item in ovr.split("__"):
            overrides.append(item.replace("=", " = ", 1))
    sim = Simulation.from_deck(DECK, overrides=tuple(overrides),
                               dtype=jnp.float32)

    if MODE == "solver-":
        s = sim.psatd
        s._w_c = -s._w_c
        s._T2 = jnp.conj(s._T2)
        for nm in ("_X1", "_X2", "_X3", "_X4"):
            if hasattr(s, nm):
                setattr(s, nm, jnp.conj(getattr(s, nm)))
    elif MODE == "origin-":
        import dataclasses
        neg = tuple(-v for v in sim.cfg.psatd_v_galilean)
        cfg2 = dataclasses.replace(sim.cfg, psatd_v_galilean=neg)
        # solver stays built from the ORIGINAL sign; only gather/deposit
        # origins see the flipped drift
        sim._step = jax.jit(functools.partial(
            pic_step, cfg=cfg2, staggering=sim.staggering, psatd=sim.psatd))
        sim._step_main = sim._step

    state = sim.init()
    e_hist = []
    t0 = time.perf_counter()
    for step in range(STEPS):
        state = sim._step(state)
        if (step + 1) % EVERY == 0:
            e = field_energy(state)
            e_hist.append(e)
            print(f"step {step+1:4d}  E = {e:.6e}", flush=True)
    sim.state = state
    # growth rate per step from the last two samples
    if len(e_hist) >= 2 and e_hist[-2] > 0:
        g = np.log(e_hist[-1] / e_hist[-2]) / (2 * EVERY)
        print(f"MODE={MODE}  growth(log E)/step over last {2*EVERY}: {g:.4f}")
    print(f"wall: {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
