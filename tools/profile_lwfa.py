#!/usr/bin/env python
"""Ablation profile of the bounded binned LWFA step (bench.py run_lwfa).

Times the per-step cost of the 2D LWFA bench deck on the TPU under a set of
single-feature ablations so the dominant phase is identifiable from the
deltas.  Usage: python tools/profile_lwfa.py [nx nz ppc]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def timed(name, deck_text, steps=12):
    import jax.numpy as jnp  # noqa: F401

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.utils.parser import Deck

    sim = Simulation.from_deck(Deck.from_string(deck_text))
    sim.init()
    sim.evolve(8)
    bench._pull(sim.state.fields.Ex)
    t0 = time.perf_counter()
    bench._pull(sim.state.fields.Ex)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    sim.evolve(steps)
    bench._pull(sim.state.fields.Ex)
    span = time.perf_counter() - t0
    per = max(span - rtt, 1e-9) / steps
    print(f"{name:28s} {per*1e3:9.2f} ms/step", flush=True)
    return per


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ppc = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base = bench._LWFA_2D_DECK.format(
        nx=nx, nz=nz, ppcx=ppc, ppcz=ppc, interval=16, max_step=4000,
        mxu="mixed",
    )
    variants = [
        ("base", base),
        ("tiled off (slow path)",
         base.replace("tpu.tiled_particles = on",
                      "tpu.tiled_particles = off")),
        ("no laser",
         base.replace("lasers.names = laser1", "lasers.names =")),
        ("no filter", base.replace("warpx.use_filter = 1",
                                   "warpx.use_filter = 0")),
        ("pec (no PML)",
         base.replace("boundary.field_lo = pml pml",
                      "boundary.field_lo = pec pec")
             .replace("boundary.field_hi = pml pml",
                      "boundary.field_hi = pec pec")),
        ("no moving window",
         base.replace("warpx.do_moving_window = 1",
                      "warpx.do_moving_window = 0")
             .replace("electrons.do_continuous_injection = 1",
                      "electrons.do_continuous_injection = 0")),
        ("interval 32",
         base.replace("warpx.sort_intervals = 16",
                      "warpx.sort_intervals = 32")),
        ("no beam",
         base.replace("particles.species_names = electrons beam",
                      "particles.species_names = electrons")),
        ("interval 8",
         base.replace("warpx.sort_intervals = 16",
                      "warpx.sort_intervals = 8")),
    ]
    for name, text in variants:
        try:
            timed(name, text)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
