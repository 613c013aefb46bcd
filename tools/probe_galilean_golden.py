#!/usr/bin/env python
"""Run the 2D Galilean deck at f64 and diff our checksums vs the golden."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

DECK = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/Examples/Tests/nci_psatd_stability/inputs_test_2d_galilean_psatd"
)
GOLD = sys.argv[2] if len(sys.argv) > 2 else (
    "/root/reference/Regression/Checksum/benchmarks_json/test_2d_galilean_psatd.json"
)
STEPS = os.environ.get("PROBE_STEPS")


def main():
    from warpx_tpu.core.simulation import Simulation

    overrides = ["diagnostics.diags_names ="]
    if STEPS:
        overrides.append(f"max_step = {STEPS}")
    sim = Simulation.from_deck(DECK, overrides=tuple(overrides))
    sim.init()
    sim.evolve()
    ours = sim.checksums()
    gold = json.load(open(GOLD))
    worst = 0.0
    for grp, vals in gold.items():
        for q, ref in vals.items():
            got = ours.get(grp, {}).get(q)
            if got is None:
                print(f"{grp}/{q}: MISSING (ref {ref:.6e})")
                continue
            rel = abs(got - ref) / max(abs(ref), 1e-300)
            worst = max(worst, rel if abs(ref) > 1e-290 else 0.0)
            print(f"{grp}/{q}: got {got:.10e} ref {ref:.10e} rel {rel:.3e}")
    print(f"WORST rel (nonzero refs): {worst:.3e}")


if __name__ == "__main__":
    main()
