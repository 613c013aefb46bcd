#!/usr/bin/env python
"""Deck-compatibility sweep: run every Cartesian reference test deck for a
couple of steps and record load/run outcomes.  Surfaces crash-level feature
gaps cheaply; results land in DECK_SWEEP.md."""

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/Examples"
# RZ and EB decks are included since round 3 (rz spectral + staircase EB)
SKIP_PAT = ("picmi", ".py", "restart")

RUNNER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[2])
from warpx_tpu.__main__ import main
deck = sys.argv[1]
sys.exit(main([deck, "max_step=2", "diagnostics.diags_names=",
               "--output-dir", "/tmp/sweep_diags", "--f32"]))
"""


def main():
    decks = sorted(
        glob.glob(f"{REF}/Tests/*/inputs_test_*")
        + glob.glob(f"{REF}/Physics_applications/*/inputs_test_*")
    )
    decks = [
        d for d in decks if not any(p in os.path.basename(d) for p in SKIP_PAT)
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    if only and only != "--resume":
        decks = [d for d in decks if only in d]
    results = []
    if only == "--resume" and os.path.exists(f"{REPO}/DECK_SWEEP.partial"):
        # keep prior PASSes; retry failures/timeouts and untried decks
        done = {}
        for line in open(f"{REPO}/DECK_SWEEP.partial"):
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                done[parts[1]] = (parts[0], parts[2] if len(parts) > 2 else "")
        keep = {n: v for n, v in done.items() if v[0] == "PASS"}
        results = [(n, v[0], v[1]) for n, v in keep.items()]
        decks = [d for d in decks if os.path.basename(d) not in keep]
        os.replace(f"{REPO}/DECK_SWEEP.partial",
                   f"{REPO}/DECK_SWEEP.partial.bak")
        with open(f"{REPO}/DECK_SWEEP.partial", "a") as fh:
            for n, (st, err) in keep.items():
                fh.write(f"{st}\t{n}\t{err}\n")
    for deck in decks:
        name = os.path.basename(deck)
        try:
            out = subprocess.run(
                [sys.executable, "-c", RUNNER, deck, REPO],
                capture_output=True, text=True, timeout=240,
            )
            if out.returncode == 0:
                results.append((name, "PASS", ""))
            else:
                err = (out.stderr.strip().splitlines() or ["?"])[-1][:160]
                results.append((name, "FAIL", err))
        except subprocess.TimeoutExpired:
            results.append((name, "TIMEOUT", ""))
        print(f"{results[-1][1]:8s} {name}  {results[-1][2]}", flush=True)
        with open(f"{REPO}/DECK_SWEEP.partial", "a") as fh:
            fh.write(f"{results[-1][1]}\t{name}\t{results[-1][2]}\n")
    npass = sum(1 for r in results if r[1] == "PASS")
    print(f"\n{npass}/{len(results)} decks run for 2 steps without error")
    with open(f"{REPO}/DECK_SWEEP.md", "w") as fh:
        fh.write("# Reference deck compatibility sweep\n\n")
        fh.write(
            "Every non-PICMI reference test deck (incl. RZ and EB)"
            " run for 2 steps via `python -m warpx_tpu <deck> max_step=2`"
            f" in f32.\n\n**{npass}/{len(results)} pass.**\n\n"
        )
        fh.write("| deck | result | error |\n|---|---|---|\n")
        for name, st, err in results:
            fh.write(f"| {name} | {st} | {err} |\n")


if __name__ == "__main__":
    main()
