"""CLI driver: ``python -m warpx_tpu <inputs_deck> [key=value ...]``.

Mirrors the reference executable's invocation style (reference:
Source/main.cpp — ``warpx.3d inputs param=value``): positional deck path
followed by ParmParse-style command-line overrides.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m warpx_tpu",
        description="TPU-native WarpX-class PIC simulation driver",
    )
    ap.add_argument("deck", help="path to a ParmParse inputs deck")
    ap.add_argument(
        "overrides", nargs="*",
        help='deck overrides, ParmParse style: key=value; quote lists, '
        'e.g. "amr.n_cell=32 32 32"',
    )
    ap.add_argument("--output-dir", default="diags",
                    help="diagnostics output directory (default: diags)")
    ap.add_argument("--f32", action="store_true",
                    help="run in single precision (default: f64 via x64 mode)")
    ap.add_argument("--steps", type=int, default=-1,
                    help="run this many steps instead of the deck's max_step")
    ap.add_argument("--checksums", action="store_true",
                    help="print reference-format sum-abs checksums at the end")
    ap.add_argument("--restart", default=None, metavar="CHECKPOINT",
                    help="resume from a checkpoint directory written by a "
                    "format=checkpoint diagnostic")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu|tpu|axon); NOTE the "
                    "JAX_PLATFORMS env var is ignored when an experimental "
                    "TPU plugin is installed, this flag (or "
                    "WARPX_TPU_PLATFORM) is authoritative")
    args = ap.parse_args(argv)

    import os

    import jax

    platform = args.platform or os.environ.get("WARPX_TPU_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(args.deck, overrides=tuple(args.overrides),
                               output_dir=args.output_dir)
    sim.init()
    if args.restart:
        from warpx_tpu.io.checkpoint import load_checkpoint

        sim.state, sim.is_synchronized = load_checkpoint(
            args.restart, sim.state
        )
        print(f"restarted from {args.restart} at step {int(sim.state.step)}")
    t0 = time.perf_counter()
    sim.evolve(args.steps)
    jax.block_until_ready(sim.state.fields.Ex)
    elapsed = time.perf_counter() - t0
    print(f"completed {int(sim.state.step)} steps in {elapsed:.3f} s "
          f"(t = {float(sim.state.time):.6e} s)")
    if args.checksums:
        import json

        print(json.dumps(sim.checksums(), indent=2, sort_keys=True))
    unused = sim.deck.unused_keys() if sim.deck is not None else []
    if unused:
        from warpx_tpu.utils.observability import warn

        warn("Inputs", "unused deck keys: " + ", ".join(sorted(unused)),
             "low")
    # end-of-run deduplicated warning summary (WarnManager.H:227 analog)
    from warpx_tpu.utils.observability import WarnManager

    mgr = WarnManager.instance()
    if mgr._records:
        mgr.print_summary(sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
