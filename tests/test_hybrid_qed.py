"""Hybrid QED Maxwell (warpx.use_hybrid_QED): Heisenberg-Euler slowdown.

Runs the reference deck inputs_test_2d_maxwell_hybrid_qed_solver and applies
the reference's own analysis gate (analysis.py: phase velocity within 1.25%
of c / sqrt((1+12 xi Es^2/eps0)/(1+4 xi Es^2/eps0)))."""

import os

import numpy as np
import pytest

from warpx_tpu import constants

from .conftest import REFERENCE, reference_available

c = constants.c


@pytest.mark.slow
def test_hybrid_qed_phase_velocity():
    if not reference_available():
        pytest.skip("reference not mounted")
    from warpx_tpu.core.simulation import Simulation

    deck = os.path.join(
        REFERENCE,
        "Examples/Tests/maxwell_hybrid_qed/"
        "inputs_test_2d_maxwell_hybrid_qed_solver",
    )
    sim = Simulation.from_deck(
        deck, overrides=("diagnostics.diags_names =",)
    )
    sim.init()
    sim.evolve()
    ey = np.asarray(sim.state.fields.Ey)
    geom = sim.cfg.geometry
    Es, xi = 1.0e5, 1.0e-23
    line = ey[ey.shape[0] // 2, :] - Es  # remove the static field
    dz = geom.dx[1]
    z_end = geom.prob_lo[1] + np.argmax(line) * dz
    t = float(sim.state.time)
    v_pic = (z_end - 0.0) / t
    v_th = c / np.sqrt(
        (1.0 + 12.0 * xi * Es**2 / constants.ep0)
        / (1.0 + 4.0 * xi * Es**2 / constants.ep0)
    )
    err = 100.0 * abs(v_pic - v_th) / v_th
    assert err < 1.25, (v_pic, v_th, err)
    # the QED slowdown must actually be resolved (v measurably below c)
    assert v_pic < c * (1.0 - 1e-4), v_pic
