"""Bounded-domain PSATD with damped z boundaries (FieldBoundaryType::Damped).

Gates:
* before the pulse reaches the boundary, the bounded run matches the
  periodic run in the interior (same spectral operator);
* after the pulse crosses the damped zone, the EM energy drops by orders of
  magnitude (DampFieldsInGuards absorbs it);
* a moving-window PSATD vacuum run keeps the pulse centered in the window.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation

c = constants.c


def _pulse_fields(state, geom, z0, w0):
    """Gaussian EM pulse moving +z: Ex = f(z), By = Ex/c."""
    z = geom.prob_lo[1] + (np.arange(geom.n_cell[1]) + 0.5) * geom.dx[1]
    prof = np.exp(-((z - z0) / w0) ** 2) * np.cos(
        2 * np.pi * (z - z0) / (4 * w0)
    )
    ex = np.tile(prof, (geom.n_cell[0], 1))
    f = state.fields
    # bounded shapes may carry extra wall nodes: embed into the stored shape
    def put(name, arr):
        tgt = np.zeros(getattr(f, name).shape)
        off0 = (tgt.shape[0] - arr.shape[0]) // 2
        off1 = (tgt.shape[1] - arr.shape[1]) // 2
        tgt[off0:off0 + arr.shape[0], off1:off1 + arr.shape[1]] = arr
        return jnp.asarray(tgt)

    return state.replace(
        fields=f.replace(Ex=put("Ex", ex), By=put("By", ex / c))
    )


def _energy(state):
    f = state.fields
    return float(
        sum(jnp.sum(jnp.square(a)) for a in (f.Ex, f.Ey, f.Ez))
        + c * c * sum(jnp.sum(jnp.square(a)) for a in (f.Bx, f.By, f.Bz))
    )


def _cfg(n=64, damped=True, **kw):
    L = 1.0
    geom = Geometry(
        2, (16, n), (0.0, -L / 2), (0.25, L / 2),
        periodic=(True, not damped),
    )
    bcs = dict(
        field_bc_lo=("periodic", "damped"),
        field_bc_hi=("periodic", "damped"),
        particle_bc_lo=("periodic", "absorbing"),
        particle_bc_hi=("periodic", "absorbing"),
    ) if damped else {}
    return SimConfig(
        geometry=geom, max_step=200, dt=0.95 * (L / n) / c,
        em_solver="psatd", psatd_order=16, use_filter=False,
        current_deposition="direct", **bcs, **kw,
    )


@pytest.mark.slow
def test_damped_z_absorbs_pulse():
    cfg = _cfg()
    sim = Simulation(cfg)
    state = sim.init()
    geom = cfg.geometry
    state = _pulse_fields(state, geom, z0=0.0, w0=0.06)
    e0 = _energy(state)

    # pre-arrival parity with the periodic run (interior physics identical)
    cfg_p = _cfg(damped=False)
    sim_p = Simulation(cfg_p)
    state_p = sim_p.init()
    state_p = _pulse_fields(state_p, geom, z0=0.0, w0=0.06)
    n_pre = 10
    for _ in range(n_pre):
        state = sim._step_main(state)
        state = sim._step_window(state, False)
        state_p = sim_p._step(state_p)
    exb = np.asarray(state.fields.Ex)
    exp_ = np.asarray(state_p.fields.Ex)
    # compare the central interior region (away from the damp zones)
    nb = exb.shape
    iz0 = (nb[1] - geom.n_cell[1]) // 2
    core_b = exb[:, iz0 + 8: iz0 + geom.n_cell[1] - 8]
    core_p = exp_[:, 8:-8]
    err = np.abs(core_b - core_p).max() / np.abs(core_p).max()
    assert err < 1e-8, err

    # run until the pulse has crossed the boundary: absorbed
    for _ in range(190):
        state = sim._step_main(state)
        state = sim._step_window(state, False)
    e1 = _energy(state)
    assert e1 < 2e-3 * e0, (e0, e1)


@pytest.mark.slow
def test_psatd_moving_window_vacuum():
    """Moving window at v=c with PSATD: a copropagating pulse stays inside
    the window (shifts work with the spectral advance)."""
    import dataclasses

    cfg = dataclasses.replace(
        _cfg(), do_moving_window=True, moving_window_dir=1,
        moving_window_v=1.0, max_step=120,
    )
    sim = Simulation(cfg)
    state = sim.init()
    geom = cfg.geometry
    state = _pulse_fields(state, geom, z0=0.0, w0=0.06)
    e0 = _energy(state)
    for _ in range(120):
        state = sim._step_main(state)
        state = sim._step_window(state, jnp.asarray(False))
    e1 = _energy(state)
    # the +z pulse rides the window: most of its energy survives (the -z
    # half of the standing decomposition exits through the damped wall)
    assert e1 > 0.2 * e0, (e0, e1)
    # and the field maximum is still in the window interior
    ex = np.asarray(state.fields.Ex)
    imax = np.unravel_index(np.argmax(np.abs(ex)), ex.shape)
    assert 4 < imax[1] < ex.shape[1] - 4


@pytest.mark.slow
def test_galilean_psatd_hybrid_deck():
    """The full 2D boosted-frame galilean-PSATD hybrid-grid moving-window
    deck (rigid beam + continuously injected plasma, damped z boundaries)
    runs 400 steps and lands on the golden for every drift-dominated
    checksum (the transverse momenta are quiet-start-noise sums and RNG
    dependent; fields agree to ~10%)."""
    import json
    import os

    from warpx_tpu.core.simulation import Simulation

    from .conftest import REFERENCE, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    deck = os.path.join(
        REFERENCE,
        "Examples/Tests/nci_psatd_stability/"
        "inputs_test_2d_galilean_psatd_hybrid",
    )
    sim = Simulation.from_deck(deck, overrides=("diagnostics.diags_names =",))
    sim.init()
    sim.evolve()
    gold = json.load(open(os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/"
        "test_2d_galilean_psatd_hybrid.json",
    )))
    ours = sim.checksums()
    for sp, q, tol in (
        ("electrons", "particle_weight", 0.01),
        ("ions", "particle_weight", 0.01),
        ("beam", "particle_weight", 1e-9),
        ("electrons", "particle_momentum_z", 0.01),
        ("ions", "particle_momentum_z", 0.01),
        ("beam", "particle_momentum_z", 0.05),
        ("electrons", "particle_position_y", 0.03),
    ):
        ref = gold[sp][q]
        got = ours[sp][q]
        assert abs(got - ref) <= tol * abs(ref), (sp, q, got, ref)
    for q in ("Ey", "jy"):
        ref = gold["lev=0"][q]
        got = ours["lev=0"][q]
        assert abs(got - ref) <= 0.12 * abs(ref), (q, got, ref)


@pytest.mark.slow
def test_comoving_psatd_hybrid_deck():
    """inputs_test_2d_comoving_psatd_hybrid (PsatdAlgorithmComoving.cpp):
    boosted-frame moving-window run with the comoving spectral family and
    direct deposition, 400 steps.  Measured: weights 2.5e-4, drift momenta
    0.4-2.5%, positions 0.4-0.7%, fields 3-4% of the reference goldens."""
    import json
    import os

    from warpx_tpu.core.simulation import Simulation

    from .conftest import REFERENCE, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    deck = os.path.join(
        REFERENCE,
        "Examples/Tests/nci_psatd_stability/"
        "inputs_test_2d_comoving_psatd_hybrid",
    )
    sim = Simulation.from_deck(deck, overrides=("diagnostics.diags_names =",))
    sim.init()
    sim.evolve()
    gold = json.load(open(os.path.join(
        REFERENCE,
        "Regression/Checksum/benchmarks_json/"
        "test_2d_comoving_psatd_hybrid.json",
    )))
    ours = sim.checksums()
    for sp, q, tol in (
        ("electrons", "particle_weight", 1e-3),
        ("ions", "particle_weight", 1e-3),
        ("beam", "particle_weight", 1e-9),
        ("electrons", "particle_momentum_z", 0.02),
        ("ions", "particle_momentum_z", 0.02),
        ("beam", "particle_momentum_z", 0.05),
        ("electrons", "particle_position_x", 0.02),
        ("electrons", "particle_position_y", 0.02),
        ("ions", "particle_position_x", 0.02),
    ):
        ref = gold[sp][q]
        got = ours[sp][q]
        assert abs(got - ref) <= tol * abs(ref), (sp, q, got, ref)
    for comp in ("Ex", "Ey", "Ez", "jx", "jy", "jz", "rho"):
        ref = gold["lev=0"][comp]
        got = ours["lev=0"][comp]
        assert abs(got - ref) <= 0.1 * abs(ref), (comp, got, ref)
