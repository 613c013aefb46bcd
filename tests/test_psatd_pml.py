"""Spectral (PSATD) PML: split-field k-space push + real-space damping.

Reimplements PsatdAlgorithmPml.cpp (12-split / 24-split-with-cleaning
branches) over the extended single box.  Gates:

* before the pulse reaches the PML, the bounded run matches the periodic
  run in the interior (the regular spectral operator is untouched);
* after the pulse crosses the strips the EM energy collapses (absorption);
* same with the divergence-cleaning (24-component) variant;
* (slow) the reference's own 2D laser deck reflectivity gate
  (Examples/Tests/pml/analysis_pml_psatd.py): energy(300)/energy(50) < 1e-6
  measured on cell-centered fields.
"""

import dataclasses

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


def _cfg(n=64, pml=True, **kw):
    L = 1.0
    geom = Geometry(
        2, (16, n), (0.0, -L / 2), (0.25, L / 2),
        periodic=(True, not pml),
    )
    bcs = dict(
        field_bc_lo=("periodic", "pml"),
        field_bc_hi=("periodic", "pml"),
        particle_bc_lo=("periodic", "absorbing"),
        particle_bc_hi=("periodic", "absorbing"),
    ) if pml else {}
    return SimConfig(
        geometry=geom, max_step=200, dt=0.95 * (L / n) / c,
        em_solver="psatd", psatd_order=16, use_filter=False,
        current_deposition="direct", **bcs, **kw,
    )




def test_pml_psatd_absorbs_pulse():
    cfg = _cfg()
    sim = Simulation(cfg)
    state = sim.init()
    geom = cfg.geometry
    state = _pulse_fields(state, geom, z0=0.0, w0=0.06)
    e0 = _energy(state)

    # pre-arrival parity with the periodic run
    cfg_p = _cfg(pml=False)
    sim_p = Simulation(cfg_p)
    state_p = sim_p.init()
    state_p = _pulse_fields(state_p, geom, z0=0.0, w0=0.06)
    for _ in range(10):
        state = sim._step_main(state)
        state = sim._step_window(state, False)
        state_p = sim_p._step(state_p)
    exb = np.asarray(state.fields.Ex)
    exp_ = np.asarray(state_p.fields.Ex)
    nb = exb.shape
    iz0 = (nb[1] - geom.n_cell[1]) // 2
    core_b = exb[:, iz0 + 8: iz0 + geom.n_cell[1] - 8]
    core_p = exp_[:, 8:-8]
    err = np.abs(core_b - core_p).max() / np.abs(core_p).max()
    assert err < 1e-8, err

    # run until both pulse halves have crossed the strips: absorbed
    for _ in range(190):
        state = sim._step_main(state)
        state = sim._step_window(state, False)
    e1 = _energy(state)
    assert e1 < 1e-4 * e0, (e0, e1)


def test_pml_psatd_cleaning_absorbs_pulse():
    """24-split branch (do_pml_dive/divb_cleaning) absorbs as well."""
    cfg = dataclasses.replace(
        _cfg(), do_pml_dive_cleaning=True, do_pml_divb_cleaning=True,
    )
    sim = Simulation(cfg)
    state = sim.init()
    state = _pulse_fields(state, cfg.geometry, z0=0.0, w0=0.06)
    e0 = _energy(state)
    for _ in range(200):
        state = sim._step_main(state)
        state = sim._step_window(state, False)
    e1 = _energy(state)
    assert np.isfinite(e1)
    assert e1 < 1e-4 * e0, (e0, e1)


@pytest.mark.slow
def test_pml_psatd_reference_reflectivity():
    """The reference deck's own gate (analysis_pml_psatd.py): laser pulse
    launched at 45 degrees, energy(300)/energy(50) < 1e-6 on cell-centered
    fields (the plotfile convention the reference analysis reads)."""
    from warpx_tpu.core.domain import DomainLayout

    sim = Simulation.from_deck(
        "/root/reference/Examples/Tests/pml/inputs_test_2d_pml_x_psatd"
    )
    sim.init()
    lay = DomainLayout.from_config(sim.cfg)
    ep0, mu0 = constants.ep0, constants.mu0

    def cc(nm):
        a = np.asarray(getattr(sim.state.fields, nm))[
            lay.phys_slice(sim.staggering[nm])
        ]
        for d in range(a.ndim):
            if sim.staggering[nm][d] == 1:
                sl0 = [slice(None)] * a.ndim
                sl1 = [slice(None)] * a.ndim
                sl0[d] = slice(0, -1)
                sl1[d] = slice(1, None)
                a = 0.5 * (a[tuple(sl0)] + a[tuple(sl1)])
        return a

    def energy():
        tot = 0.0
        for nm in ("Ex", "Ey", "Ez"):
            tot += 0.5 * ep0 * np.sum(cc(nm) ** 2)
        for nm in ("Bx", "By", "Bz"):
            tot += 0.5 / mu0 * np.sum(cc(nm) ** 2)
        return tot

    sim.evolve(50)
    e50 = energy()
    sim.evolve(250)
    e300 = energy()
    assert e300 / e50 < 1.0e-6, (e50, e300, e300 / e50)
