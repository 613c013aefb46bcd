"""Macroscopic Maxwell medium (algo.em_solver_medium = macroscopic).

Analytic gates (the reference's only macroscopic regression deck needs EB,
so the physics is pinned against closed-form solutions instead):

* uniform conductor: E damps exactly as the scheme's alpha^n per step
  (sigma uniform -> curl term vanishes for a uniform field);
* dielectric (eps = 4 eps0): plane-wave phase velocity halves (c/n);
* vacuum parameters: macroscopic path == vacuum Yee path bit-for-bit.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.solvers.yee import compute_dt_yee

c = constants.c
ep0 = constants.ep0


def _cfg(n=16, sigma=None, eps=None, method="backwardeuler", **kw):
    lx = 1.0
    geom = Geometry(3, (n, n, n), (0.0,) * 3, (lx,) * 3, (True,) * 3)
    return SimConfig(
        geometry=geom, max_step=10, dt=compute_dt_yee(geom, 0.9),
        em_solver_medium="macroscopic", macroscopic_sigma_method=method,
        macro_sigma=sigma, macro_epsilon=eps, use_filter=False,
        tiled_particles="off", **kw,
    )


@pytest.mark.parametrize("method", ["backwardeuler", "laxwendroff"])
def test_uniform_conductor_damping(method):
    sigma = 5.0e-3
    cfg = _cfg(sigma=sigma, method=method)
    sim = Simulation(cfg)
    state = sim.init()
    f = state.fields
    state = state.replace(fields=f.replace(Ex=jnp.ones_like(f.Ex)))
    sim.state = state
    n_steps = 10
    for _ in range(n_steps):
        state = sim._step(state)
    fac = sigma * cfg.dt / ep0
    if method == "laxwendroff":
        alpha = (1 - 0.5 * fac) / (1 + 0.5 * fac)
    else:
        alpha = 1.0 / (1 + fac)
    expected = alpha ** n_steps
    got = float(jnp.mean(state.fields.Ex))
    assert abs(got - expected) < 1e-12 * abs(expected), (got, expected)
    # uniform field stays uniform (roundoff only)
    assert float(jnp.std(state.fields.Ex)) < 1e-12


def test_vacuum_medium_matches_vacuum_solver():
    """sigma=0, eps=ep0, mu=mu0 macroscopic == plain Yee, bit-for-bit."""
    import dataclasses

    cfg_m = _cfg()
    cfg_v = dataclasses.replace(
        cfg_m, em_solver_medium="vacuum", macro_sigma=None,
        macro_epsilon=None,
    )
    k = 2 * np.pi / 1.0
    z = np.arange(16) / 16.0
    ex = np.tile(np.sin(k * z), (16, 16, 1))

    def run(cfg):
        sim = Simulation(cfg)
        state = sim.init()
        state = state.replace(
            fields=state.fields.replace(
                Ex=jnp.asarray(ex),
                By=jnp.asarray(ex / c),
            )
        )
        for _ in range(8):
            state = sim._step(state)
        return np.asarray(state.fields.Ex)

    a, b = run(cfg_m), run(cfg_v)
    # association differs (beta*(curl(B/mu)) vs c^2 dt curlB): roundoff only
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12 * np.abs(a).max())


def test_dielectric_phase_velocity():
    """Plane wave in eps=4*eps0: phase advances at c/2 (within the Yee
    dispersion error of the coarse grid)."""
    n = 64
    lx = 1.0
    geom = Geometry(3, (4, 4, n), (0.0,) * 3, (lx / 16, lx / 16, lx), (True,) * 3)
    eps_r = 4.0
    dt = compute_dt_yee(geom, 0.5)  # stay under the medium's CFL (c/n)
    cfg = SimConfig(
        geometry=geom, max_step=10, dt=dt,
        em_solver_medium="macroscopic", macro_epsilon=eps_r * ep0,
        use_filter=False,
    )
    sim = Simulation(cfg)
    state = sim.init()
    m = 2
    k = 2 * np.pi * m / lx
    zc = (np.arange(n) + 0.0) / n * lx
    v = c / np.sqrt(eps_r)
    ex = np.tile(np.cos(k * zc), (4, 4, 1))
    # standing wave: Ex(k, t) = A cos(w t + phi) exactly satisfies the
    # 3-term recurrence s_{n+1} + s_{n-1} = 2 cos(w dt) s_n, which pins the
    # scheme's dispersion w(k) without needing an exact traveling eigenmode
    state = state.replace(fields=state.fields.replace(Ex=jnp.asarray(ex)))
    samples = []
    for _ in range(20):
        samples.append(complex(np.fft.fft(np.asarray(state.fields.Ex)[0, 0])[m]))
        state = sim._step(state)
    s = np.array(samples).real
    cos_wdt = np.median(
        (s[2:] + s[:-2]) / (2.0 * s[1:-1])
    )
    w_meas = np.arccos(cos_wdt) / dt
    # Yee dispersion in a dielectric: sin(w dt/2) = (v dt / dz) sin(k dz / 2)
    dz = lx / n
    w_theory = 2.0 / dt * np.arcsin(v * dt / dz * np.sin(k * dz / 2.0))
    assert abs(w_meas - w_theory) / w_theory < 1e-9, (w_meas, w_theory)
    # and the scheme's w is within the coarse-grid dispersion error of k*v
    assert abs(w_meas - k * v) / (k * v) < 5e-3, (w_meas, k * v)


def test_parsed_sigma_profile():
    """sigma_function(x,y,z): the parsed path must equal the constant path
    exactly, and a spatial profile must damp selectively."""
    import dataclasses

    cfg_c = _cfg(sigma=5.0e-3)
    cfg_p = dataclasses.replace(
        _cfg(sigma=None), macro_sigma_function="5.0e-3 + 0*z",
    )

    def run(cfg, steps=4):
        sim = Simulation(cfg)
        state = sim.init()
        state = state.replace(
            fields=state.fields.replace(Ex=jnp.ones_like(state.fields.Ex))
        )
        for _ in range(steps):
            state = sim._step(state)
        return np.asarray(state.fields.Ex)

    np.testing.assert_array_equal(run(cfg_c), run(cfg_p))

    # spatially-selective conductor: the conducting half damps much harder
    cfg_s = dataclasses.replace(
        _cfg(sigma=None), macro_sigma_function="5.0e-3*(z>0.5)",
    )
    ex = run(cfg_s, steps=4)
    fac = 5.0e-3 * _cfg().dt / ep0
    left, right = ex[:, :, 4].mean(), ex[:, :, 12].mean()
    assert abs(right - (1 / (1 + fac)) ** 4) < 1e-3
    assert right < 0.9 < left
