"""Back-transformed diagnostics test.

A right-moving vacuum EM pulse initialized in the boosted frame must be
reconstructed by the BTD machinery as the analytic LAB-frame pulse: the
snapshot at t_lab is Ex_lab(z_lab) = gamma(1+beta) Ex'(zeta'), with the
phase contraction zeta_lab = gamma(1-beta) zeta'.  This validates the
plane sweep (z_boost/z_lab trajectories, BTDiagnostics.H:276-289), the
k_lab indexing, and the field mixing (BackTransformFunctor::
LorentzTransformZ) end to end.
"""

import numpy as np
import pytest

from warpx_tpu.core.config import SimConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.diagnostics.btd import BTDSnapshots

c = 299792458.0


@pytest.mark.slow
def test_btd_vacuum_pulse(tmp_path):
    import jax.numpy as jnp

    gamma = 2.0
    beta = np.sqrt(1.0 - 1.0 / gamma**2)
    L = 100e-6
    n = 512
    geom = Geometry(1, (n,), (0.0,), (L,), (True,))
    cfg = SimConfig(
        geometry=geom, max_step=460, dt=0.999 * (L / n) / c,
        species=(), em_solver="yee", gamma_boost=gamma, boost_direction=2,
        use_filter=False,
    )
    sim = Simulation(cfg)
    sim.init()
    # boosted-frame pulse: Ex' = E0' exp(-(z'-zc')^2/2 sigma'^2), By'=Ex'/c
    E0p, zcp, sigp = 1.0e8, 30e-6, 5e-6
    dz = L / n
    z_ex = (np.arange(n) + 0.5) * dz  # Ex staggered: nodal z in 1D? use cc
    # our 1D staggering: Ex nodal along z? build from staggering flags
    stag = sim.staggering["Ex"]
    z_ex = (np.arange(n) + (0.0 if stag[0] else 0.5)) * dz
    stag_by = sim.staggering["By"]
    z_by = (np.arange(n) + (0.0 if stag_by[0] else 0.5)) * dz
    ex0 = E0p * np.exp(-((z_ex - zcp) ** 2) / (2 * sigp**2))
    by0 = E0p / c * np.exp(-((z_by - zcp) ** 2) / (2 * sigp**2))
    sim.state = sim.state.replace(
        fields=sim.state.fields.replace(
            Ex=jnp.asarray(ex0, sim.dtype), By=jnp.asarray(by0, sim.dtype),
        )
    )
    # one snapshot timed so the plane crosses the pulse mid-run
    delta = 20e-6
    t_lab = gamma * beta * (zcp + delta) / c
    btd = BTDSnapshots("btd", cfg, 1, t_lab, ["Ex", "By"], str(tmp_path))
    btd.t_lab = [t_lab]
    for _ in range(cfg.max_step):
        sim.evolve(1)
        btd.update(sim)
    btd.finalize()

    filled = btd.filled[0]
    assert filled.sum() > 100  # the sweep filled a contiguous band
    zl = btd.z_lab_centers(0)
    ex_lab = btd.snapshot(0)["Ex"]
    # analytic lab pulse at t_lab
    contr = gamma * (1.0 - beta)
    amp = gamma * (1.0 + beta) * E0p
    zeta0 = contr * zcp
    sig_lab = contr * sigp
    th = amp * np.exp(
        -((zl - c * t_lab - zeta0) ** 2) / (2 * sig_lab**2)
    )
    m = filled & (np.abs(th) > 0.05 * amp)
    assert m.sum() > 10, (filled.sum(), (np.abs(th) > 0.05 * amp).sum())
    rel = np.abs(ex_lab[m] - th[m]).max() / amp
    assert rel < 0.05, rel
    # By transforms with the same factor for a vacuum pulse
    by_lab = btd.snapshot(0)["By"]
    rel_b = np.abs(by_lab[m] * c - th[m]).max() / amp
    assert rel_b < 0.05, rel_b
