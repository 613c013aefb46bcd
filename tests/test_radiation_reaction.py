"""Classical radiation reaction (Boris + Landau-Lifshitz RR force).

Reference: UpdateMomentumBorisWithRadiationReaction.H (Tamburini et al.,
NJP 12 123005); gate: Examples/Tests/radiation_reaction/analysis.py — the
synchrotron gamma(t) = coth(t/tau_c - C) closed form at 5%.
"""

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_radiation_reaction_synchrotron_cooling():
    c = 299792458.0
    m_e = 9.1093837015e-31
    q_0 = 1.602176634e-19
    r_e = 2.81794e-15
    L = 1.0e-6
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/radiation_reaction/"
        "inputs_test_3d_radiation_reaction",
        overrides=("diagnostics.diags_names=",),
    )
    sim.init()
    sim.evolve(-1)
    p_aux_0 = np.array([2.0, 3.0, 6.0])
    Q, _ = np.linalg.qr(np.column_stack([p_aux_0, [1, 0, 0], [0, 1, 0]]))
    p_0, p_1, p_2 = -Q[:, 0], -Q[:, 1], -Q[:, 2]
    B_val = 300 * m_e * 2 * np.pi * c / q_0 / L
    omega_c = q_0 * B_val / m_e
    tau_c = 1 / (omega_c**2 * (2 / 3) * r_e / c)

    def gam(p):
        return np.sqrt(1.0 + np.dot(p, p))

    def expected(init_mom, time):
        if np.linalg.norm(np.cross(init_mom, p_0 * B_val)) < 1e-4:
            return gam(init_mom)  # parallel: no synchrotron losses
        tt = time / tau_c
        g0 = gam(init_mom)
        return 1.0 / np.tanh(tt + 0.5 * np.log((g0 + 1) / (g0 - 1)))

    cases = {
        "ele_para0": p_0 * 1000, "ele_perp0": p_1 * 50,
        "ele_perp1": p_2 * 200, "ele_perp2": p_1 * 1000,
        "pos_perp2": p_1 * 1000,
    }
    t = float(sim.state.time)
    for nm, p_init in cases.items():
        sp = sim.state.species[nm]
        alive = np.asarray(sp.alive)
        u = np.array([
            np.asarray(sp.ux)[alive].mean(),
            np.asarray(sp.uy)[alive].mean(),
            np.asarray(sp.uz)[alive].mean(),
        ]) / c
        g_sim = np.sqrt(1 + np.dot(u, u))
        g_th = expected(p_init, t)
        assert abs(g_sim - g_th) / g_th < 0.05, (nm, g_sim, g_th)
