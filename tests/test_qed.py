"""QED process tests (quantum synchrotron, Breit-Wheeler, Schwinger).

These replicate the reference's own regression analyses
(Examples/Tests/qed/analysis_{quantum_sync,breit_wheeler_core,schwinger}.py)
at reduced particle count: photon/pair yields against the exact
adaptive-quadrature rates at 5-sigma, plus momentum conservation.  PICSAR
itself is a build-time dependency of the reference (not vendored), so the
lookup tables are generated from the same closed-form rates.
"""

import numpy as np
import pytest
import scipy.integrate as integ
import scipy.special as spe

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

me = 9.1093837015e-31
c = 299792458.0
qe = 1.602176634e-19
hbar = 6.62607015e-34 / (2 * np.pi)
alpha = 7.2973525693e-3
E_s = me**2 * c**3 / (qe * hbar)
mec = me * c
E_f = np.array([-2433321316961438.0, 973328526784575.0, 1459992790176863.0])
B_f = np.array([2857142.85714286, 4285714.28571428, 8571428.57142857])


def _chi_part(p):
    gam = np.sqrt(1.0 + np.dot(p, p) / mec**2)
    v = p / (gam * me)
    Epv = E_f + np.cross(v, B_f)
    vdE = np.dot(v, E_f) / c
    return gam * np.sqrt(np.dot(Epv, Epv) - vdE * vdE) / E_s


def _chi_phot(p):
    pn = np.linalg.norm(p)
    v = c * (p / pn)
    Epv = E_f + np.cross(v, B_f)
    vdE = np.dot(v, E_f) / c
    return (pn / mec) * np.sqrt(np.dot(Epv, Epv) - vdE * vdE) / E_s


def _boris(pp, dt, charge_sign):
    econst = 0.5 * qe * dt * charge_sign / me
    u = pp / me + econst * E_f
    inv_gamma = 1 / np.sqrt(1 + np.dot(u, u) / c**2)
    t = econst * B_f * inv_gamma
    s = 2 * t / (1 + np.dot(t, t))
    u = u + np.cross(u + np.cross(u, t), s) + econst * E_f
    return u * me


def _qs_G(chi):
    def inner(y):
        return integ.quad(
            lambda x: np.exp(-y * (1 + 4 * x**2 / 3) * np.sqrt(1 + x * x / 3))
            * (9 + 36 * x**2 + 16 * x**4)
            / (3 + 4 * x**2) / np.sqrt(1 + x**2 / 3), 0, np.inf,
        )[0] / np.sqrt(3)

    def S(xi):
        if xi in (0.0, 1.0):
            return 0.0
        Y = (2 / 3) * xi / (chi * (1 - xi))
        return np.sqrt(3) / 2 / np.pi * xi * (
            inner(Y) + xi**2 * spe.kv(2 / 3, Y) / (1 - xi)
        )

    return integ.quad(lambda xi: S(xi) / xi if xi > 0 else 0.0, 0, 1,
                      limit=200)[0]


def _bw_T(chi):
    def bw_inner(x):
        return integ.quad(
            lambda s: np.sqrt(s) * spe.kv(1 / 3, 2 / 3 * s**1.5), x, np.inf
        )[0]

    def F(ce):
        if ce <= 0 or chi <= ce:
            return 0.0
        X = (chi / (ce * (chi - ce))) ** (2 / 3)
        return bw_inner(X) - (2.0 - chi * X**1.5) * spe.kv(
            2 / 3, 2 / 3 * X**1.5
        )

    return integ.quad(F, 0, chi, limit=200)[0] / (
        np.pi * np.sqrt(3) * chi**2
    )


@pytest.mark.slow
def test_quantum_synchrotron_photon_yield():
    """Photon yields of the reference 2D quantum-sync deck (4 momenta
    spanning chi 0.02..18) within 5 sigma of the analytic
    N (1 - exp(-dN/dt dt)) with chi at the boris-updated momentum
    (analysis_quantum_sync.py:199-204,308-314)."""
    momenta = {
        "p1": np.array([10.0, 0, 0]) * mec,
        "p2": np.array([0, 100.0, 0]) * mec,
        "p3": np.array([0, 0, 1000.0]) * mec,
        "p4": np.array([5773.502691896] * 3) * mec,
    }
    csign = {"p1": -1, "p2": -1, "p3": 1, "p4": 1}
    phots = {"p1": "qsp_1", "p2": "qsp_2", "p3": "qsp_3", "p4": "qsp_4"}
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/qed/inputs_test_2d_qed_quantum_sync",
        overrides=tuple(
            f"{p}.num_particles_per_cell_each_dim=4 4" for p in momenta
        ) + ("diagnostics.diags_names=",),
    )
    sim.init()
    dt = sim.cfg.dt
    sim.evolve(-1)
    N0 = 16384
    for pn, p0 in momenta.items():
        pb = _boris(_boris(p0, -dt * 0.5, csign[pn]), dt, csign[pn])
        gam = np.sqrt(1.0 + np.dot(pb, pb) / mec**2)
        chi = _chi_part(pb)
        dndt = (2 / 3) * alpha * me * c**2 / hbar * _qs_G(chi) / gam
        nph = int(np.asarray(sim.state.species[phots[pn]].alive).sum())
        expected = N0 * (1 - np.exp(-dndt * dt))
        assert abs(nph - expected) < 5 * max(np.sqrt(expected), 1.0), (
            pn, chi, nph, expected,
        )


@pytest.mark.slow
def test_breit_wheeler_pair_yield():
    """Pair yields of the reference 2D Breit-Wheeler deck (chi 2.3..182)
    within 5 sigma of the analytic rate; exact electron/positron pairing
    and momentum conservation (analysis_breit_wheeler_core.py)."""
    momenta = {
        "p1": np.array([2000.0, 0, 0]) * mec,
        "p2": np.array([0, 5000.0, 0]) * mec,
        "p3": np.array([0, 0, 10000.0]) * mec,
        "p4": np.array([57735.02691896] * 3) * mec,
    }
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/qed/inputs_test_2d_qed_breit_wheeler",
        overrides=tuple(
            f"{p}.num_particles_per_cell_each_dim=4 4" for p in momenta
        ) + ("diagnostics.diags_names=",),
    )
    sim.init()
    dt = sim.cfg.dt
    sim.evolve(-1)
    N0 = 16384
    for pn, p0 in momenta.items():
        chi = _chi_phot(p0)
        gam = np.linalg.norm(p0) / mec
        dndt = alpha * me * c**2 / hbar * _bw_T(chi) * chi / gam
        ele = sim.state.species[pn.replace("p", "ele")]
        pos = sim.state.species[pn.replace("p", "pos")]
        ne = int(np.asarray(ele.alive).sum())
        npos = int(np.asarray(pos.alive).sum())
        expected = N0 * (1 - np.exp(-dndt * dt))
        assert ne == npos
        assert abs(ne - expected) < 5 * max(np.sqrt(expected), 1.0), (
            pn, chi, ne, expected,
        )


@pytest.mark.slow
@pytest.mark.parametrize("tn,fields,vol_frac", [
    ("1", (1.0e16, 0, 0, 16792888.570516706, 5256650.141557486,
           18363530.799561853), 1.0),
    ("2", (1.0e18, 0, 0, 1679288857.0516706, 525665014.1557486,
           1836353079.9561853), 0.5),
    ("3", (0, 1.090934525450495e17, 0, 0, 0, 0), 1.0),
    ("4", (0, 0, 2.5e20, 0, 833910140000.0, 0), (3.0 / 4.0) ** 2),
])
def test_schwinger_pair_production(tn, fields, vol_frac):
    """The four reference Schwinger decks: total created pair weight within
    5 sigma of dV dt times the pair-production rate from the field
    invariants (analysis_schwinger.py; case 1 expects zero pairs)."""
    Ex, Ey, Ez, Bx, By, Bz = fields
    E2 = Ex**2 + Ey**2 + Ez**2
    H2 = c**2 * (Bx**2 + By**2 + Bz**2)
    F = (E2 - H2) / 2
    G = c * (Ex * Bx + Ey * By + Ez * Bz)
    eps = np.sqrt(np.sqrt(F**2 + G**2) + F) / E_s
    eta = np.sqrt(np.sqrt(F**2 + G**2) - F) / E_s
    if eps == 0.0:
        rate = 0.0
    elif eta == 0.0:
        rate = (qe**2 * E_s**2 / 4 / np.pi**2 / c / hbar**2
                * eps**2 / np.pi * np.exp(-np.pi / eps))
    else:
        rate = (qe**2 * E_s**2 / 4 / np.pi**2 / c / hbar**2 * eps * eta
                / np.tanh(np.pi * eta / eps) * np.exp(-np.pi / eps))
    sim = Simulation.from_deck(
        f"{REFERENCE}/Examples/Tests/qed/inputs_test_3d_qed_schwinger_{tn}",
        overrides=("diagnostics.diags_names=",),
    )
    sim.init()
    dt = sim.cfg.dt
    sim.evolve(-1)
    ele = sim.state.species["ele_schwinger"]
    pos = sim.state.species["pos_schwinger"]
    w = np.asarray(ele.w)[np.asarray(ele.alive)]
    wp = np.asarray(pos.w)[np.asarray(pos.alive)]
    assert np.array_equal(np.sort(w), np.sort(wp))
    expected = (1.0e-6) ** 3 * vol_frac * dt * rate
    if expected < 0.01:
        assert w.size == 0
    else:
        assert abs(w.sum() - expected) < 5 * np.sqrt(expected), (
            w.sum(), expected,
        )
