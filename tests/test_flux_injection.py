"""NFluxPerCell injection (reference: Examples/Tests/flux_injection,
analysis_flux_injection_3d.py): total injected charge equals
flux * area * t, and the velocity distribution along the flux normal is the
flux-weighted Gaussian u*exp(-(u-u_m)^2/2u_th^2) (both rejection branches:
u_m/u_th = 0.7 for electrons along y, 0.5 for protons along -x)."""

import os

import numpy as np
import pytest

from warpx_tpu.core.simulation import Simulation

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


@pytest.mark.slow
def test_3d_flux_injection_deck():
    deck = os.path.join(
        REFERENCE, "Examples/Tests/flux_injection/inputs_test_3d_flux_injection"
    )
    sim = Simulation.from_deck(deck, overrides=("diagnostics.diags_names =",))
    sim.init()
    sim.evolve()
    t_max = 2 * 7e-9
    area = 8.0 * 8.0
    Ntot = 1.0 * area * t_max  # flux * area * t

    c = 299792458.0

    def check(name, axis, direction, u_m, u_th):
        sp = sim.state.species[name]
        alive = np.asarray(sp.alive)
        w = np.asarray(sp.w)[alive]
        assert abs(w.sum() - Ntot) < 0.05 * Ntot, (name, w.sum(), Ntot)
        un = np.asarray(getattr(sp, "u" + axis))[alive] / c * direction
        assert (un > 0).all(), name  # emitted INTO the domain
        # flux-weighted Gaussian moments: <u> = int u^2 G / int u G
        uu = np.linspace(0, u_m + 6 * u_th, 4001)
        pdf = uu * np.exp(-((uu - u_m) ** 2) / (2 * u_th**2))
        pdf /= np.trapezoid(pdf, uu)
        mean_th = np.trapezoid(uu * pdf, uu)
        var_th = np.trapezoid((uu - mean_th) ** 2 * pdf, uu)
        assert abs(un.mean() - mean_th) < 0.02 * mean_th, (
            name, un.mean(), mean_th,
        )
        assert abs(un.var() - var_th) < 0.05 * var_th, (name, un.var(), var_th)

    check("electron", "y", +1, 0.07, 0.1)   # u_m/u_th = 0.7 (branch 2)
    check("proton", "x", -1, 0.05, 0.1)     # u_m/u_th = 0.5 (branch 1)
