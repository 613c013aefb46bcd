"""Multi-J PSATD (OneStep_multiJ + PsatdAlgorithmFirstOrder).

The first-order-form solver is gated against the second-order one in
vacuum (identical analytic propagator), and the two reference multi-J
deck families are golden-gated: 2D Langmuir with J-linear n_depositions=2
(lands at ~1e-7 of every checksum) and 3D uniform plasma with
J/rho-constant + F/G divergence cleaning.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from .conftest import REFERENCE, reference_available

GOLD = os.path.join(REFERENCE, "Regression/Checksum/benchmarks_json")


def _rel(a, b):
    return abs(a - b) / (abs(b) or 1.0)


def test_first_order_matches_second_order_vacuum():
    """With J = rho = 0 and no div cleaning, the first-order-form update
    (PsatdAlgorithmFirstOrder.cpp) must equal the standard PSATD propagator
    exactly: C E + (1-C) khat khat.E + i c S/|k| (k x B)."""
    from warpx_tpu.core.grid import Geometry, yee_staggering
    from warpx_tpu.core.state import FieldState
    from warpx_tpu.solvers.psatd import PsatdFirstOrder, PsatdSolver

    geom = Geometry(
        ndim=2, n_cell=(32, 48), prob_lo=(-1.0, -1.0), prob_hi=(1.0, 1.0),
        periodic=(True, True),
    )
    stag = yee_staggering(2)
    dt = 1e-11
    rng = np.random.default_rng(0)
    z = lambda s=1.0: jnp.asarray(rng.standard_normal((32, 48)) * s)  # noqa: E731
    f = FieldState(
        Ex=z(), Ey=z(), Ez=z(), Bx=z(1e-8), By=z(1e-8), Bz=z(1e-8),
        jx=jnp.zeros((32, 48)), jy=jnp.zeros((32, 48)),
        jz=jnp.zeros((32, 48)),
    )
    s2 = PsatdSolver(geom, stag, dt, n_order=16, update_with_rho=False)
    s1 = PsatdFirstOrder(
        geom, stag, dt, n_order=16, j_in_time="constant",
        rho_in_time="constant", div_cleaning=False,
    )
    zero3 = tuple(jnp.zeros((32, 48)) for _ in range(3))
    o2 = s2.push(f)
    o1 = s1.push_first_order(f, zero3)
    for nm in ("Ex", "Ey", "Ez", "Bx", "By", "Bz"):
        a = np.asarray(getattr(o1, nm))
        b = np.asarray(getattr(o2, nm))
        assert np.max(np.abs(a - b)) < 1e-12 * np.max(np.abs(b)), nm


def test_multij_gates():
    """rho_in_time=constant outside first-order multi-J and n_dep>1 with
    second-order must hard-fail (WarpX.cpp:1454-1459)."""
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.utils.parser import Deck

    base = """
        max_step = 1
        amr.n_cell = 16 16
        geometry.dims = 2
        geometry.prob_lo = -1 -1
        geometry.prob_hi = 1 1
        boundary.field_lo = periodic periodic
        boundary.field_hi = periodic periodic
        algo.maxwell_solver = psatd
        {extra}
        """
    with pytest.raises(NotImplementedError):
        Simulation.from_deck(Deck.from_string(
            base.format(extra="psatd.rho_in_time = constant")
        ))
    with pytest.raises(NotImplementedError):
        Simulation.from_deck(Deck.from_string(base.format(
            extra="warpx.do_multi_J = 1\n"
                  "warpx.do_multi_J_n_depositions = 2"
        )))


@pytest.mark.slow
def test_langmuir_multij_2d_golden():
    """test_2d_langmuir_multi_psatd_multiJ: J linear in time, first-order
    solution, n_depositions = 2.  Measured parity ~1e-7 on every non-zero
    checksum (By is a noise-floor sum gated at 1e-3)."""
    from warpx_tpu.core.simulation import Simulation

    if not reference_available():
        pytest.skip("reference not mounted")
    sim = Simulation.from_deck(
        os.path.join(
            REFERENCE,
            "Examples/Tests/langmuir/inputs_test_2d_langmuir_multi_psatd_multiJ",
        ),
        overrides=("diagnostics.diags_names =",),
    )
    sim.init()
    sim.evolve()
    gold = json.load(
        open(os.path.join(GOLD, "test_2d_langmuir_multi_psatd_multiJ.json"))
    )
    ours = sim.checksums()
    for sp in gold:
        for q, ref in gold[sp].items():
            got = ours[sp][q]
            if ref == 0.0:
                assert got == 0.0, (sp, q, got)
            elif q == "By":
                assert _rel(got, ref) < 1e-3, (sp, q, got, ref)
            else:
                assert _rel(got, ref) < 1e-5, (sp, q, got, ref)


@pytest.mark.slow
def test_uniform_plasma_multij_3d():
    """test_3d_uniform_plasma_multiJ: J/rho constant in time, first-order
    solution, F/G divergence cleaning, drifting neutral plasma (gamma=10).
    Gate = the reference's own analysis_multiJ.py stability criterion
    (E energy < 1e-8 * 66e6 J) + particle goldens (weights exact, drift
    momenta ~7e-9, positions ~1e-6; residual fields are RNG noise sums)."""
    from warpx_tpu import constants
    from warpx_tpu.core.simulation import Simulation

    if not reference_available():
        pytest.skip("reference not mounted")
    sim = Simulation.from_deck(
        os.path.join(
            REFERENCE,
            "Examples/Tests/nci_psatd_stability/"
            "inputs_test_3d_uniform_plasma_multiJ",
        ),
        overrides=("diagnostics.diags_names =",),
    )
    sim.init()
    sim.evolve()
    st = sim.state
    # analysis_multiJ.py sums over cells without the volume element; match it
    energy_cells = float(jnp.sum(
        constants.ep0 / 2.0
        * (st.fields.Ex**2 + st.fields.Ey**2 + st.fields.Ez**2)
    ))
    assert energy_cells < 1e-8 * 66e6, energy_cells
    gold = json.load(
        open(os.path.join(GOLD, "test_3d_uniform_plasma_multiJ.json"))
    )
    ours = sim.checksums()
    for sp in ("electrons", "ions"):
        for q, tol in (
            ("particle_weight", 1e-12),
            ("particle_momentum_z", 1e-6),
            ("particle_position_x", 1e-4),
            ("particle_position_y", 1e-4),
            ("particle_position_z", 1e-4),
        ):
            assert _rel(ours[sp][q], gold[sp][q]) < tol, (
                sp, q, ours[sp][q], gold[sp][q])
