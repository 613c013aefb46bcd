"""New reduced diagnostics: ColliderRelevant, DifferentialLuminosity,
ChargeOnEB, LoadBalanceCosts (reference: Source/Diagnostics/ReducedDiags)."""

import numpy as np

import jax.numpy as jnp

from warpx_tpu import constants
from warpx_tpu.core.config import SimConfig, SpeciesConfig
from warpx_tpu.core.grid import Geometry
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.diagnostics.reduced import compute_reduced
from warpx_tpu.solvers.yee import compute_dt_yee

c = constants.c
q_e = constants.q_e
m_e = constants.m_e


def _two_beam_sim(uz=1000.0):
    geom = Geometry(3, (8, 8, 8), (-1e-5,) * 3, (1e-5,) * 3, (True,) * 3)
    mk = lambda nm, q, uzv: SpeciesConfig(  # noqa: E731
        name=nm, charge=q, mass=m_e,
        injection_style="nrandompercell", num_particles_per_cell=8,
        profile="constant", density=1e20,
        momentum_distribution="constant", uz=uzv,
    )
    cfg = SimConfig(
        geometry=geom, max_step=2, dt=compute_dt_yee(geom, 0.9),
        species=(mk("beam1", -q_e, uz), mk("beam2", q_e, -uz)),
        use_filter=False,
    )
    sim = Simulation(cfg)
    sim.init()
    return sim


def test_collider_relevant():
    sim = _two_beam_sim()
    out = compute_reduced(
        "ColliderRelevant", sim.state, sim.cfg, sim.staggering,
        {"species": ["beam1", "beam2"]},
    )
    # dL/dt = 2 c n1 n2 V for uniform overlapping beams
    expected = 2.0 * c * 1e20 * 1e20 * (2e-5) ** 3
    assert abs(out["dL_dt"] - expected) < 0.2 * expected, (
        out["dL_dt"], expected,
    )
    # centered uniform beams: means ~0, stds ~ L/sqrt(12)
    assert abs(out["x_ave_beam1"]) < 2e-6
    assert 0.7 * 2e-5 / np.sqrt(12) < out["x_std_beam1"] < 1.3 * 2e-5 / np.sqrt(12)
    # thetax of a pure z mover is 0
    assert abs(out["thetax_ave_beam1"]) < 1e-12


def test_differential_luminosity_total():
    """The E_com-integrated differential luminosity equals dL/dt * dt for
    one accumulation (head-on identical-gamma beams: single E_com bin)."""
    uz = 1000.0
    sim = _two_beam_sim(uz)
    gam = np.sqrt(1 + uz**2)
    e_com = 2 * gam * m_e * c * c / q_e  # eV (head-on, equal gamma)
    out = compute_reduced(
        "DifferentialLuminosity", sim.state, sim.cfg, sim.staggering,
        {"species": ["beam1", "beam2"], "bin_number": 40,
         "bin_min": 0.5 * e_com, "bin_max": 1.5 * e_com},
    )
    vals = np.array(list(out.values()))
    bsize = (1.5 * e_com - 0.5 * e_com) / 40
    integral = vals.sum() * bsize
    expected = 2.0 * c * 1e20 * 1e20 * (2e-5) ** 3 * sim.cfg.dt
    # statistical pairing estimator: generous tolerance
    assert abs(integral - expected) < 0.4 * expected, (integral, expected)
    # the spectrum is concentrated at the analytic E_com
    imax = int(np.argmax(vals))
    centers = 0.5 * e_com + bsize * (np.arange(40) + 0.5)
    assert abs(centers[imax] - e_com) < 2 * bsize


def test_charge_on_eb_gauss():
    """A uniform charge ball inside the EB: Q from the staircase Gauss
    integral matches the deposited charge (after one ES-less step the
    E-field of the ball is not self-consistently solved, so build E
    directly: E = x/3eps0*rho inside a uniform ball)."""
    geom = Geometry(3, (16, 16, 16), (-1.0,) * 3, (1.0,) * 3, (True,) * 3)
    cfg = SimConfig(
        geometry=geom, max_step=1, dt=1e-12,
        eb_implicit_function="0.25 - (x*x + y*y + z*z)",
        field_bc_lo=("pec",) * 3, field_bc_hi=("pec",) * 3,
        use_filter=False,
    )
    # build a linear E field E = k*x_i (div E = 3k) everywhere
    from warpx_tpu.core.state import FieldState, SimState

    # bounded (pec) layout: nodal dims are wall-inclusive with n+1 values
    shapes = {"Ex": (0, 1, 1), "Ey": (1, 0, 1), "Ez": (1, 1, 0),
              "Bx": (1, 0, 0), "By": (0, 1, 0), "Bz": (0, 0, 1),
              "jx": (0, 1, 1), "jy": (1, 0, 1), "jz": (1, 1, 0)}
    karr = 7.5
    arrs = {}
    for nm, flags in shapes.items():
        coords = []
        for d in range(3):
            npt = 17 if flags[d] == 1 else 16
            off = 0.0 if flags[d] == 1 else 0.5
            coords.append(geom.prob_lo[d] + (np.arange(npt) + off) * geom.dx[d])
        mesh = np.meshgrid(*coords, indexing="ij")
        if nm.startswith("E"):
            d_own = {"Ex": 0, "Ey": 1, "Ez": 2}[nm]
            arrs[nm] = jnp.asarray(karr * mesh[d_own])
        else:
            arrs[nm] = jnp.zeros_like(jnp.asarray(mesh[0]))
    fields = FieldState(**arrs)
    state = SimState(fields=fields, species={}, step=jnp.zeros((), jnp.int32),
                     time=jnp.zeros(()), rng=jnp.zeros(2, jnp.uint32))
    out = compute_reduced(
        "ChargeOnEB", state, cfg, {}, {},
    )
    # Q = eps0 * divE * V_covered; divE = 3k; V = (4/3) pi R^3 (staircased)
    v_ball = 4.0 / 3.0 * np.pi * 0.5**3
    expected = constants.ep0 * 3 * karr * v_ball
    assert abs(out["Charge (C)"] - expected) < 0.15 * abs(expected), (
        out, expected,
    )


def test_load_balance_costs():
    sim = _two_beam_sim()
    out = compute_reduced(
        "LoadBalanceCosts", sim.state, sim.cfg, sim.staggering
    )
    n_parts = sum(
        int(jnp.sum(s.alive)) for s in sim.state.species.values()
    )
    assert out["num_macro_particles_box_0"] == n_parts
    assert out["cost_box_0"] > 0
