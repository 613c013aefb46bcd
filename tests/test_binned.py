"""Tile-binned Pallas hot path vs the reference jnp path.

The binned path (core/binned_step.py + ops/pallas_pic.py + ops/tiling.py) is
the TPU performance path; these tests pin it to the reference path's physics
on CPU (Pallas interpret mode, f64) — the analog of the reference validating
its shared-memory binned deposition against the plain atomicAdd path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warpx_tpu.core.config import SimConfig, SpeciesConfig
from warpx_tpu.core.grid import Geometry, yee_staggering
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.core.state import ParticleState
from warpx_tpu.constants import c
from warpx_tpu.ops.tiling import (
    TileSpec, extract_windows, fold_windows, rebin, tile_ids,
)
from warpx_tpu.solvers.yee import compute_dt_yee


def _geom(n=16, lx=40e-6, ndim=3):
    return Geometry(
        ndim=ndim, n_cell=(n,) * ndim, prob_lo=(-lx / 2,) * ndim,
        prob_hi=(lx / 2,) * ndim, periodic=(True,) * ndim,
    )


def test_extract_fold_adjoint():
    geom = _geom()
    spec = TileSpec.create(geom.n_cell, order=1, n_particles=1000,
                           margin=1, interval=1, p_max=512)
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, geom.n_cell)
    wr = jax.random.normal(
        jax.random.fold_in(key, 1), (spec.n_tiles, spec.w, spec.w * spec.w)
    )
    lhs = jnp.vdot(extract_windows(g, spec), wr)
    # extract layout (i, (j,k)) == fold axes (0, 1, 2)
    rhs = jnp.vdot(g, fold_windows(wr, spec, geom.n_cell, axes=(0, 1, 2)))
    assert abs(float(lhs - rhs)) < 1e-10 * abs(float(lhs))


def test_rebin_invariants():
    np.random.seed(0)
    geom = _geom()
    spec = TileSpec.create(geom.n_cell, order=1, n_particles=4096,
                           margin=1, interval=1, p_max=1024)
    cap = 4096
    pos = np.random.uniform(-20e-6, 20e-6, (3, cap))
    pos[0, :10] += 40e-6  # out-of-domain: must wrap
    alive = np.random.rand(cap) > 0.2
    sp = ParticleState(
        w=jnp.asarray((np.random.rand(cap) + 0.5) * alive),
        ux=jnp.asarray(np.random.randn(cap)),
        uy=jnp.asarray(np.random.randn(cap)),
        uz=jnp.asarray(np.random.randn(cap)),
        alive=jnp.asarray(alive),
        x=jnp.asarray(pos[0]), y=jnp.asarray(pos[1]), z=jnp.asarray(pos[2]),
    )
    new, overflow = rebin(sp, geom, spec)
    assert int(overflow) == 0
    assert int(new.alive.sum()) == alive.sum()
    # conserved weighted momentum
    assert np.isclose(
        float(jnp.sum(jnp.where(sp.alive, sp.w * sp.ux, 0.0))),
        float(jnp.sum(jnp.where(new.alive, new.w * new.ux, 0.0))),
    )
    # every alive particle sits in its own tile's slot range
    tids = np.asarray(tile_ids(new.positions(3), geom, spec))
    slot_tile = np.repeat(np.arange(spec.n_tiles), spec.p_max)
    al = np.asarray(new.alive)
    assert (tids[al] == slot_tile[al]).all()
    # dead slots carry zero weight
    assert float(jnp.abs(jnp.where(new.alive, 0.0, new.w)).max()) == 0.0


def _species(ppc=2, uth=0.1):
    return tuple(
        SpeciesConfig(
            name=nm, charge=q, mass=9.1093837015e-31,
            injection_style="nuniformpercell",
            num_particles_per_cell_each_dim=(ppc, 1, 1),
            profile="constant", density=2.0e24,
            momentum_distribution="gaussian",
            ux_th=uth, uy_th=uth, uz_th=uth,
        )
        for nm, q in (
            ("electrons", -1.602176634e-19),
            ("positrons", 1.602176634e-19),
        )
    )


@pytest.mark.parametrize(
    "order,solver,ndim",
    [
        (1, "yee", 3),
        (1, "yee", 2),
        pytest.param(2, "ckc", 3, marks=pytest.mark.slow),
        pytest.param(2, "yee", 2, marks=pytest.mark.slow),
        pytest.param(3, "psatd", 3, marks=pytest.mark.slow),
    ],
)
def test_binned_step_matches_reference(order, solver, ndim):
    """8 steps of the fused binned path == reference path to 1e-9 on every
    checksum quantity (divB/divE excluded: they are machine-roundoff noise
    whose value depends on summation order)."""
    geom = _geom(n=32 if ndim == 2 else 16, ndim=ndim)
    kw = {}
    if solver == "psatd":
        kw = dict(psatd_order=-1, psatd_periodic_single_box=True)

    def mkcfg(tiled):
        return SimConfig(
            geometry=geom, max_step=8, dt=compute_dt_yee(geom, 0.999),
            particle_shape=order, species=_species(),
            em_solver=solver, tiled_particles=tiled, sort_interval=3, **kw,
        )

    sim_a = Simulation(mkcfg("off"))
    sim_a.init()
    sim_a.evolve()
    sim_b = Simulation(mkcfg("on"))
    sim_b.init()
    sim_b.evolve()
    cs_a, cs_b = sim_a.checksums(), sim_b.checksums()
    for k in cs_a:
        for q_ in cs_a[k]:
            if q_ in ("divB", "divE"):
                continue
            a, b = cs_a[k][q_], cs_b[k][q_]
            assert abs(a - b) <= 1e-9 * abs(a) + 1e-300, (k, q_, a, b)


def test_binned_mxu_precision_modes():
    """'mixed' (bf16 gather) stays within bf16 interpolation rounding of the
    f32 path; 'bf16' (bf16 deposit too) within ~1e-2.  Both must conserve
    total weight exactly (precision only touches gather/deposit operands)."""
    geom = _geom()
    results = {}
    for mxu in ("f32", "mixed", "bf16"):
        cfg = SimConfig(
            geometry=geom, max_step=4, dt=compute_dt_yee(geom, 0.999),
            particle_shape=1, species=_species(),
            tiled_particles="on", sort_interval=3, tile_mxu=mxu,
        )
        sim = Simulation(cfg)
        sim.init()
        sim.evolve()
        results[mxu] = sim.state
    ref = results["f32"].fields.Ex
    scale = float(jnp.abs(ref).max())
    for mxu, tol in (("mixed", 3e-2), ("bf16", 3e-2)):
        err = float(jnp.abs(results[mxu].fields.Ex - ref).max()) / scale
        assert err < tol, (mxu, err)
        assert err > 0.0  # the mode really changed the arithmetic
        w_ref = float(jnp.sum(results["f32"].species["electrons"].w))
        w_got = float(jnp.sum(results[mxu].species["electrons"].w))
        assert w_ref == w_got


def test_binned_relativistic_drift_margin():
    """Relativistic thermal plasma: particles move ~0.5 cells/step; the
    auto-margin must keep the layout valid (zero violations) across rebins."""
    geom = _geom()
    cfg = SimConfig(
        geometry=geom, max_step=6, dt=compute_dt_yee(geom, 0.999),
        particle_shape=1, species=_species(ppc=1, uth=3.0),
        tiled_particles="on", sort_interval=4,
    )
    sim = Simulation(cfg)
    sim.init()
    sim.evolve()
    sim._normalize_binned()  # raises on overflow/violations
