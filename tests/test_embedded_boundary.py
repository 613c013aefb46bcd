"""Embedded boundaries: staircase level set + particle scraping.

Runs the reference's inputs_test_3d_particle_scrape deck: an electron bunch
drifts into a covered slab (warpx.eb_implicit_function) and must be scraped
at the EB with the particles recorded in the boundary buffer (reference:
EmbeddedBoundary/ParticleScraper.H + ParticleBoundaryBuffer; the deck's
PICMI analysis checks the same count bookkeeping)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from .conftest import REFERENCE, reference_available

DECK = os.path.join(
    REFERENCE,
    "Examples/Tests/particle_boundary_scrape/inputs_test_3d_particle_scrape",
)


@pytest.mark.slow
def test_particle_scrape_at_eb():
    if not reference_available():
        pytest.skip("reference not mounted")
    from warpx_tpu.core.simulation import Simulation

    sim = Simulation.from_deck(
        DECK, overrides=("diagnostics.diags_names =",)
    )
    state = sim.init()
    n0 = int(jnp.sum(state.species["electrons"].alive))
    assert n0 > 50
    sim.evolve()
    state = sim.state
    alive = int(jnp.sum(state.species["electrons"].alive))
    n_eb = int(state.aux["scrape:electrons:eb:n"])
    n_xhi = int(state.aux["scrape:electrons:xhi:n"])
    # the bunch drifts +z into the slab: a large fraction must be scraped
    # at the EB and recorded
    assert n_eb > 0.2 * n0, (n_eb, n0)
    # bookkeeping: everything is alive or recorded at a boundary... the
    # z-drift cannot reach xhi
    assert n_xhi == 0
    # no survivor sits inside the covered region
    el = state.species["electrons"]
    inside = (
        (np.abs(np.asarray(el.x)) < 12.5e-6)
        & (np.abs(np.asarray(el.y)) < 12.5e-6)
        & (np.asarray(el.z) > -8.65e-5)
        & (np.asarray(el.z) < -6.15e-5)
    )
    assert not np.any(inside & np.asarray(el.alive))
    # recorded EB particles carry sane positions (at the slab's lower face)
    zrec = sim.scraped_particles("electrons", "eb")["p2"]
    assert zrec.shape[0] == n_eb
    assert np.all(zrec[:n_eb] > -9.0e-5)
