"""Multi-chip equivalence: N-shard SPMD step == single-device step.

The analog of the reference's nprocs=2 CI validation
(Examples/CMakeLists.txt:22): same deck, 1 device vs an 8-device virtual mesh,
fields must agree to roundoff and particle checksums must match.
"""

import numpy as np
import pytest

from warpx_tpu.core.deck import config_from_deck
from warpx_tpu.core.simulation import DistSimulation, Simulation
from warpx_tpu.utils.parser import Deck

from .conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

DECK_2D = (
    f"{REFERENCE}/Examples/Tests/langmuir/inputs_test_2d_langmuir_multi"
)


@pytest.mark.parametrize("mesh_shape", [{"x": 2, "z": 4}, {"z": 8}, {"x": 2}])
def test_sharded_matches_single_2d(mesh_shape):
    import jax

    if len(jax.devices()) < max(
        int(np.prod(list(mesh_shape.values()))), 1
    ):
        pytest.skip("not enough devices")
    deck = Deck.from_file(DECK_2D)
    cfg = config_from_deck(deck)

    sim1 = Simulation(cfg)
    sim1.init()
    sim1.evolve(5)

    simN = DistSimulation(cfg, mesh_shape)
    simN.init()
    simN.evolve(5)

    f1, fN = sim1.state.fields, simN.state.fields
    for name in ("Ex", "Ey", "Ez", "Bx", "Bz", "jx", "jy", "jz"):
        a = np.asarray(getattr(f1, name))
        b = np.asarray(getattr(fN, name))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-12, err_msg=name)

    for sp_name in ("electrons", "positrons"):
        s1 = sim1.state.species[sp_name]
        sN = simN.state.species[sp_name]
        a1 = np.asarray(s1.alive)
        aN = np.asarray(sN.alive)
        assert a1.sum() == aN.sum()
        for field in ("x", "z", "ux", "uz", "w"):
            v1 = np.sort(np.asarray(getattr(s1, field))[a1])
            vN = np.sort(np.asarray(getattr(sN, field))[aN])
            scale = max(np.abs(v1).max(), 1e-30)
            np.testing.assert_allclose(
                v1 / scale, vN / scale, atol=1e-12, err_msg=f"{sp_name}.{field}"
            )
