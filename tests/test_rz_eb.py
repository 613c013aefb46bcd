"""RZ embedded boundary (staircase level set on the cylindrical grid).

Covered-edge E / covered-face B are frozen at zero; a component is
covered only when its whole edge/face lies inside phi > 0 (the
reference's Yee-EB skips updates only for zero-length edges — this is
what makes a sub-cell-thin conducting disk act as a PEC sheet on the
tangential-E / normal-B components alone).
"""

import os

import numpy as np
import pytest

from .conftest import REFERENCE, reference_available


@pytest.mark.slow
def test_rz_embedded_boundary_diffraction():
    """The reference deck's own gate (analysis_fields.py:42-44): a laser
    diffracting around a conducting disk of diameter d=0.4 produces an
    Airy pattern whose first minimum lies along
    theta = arcsin(1.22 lambda / d)/2 within 0.03 for all z above the
    50th diag row."""
    if not reference_available():
        pytest.skip("reference not mounted")
    from scipy.ndimage import gaussian_filter1d

    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.rz.core import rz_cell_centered_output

    sim = Simulation.from_deck(
        os.path.join(
            REFERENCE,
            "Examples/Tests/embedded_boundary_diffraction/"
            "inputs_test_rz_embedded_boundary_diffraction",
        ),
        overrides=("diagnostics.diags_names =",),
    )
    sim.init()
    sim.evolve()
    out = rz_cell_centered_output(sim.state, sim.cfg)
    Ex = np.asarray(out["Er"]).T  # (nz, nr), theta=0 reconstruction
    In = gaussian_filter1d(Ex**2, sigma=5, axis=0)
    geom = sim.cfg.geometry
    dr, dz = geom.dx
    rvals = geom.prob_lo[0] + (np.arange(Ex.shape[1]) + 0.5) * dr
    zvals = geom.prob_lo[1] + (np.arange(Ex.shape[0]) + 0.5) * dz

    def r_first_minimum(iz):
        ir = 0
        while ir + 1 < len(rvals) and In[iz, ir + 1] < In[iz, ir]:
            ir += 1
        return rvals[ir]

    r = np.array([r_first_minimum(iz) for iz in range(len(zvals))])
    theta = np.arcsin(1.22 * 0.1 / 0.4) / 2
    sel = zvals > zvals[50]
    assert np.all(np.abs(r[sel] - theta * zvals[sel]) < 0.03)
