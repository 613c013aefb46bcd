"""Run REFERENCE PICMI scripts verbatim through our picmi implementation.

The reference's PICMI tests are plain python scripts doing
``from pywarpx import picmi`` (e.g.
Examples/Tests/langmuir/inputs_test_2d_langmuir_multi_picmi.py); aliasing
``pywarpx`` to ``warpx_tpu.pywarpx`` (whose ``picmi`` attribute is our
implementation) runs them unchanged — the analog of the reference's
`.py`-driven CTest cases.  Checksum-gated against the reference's own
picmi golden (test_2d_langmuir_multi_picmi.json).
"""

import json
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _run_reference_picmi_script(path):
    import warpx_tpu.pywarpx as pywarpx_mod

    sys.modules.setdefault("pywarpx", pywarpx_mod)
    src = open(path).read()
    glb = {"__name__": "__main__", "__file__": path}
    exec(compile(src, path, "exec"), glb)
    return glb


@pytest.mark.slow
def test_2d_langmuir_multi_picmi_script():
    glb = _run_reference_picmi_script(
        f"{REFERENCE}/Examples/Tests/langmuir/"
        "inputs_test_2d_langmuir_multi_picmi.py"
    )
    sim = glb["sim"].extension
    assert int(sim.state.step) == 40
    comp = sim.checksums()
    gold = json.load(open(
        f"{REFERENCE}/Regression/Checksum/benchmarks_json/"
        "test_2d_langmuir_multi_picmi.json"
    ))
    failures = []
    for group, entries in gold.items():
        for key, rv in entries.items():
            cv = comp.get(group, {}).get(key)
            if cv is None:
                failures.append(f"missing {group}/{key}")
                continue
            rel = abs(cv - rv) / max(abs(rv), 1e-300)
            if not np.isfinite(cv) or rel > 1e-8:
                failures.append(f"{group}/{key}: rel {rel:.2e} "
                                f"({cv:.8e} vs {rv:.8e})")
    assert not failures, "\n".join(failures)


def test_picmi_write_input_file(tmp_path):
    """write_input_file emits a deck that config_from_deck accepts and
    that reproduces the PICMI-built configuration."""
    from warpx_tpu import picmi
    from warpx_tpu.core.deck import config_from_deck
    from warpx_tpu.utils.parser import Deck

    grid = picmi.Cartesian2DGrid(
        number_of_cells=[16, 16],
        lower_bound=[-1e-5, -1e-5], upper_bound=[1e-5, 1e-5],
        lower_boundary_conditions=["periodic", "periodic"],
        upper_boundary_conditions=["periodic", "periodic"],
    )
    solver = picmi.ElectromagneticSolver(grid=grid, method="CKC", cfl=0.9)
    sim = picmi.Simulation(solver=solver, max_steps=7)
    sim.add_species(
        picmi.Species(
            particle_type="electron", name="e",
            initial_distribution=picmi.UniformDistribution(density=1e24),
        ),
        layout=picmi.GriddedLayout(n_macroparticle_per_cell=[1, 1]),
    )
    f = str(tmp_path / "inputs")
    sim.write_input_file(f)
    cfg = config_from_deck(Deck.from_file(f))
    assert cfg.em_solver == "ckc"
    assert cfg.max_step == 7
    assert cfg.species[0].name == "e"
    assert cfg.species[0].density == 1e24


def test_picmi_wide_surface_lowering(tmp_path):
    """The widened classes lower to the expected deck keys."""
    from warpx_tpu import picmi

    grid = picmi.CylindricalGrid(
        number_of_cells=[8, 16],
        lower_bound=[0.0, -1e-5], upper_bound=[1e-5, 1e-5],
        lower_boundary_conditions=["none", "periodic"],
        upper_boundary_conditions=["pec", "periodic"],
        n_azimuthal_modes=2,
    )
    solver = picmi.ElectromagneticSolver(grid=grid, method="Yee", cfl=0.9)
    sim = picmi.Simulation(solver=solver, max_steps=1)
    text = sim._build_deck_text()
    assert "geometry.dims = RZ" in text
    assert "warpx.n_rz_azimuthal_modes = 2" in text

    # implicit evolve scheme + newton/gmres lowering
    grid3 = picmi.Cartesian1DGrid(
        number_of_cells=[16], lower_bound=[0.0], upper_bound=[1.0],
        lower_boundary_conditions=["periodic"],
        upper_boundary_conditions=["periodic"],
    )
    solver3 = picmi.ElectromagneticSolver(
        grid=grid3, method="Yee", cfl=0.9,
        warpx_evolve_scheme=picmi.ThetaImplicitEMEvolveScheme(
            theta=0.5,
            nonlinear_solver=picmi.NewtonNonlinearSolver(
                relative_tolerance=1e-9,
                linear_solver=picmi.GMRESLinearSolver(
                    relative_tolerance=1e-6),
            ),
        ),
    )
    sim3 = picmi.Simulation(solver=solver3, max_steps=1)
    text3 = sim3._build_deck_text()
    assert "algo.evolve_scheme = theta_implicit_em" in text3
    assert "implicit_evolve.nonlinear_solver = newton" in text3
    assert "gmres.relative_tolerance" in text3

    # MCC collisions lowering
    mcc = picmi.MCCCollisions(
        name="coll_elec", species=picmi.Species(name="electrons"),
        background_density=1e22, background_temperature=300.0,
        background_mass=6.6e-26,
        scattering_processes={
            "elastic": {"cross_section": "/tmp/elastic.dat"},
            "ionization": {"cross_section": "/tmp/ion.dat",
                           "energy": 15.76,
                           "species": "ions"},
        },
    )
    hybrid = picmi.HybridPICSolver(
        grid=grid3, Te=10.0, n0=1e18, plasma_resistivity=1e-6,
        substeps=20,
    )
    sim4 = picmi.Simulation(solver=hybrid, max_steps=1,
                            collisions=[mcc])
    text4 = sim4._build_deck_text()
    assert "algo.maxwell_solver = hybrid" in text4
    assert "hybrid_pic_model.elec_temp = 10.0" in text4
    assert "coll_elec.type = background_mcc" in text4
    assert "coll_elec.ionization_energy = 15.76" in text4

    # embedded boundary + ES solver
    eb = picmi.EmbeddedBoundary(
        implicit_function="-(x**2+y**2+z**2-radius**2)", radius=0.2
    )
    grid5 = picmi.Cartesian3DGrid(
        number_of_cells=[8, 8, 8],
        lower_bound=[-1, -1, -1], upper_bound=[1, 1, 1],
        lower_boundary_conditions=["dirichlet"] * 3,
        upper_boundary_conditions=["dirichlet"] * 3,
    )
    es = picmi.ElectrostaticSolver(grid=grid5)
    sim5 = picmi.Simulation(solver=es, max_steps=1,
                            warpx_embedded_boundary=eb)
    text5 = sim5._build_deck_text()
    assert "warpx.do_electrostatic = labframe" in text5
    assert "warpx.eb_implicit_function" in text5
    assert "my_constants.radius = 0.2" in text5

    # from-file initial field + BTD diagnostic keys
    sim6 = picmi.Simulation(solver=solver, max_steps=1)
    sim6.add_applied_field(
        picmi.LoadInitialField(read_fields_from_path="/tmp/f.h5",
                               load_E=False)
    )
    sim6.add_diagnostic(picmi.LabFrameFieldDiagnostic(
        name="btd", num_snapshots=4, dt_snapshots=1e-14,
        data_list=["Ex"],
    ))
    text6 = sim6._build_deck_text()
    assert "warpx.B_ext_grid_init_style = read_from_file" in text6
    assert "btd.diag_type = BackTransformed" in text6
