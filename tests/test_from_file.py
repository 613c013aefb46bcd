"""From-file inputs: particle injection from openPMD and external grid
fields read from file.

Reference: PhysicalParticleContainer::AddPlasmaFromFile
(PhysicalParticleContainer.cpp:680-800, injection_style = external_file;
positions = position + positionOffset + z_shift, u = momentum/mass, bounds
filter) and WarpX::ReadExternalFieldFromFile (WarpXInitData.cpp:1503-1672,
warpx.{E,B}_ext_grid_init_style = read_from_file: multilinear interpolation
from the file's node lattice offset + i*spacing onto every staggered grid
position).  The stock decks for these features (rz_load_external_field_*)
need the absent openPMD-example-datasets; these tests exercise the same
machinery on files we write ourselves.
"""

import numpy as np
import pytest

import h5py

from warpx_tpu.core.simulation import Simulation
from warpx_tpu.utils.parser import Deck


def _write_particle_file(path, n=40, mass=9.1093837015e-31,
                         charge=-1.602176634e-19):
    rng = np.random.default_rng(7)
    x = rng.uniform(-10e-6, 10e-6, n)
    y = rng.uniform(-10e-6, 10e-6, n)
    z = rng.uniform(-10e-6, 10e-6, n)
    ux = rng.normal(0.0, 0.05, n)  # gamma*v/c
    uy = rng.normal(0.0, 0.05, n)
    uz = rng.normal(0.3, 0.05, n)
    w = rng.uniform(1e8, 2e8, n)
    c = 299792458.0
    with h5py.File(path, "w") as fh:
        fh.attrs["openPMD"] = np.bytes_("1.1.0")
        fh.attrs["basePath"] = np.bytes_("/data/%T/")
        fh.attrs["particlesPath"] = np.bytes_("particles/")
        fh.attrs["meshesPath"] = np.bytes_("meshes/")
        it = fh.create_group("data/0")
        it.attrs["time"] = 0.0
        it.attrs["timeUnitSI"] = 1.0
        ps = it.create_group("particles/beam")
        pos = ps.create_group("position")
        off = ps.create_group("positionOffset")
        mom = ps.create_group("momentum")
        for ax, arr in (("x", x), ("y", y), ("z", z)):
            d = pos.create_dataset(ax, data=arr * 0.5)
            d.attrs["unitSI"] = 1.0
            # half the position rides positionOffset with unitSI 2.0 to
            # exercise the unit scaling: 0.5*arr + 2.0*(0.25*arr) = arr
            d2 = off.create_dataset(ax, data=arr * 0.25)
            d2.attrs["unitSI"] = 2.0
        for ax, arr in (("x", ux), ("y", uy), ("z", uz)):
            d = mom.create_dataset(ax, data=arr * mass * c)
            d.attrs["unitSI"] = 1.0
        wg = ps.create_group("weighting")
        d = wg.create_dataset("value", data=w)
        d.attrs["unitSI"] = 1.0
        for nm, v in (("charge", charge), ("mass", mass)):
            g = ps.create_group(nm)
            g.attrs["value"] = v
            g.attrs["unitSI"] = 1.0
        ps.attrs["currentDeposition"] = np.bytes_("none")
    return x, y, z, ux * c, uy * c, uz * c, w, mass


DECK_INJ = """
max_step = 1
amr.n_cell = 16 16 16
geometry.dims = 3
geometry.prob_lo = -20.e-6 -20.e-6 -20.e-6
geometry.prob_hi =  20.e-6  20.e-6  20.e-6
boundary.field_lo = periodic periodic periodic
boundary.field_hi = periodic periodic periodic
warpx.cfl = 0.9
algo.particle_shape = 1
particles.species_names = beam
beam.injection_style = external_file
beam.injection_file = {path}
beam.z_shift = {z_shift}
"""


def test_injection_from_openpmd_file(tmp_path):
    path = str(tmp_path / "beam.h5")
    x, y, z, vux, vuy, vuz, w, mass = _write_particle_file(path)
    z_shift = 2.0e-6
    sim = Simulation.from_deck(
        Deck.from_string(DECK_INJ.format(path=path, z_shift=z_shift))
    )
    state = sim.init()
    sp = state.species["beam"]
    alive = np.asarray(sp.alive)
    assert alive.sum() == len(x)
    # charge/mass resolved from the file records
    sp_cfg = next(s for s in sim.cfg.species if s.name == "beam")
    assert sp_cfg.mass == pytest.approx(mass, rel=1e-12)
    assert sp_cfg.charge == pytest.approx(-1.602176634e-19, rel=1e-12)
    order = np.argsort(np.asarray(sp.x)[alive])
    ref_order = np.argsort(x)
    for got, ref in (
        (np.asarray(sp.x)[alive][order], x[ref_order]),
        (np.asarray(sp.y)[alive][order], y[ref_order]),
        (np.asarray(sp.z)[alive][order], z[ref_order] + z_shift),
        (np.asarray(sp.ux)[alive][order], vux[ref_order]),
        (np.asarray(sp.w)[alive][order], w[ref_order]),
    ):
        np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_injection_from_file_bounds(tmp_path):
    """Out-of-bounds particles are dropped (insideBounds filter)."""
    path = str(tmp_path / "beam.h5")
    x, y, z, *_ = _write_particle_file(path)
    deck = DECK_INJ.format(path=path, z_shift=0.0) + "beam.zmin = 0.0\n"
    sim = Simulation.from_deck(Deck.from_string(deck))
    state = sim.init()
    sp = state.species["beam"]
    assert int(np.asarray(sp.alive).sum()) == int((z >= 0.0).sum())


def _write_field_file(path, fn, lo, hi, n):
    """Node-lattice mesh file: B components given by fn(x, y, z)."""
    xs = [np.linspace(lo[d], hi[d], n[d]) for d in range(3)]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    with h5py.File(path, "w") as fh:
        fh.attrs["openPMD"] = np.bytes_("1.1.0")
        fh.attrs["basePath"] = np.bytes_("/data/%T/")
        fh.attrs["meshesPath"] = np.bytes_("meshes/")
        fh.attrs["particlesPath"] = np.bytes_("particles/")
        it = fh.create_group("data/0")
        it.attrs["time"] = 0.0
        B = it.create_group("meshes/B")
        B.attrs["geometry"] = np.bytes_("cartesian")
        B.attrs["dataOrder"] = np.bytes_("C")
        B.attrs["axisLabels"] = np.array(
            [np.bytes_(a) for a in ("x", "y", "z")]
        )
        B.attrs["gridSpacing"] = np.array(
            [(hi[d] - lo[d]) / (n[d] - 1) for d in range(3)]
        )
        B.attrs["gridGlobalOffset"] = np.asarray(lo, np.float64)
        B.attrs["gridUnitSI"] = 1.0
        for ci, comp in enumerate(("x", "y", "z")):
            d = B.create_dataset(comp, data=fn(ci, X, Y, Z))
            d.attrs["unitSI"] = 1.0
            d.attrs["position"] = np.zeros(3)


DECK_EXT = """
max_step = 0
amr.n_cell = 8 8 8
geometry.dims = 3
geometry.prob_lo = -1.0 -1.0 -1.0
geometry.prob_hi =  1.0  1.0  1.0
boundary.field_lo = periodic periodic periodic
boundary.field_hi = periodic periodic periodic
warpx.cfl = 0.9
algo.particle_shape = 1
particles.species_names =
warpx.B_ext_grid_init_style = read_from_file
warpx.read_fields_from_path = {path}
"""


def test_external_grid_field_from_file(tmp_path):
    """A linear field is reproduced EXACTLY by multilinear interpolation
    at every staggered position (the file lattice spans the domain)."""
    path = str(tmp_path / "bfield.h5")

    def fn(ci, X, Y, Z):
        return (1.0 + ci) * X + 0.5 * Y - 2.0 * Z + 0.25 * ci

    _write_field_file(path, fn, lo=(-1.2, -1.2, -1.2), hi=(1.2, 1.2, 1.2),
                      n=(13, 11, 17))
    sim = Simulation.from_deck(Deck.from_string(DECK_EXT.format(path=path)))
    state = sim.init()
    geom = sim.cfg.geometry
    for ci, comp in enumerate(("Bx", "By", "Bz")):
        arr = np.asarray(getattr(state.fields, comp))
        flags = sim.staggering[comp]
        coords = [
            geom.prob_lo[d]
            + (np.arange(arr.shape[d]) + (0.0 if flags[d] else 0.5))
            * geom.dx[d]
            for d in range(3)
        ]
        X, Y, Z = np.meshgrid(*coords, indexing="ij")
        np.testing.assert_allclose(arr, fn(ci, X, Y, Z), rtol=0, atol=1e-12)


def test_parsed_theta_beta_uniform_injectors():
    """theta/beta parser profiles, uniform cuboid and gaussian-parser
    momentum distributions (InjectorMomentum.H uniform/parser branches;
    exercised by inputs_test_3d_initial_distribution)."""
    import numpy as np

    from warpx_tpu.core.deck import config_from_deck
    from warpx_tpu.core.injection import inject_species
    from warpx_tpu.utils.parser import Deck

    deck = Deck.from_string("""
max_step = 1
amr.n_cell = 8 8 8
geometry.dims = 3
geometry.prob_lo = -1. -1. -1.
geometry.prob_hi = 1. 1. 1.
boundary.field_lo = periodic periodic periodic
boundary.field_hi = periodic periodic periodic
warpx.cfl = 0.9
algo.particle_shape = 1
particles.species_names = mj vp un gp
mj.charge = -q_e
mj.mass = m_e
mj.injection_style = NRandomPerCell
mj.num_particles_per_cell = 2
mj.profile = constant
mj.density = 1.0e21
mj.momentum_distribution_type = maxwell_juttner
mj.theta_distribution_type = parser
mj.theta_function(x,y,z) = "1.0 + heaviside(x,0)"
vp.charge = -q_e
vp.mass = m_e
vp.injection_style = NRandomPerCell
vp.num_particles_per_cell = 2
vp.profile = constant
vp.density = 1.0e21
vp.momentum_distribution_type = maxwell_boltzmann
vp.theta = 1e-9
vp.beta_distribution_type = parser
vp.beta_function(x,y,z) = "-0.2 + 0.4 * heaviside(z,0)"
vp.bulk_vel_dir = -y
un.charge = q_e
un.mass = m_e
un.injection_style = NRandomPerCell
un.num_particles_per_cell = 2
un.profile = constant
un.density = 1.0e21
un.momentum_distribution_type = uniform
un.ux_min = -0.2
un.ux_max = 0.3
un.uz_min = 10.
un.uz_max = 11.
gp.charge = -q_e
gp.mass = m_e
gp.injection_style = NRandomPerCell
gp.num_particles_per_cell = 2
gp.profile = constant
gp.density = 1.0e21
gp.momentum_distribution_type = gaussian_parse_momentum_function
gp.momentum_function_ux_m(x,y,z) = 0.1*z
gp.momentum_function_ux_th(x,y,z) = 0.0
""")
    cfg = config_from_deck(deck)
    rng = np.random.default_rng(3)
    c = 299792458.0
    sps = {s.name: s for s in cfg.species}
    # theta parser: <u^2> larger on the x>0 side (theta 2 vs 1)
    ps = inject_species(sps["mj"], cfg.geometry, np.float64, rng)
    x = np.asarray(ps.x)
    u2 = (np.asarray(ps.ux)**2 + np.asarray(ps.uy)**2
          + np.asarray(ps.uz)**2) / c**2
    assert u2[x > 0].mean() > 1.5 * u2[x < 0].mean()
    # beta parser along -y: mean uy has opposite signs across z=0
    # (beta -0.2 -> bulk_vel_dir -y gives +0.2c drift along y)
    ps = inject_species(sps["vp"], cfg.geometry, np.float64, rng)
    z = np.asarray(ps.z)
    uy = np.asarray(ps.uy) / c
    assert uy[z < 0].mean() > 0.15 and uy[z > 0].mean() < -0.15
    # uniform cuboid
    ps = inject_species(sps["un"], cfg.geometry, np.float64, rng)
    ux = np.asarray(ps.ux) / c
    uz = np.asarray(ps.uz) / c
    assert -0.2 <= ux.min() and ux.max() <= 0.3
    assert 10.0 <= uz.min() and uz.max() <= 11.0
    # gaussian parser: ux == 0.1*z*c exactly (zero spread)
    ps = inject_species(sps["gp"], cfg.geometry, np.float64, rng)
    np.testing.assert_allclose(
        np.asarray(ps.ux), 0.1 * np.asarray(ps.z) * c, rtol=1e-12
    )


def test_juttner_low_theta_aborts():
    """theta < 0.1 aborts like the reference (InjectorMomentum.H:313)."""
    import numpy as np
    import pytest as _pytest

    from warpx_tpu.core.injection import _sample_juttner

    rng = np.random.default_rng(0)
    with _pytest.raises(ValueError, match="Maxwell-Juttner"):
        _sample_juttner(rng, 10, 0.01, 0.0, 0, np.float64)
