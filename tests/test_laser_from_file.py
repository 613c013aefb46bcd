"""Laser profile from a lasy (openPMD) file.

Mirrors the reference's laser_injection_from_file tests
(Examples/Tests/laser_injection_from_lasy_file): a lasy envelope is
synthesized (gaussian pulse), and the emitted amplitude must match the
built-in gaussian profile at focal_distance = 0 (where the analytic profile
has no diffraction/Gouy terms and equals envelope * cos(omega (t - t_peak))).
Reference: Source/Laser/LaserProfilesImpl/LaserProfileFromFile.cpp.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from warpx_tpu import constants
from warpx_tpu.core.config import LaserConfig
from warpx_tpu.core.laser import fill_amplitude
from warpx_tpu.core.laser_file import load_lasy

WAVELENGTH = 1.0e-6
E_MAX = 1.0e12
WAIST = 5.0e-6
TAU = 15.0e-15
T_PEAK = 60.0e-15


def _gauss_env(t, x2):
    """Complex lasy envelope matching the built-in gaussian at f_dist=0:
    Re(env e^{-i w t}) == E cos(w (t - t_peak)) e^{-(t-t_peak)^2/tau^2 - x2/w0^2}."""
    omega0 = 2.0 * math.pi * constants.c / WAVELENGTH
    return (
        E_MAX
        * np.exp(-((t - T_PEAK) ** 2) / TAU**2 - x2 / WAIST**2)
        * np.exp(1j * omega0 * T_PEAK)
    )


def _write_lasy_cartesian(path):
    h5py = pytest.importorskip("h5py")
    nt, ny, nx = 241, 41, 81
    t = np.linspace(0.0, 120e-15, nt)
    y = np.linspace(-3 * WAIST, 3 * WAIST, ny)
    x = np.linspace(-4 * WAIST, 4 * WAIST, nx)
    env = _gauss_env(
        t[:, None, None], x[None, None, :] ** 2 + y[None, :, None] ** 2
    ).astype(np.complex128)
    with h5py.File(path, "w") as fh:
        grp = fh.create_group("data/0/meshes")
        ds = grp.create_dataset("laserEnvelope", data=env)
        ds.attrs["geometry"] = np.bytes_("cartesian")
        ds.attrs["gridSpacing"] = np.array(
            [t[1] - t[0], y[1] - y[0], x[1] - x[0]]
        )
        ds.attrs["gridGlobalOffset"] = np.array([t[0], y[0], x[0]])
        ds.attrs["position"] = np.zeros(3)
    return path


def _write_lasy_rz(path):
    h5py = pytest.importorskip("h5py")
    nt, nr = 241, 61
    t = np.linspace(0.0, 120e-15, nt)
    r = np.linspace(0.0, 4 * WAIST, nr)
    env = _gauss_env(t[:, None], r[None, :] ** 2)[None].astype(np.complex128)
    with h5py.File(path, "w") as fh:
        grp = fh.create_group("data/0/meshes")
        ds = grp.create_dataset("laserEnvelope", data=env)
        ds.attrs["geometry"] = np.bytes_("thetaMode")
        ds.attrs["gridSpacing"] = np.array([t[1] - t[0], r[1] - r[0]])
        ds.attrs["gridGlobalOffset"] = np.array([t[0], r[0]])
        ds.attrs["position"] = np.zeros(2)
    return path


def _laser(profile, fname=""):
    return LaserConfig(
        name="lasy",
        position=(0.0, 0.0, 0.0),
        direction=(0.0, 0.0, 1.0),
        polarization=(1.0, 0.0, 0.0),
        e_max=E_MAX,
        wavelength=WAVELENGTH,
        profile=profile,
        profile_waist=WAIST,
        profile_duration=TAU,
        profile_t_peak=T_PEAK,
        profile_focal_distance=0.0,
        lasy_file_name=fname,
    )


def test_lasy_cartesian_matches_gaussian(tmp_path):
    fname = _write_lasy_cartesian(str(tmp_path / "gauss.h5"))
    lg = _laser("gaussian")
    lf = _laser("from_file", fname)
    rng = np.random.default_rng(0)
    Xp = jnp.asarray(rng.uniform(-3 * WAIST, 3 * WAIST, 256))
    Yp = jnp.asarray(rng.uniform(-2 * WAIST, 2 * WAIST, 256))
    for t in (20e-15, 55e-15, 60e-15, 90e-15):
        a_ref = np.asarray(fill_amplitude(lg, 3, Xp, Yp, t))
        a_fil = np.asarray(fill_amplitude(lf, 3, Xp, Yp, t))
        assert np.max(np.abs(a_fil - a_ref)) < 2e-2 * E_MAX


def test_lasy_rz_matches_gaussian(tmp_path):
    fname = _write_lasy_rz(str(tmp_path / "gauss_rz.h5"))
    lg = _laser("gaussian")
    lf = _laser("from_file", fname)
    rng = np.random.default_rng(1)
    Xp = jnp.asarray(rng.uniform(-2.5 * WAIST, 2.5 * WAIST, 256))
    Yp = jnp.asarray(rng.uniform(-2.5 * WAIST, 2.5 * WAIST, 256))
    for t in (40e-15, 60e-15, 75e-15):
        a_ref = np.asarray(fill_amplitude(lg, 3, Xp, Yp, t))
        a_fil = np.asarray(fill_amplitude(lf, 3, Xp, Yp, t))
        assert np.max(np.abs(a_fil - a_ref)) < 2e-2 * E_MAX


def test_lasy_out_of_bounds_zero(tmp_path):
    fname = _write_lasy_cartesian(str(tmp_path / "gauss.h5"))
    lf = _laser("from_file", fname)
    X = jnp.asarray([5 * WAIST, 0.0])
    Y = jnp.zeros(2)
    a = np.asarray(fill_amplitude(lf, 3, X, Y, 60e-15))
    assert a[0] == 0.0 and abs(a[1]) > 0.1 * E_MAX
    # outside the time window
    a2 = np.asarray(fill_amplitude(lf, 3, X, Y, 500e-15))
    assert np.all(a2 == 0.0)


def test_lasy_delay_shifts_pulse(tmp_path):
    fname = _write_lasy_cartesian(str(tmp_path / "gauss.h5"))
    import dataclasses

    lf = _laser("from_file", fname)
    lfd = dataclasses.replace(lf, delay=20e-15)
    X = jnp.zeros(1)
    a0 = np.asarray(fill_amplitude(lf, 3, X, X, 60e-15))
    ad = np.asarray(fill_amplitude(lfd, 3, X, X, 80e-15))
    assert np.allclose(a0, ad, atol=1e-3 * E_MAX)


def test_lasy_loader_metadata(tmp_path):
    fname = _write_lasy_cartesian(str(tmp_path / "meta.h5"))
    ld = load_lasy(fname)
    assert ld.cartesian
    assert ld.t_min == 0.0
    assert abs(ld.t_max - 120e-15) < 1e-20
    assert abs(ld.x_min + 4 * WAIST) < 1e-12


def test_lasy_deck_runs(tmp_path):
    """End-to-end: a 2D sim driven by a lasy file emits the same fields as
    the built-in gaussian profile (laser_injection_from_lasy_file analog)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from warpx_tpu.core.simulation import Simulation
    from warpx_tpu.utils.parser import Deck

    fname = _write_lasy_cartesian(str(tmp_path / "gauss2d.h5"))
    base = """
    max_step = 40
    amr.n_cell = 32 64
    geometry.dims = 2
    geometry.prob_lo = -15.e-6 -10.e-6
    geometry.prob_hi =  15.e-6  10.e-6
    boundary.field_lo = periodic pec
    boundary.field_hi = periodic pec
    warpx.cfl = 0.9
    lasers.names = lasy
    lasy.position = 0. 0. -5.e-6
    lasy.direction = 0. 0. 1.
    lasy.polarization = 1. 0. 0.
    lasy.e_max = {emax}
    lasy.wavelength = {wl}
    lasy.profile = {profile}
    {extra}
    """
    fields = {}
    for profile, extra in (
        (
            "gaussian",
            f"lasy.profile_waist = {WAIST}\n"
            f"lasy.profile_duration = {TAU}\n"
            f"lasy.profile_t_peak = {T_PEAK}\n"
            "lasy.profile_focal_distance = 0.0",
        ),
        ("from_file", f'lasy.lasy_file_name = "{fname}"'),
    ):
        deck = Deck.from_string(
            base.format(emax=E_MAX, wl=WAVELENGTH, profile=profile,
                        extra=extra)
        )
        sim = Simulation.from_deck(deck, output_dir=str(tmp_path / profile))
        sim.init()
        sim.evolve()
        fields[profile] = np.asarray(sim.state.fields.Ex)
    ref = fields["gaussian"]
    dev = np.abs(fields["from_file"] - ref).max()
    assert ref.max() > 1e9  # the laser actually launched
    assert dev < 0.03 * np.abs(ref).max()
