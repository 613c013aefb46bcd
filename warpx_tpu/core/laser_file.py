"""Laser profile from a lasy (openPMD) file.

Reimplements the reference's LaserProfileFromFile (reference:
Source/Laser/LaserProfilesImpl/LaserProfileFromFile.cpp): the lasy file's
complex E-envelope (mesh "laserEnvelope", geometry "cartesian" with axes
{t,y,x} or "thetaMode" with {m,t,r}) is interpolated tri/bilinearly at the
antenna-plane coordinates and each time, and the emitted amplitude is
Re(envelope * e^{-i omega0 t}) (:436-437).  The whole file is loaded up
front (no time chunking: lasy envelopes are small; the reference chunks
only to bound host memory).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .. import constants

__all__ = ["LasyData", "load_lasy", "lasy_amplitude"]

_CACHE = {}


@dataclasses.dataclass(frozen=True)
class LasyData:
    cartesian: bool
    t_min: float
    t_max: float
    # cartesian: (nt, ny, nx) complex; thetaMode: (2m-1, nt, nr) complex
    data: object
    x_min: float = 0.0
    x_max: float = 0.0
    y_min: float = 0.0
    y_max: float = 0.0
    r_min: float = 0.0
    r_max: float = 0.0


def load_lasy(path: str) -> LasyData:
    """Read the lasy envelope (cached per path)."""
    if path in _CACHE:
        return _CACHE[path]
    import h5py

    with h5py.File(path, "r") as fh:
        base = fh.attrs.get("basePath", b"/data/%T/")
        if isinstance(base, bytes):
            base = base.decode()
        data_grp = fh["data"]
        it_key = sorted(data_grp.keys(), key=lambda s: int(s))[0]
        it = data_grp[it_key]
        E = it["fields/laserEnvelope"] if "fields" in it else it[
            "meshes/laserEnvelope"]
        geom = E.attrs["geometry"]
        if isinstance(geom, bytes):
            geom = geom.decode()
        spacing = np.asarray(E.attrs["gridSpacing"], float)
        offset = np.asarray(E.attrs["gridGlobalOffset"], float)
        # the scalar record: either the group IS the dataset or it holds one
        if isinstance(E, h5py.Dataset):
            ds = E
        else:
            ds = E[
                [k for k in E.keys()][0]
            ] if not isinstance(E, h5py.Dataset) else E
        pos = np.asarray(ds.attrs.get("position", np.zeros(len(spacing))),
                         float)
        raw = ds[...]
        if raw.dtype.names:  # compound (r, i)
            arr = raw[raw.dtype.names[0]] + 1j * raw[raw.dtype.names[1]]
        else:
            arr = np.asarray(raw)
        if geom == "cartesian":
            nt, ny, nx = arr.shape
            t_min = offset[0] + pos[0] * spacing[0]
            out = LasyData(
                cartesian=True,
                t_min=float(t_min),
                t_max=float(t_min + (nt - 1) * spacing[0]),
                y_min=float(offset[1] + pos[1] * spacing[1]),
                y_max=float(offset[1] + pos[1] * spacing[1]
                            + (ny - 1) * spacing[1]),
                x_min=float(offset[2] + pos[2] * spacing[2]),
                x_max=float(offset[2] + pos[2] * spacing[2]
                            + (nx - 1) * spacing[2]),
                data=jnp.asarray(arr),
            )
        elif geom == "thetaMode":
            ncomp, nt, nr = arr.shape
            t_min = offset[0] + pos[0] * spacing[0]
            out = LasyData(
                cartesian=False,
                t_min=float(t_min),
                t_max=float(t_min + (nt - 1) * spacing[0]),
                r_min=float(offset[1] + pos[1] * spacing[1]),
                r_max=float(offset[1] + pos[1] * spacing[1]
                            + (nr - 1) * spacing[1]),
                data=jnp.asarray(arr),
            )
        else:
            raise NotImplementedError(f"lasy geometry '{geom}'")
    _CACHE[path] = out
    return out


def _axis_interp(coord, lo, hi, n):
    """(left index, right index, fraction) with the reference's
    ceil-based index selection (LaserProfileFromFile.cpp:468-476)."""
    s = (n - 1) * (coord - lo) / (hi - lo)
    idx_r = jnp.clip(jnp.ceil(s).astype(jnp.int32), 1, n - 1)
    idx_l = idx_r - 1
    frac = s - idx_l.astype(coord.dtype)
    return idx_l, idx_r, frac


def lasy_amplitude(ld: LasyData, laser, Xp, Yp, t):
    """Amplitude at antenna-plane coords (Xp, Yp) and scalar time t."""
    omega_t = 2.0 * np.pi * constants.c * t / laser.wavelength
    phase = jnp.exp(-1j * omega_t)
    nt = ld.data.shape[-2] if not ld.cartesian else ld.data.shape[0]
    tl, tr, tf = _axis_interp(
        jnp.asarray(t, Xp.dtype), ld.t_min, ld.t_max, nt
    )
    if ld.cartesian:
        _, ny, nx = ld.data.shape
        xl, xr, xf = _axis_interp(Xp, ld.x_min, ld.x_max, nx)
        yl, yr, yf = _axis_interp(Yp, ld.y_min, ld.y_max, ny)

        def at(ti, yi, xi):
            return ld.data[ti, yi, xi]

        def plane(ti):
            return (
                at(ti, yl, xl) * (1 - yf) * (1 - xf)
                + at(ti, yr, xl) * yf * (1 - xf)
                + at(ti, yl, xr) * (1 - yf) * xf
                + at(ti, yr, xr) * yf * xf
            )

        val = plane(tl) * (1 - tf) + plane(tr) * tf
        inside = (
            (Xp > ld.x_min) & (Xp < ld.x_max)
            & (Yp > ld.y_min) & (Yp < ld.y_max)
        )
    else:
        ncomp = ld.data.shape[0]
        rp = jnp.sqrt(Xp * Xp + Yp * Yp)
        ok = rp > 0
        safe = jnp.where(ok, rp, 1.0)
        ct = jnp.where(ok, Xp / safe, 1.0)
        st = jnp.where(ok, Yp / safe, 0.0)
        nr = ld.data.shape[2]
        rl, rr, rf = _axis_interp(rp, ld.r_min, ld.r_max, nr)

        def bilin(comp):
            return (
                ld.data[comp, tl, rl] * (1 - tf) * (1 - rf)
                + ld.data[comp, tl, rr] * (1 - tf) * rf
                + ld.data[comp, tr, rl] * tf * (1 - rf)
                + ld.data[comp, tr, rr] * tf * rf
            )

        val = bilin(0)
        fc, fs = ct, st
        for m in range(1, ncomp // 2 + 1):
            val = val + bilin(2 * m - 1) * fc + bilin(2 * m) * fs
            fc, fs = fc * ct - fs * st, fc * st + fs * ct
        inside = (rp < ld.r_max)
    amp = jnp.real(val * phase)
    t_ok = (t >= ld.t_min) & (t <= ld.t_max)
    return jnp.where(inside & t_ok, amp, 0.0)
