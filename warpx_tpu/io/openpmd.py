"""openPMD-standard HDF5 output written directly with h5py.

The reference writes openPMD through openPMD-api
(Source/Diagnostics/WarpXOpenPMD.cpp, FlushFormats/FlushFormatOpenPMD.cpp);
this writer emits the same openPMD 1.1.0 file layout (basePath/meshesPath/
particlesPath, unitDimension/unitSI/gridSpacing/position attributes) so
openPMD-viewer and the reference's checksumAPI can read our output unchanged.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from .. import constants
from ..core.config import SimConfig
from ..core.state import SimState

__all__ = ["write_openpmd_iteration"]

# unitDimension: powers of (L, M, T, I, theta, N, J)
_UNIT_DIM = {
    "E": (1.0, 1.0, -3.0, -1.0, 0.0, 0.0, 0.0),
    "B": (0.0, 1.0, -2.0, -1.0, 0.0, 0.0, 0.0),
    "j": (-2.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0),
    "rho": (-3.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0),
}


def _axis_labels(ndim: int):
    return {1: ["z"], 2: ["x", "z"], 3: ["x", "y", "z"]}[ndim]


def write_openpmd_iteration(
    filename: str,
    iteration: int,
    state: SimState,
    cfg: SimConfig,
    fields: Dict[str, np.ndarray],
    time: float,
    dt: float,
    origin,
    species_names=None,
    select=None,
):
    """Append one iteration (fields + particles) in openPMD layout."""
    import h5py

    geom = cfg.geometry
    ndim = geom.ndim
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with h5py.File(filename, "a") as fh:
        fh.attrs["openPMD"] = np.bytes_("1.1.0")
        fh.attrs["openPMDextension"] = np.uint32(0)
        fh.attrs["basePath"] = np.bytes_("/data/%T/")
        fh.attrs["meshesPath"] = np.bytes_("fields/")
        fh.attrs["particlesPath"] = np.bytes_("particles/")
        fh.attrs["software"] = np.bytes_("warpx_tpu")
        fh.attrs["iterationEncoding"] = np.bytes_("groupBased")
        fh.attrs["iterationFormat"] = np.bytes_("/data/%T/")

        it = fh.require_group(f"data/{iteration}")
        it.attrs["time"] = float(time)
        it.attrs["dt"] = float(dt)
        it.attrs["timeUnitSI"] = 1.0

        meshes = it.require_group("fields")
        labels = _axis_labels(ndim)

        def mesh_attrs(obj, kind):
            obj.attrs["geometry"] = np.bytes_("cartesian")
            obj.attrs["dataOrder"] = np.bytes_("C")
            obj.attrs["axisLabels"] = np.array([np.bytes_(a) for a in labels])
            obj.attrs["gridSpacing"] = np.asarray(geom.dx, dtype=np.float64)
            obj.attrs["gridGlobalOffset"] = np.asarray(origin, dtype=np.float64)
            obj.attrs["gridUnitSI"] = 1.0
            obj.attrs["timeOffset"] = 0.0
            obj.attrs["unitDimension"] = np.asarray(
                _UNIT_DIM.get(kind, (0.0,) * 7), dtype=np.float64
            )

        for name, arr in fields.items():
            is_vec = len(name) == 2 and name[0] in "EBj"
            if is_vec:
                rec = meshes.require_group(name[0])
                mesh_attrs(rec, name[0])
                comp = name[1]
                if comp in rec:
                    del rec[comp]
                ds = rec.create_dataset(comp, data=np.asarray(arr))
            else:
                # scalar mesh record: the record itself is the dataset
                if name in meshes:
                    del meshes[name]
                ds = meshes.create_dataset(name, data=np.asarray(arr))
                mesh_attrs(ds, "rho" if name == "rho" else name)
            ds.attrs["unitSI"] = 1.0
            ds.attrs["position"] = np.full(ndim, 0.5)

        parts = it.require_group("particles")
        for sp_cfg in cfg.species:
            sp = state.species[sp_cfg.name]
            if sp.capacity == 0:
                continue
            if species_names is not None and sp_cfg.name not in species_names:
                continue
            alive = np.asarray(sp.alive)
            if select is not None and sp_cfg.name in select:
                alive = alive & select[sp_cfg.name]
            grp = parts.require_group(sp_cfg.name)
            grp.attrs["charge"] = sp_cfg.charge
            grp.attrs["mass"] = sp_cfg.mass
            # batch the alive-masked gathers through the native (GIL-free,
            # multithreaded) compactor; numpy fallback inside
            from ..native import compact

            names = _axis_labels(ndim)
            float_arrays = (
                [np.asarray(a) for a in sp.positions(ndim)]
                + [np.asarray(a) for a in (sp.ux, sp.uy, sp.uz)]
                + [np.asarray(sp.w)]
            )
            packed = compact(alive, float_arrays)
            pos_data = packed[:ndim]
            mom_data = packed[ndim:ndim + 3]
            w_data = packed[ndim + 3]
            pos = grp.require_group("position")
            pos.attrs["unitDimension"] = np.asarray(
                (1.0, 0, 0, 0, 0, 0, 0), dtype=np.float64
            )
            pos.attrs["timeOffset"] = 0.0
            for nm, data in zip(names, pos_data):
                if nm in pos:
                    del pos[nm]
                ds = pos.create_dataset(nm, data=data)
                ds.attrs["unitSI"] = 1.0
            mom = grp.require_group("momentum")
            mom.attrs["unitDimension"] = np.asarray(
                (1.0, 1.0, -1.0, 0, 0, 0, 0), dtype=np.float64
            )
            mom.attrs["timeOffset"] = 0.0
            for nm, data in zip(("x", "y", "z"), mom_data):
                if nm in mom:
                    del mom[nm]
                ds = mom.create_dataset(nm, data=data * sp_cfg.mass)
                ds.attrs["unitSI"] = 1.0
            w = grp.require_group("weighting")
            if "value" in w:
                del w["value"]
            ds = w.create_dataset("value", data=w_data)
            ds.attrs["unitSI"] = 1.0
            for aname, arr in sp.extra.items():
                g = grp.require_group(aname)
                if "value" in g:
                    del g["value"]
                ds = g.create_dataset("value", data=np.asarray(arr)[alive])
                ds.attrs["unitSI"] = 1.0
