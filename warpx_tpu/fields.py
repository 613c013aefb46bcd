"""pywarpx-compatible field data views (reference: Python/pywarpx/fields.py).

Numpy-like wrappers over the live simulation's field arrays with global
indexing, slicing, and in-place assignment writing back into the state
pytree (the reference's wrappers are zero-copy views over the MultiFab
boxes; here assignment rebuilds the immutable SimState):

    from warpx_tpu import fields
    Ex = fields.ExWrapper()
    mid = Ex[:, :, 16]          # numpy array
    Ex[:, :, 16] = 2 * mid      # writes back into the running simulation

Wrapper factories mirror the reference's class names: ExWrapper..BzWrapper,
JxWrapper.., RhoFPWrapper, PhiFPWrapper, FFPWrapper, GFPWrapper (+ *FP
aliases).  Guard-cell access (include_ghosts) is not exposed: the TPU state
carries no persistent ghosts (halo exchange materializes them per step).
"""

from __future__ import annotations

import numpy as np

from .runtime import get_simulation

__all__ = [
    "FieldWrapper",
    "ExWrapper", "EyWrapper", "EzWrapper",
    "BxWrapper", "ByWrapper", "BzWrapper",
    "JxWrapper", "JyWrapper", "JzWrapper",
    "ExFPWrapper", "EyFPWrapper", "EzFPWrapper",
    "BxFPWrapper", "ByFPWrapper", "BzFPWrapper",
    "JxFPWrapper", "JyFPWrapper", "JzFPWrapper",
    "RhoFPWrapper", "PhiFPWrapper", "FFPWrapper", "GFPWrapper",
]

_ATTR = {
    "Ex": "Ex", "Ey": "Ey", "Ez": "Ez",
    "Bx": "Bx", "By": "By", "Bz": "Bz",
    "Jx": "jx", "Jy": "jy", "Jz": "jz",
    "Rho": "rho", "Phi": "phi", "F": "F", "G": "G",
}


class FieldWrapper:
    """View of one field component (reference: fields._MultiFABWrapper).

    Supports len(), .shape, .mesh(direction), numpy-style __getitem__ /
    __setitem__ (including negative indices and slices), and the reduction
    helpers min/max/sum/norm0.
    """

    def __init__(self, name, level=0, include_ghosts=False, sim=None):
        if level != 0:
            raise NotImplementedError("mesh-refinement levels")
        self.name = name
        self._attr = _ATTR[name]
        self._sim = sim

    @property
    def sim(self):
        return self._sim or get_simulation()

    def _array(self):
        arr = getattr(self.sim.state.fields, self._attr, None)
        if arr is None:
            raise RuntimeError(
                f"field '{self.name}' is not allocated in this run"
            )
        return arr

    @property
    def shape(self):
        return tuple(self._array().shape)

    def __len__(self):
        return self.shape[0]

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def mesh(self, direction):
        """Physical coordinates of this component's points along an axis
        (reference: fields.py mesh()), honoring Yee staggering."""
        sim = self.sim
        geom = sim.cfg.geometry
        axes = geom.axis_names
        d = axes.index(direction)
        flags = sim.staggering.get(self.name, (1,) * geom.ndim)
        n = self._array().shape[d]
        offset = 0.0 if flags[d] == 1 else 0.5
        return geom.prob_lo[d] + (np.arange(n) + offset) * geom.dx[d]

    def __getitem__(self, index):
        return np.asarray(self._array())[index]

    def __setitem__(self, index, value):
        import jax.numpy as jnp

        sim = self.sim
        arr = np.array(self._array())
        arr[index] = value
        sim.state = sim.state.replace(
            fields=sim.state.fields.replace(
                **{self._attr: jnp.asarray(arr)}
            )
        )

    def min(self):
        return float(np.min(self[...]))

    def max(self):
        return float(np.max(self[...]))

    def sum(self):
        return float(np.sum(self[...]))

    def norm0(self):
        return float(np.max(np.abs(self[...])))


def _factory(name):
    def make(level=0, include_ghosts=False):
        return FieldWrapper(name, level, include_ghosts)

    make.__name__ = f"{name}Wrapper"
    return make


ExWrapper = _factory("Ex")
EyWrapper = _factory("Ey")
EzWrapper = _factory("Ez")
BxWrapper = _factory("Bx")
ByWrapper = _factory("By")
BzWrapper = _factory("Bz")
JxWrapper = _factory("Jx")
JyWrapper = _factory("Jy")
JzWrapper = _factory("Jz")
RhoFPWrapper = _factory("Rho")
PhiFPWrapper = _factory("Phi")
FFPWrapper = _factory("F")
GFPWrapper = _factory("G")

# fine-patch aliases (single-level runs: fp == the only level)
ExFPWrapper, EyFPWrapper, EzFPWrapper = ExWrapper, EyWrapper, EzWrapper
BxFPWrapper, ByFPWrapper, BzFPWrapper = BxWrapper, ByWrapper, BzWrapper
JxFPWrapper, JyFPWrapper, JzFPWrapper = JxWrapper, JyWrapper, JzWrapper
