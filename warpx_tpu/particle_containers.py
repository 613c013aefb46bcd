"""pywarpx-compatible particle data views
(reference: Python/pywarpx/particle_containers.py).

ParticleContainerWrapper exposes the live simulation's per-species SoA
arrays (alive slots only), add_particles, and the boundary-scraping buffer
reader.  The reference returns per-tile zero-copy views; the TPU state is a
fixed-capacity masked SoA, so getters return compacted copies and
add_particles writes into free slots.
"""

from __future__ import annotations

import numpy as np

from .runtime import get_simulation

__all__ = ["ParticleContainerWrapper", "ParticleBoundaryBufferWrapper"]


class ParticleContainerWrapper:
    def __init__(self, species_name, sim=None):
        self.name = species_name
        self._sim = sim

    @property
    def sim(self):
        return self._sim or get_simulation()

    def _sp(self):
        return self.sim.state.species[self.name]

    def _alive(self):
        return np.asarray(self._sp().alive)

    def _get(self, arr):
        return np.asarray(arr)[self._alive()]

    # ---- getters (reference: get_particle_x etc., compacted copies)
    def get_particle_count(self, local=False):
        return int(self._alive().sum())

    nps = property(get_particle_count)

    def get_particle_x(self, level=0, copy_to_host=True):
        return [self._get(self._sp().x)]

    def get_particle_y(self, level=0, copy_to_host=True):
        sp = self._sp()
        if sp.y is None:
            return [np.zeros(self.get_particle_count())]
        return [self._get(sp.y)]

    def get_particle_z(self, level=0, copy_to_host=True):
        return [self._get(self._sp().z)]

    def get_particle_weight(self, level=0, copy_to_host=True):
        return [self._get(self._sp().w)]

    def get_particle_ux(self, level=0, copy_to_host=True):
        return [self._get(self._sp().ux)]

    def get_particle_uy(self, level=0, copy_to_host=True):
        return [self._get(self._sp().uy)]

    def get_particle_uz(self, level=0, copy_to_host=True):
        return [self._get(self._sp().uz)]

    def get_particle_real_arrays(self, comp_name, level=0, copy_to_host=True):
        sp = self._sp()
        std = {"w": sp.w, "ux": sp.ux, "uy": sp.uy, "uz": sp.uz,
               "x": sp.x, "y": sp.y, "z": sp.z}
        if comp_name in std and std[comp_name] is not None:
            return [self._get(std[comp_name])]
        if comp_name in sp.extra:
            return [self._get(sp.extra[comp_name])]
        raise KeyError(comp_name)

    # convenient aliases used throughout pywarpx user scripts
    xp = property(lambda self: self.get_particle_x()[0])
    yp = property(lambda self: self.get_particle_y()[0])
    zp = property(lambda self: self.get_particle_z()[0])
    wp = property(lambda self: self.get_particle_weight()[0])
    uxp = property(lambda self: self.get_particle_ux()[0])
    uyp = property(lambda self: self.get_particle_uy()[0])
    uzp = property(lambda self: self.get_particle_uz()[0])

    def get_species_charge_sum(self, local=False):
        by_name = {s.name: s for s in self.sim.cfg.species}
        q = by_name[self.name].charge
        return float(q * self.wp.sum())

    def add_particles(self, x=None, y=None, z=None, ux=None, uy=None,
                      uz=None, w=None, unique_particles=True, **kwargs):
        """Insert particles into free slots (reference: add_particles;
        capacity overflow raises instead of growing the tile)."""
        import jax.numpy as jnp

        arrs = {k: np.atleast_1d(np.asarray(v, float)) for k, v in
                (("x", x), ("y", y), ("z", z), ("ux", ux), ("uy", uy),
                 ("uz", uz), ("w", w)) if v is not None}
        n = max(a.size for a in arrs.values())
        sim = self.sim
        sp = self._sp()
        free = np.nonzero(~np.asarray(sp.alive))[0]
        if free.size < n:
            raise RuntimeError(
                f"species '{self.name}' has {free.size} free slots, "
                f"need {n} (increase the capacity factor)"
            )
        tgt = free[:n]
        ndim = sim.cfg.geometry.ndim
        upd = {}
        defaults = {"x": 0.0, "y": 0.0, "z": 0.0, "ux": 0.0, "uy": 0.0,
                    "uz": 0.0, "w": 0.0}
        for k, default in defaults.items():
            cur = getattr(sp, k)
            if cur is None:
                continue
            vals = arrs.get(k)
            if vals is None:
                vals = np.full(n, default)
            elif vals.size == 1:
                vals = np.full(n, float(vals[0]))
            new = np.array(cur)
            new[tgt] = vals
            upd[k] = jnp.asarray(new)
        alive = np.array(sp.alive)
        alive[tgt] = True
        upd["alive"] = jnp.asarray(alive)
        extra = dict(sp.extra)
        for k, v in kwargs.items():
            if k in extra:
                new = np.array(extra[k])
                new[tgt] = np.broadcast_to(np.asarray(v, float), (n,))
                extra[k] = jnp.asarray(new)
        species = dict(sim.state.species)
        species[self.name] = sp.replace(extra=extra, **upd)
        sim.state = sim.state.replace(species=species)


class ParticleBoundaryBufferWrapper:
    """Reader for the boundary-scraping buffers
    (reference: particle_containers.ParticleBoundaryBufferWrapper;
    buffers live in state.aux as 'scrape:<species>:<face>:<field>')."""

    @property
    def sim(self):
        return get_simulation()

    def get_particle_boundary_buffer_size(self, species_name, boundary,
                                          local=False):
        key = f"scrape:{species_name}:{boundary}:n"
        return int(np.asarray(self.sim.state.aux[key]))

    def get_particle_boundary_buffer(self, species_name, boundary,
                                     comp_name, level=0):
        n = self.get_particle_boundary_buffer_size(species_name, boundary)
        key = f"scrape:{species_name}:{boundary}:{comp_name}"
        return [np.asarray(self.sim.state.aux[key])[:n]]

    def clear_buffer(self):
        import jax.numpy as jnp

        sim = self.sim
        aux = dict(sim.state.aux)
        for k in aux:
            if k.startswith("scrape:") and k.endswith(":n"):
                aux[k] = jnp.zeros((), aux[k].dtype)
        sim.state = sim.state.replace(aux=aux)
