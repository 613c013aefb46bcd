"""Input-deck -> SimConfig interpretation.

Maps the reference's ParmParse key-space (algo.*, warpx.*, geometry.*, amr.*,
particles.*, <species>.*) to the static configuration
(reference: Source/WarpX.cpp:466 ReadParameters;
Source/Initialization/PlasmaInjector.cpp for species keys).
"""

from __future__ import annotations

import math

from ..utils.parser import Deck
from .config import SimConfig, SpeciesConfig
from .grid import Geometry

__all__ = ["config_from_deck"]

_DIM_MAP = {"1": 1, "2": 2, "3": 3, "rz": "rz"}


def _species_from_deck(deck: Deck, name: str, ndim: int) -> SpeciesConfig:
    g = lambda k, default=None: deck.get_real(f"{name}.{k}", default)  # noqa: E731
    gs = lambda k, default=None: deck.get_string(f"{name}.{k}", default)  # noqa: E731

    style = (gs("injection_style", "none") or "none").lower()
    ppc_each = tuple(deck.get_ints(f"{name}.num_particles_per_cell_each_dim", ()))
    ppc = deck.get_int(f"{name}.num_particles_per_cell", 0)

    profile = (gs("profile", "constant") or "constant").lower()
    density_expr = None
    if profile in ("parse", "parse_density_function"):
        found = deck.get_expr_string(name, "density_function")
        if found:
            density_expr = found[0]

    mom = (gs("momentum_distribution_type", "at_rest") or "at_rest").lower()
    momentum_exprs = None
    if mom == "parse_momentum_function":
        exprs = []
        for comp in ("ux", "uy", "uz"):
            found = deck.get_expr_string(name, f"momentum_function_{comp}")
            exprs.append(found[0] if found else "0")
        momentum_exprs = tuple(exprs)

    inf = math.inf
    full_lo = (
        g("xmin", -inf), g("ymin", -inf), g("zmin", -inf),
    )
    full_hi = (
        g("xmax", inf), g("ymax", inf), g("zmax", inf),
    )
    axes = {1: (2,), 2: (0, 2), 3: (0, 1, 2)}[ndim]
    bounds_lo = tuple(full_lo[a] for a in axes)
    bounds_hi = tuple(full_hi[a] for a in axes)

    return SpeciesConfig(
        name=name,
        charge=g("charge", 0.0),
        mass=g("mass", 0.0),
        injection_style=style,
        num_particles_per_cell_each_dim=ppc_each,
        num_particles_per_cell=ppc,
        profile=profile,
        density=g("density", 0.0),
        density_expr=density_expr,
        momentum_distribution=mom,
        ux=g("ux", 0.0), uy=g("uy", 0.0), uz=g("uz", 0.0),
        ux_th=g("ux_th", 0.0), uy_th=g("uy_th", 0.0), uz_th=g("uz_th", 0.0),
        momentum_exprs=momentum_exprs,
        bounds_lo=bounds_lo,
        bounds_hi=bounds_hi,
        do_not_push=bool(deck.get_int(f"{name}.do_not_push", 0)),
        do_not_gather=bool(deck.get_int(f"{name}.do_not_gather", 0)),
        do_not_deposit=bool(deck.get_int(f"{name}.do_not_deposit", 0)),
        user_constants=tuple(sorted(deck.my_constants.items())),
    )


def config_from_deck(deck: Deck) -> SimConfig:
    dims_tok = deck.get_string("geometry.dims", "3").lower()
    ndim = _DIM_MAP.get(dims_tok)
    if ndim == "rz":
        raise NotImplementedError("RZ geometry lands with the RZ solver milestone")

    n_cell = tuple(deck.get_ints("amr.n_cell"))
    prob_lo = tuple(deck.get_reals("geometry.prob_lo"))
    prob_hi = tuple(deck.get_reals("geometry.prob_hi"))
    assert len(n_cell) == ndim, (n_cell, ndim)

    field_lo = deck.get_strings("boundary.field_lo", ["periodic"] * ndim)
    field_hi = deck.get_strings("boundary.field_hi", ["periodic"] * ndim)
    periodic = tuple(
        lo == "periodic" and hi == "periodic"
        for lo, hi in zip(field_lo, field_hi)
    )

    geom = Geometry(
        ndim=ndim,
        n_cell=n_cell,
        prob_lo=prob_lo,
        prob_hi=prob_hi,
        periodic=periodic,
    )

    max_step = deck.get_int("max_step", deck.get_int("warpx.max_step", 0))
    cfl = deck.get_real("warpx.cfl", 0.999)
    const_dt = deck.get_real("warpx.const_dt", None)

    solver = (deck.get_string("algo.maxwell_solver", "yee") or "yee").lower()
    if solver == "none":
        em_solver = "none"
    elif solver in ("yee", "ckc", "psatd", "ect"):
        em_solver = solver
    else:
        raise NotImplementedError(f"maxwell solver {solver}")

    if const_dt is not None:
        dt = const_dt
    else:
        from ..solvers.yee import compute_dt_yee

        if em_solver == "psatd":
            dt = cfl * min(geom.dx) / 299_792_458.0
        else:
            dt = compute_dt_yee(geom, cfl)

    grid_type = (deck.get_string("warpx.grid_type", "staggered") or "staggered").lower()
    if grid_type == "hybrid":
        raise NotImplementedError("hybrid grid type")

    pusher = (deck.get_string("algo.particle_pusher", "boris") or "boris").lower()
    species_names = deck.get_strings("particles.species_names", [])
    import dataclasses

    species = tuple(
        dataclasses.replace(_species_from_deck(deck, nm, ndim), pusher=pusher)
        for nm in species_names
    )

    filter_npass = tuple(
        deck.get_ints("warpx.filter_npass_each_dir", (1,) * ndim)
    )

    return SimConfig(
        geometry=geom,
        max_step=max_step,
        dt=dt,
        particle_shape=deck.get_int("algo.particle_shape", 1),
        em_solver=em_solver,
        current_deposition=(
            deck.get_string("algo.current_deposition", "esirkepov") or "esirkepov"
        ).lower(),
        field_gathering=(
            deck.get_string("algo.field_gathering", "energy-conserving")
            or "energy-conserving"
        ).lower(),
        grid_type=grid_type,
        use_filter=deck.get_bool("warpx.use_filter", False),
        filter_npass_each_dir=filter_npass,
        species=species,
        cfl=cfl,
        verbose=deck.get_bool("warpx.verbose", False),
    )
