"""RZ (quasi-cylindrical, azimuthal-mode) geometry support."""

from .core import (  # noqa: F401
    RZ_STAGGER, compute_dt_rz, make_rz_step_fns, rz_cell_centered_output,
    rz_checksums, rz_inject_species,
)
