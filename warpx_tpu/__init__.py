"""warpx_tpu: a TPU-native electromagnetic Particle-In-Cell framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the WarpX
reference (see SURVEY.md): state is an immutable pytree stepped by pure jitted
functions, spatial domain decomposition is a jax.sharding Mesh with XLA
collectives for halos, and the hot PIC loops (gather+push, deposition) are
vectorized/Pallas kernels.
"""

from . import constants  # noqa: F401

__version__ = "0.1.0"
