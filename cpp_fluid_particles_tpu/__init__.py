"""cpp_fluid_particles_tpu — a TPU-native SPH fluid simulation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the CUDA
reference ``zhai-xiao/CPP-Fluid-Particles``: WCSPH, DFSPH and PBD pressure
solvers with boundary particles, He-2014 surface tension and air pressure,
a uniform-grid neighbor engine, a point-splat renderer, and multi-chip
spatial sharding over a ``jax.sharding.Mesh``.
"""

from .config import SimConfig, dam_break_config, BENCH_DT
from .simulation import Simulation, SOLVERS, resolve_solver
from .state import (
    FluidState,
    block_positions,
    boundary_positions,
    dam_break_positions,
    drop_scene,
    make_fluid_state,
    scaled_dam_scene,
)

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "dam_break_config",
    "BENCH_DT",
    "Simulation",
    "SOLVERS",
    "resolve_solver",
    "FluidState",
    "block_positions",
    "drop_scene",
    "scaled_dam_scene",
    "boundary_positions",
    "dam_break_positions",
    "make_fluid_state",
]
