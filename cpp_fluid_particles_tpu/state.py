"""Particle state containers and scene construction.

TPU-native replacement of the reference's device containers
(src/DArray.h, src/Particles.h, src/SPHParticles.h): the whole per-particle
state is one structure-of-arrays pytree resident in HBM. Unlike the CUDA
reference, the array order is the particle identity and never changes (see
ops/grid.py for why).

Scene construction reproduces src/main.cpp:73-117: a 36x24x24 dam-break
fluid block and six boundary walls sampled at half the cell length.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .config import SimConfig


class FluidState(NamedTuple):
    """SoA fluid state (src/SPHParticles.h:20-60 equivalents)."""

    pos: jnp.ndarray       # (N, 3) float32
    vel: jnp.ndarray       # (N, 3) float32
    mass: jnp.ndarray      # (N,)   float32
    density: jnp.ndarray   # (N,)   float32
    pressure: jnp.ndarray  # (N,)   float32

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def make_fluid_state(pos: np.ndarray, cfg: SimConfig) -> FluidState:
    n = pos.shape[0]
    return FluidState(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.zeros((n, 3), jnp.float32),
        mass=jnp.full((n,), cfg.m0, jnp.float32),  # src/SPHSystem.cu:73
        density=jnp.zeros((n,), jnp.float32),
        pressure=jnp.zeros((n,), jnp.float32),
    )


def dam_break_positions(cfg: SimConfig) -> np.ndarray:
    """The 36x24x24 fluid block at (0.27, 0.10, 0.27) (src/main.cpp:75-85).

    Loop nesting matches the reference (i over y, j over x, k over z) so the
    particle ordering is identical.
    """
    s = cfg.spacing
    out = []
    for i in range(36):
        for j in range(24):
            for k in range(24):
                out.append((0.27 + s * j, 0.10 + s * i, 0.27 + s * k))
    return np.asarray(out, np.float32)


def boundary_positions(cfg: SimConfig) -> np.ndarray:
    """Six walls of the unit cube, 2*cell_size samples per axis, inset to
    [0.005, 0.995] * space (src/main.cpp:88-117). 14,408 particles for the
    default config."""
    space = np.asarray(cfg.space_size, np.float64)
    compact = 2 * np.asarray(cfg.cell_size, np.int64)  # (cx, cy, cz) doubled
    cbx, cy, cz = int(compact[0]), int(compact[1]), int(compact[2])
    denom = compact.astype(np.float64) - 1.0
    out = []

    def emit(ix, iy, iz):
        x = np.array([ix, iy, iz], np.float64) / denom * space
        out.append(0.99 * x + 0.005 * space)

    # front and back (z = 0 and z = cz-1)
    for i in range(cbx):
        for j in range(cy):
            emit(i, j, 0)
            emit(i, j, cz - 1)
    # top and bottom (y = 0 and y = cy-1), z interior
    for i in range(cbx):
        for j in range(cz - 2):
            emit(i, 0, j + 1)
            emit(i, cy - 1, j + 1)
    # left and right (x = 0 and x = cx-1), y and z interior
    for i in range(cy - 2):
        for j in range(cz - 2):
            emit(0, i + 1, j + 1)
            emit(cbx - 1, i + 1, j + 1)

    return np.asarray(out, np.float32)
