"""Shared small-scale test fixtures.

A shrunken domain keeps the dense engine's full-grid passes cheap on the
CPU backend (13^3 cells instead of the dam scene's 25^3) while preserving
all physics: walls, gravity, every solver branch.
"""

import numpy as np

import cpp_fluid_particles_tpu as cfp

SMALL_CFG = cfp.dam_break_config(
    mode="parity",
    space_size=(0.52, 0.52, 0.52),
    max_active_cells=1024,
    max_per_cell=16,
)


def small_block(n_side=6, origin=(0.16, 0.10, 0.16), cfg=SMALL_CFG):
    s = cfg.spacing
    return np.array(
        [(origin[0] + s * i, origin[1] + s * j, origin[2] + s * k)
         for i in range(n_side) for j in range(n_side) for k in range(n_side)],
        np.float32,
    )
