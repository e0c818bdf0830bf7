"""Dense pair-interaction engine over the 27-cell stencil.

This is the TPU-native replacement for the reference's per-thread
"27-neighbor-cell scan" pattern (src/BasicSPHSolver.cu:62-70 and its ~15
clones): instead of each particle walking variable-length ``cellStart``
ranges, we compute dense (active_cell, K_i, K_j) pair blocks — one block per
stencil offset — as fully regular vectorised arithmetic, accumulated in a
``lax.fori_loop`` over the 27 offsets so only one pair block is live at a
time.

A "pass" is defined by a pair function that receives broadcast-ready i-side
and j-side field views plus the relative position/distance block, and returns
per-pair contributions; the engine masks nothing — padded slots are
constructed (POS_PAD positions, zero masses) so every kernel term is exactly
zero for them.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .grid import GridTables, active_view
from ..parallel.mesh import constrain_cells


class PairSource(NamedTuple):
    """One j-side particle set for a pass (fluid or boundary)."""

    tables: GridTables
    grids: Dict[str, jnp.ndarray]   # name -> (Mj+2, Kj, ...) padded grids
    pair_fn: Callable               # (i_fields, j_fields, rel, r) -> pytree


def _rel_r(pos_i: jnp.ndarray, pos_j: jnp.ndarray):
    """pos_i: (M, Ki, 3), pos_j: (M, Kj, 3) -> rel (M, Ki, Kj, 3), r (M, Ki, Kj)."""
    rel = pos_i[:, :, None, :] - pos_j[:, None, :, :]
    r = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    return rel, r


def neighbor_reduce(
    i_tables: GridTables,
    i_fields: Dict[str, jnp.ndarray],
    sources: Sequence[PairSource],
    out_init,
):
    """Accumulate pair contributions over the 27-cell stencil.

    i_fields: name -> (M+2, K, ...) padded grids (the engine takes the
    (M, K, ...) active view and pre-broadcasts to (M, K, 1, ...)).
    out_init: pytree of (M, Ki, ...) zero arrays; each pair_fn must return a
    matching pytree of per-pair (M, Ki, Kj, ...) contributions, which the
    engine sums over Kj and accumulates.
    """
    # under parallel.mesh.spatial_sharding these constraints make GSPMD
    # partition the whole pair computation along the active-cell axis
    i_raw = {k: constrain_cells(active_view(g))
             for k, g in i_fields.items()}  # (M, Ki, ...)
    i_view = {k: jnp.expand_dims(v, 2) for k, v in i_raw.items()}  # (M, Ki, 1, ..)
    out_init = jax.tree_util.tree_map(constrain_cells, out_init)
    neighbor_cells = constrain_cells(i_tables.neighbor_cells)

    def body(o, acc):
        ncell = neighbor_cells[:, o]  # (M,)
        for src in sources:
            jslot = src.tables.cell2active[ncell]  # (M,) row into (Mj+2, K, ...)
            j_raw = {k: g[jslot] for k, g in src.grids.items()}  # (M, Kj, ...)
            rel, r = _rel_r(i_raw["pos"], j_raw["pos"])
            j_view = {k: jnp.expand_dims(v, 1) for k, v in j_raw.items()}
            contrib = src.pair_fn(i_view, j_view, rel, r)
            acc = jax.tree_util.tree_map(
                lambda a, c: a + jnp.sum(c, axis=2), acc, contrib
            )
        return acc

    return jax.lax.fori_loop(0, 27, body, out_init)


def zeros_like_active(M: int, K: int, *, vec: bool = False) -> jnp.ndarray:
    shape = (M, K, 3) if vec else (M, K)
    return jnp.zeros(shape, jnp.float32)
