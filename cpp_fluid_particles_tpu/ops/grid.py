"""Uniform-grid neighbor structure, TPU-first.

Replaces the reference's counting-sort neighbor search
(src/SPHSystem.cu:114-127 + src/CUDAFunctions.cuh:56-78) with a design built
for XLA's static shapes:

  * Particle state stays in a FIXED, unsorted order forever — particle
    identity is stable, so carried per-particle arrays (DFSPH warm stiffness,
    PBD last positions) never need the reference's replayed-sort realignment
    trick (src/DFSPHSolver.cu:170-171, src/PBDSolver.cu:84-85).
  * Each step we build a *compacted padded cell grid*: the at-most
    ``max_active_cells`` occupied cells each get a dense row of
    ``max_per_cell`` particle slots. All physics passes then run as dense,
    regular (active_cell, K_i, K_j) pair blocks over the 27-cell stencil —
    pure vectorised VPU work with zero dynamic shapes.

Cell-id convention matches the reference exactly
(src/CUDAFunctions.cuh:64-70): flat id ((x*cy)+y)*cz + z, out-of-grid
particles map to the sentinel id ``num_cells``.

Capacity overflow (a cell holding more than K particles, or more than M
occupied cells) drops the excess particles from interactions; the counts are
reported in ``GridTables.overflow`` so callers/tests can assert zero.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig

# Fill value for padded position slots: far enough that every kernel
# evaluates to exactly 0 against any real particle, small enough that no
# intermediate (r^2, q^5-style terms) overflows float32.
POS_PAD = 1e6

# The 27-cell stencil in the reference's iteration order
# (m/9-1, (m%9)/3-1, m%3-1) — src/BasicSPHSolver.cu:62-66 et al.
STENCIL = np.array(
    [(m // 9 - 1, (m % 9) // 3 - 1, m % 3 - 1) for m in range(27)],
    dtype=np.int32,
)


class GridTables(NamedTuple):
    """Per-particle-set spatial index (fluid: rebuilt each step; boundary:
    built once at scene init — mirrors src/SPHSystem.cu:69 vs :136)."""

    cell_ids: jnp.ndarray       # (N,) int32 in [0, C]; C = out-of-grid sentinel
    grid_index: jnp.ndarray     # (N,) int32 flat index into (M+2, K) grids
    valid: jnp.ndarray          # (N,) bool — particle holds a real grid slot
    active_cells: jnp.ndarray   # (M,) int32 cell id per active slot (C if unused)
    cell2active: jnp.ndarray    # (C+1,) int32 cell -> active slot (M if none)
    neighbor_cells: jnp.ndarray  # (M, 27) int32 neighbor cell ids (C if off-grid)
    overflow: jnp.ndarray       # () int32 — dropped particles + dropped cells
    num_active: jnp.ndarray     # () int32


def cell_coords(pos: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """(N,3) float positions -> (N,3) int32 cell coordinates.

    C-style truncation toward zero, like the reference's make_int3 cast
    (src/CUDAFunctions.cuh:76)."""
    return (pos / cfg.cell_length).astype(jnp.int32)


def cell_id_from_coords(c: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """(..., 3) int coords -> flat cell id with out-of-grid sentinel
    (src/CUDAFunctions.cuh:64-70)."""
    cx, cy, cz = cfg.cell_size
    inb = (
        (c[..., 0] >= 0) & (c[..., 0] < cx)
        & (c[..., 1] >= 0) & (c[..., 1] < cy)
        & (c[..., 2] >= 0) & (c[..., 2] < cz)
    )
    flat = (c[..., 0] * cy + c[..., 1]) * cz + c[..., 2]
    return jnp.where(inb, flat, cfg.num_cells)


def compute_cell_ids(pos: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    return cell_id_from_coords(cell_coords(pos, cfg), cfg)


def build_grid(
    pos: jnp.ndarray,
    cfg: SimConfig,
    max_active: int,
    max_per_cell: int,
) -> GridTables:
    """Build the compacted cell grid for one particle set.

    Functional replacement for SPHSystem::neighborSearch
    (src/SPHSystem.cu:114-127): instead of sorting the state arrays in place,
    we compute a slot assignment particle -> (active cell row, rank) and keep
    the state unsorted.
    """
    n = pos.shape[0]
    C = cfg.num_cells
    cx, cy, cz = cfg.cell_size
    M, K = max_active, max_per_cell

    cell_ids = compute_cell_ids(pos, cfg)

    # rank of each particle within its cell (= position it would have in the
    # reference's counting sort). Stable argsort keeps index order within a
    # cell, matching thrust's deterministic equal-key permutation.
    order = jnp.argsort(cell_ids, stable=True)
    sorted_ids = cell_ids[order]
    counts = jnp.bincount(cell_ids, length=C + 1)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - cell_start[sorted_ids]
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    # compact the occupied cells into M dense rows
    occupied = counts[:C] > 0
    num_active = jnp.sum(occupied).astype(jnp.int32)
    active_cells = jnp.nonzero(occupied, size=M, fill_value=C)[0].astype(jnp.int32)
    used = jnp.arange(M, dtype=jnp.int32) < num_active
    cell2active = (
        jnp.full((C + 1,), M, jnp.int32)
        .at[active_cells]
        .set(jnp.where(used, jnp.arange(M, dtype=jnp.int32), M))
        .at[C]
        .set(M)
    )

    a = cell2active[cell_ids]
    valid = (cell_ids < C) & (rank < K) & (a < M)
    # row M of the (M+2)-row grids is the clean zero/pad row read through
    # sentinel lookups; row M+1 is the trash row written by dropped particles.
    grid_index = jnp.where(valid, a * K + rank, (M + 1) * K)

    # 27-neighborhood cell ids per active row
    acx = active_cells // (cy * cz)
    acy = (active_cells // cz) % cy
    acz = active_cells % cz
    coords = jnp.stack([acx, acy, acz], axis=-1)  # (M, 3)
    ncoords = coords[:, None, :] + jnp.asarray(STENCIL)[None, :, :]  # (M,27,3)
    neighbor_cells = jnp.where(
        (active_cells < C)[:, None],
        cell_id_from_coords(ncoords, cfg),
        C,
    ).astype(jnp.int32)

    # in-grid particles that did not get a slot (cell over K, or cell beyond M)
    overflow = jnp.sum((cell_ids < C) & ~valid).astype(jnp.int32)

    return GridTables(
        cell_ids=cell_ids,
        grid_index=grid_index.astype(jnp.int32),
        valid=valid,
        active_cells=active_cells,
        cell2active=cell2active,
        neighbor_cells=neighbor_cells,
        overflow=overflow,
        num_active=num_active,
    )


def scatter_to_grid(
    tables: GridTables,
    field: jnp.ndarray,
    max_active: int,
    max_per_cell: int,
    fill: float = 0.0,
) -> jnp.ndarray:
    """(N, ...) particle field -> (M+2, K, ...) padded cell-grid field.

    Row M stays at ``fill`` (read via sentinel neighbor lookups); row M+1
    collects dropped particles and is never read back.
    """
    M, K = max_active, max_per_cell
    trailing = field.shape[1:]
    flat = jnp.full(((M + 2) * K,) + trailing, fill, field.dtype)
    flat = flat.at[tables.grid_index].set(field, mode="drop")
    return flat.reshape((M + 2, K) + trailing)


def gather_from_grid(
    tables: GridTables,
    grid_field: jnp.ndarray,
    fill: float = 0.0,
) -> jnp.ndarray:
    """(M+2, K, ...) grid field -> (N, ...) per-particle values; dropped
    particles receive ``fill``."""
    trailing = grid_field.shape[2:]
    flat = grid_field.reshape((-1,) + trailing)
    out = flat[tables.grid_index]
    mask = tables.valid
    if trailing:
        mask = mask.reshape((-1,) + (1,) * len(trailing))
    return jnp.where(mask, out, fill)


def active_view(grid_field: jnp.ndarray) -> jnp.ndarray:
    """The (M, K, ...) i-side view of a padded grid field (drop pad rows)."""
    return grid_field[:-2]
