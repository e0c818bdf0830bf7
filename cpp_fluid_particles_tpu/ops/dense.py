"""Dense ghosted cell grid — the data layout for the Pallas fast path.

Layout: ``(F, K, G)`` with ``G = (CX+2)*(CY+2)*(CZ+2)`` the FLATTENED
ghosted cell axis (x-major) as the MINOR dimension and the per-cell slot
axis K leading. Two properties make this the fast layout on TPU:

* pair blocks are ``(K_i, K_j, G)`` — the minor dimension is the huge cell
  axis, so every elementwise op and reduction runs fully lane-utilized
  (the previous slot-minor layout put (K_i, K_j) ~ (12, 12) in the tiled
  minor dims — ~7% of each (8, 128) tile; measured 2.4x slower on the v5e).
* a one-cell ghost ring on every side means a stencil offset (dx, dy, dz)
  is ONE contiguous slice of the flat axis at displacement
  ``(dx*GY + dy)*GZ + dz`` — zero gathers in the hot path.

Unlike ops/grid.py (compacted active cells + XLA row gathers), this layout
has NO indexed reads in the hot path: the per-step cost is one stacked
scatter in, one stacked gather out. The Pallas column kernels consume a
5-D ``(F, GX, GY, GZ, K)`` view built by ``flat_to_ghost5``.

Cell convention still matches the reference (src/CUDAFunctions.cuh:64-70);
particles out of the grid or beyond K-per-cell go to a trash slot and do not
interact (reported in ``overflow``).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..parallel.mesh import constrain_axis
from .grid import POS_PAD, cell_coords

F32 = jnp.float32


class DenseDims(NamedTuple):
    cx: int
    cy: int
    cz: int
    k: int

    @property
    def gx(self) -> int:          # ghosted extents
        return self.cx + 2

    @property
    def gy(self) -> int:
        return self.cy + 2

    @property
    def gz(self) -> int:
        return self.cz + 2

    @property
    def zk(self) -> int:
        return self.gz * self.k

    @property
    def g(self) -> int:           # flattened ghosted cell count
        return self.gx * self.gy * self.gz

    @property
    def flat_p(self) -> int:      # max |flat stencil displacement|
        return self.gy * self.gz + self.gz + 1

    @property
    def total(self) -> int:
        return self.gx * self.gy * self.zk


def dims_for(cfg: SimConfig, k: int | None = None) -> DenseDims:
    cx, cy, cz = cfg.cell_size
    return DenseDims(cx, cy, cz, cfg.max_per_cell if k is None else k)


class DenseIndex(NamedTuple):
    """Per-step particle -> dense-slot assignment."""

    slots: jnp.ndarray       # (N,) int32 into the flat ghosted array; trash = total
    valid: jnp.ndarray       # (N,) bool
    col_count: jnp.ndarray   # (CX, CY) int32 fluid count per real column
    overflow: jnp.ndarray    # () int32
    max_occupancy: jnp.ndarray  # () int32 fullest cell this step (drives
                                #    Simulation's adaptive K)


def build_dense_index(pos: jnp.ndarray, cfg: SimConfig,
                      dims: DenseDims) -> DenseIndex:
    """cell ids -> within-cell ranks (stable argsort + run-length scan) ->
    ghosted slot indices. Replaces the reference's counting sort
    (src/SPHSystem.cu:114-127) without reordering the state."""
    n = pos.shape[0]
    c = cell_coords(pos, cfg)                     # (N, 3) truncation like ref
    inb = ((c[:, 0] >= 0) & (c[:, 0] < dims.cx)
           & (c[:, 1] >= 0) & (c[:, 1] < dims.cy)
           & (c[:, 2] >= 0) & (c[:, 2] < dims.cz))
    cc = jnp.clip(c, 0, jnp.array([dims.cx - 1, dims.cy - 1, dims.cz - 1]))
    cell = (cc[:, 0] * dims.cy + cc[:, 1]) * dims.cz + cc[:, 2]
    key = jnp.where(inb, cell, dims.cx * dims.cy * dims.cz)

    order = jnp.argsort(key, stable=True)
    sk = key[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank_sorted = iota - run_start
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    valid = inb & (rank < dims.k)
    gcell = (((cc[:, 0] + 1) * dims.gy + (cc[:, 1] + 1)) * dims.gz
             + (cc[:, 2] + 1))
    gslot = rank * dims.g + gcell          # lane-major: slot axis leads
    slots = jnp.where(valid, gslot, dims.total).astype(jnp.int32)

    colid = cc[:, 0] * dims.cy + cc[:, 1]
    col_count = jnp.bincount(jnp.where(valid, colid, dims.cx * dims.cy),
                             length=dims.cx * dims.cy + 1)[:-1]
    overflow = jnp.sum(inb & ~valid).astype(jnp.int32)
    max_occ = (jnp.max(jnp.where(inb, rank, -1)) + 1).astype(jnp.int32)
    return DenseIndex(slots=slots, valid=valid,
                      col_count=col_count.reshape(dims.cx, dims.cy)
                      .astype(jnp.int32),
                      overflow=overflow, max_occupancy=max_occ)


def fill_dense(idx: DenseIndex, fields: Sequence[jnp.ndarray],
               fills: Sequence[float], dims: DenseDims) -> jnp.ndarray:
    """Stack (N,) fields -> (F, K, G) lane-major dense arrays in ONE scatter.

    fills: per-field empty-slot value (POS_PAD for position components so
    padded slots never interact; 0 otherwise).
    """
    f = len(fields)
    vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)      # (F, N)
    init = jnp.broadcast_to(
        jnp.asarray(fills, F32)[:, None], (f, dims.total + 1))
    dense = init.at[:, idx.slots].set(vals, mode="drop")
    out = dense[:, : dims.total].reshape(f, dims.k, dims.g)
    # under parallel.spatial_sharding: each device owns an x-slab of cells
    # (the flat ghosted axis is x-major, so a contiguous shard IS a slab)
    return constrain_axis(out, 2)


def read_dense(idx: DenseIndex, dense: jnp.ndarray,
               fill: float = 0.0) -> jnp.ndarray:
    """(F, K, G) -> (F, N) per-particle values in ONE gather."""
    f = dense.shape[0]
    flat = dense.reshape(f, -1)
    out = flat[:, jnp.minimum(idx.slots, flat.shape[1] - 1)]
    return jnp.where(idx.valid[None, :], out, fill)


def flat_to_ghost5(x: jnp.ndarray, dims: DenseDims) -> jnp.ndarray:
    """(F, K, G) lane-major -> (F, GX, GY, GZ, K) ghosted 5-D view (the
    Pallas column kernels' candidate-tensor input layout)."""
    f, k = x.shape[0], x.shape[1]
    return x.reshape(f, k, dims.gx, dims.gy, dims.gz).transpose(
        0, 2, 3, 4, 1)


def ghosted_col_count(idx: DenseIndex) -> jnp.ndarray:
    """(CX, CY) -> (GX, GY) with a zero ghost ring."""
    return jnp.pad(idx.col_count, 1)
