"""Sliding-box compaction — the zero-gather adaptive-sparsity fast path.

The dense ghosted grid (ops/dense.py) spends pair compute on every cell of
the domain, but the fluid's cell-space bounding box is usually much
smaller: the dam block before impact is ~19x12x24 of 25^3 cells, and the
settled pool is ~25x8x25. This layout runs the SAME lane-major flat
executors (ops/pallas_passes.py) over a box-shaped sub-grid whose SIZE
(BX, BY, BZ) is static (a jit shape, adapted across frames by
Simulation's auto-capacity machinery, like max_per_cell) and whose
POSITION follows the fluid each step as a traced dynamic offset:

  * the fluid scatters directly into the ghosted box (one scatter),
  * the static boundary grid contributes via ONE ``jax.lax.dynamic_slice``
    of its full-domain tensor at the box origin (no gathers, unlike the
    occupied-column compaction this replaces, whose per-column row gather
    moved 27-float rows — catastrophic on TPU),
  * every neighbor pass is an ordinary flat pass with
    ``DenseDims(BX, BY, BZ, K)``.

Fluid outside the box (possible only when the true bounding box exceeds
the static size) follows the ballistic fallback and is counted in
``box_overflow``; Simulation detects it, refits the box to the measured
extents, and re-runs the frame from the pre-frame state — the same
no-drop contract as the per-cell capacity K. Measured extents are also
reported so calm stretches can shrink the box again.

Cell conventions match ops/dense.py (and the reference's
src/CUDAFunctions.cuh:64-70).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..parallel.halo import fill_read_eligible, fill_sharded, read_sharded
from ..parallel.mesh import (constrain_axis, current_halo_mode,
                             current_mesh, mesh_devices)
from .dense import DenseDims
from .grid import POS_PAD, cell_coords

F32 = jnp.float32


class BoxIndex(NamedTuple):
    """Per-step particle -> box-slot assignment."""

    slots: jnp.ndarray       # (N,) int32 into the flat ghosted box; trash=total
    valid: jnp.ndarray       # (N,) bool
    origin: jnp.ndarray      # (3,) int32 box core origin in cell coords
    ext: jnp.ndarray         # (3,) int32 measured fluid cell extents
    overflow: jnp.ndarray    # () int32 dropped by the per-cell bound K
    box_overflow: jnp.ndarray  # () int32 in-domain fluid outside the box
    max_occupancy: jnp.ndarray  # () int32 fullest cell this step
    hi_ext: jnp.ndarray      # (3,) int32 extents (+1 margin) of cells
    #                          holding > cfg.split_k_a particles — feeds
    #                          Simulation's occupancy-split activation
    #                          policy (zeros when none)


def build_box_index(pos: jnp.ndarray, cfg: SimConfig, full: DenseDims,
                    box: DenseDims) -> BoxIndex:
    """Cell ids -> within-cell ranks -> slots of the ghosted (BX, BY, BZ)
    box positioned at the fluid's minimum corner (clamped so the box stays
    inside the domain)."""
    n = pos.shape[0]
    c = cell_coords(pos, cfg)
    inb = ((c[:, 0] >= 0) & (c[:, 0] < full.cx)
           & (c[:, 1] >= 0) & (c[:, 1] < full.cy)
           & (c[:, 2] >= 0) & (c[:, 2] < full.cz))
    hi = jnp.array([full.cx - 1, full.cy - 1, full.cz - 1])
    cc = jnp.clip(c, 0, hi)

    # within-cell ranks on FULL-domain cell ids (stable argsort + run scan,
    # same permutation contract as ops/dense.py)
    cell = (cc[:, 0] * full.cy + cc[:, 1]) * full.cz + cc[:, 2]
    key = jnp.where(inb, cell, full.cx * full.cy * full.cz)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(iota - run_start)

    # fluid bounding box -> box origin (traced; the box SIZE is static)
    big = jnp.int32(1 << 20)
    cmin = jnp.min(jnp.where(inb[:, None], cc, big), axis=0)
    cmax = jnp.max(jnp.where(inb[:, None], cc, -1), axis=0)
    ext = jnp.maximum(cmax - cmin + 1, 0).astype(jnp.int32)
    bsz = jnp.array([box.cx, box.cy, box.cz], jnp.int32)
    origin = jnp.clip(jnp.minimum(cmin, big - 1).astype(jnp.int32), 0,
                      jnp.array([full.cx - box.cx, full.cy - box.cy,
                                 full.cz - box.cz], jnp.int32))

    rel = cc.astype(jnp.int32) - origin[None, :]
    inbox = inb & (rel >= 0).all(1) & (rel < bsz[None, :]).all(1)
    valid = inbox & (rank < box.k)
    gb = box.g
    gcell = (((rel[:, 0] + 1) * box.gy + (rel[:, 1] + 1)) * box.gz
             + (rel[:, 2] + 1))
    slots = jnp.where(valid, rank * gb + gcell, box.k * gb).astype(jnp.int32)

    box_overflow = jnp.sum(inb & ~inbox).astype(jnp.int32)
    overflow = jnp.sum(inbox & (rank >= box.k)).astype(jnp.int32)
    max_occ = (jnp.max(jnp.where(inb, rank, -1)) + 1).astype(jnp.int32)
    # extents of the over-K_a cells (occupancy-split activation signal)
    hi = inbox & (rank >= cfg.split_k_a)
    hlo = jnp.min(jnp.where(hi[:, None], rel, big), axis=0) - 1
    hhi = jnp.max(jnp.where(hi[:, None], rel, -big), axis=0) + 1
    hi_ext = jnp.maximum(hhi - hlo + 1, 0).astype(jnp.int32)
    return BoxIndex(slots=slots, valid=valid, origin=origin, ext=ext,
                    overflow=overflow, box_overflow=box_overflow,
                    max_occupancy=max_occ, hi_ext=hi_ext)


# measured on the v5e chip (exp/fill_sort.py, exp/gather_bw.py): scatter
# costs per ELEMENT (~0.45 GB/s), a shared-index row take per INDEX
# (~2.3 GB/s) — the "auto" fill mode picks the cheaper data motion from
# the static shapes
_SCATTER_BW = 0.45
_TAKE_BW = 2.3


def fill_box(idx: BoxIndex, fields: Sequence[jnp.ndarray],
             fills: Sequence[float], box: DenseDims,
             mode: str = "scatter") -> jnp.ndarray:
    """Stack (N,) fields -> (F, K, GB) lane-major box arrays
    (GB = ghosted box cell count).

    mode "scatter": one F-row scatter at the particle slots.
    mode "gather": scatter ONE int32 slot->particle-id row (empty slots
    keep the sentinel N), then fetch all F rows with a single
    shared-index row take from the fields padded with their fill column.
    Bitwise-identical: valid slots are injective (rank*GB+gcell), invalid
    particles land on the sliced-off trash slot either way, and empty
    slots read the fill column via the sentinel.
    mode "auto": the measured-bandwidth model above (cfg.box_fill).

    Under a mesh (spatial_sharding) with dividing shapes, the fill runs
    inside shard_map with N-sized collectives only (parallel/halo.py) —
    bitwise the same grid, without the grid-sized all-gathers GSPMD
    infers for a sharded scatter target.
    """
    f = len(fields)
    total = box.k * box.g
    n = idx.slots.shape[0]
    mesh = current_mesh()
    if mesh is not None and current_halo_mode() == "shard_map":
        # forced shard_map must not silently fall back to GSPMD
        assert fill_read_eligible(mesh, n, box.g), \
            "halo='shard_map' forced but fill/read shapes do not divide"
    if (mesh is not None and current_halo_mode() != "gspmd"
            and fill_read_eligible(mesh, n, box.g)):
        lt = total // mesh_devices(mesh)   # per-shard slot count
        lmode = mode
        if lmode == "auto":
            lmode = ("gather"
                     if f * lt / _TAKE_BW + n / _SCATTER_BW
                     < f * n / _SCATTER_BW else "scatter")
        return fill_sharded(idx.slots, fields, fills, box.k, box.g, mesh,
                            lmode)
    vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)
    if mode == "auto":
        mode = ("gather"
                if f * total / _TAKE_BW + n / _SCATTER_BW
                < f * n / _SCATTER_BW else "scatter")
    if mode == "gather":
        pid = jnp.full((total + 1,), n, jnp.int32).at[idx.slots].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        padded = jnp.concatenate(
            [vals, jnp.asarray(fills, F32)[:, None]], 1)
        dense = padded[:, pid]
    else:
        init = jnp.broadcast_to(
            jnp.asarray(fills, F32)[:, None], (f, total + 1))
        dense = init.at[:, idx.slots].set(vals, mode="drop")
    return constrain_axis(dense[:, :total].reshape(f, box.k, box.g), 2)


def read_box(idx: BoxIndex, dense: jnp.ndarray,
             fill: float = 0.0) -> jnp.ndarray:
    """(F, K, GB) -> (F, N) per-particle values in ONE gather.

    Under a mesh with dividing shapes, the gather runs inside shard_map
    with N-sized collectives only (parallel/halo.py): each device reads
    its slab's slots and a bit-exact psum_scatter hands every device its
    own particles."""
    f = dense.shape[0]
    n = idx.slots.shape[0]
    mesh = current_mesh()
    if mesh is not None and current_halo_mode() == "shard_map":
        assert fill_read_eligible(mesh, n, dense.shape[2]), \
            "halo='shard_map' forced but fill/read shapes do not divide"
    if (mesh is not None and current_halo_mode() != "gspmd"
            and fill_read_eligible(mesh, n, dense.shape[2])):
        out = read_sharded(dense, idx.slots, mesh)
        return jnp.where(idx.valid[None, :], out, fill)
    flat = dense.reshape(f, -1)
    out = flat[:, jnp.minimum(idx.slots, flat.shape[1] - 1)]
    return jnp.where(idx.valid[None, :], out, fill)


def slice_boundary_box(bd: jnp.ndarray, full: DenseDims, box: DenseDims,
                       kb: int, origin: jnp.ndarray) -> jnp.ndarray:
    """One dynamic slice of the full-domain flat boundary tensor
    (Fb, Kb, G) -> the box's ghosted window (Fb, Kb, GB). The box ghost
    ring at cell-origin o starts at full-ghosted coordinate o (core cell x
    maps to ghosted x+1), so the slice start IS the origin."""
    fb = bd.shape[0]
    bd5 = bd.reshape(fb, kb, full.gx, full.gy, full.gz)
    win = jax.lax.dynamic_slice(
        bd5, (0, 0, origin[0], origin[1], origin[2]),
        (fb, kb, box.gx, box.gy, box.gz))
    return win.reshape(fb, kb, box.g)
