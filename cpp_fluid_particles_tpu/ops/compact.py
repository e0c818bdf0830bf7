"""Occupied-column compacted layout — the adaptive-sparsity fast path.

The dense ghosted grid (ops/dense.py) spends pair compute on every cell of
the domain, but the dam-break fluid occupies only ~25-35% of (x, y) cell
columns (fewer once settled). This layout keeps ONLY the fluid-occupied
columns, each as a z-dense ghosted strip of (CZ+2) x K slots:

    compact fluid tensor: (F, NCO+1, GZ, K)
      rows 0..n_cols-1 : occupied columns (z ghosted, lane-aligned minor K)
      row NCO          : the empty sentinel column (POS_PAD / 0 fills) that
                         out-of-range or fluid-empty neighbor columns map to

Per step: ONE scatter in (fill_compact), pair passes over per-column
27-stencil windows gathered through two small row tables (``nbr`` for
fluid, ``gnbr`` for the static boundary grid — a fluid-empty neighbor
column can still hold boundary particles, so the two tables differ), ONE
gather out. Work scales with occupied columns instead of the whole domain;
the column bound NCO is a static shape whose overflow is detected
(``col_overflow``) and escalated by Simulation's auto-capacity retry,
like max_per_cell.

Cell/sentinel conventions match ops/dense.py (and the reference's
src/CUDAFunctions.cuh:64-70): out-of-grid or beyond-capacity particles go
to a trash slot, follow the ballistic fallback, and are reported.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from .dense import DenseDims
from .grid import POS_PAD, cell_coords

F32 = jnp.float32

# stencil offset o -> ((dx*3+dy) into the 9-neighbor axis, dz into GZ)
_D9 = np.asarray([(o // 9) * 3 + (o % 9) // 3 for o in range(27)], np.int32)
_DZ = np.asarray([o % 3 for o in range(27)], np.int32)


class CompactIndex(NamedTuple):
    slots: jnp.ndarray         # (N,) int32 into flat (NCO+1)*GZ*K; trash = total
    valid: jnp.ndarray         # (N,) bool
    nbr: jnp.ndarray           # (NCO, 9) int32 compact row of each (dx,dy)
                               #   neighbor column; missing/empty -> NCO
    gnbr: jnp.ndarray          # (NCO, 9) int32 ghosted flat col id for the
                               #   boundary grid; out-of-grid -> 0 (empty ghost)
    col_count: jnp.ndarray     # (NCO,) int32 fluid count per compact column
    n_cols: jnp.ndarray        # () int32 occupied columns in the domain
    overflow: jnp.ndarray      # () int32 particles dropped by the K bound
    col_overflow: jnp.ndarray  # () int32 occupied columns beyond NCO
    max_occupancy: jnp.ndarray  # () int32 fullest cell this step


def build_compact_index(pos: jnp.ndarray, cfg: SimConfig, dims: DenseDims,
                        nco: int) -> CompactIndex:
    """Cell ids -> within-cell ranks -> compact-column slot assignment +
    the per-step neighbor-column tables."""
    n = pos.shape[0]
    cx, cy, cz, k = dims.cx, dims.cy, dims.cz, dims.k
    cxy = cx * cy
    gz = cz + 2

    c = cell_coords(pos, cfg)
    inb = ((c[:, 0] >= 0) & (c[:, 0] < cx)
           & (c[:, 1] >= 0) & (c[:, 1] < cy)
           & (c[:, 2] >= 0) & (c[:, 2] < cz))
    cc = jnp.clip(c, 0, jnp.array([cx - 1, cy - 1, cz - 1]))
    cell = (cc[:, 0] * cy + cc[:, 1]) * cz + cc[:, 2]
    key = jnp.where(inb, cell, cx * cy * cz)

    order = jnp.argsort(key, stable=True)
    sk = key[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(iota - run_start)

    colid = cc[:, 0] * cy + cc[:, 1]
    counts = jnp.bincount(jnp.where(inb, colid, cxy), length=cxy + 1)[:cxy]
    occ = counts > 0
    cols = jnp.nonzero(occ, size=nco, fill_value=cxy)[0].astype(jnp.int32)
    n_cols = jnp.sum(occ).astype(jnp.int32)
    col_overflow = jnp.maximum(n_cols - nco, 0).astype(jnp.int32)
    inv = jnp.full((cxy + 1,), nco, jnp.int32).at[cols].set(
        jnp.arange(nco, dtype=jnp.int32), mode="drop")
    # cols' fill rows (cxy) land on inv[cxy], never read via colid < cxy
    pcol = inv[colid]

    valid = inb & (rank < k) & (pcol < nco)
    total = (nco + 1) * gz * k
    slots = jnp.where(
        valid, (pcol * gz + cc[:, 2] + 1) * k + rank, total
    ).astype(jnp.int32)
    overflow = jnp.sum(inb & (rank >= k)).astype(jnp.int32)

    col_count = jnp.where(cols < cxy, counts[jnp.minimum(cols, cxy - 1)],
                          0).astype(jnp.int32)

    # neighbor tables: 9 (dx, dy) offsets per occupied column
    col_x = cols // cy
    col_y = cols % cy
    real = cols < cxy
    nbr_list, gnbr_list = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nx = col_x + dx
            ny = col_y + dy
            in_grid = real & (nx >= 0) & (nx < cx) & (ny >= 0) & (ny < cy)
            nflat = jnp.clip(nx, 0, cx - 1) * cy + jnp.clip(ny, 0, cy - 1)
            # fluid: in-grid AND fluid-occupied, else the empty row
            nbr_list.append(jnp.where(in_grid, inv[nflat], nco))
            # boundary: any in-grid column can hold boundary particles;
            # out-of-grid -> ghost column 0 (always empty)
            g = (jnp.clip(nx, 0, cx - 1) + 1) * (cy + 2) \
                + jnp.clip(ny, 0, cy - 1) + 1
            gnbr_list.append(jnp.where(in_grid, g, 0))
    nbr = jnp.stack(nbr_list, 1).astype(jnp.int32)
    gnbr = jnp.stack(gnbr_list, 1).astype(jnp.int32)

    max_occ = (jnp.max(jnp.where(inb, rank, -1)) + 1).astype(jnp.int32)
    return CompactIndex(slots=slots, valid=valid, nbr=nbr, gnbr=gnbr,
                        col_count=col_count, n_cols=n_cols,
                        overflow=overflow, col_overflow=col_overflow,
                        max_occupancy=max_occ)


def fill_compact(idx: CompactIndex, fields, fills, dims: DenseDims,
                 nco: int) -> jnp.ndarray:
    """Stack (N,) fields -> (F, NCO+1, GZ, K) in ONE scatter. Empty slots
    (including the whole sentinel row and the z ghosts) carry the per-field
    fill value (POS_PAD for positions so they never interact)."""
    f = len(fields)
    gz = dims.cz + 2
    total = (nco + 1) * gz * dims.k
    vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)
    init = jnp.broadcast_to(jnp.asarray(fills, F32)[:, None], (f, total + 1))
    out = init.at[:, idx.slots].set(vals, mode="drop")
    return out[:, :total].reshape(f, nco + 1, gz, dims.k)


def read_compact(idx: CompactIndex, compact: jnp.ndarray,
                 fill: float = 0.0) -> jnp.ndarray:
    """(F, NCO+1, GZ, K) -> (F, N) per-particle values in ONE gather."""
    f = compact.shape[0]
    flat = compact.reshape(f, -1)
    out = flat[:, jnp.minimum(idx.slots, flat.shape[1] - 1)]
    return jnp.where(idx.valid[None, :], out, fill)


def pad_compact_out(core: jnp.ndarray) -> jnp.ndarray:
    """(n_out, NCO, CZ, K) executor output -> (n_out, NCO+1, GZ, K) with a
    zero sentinel row and zero z ghosts (composable as a later pass
    input)."""
    return jnp.pad(core, ((0, 0), (0, 1), (1, 1), (0, 0)))


def compact_pass(fluid_terms, bd_terms, cf,
                 idx: CompactIndex, dims: DenseDims, nco: int, n_out: int,
                 bd=None, dims_b=None) -> jnp.ndarray:
    """27-offset pass over occupied columns only.

    cf: (F, NCO+1, GZ, K) compact fluid tensor, or a TUPLE of such tensors
    whose field rows concatenate to the pass's row convention. Passing the
    step-invariant rows (positions, masses) as their own group lets XLA
    hoist their neighborhood gather out of solver iteration loops (the
    DFSPH Jacobi loops re-run this pass ~25x per frame with only the
    velocity/stiffness group changing). bd: the GHOSTED dense boundary
    tensor (Fb, GX, GY, GZ, Kb) — static, gathered per column via
    ``gnbr``. Returns (n_out, NCO+1, GZ, K) (pad_compact_out applied)."""
    groups = cf if isinstance(cf, tuple) else (cf,)
    cz, k = dims.cz, dims.k
    gz = cz + 2
    has_b = bd is not None and bd_terms is not None

    i_flat = jnp.concatenate(
        [g[:, :nco, 1:1 + cz, :] for g in groups], 0
    ).reshape(-1, nco * cz, k)
    f = i_flat.shape[0]
    # per-column 3x3 neighborhood strips: one row gather per group
    j9s = [jnp.take(g, idx.nbr, axis=1) for g in groups]  # (Fg,NCO,9,GZ,K)
    if has_b:
        fb = bd.shape[0]
        kb = dims_b.k
        gx, gy = dims.cx + 2, dims.cy + 2
        bd_cols = bd.reshape(fb, gx * gy, gz, kb)
        b9 = jnp.take(bd_cols, idx.gnbr, axis=1)  # (Fb, NCO, 9, GZ, Kb)

    d9 = jnp.asarray(_D9)
    dz = jnp.asarray(_DZ)

    def fold(o, acc):
        jo = jnp.concatenate([
            jax.lax.dynamic_slice(
                j9, (0, 0, d9[o], dz[o], 0),
                (j9.shape[0], nco, 1, cz, k))
            for j9 in j9s], 0).reshape(f, nco * cz, k)
        out = fluid_terms(i_flat, jo, False)[0]
        if has_b:
            jb = jax.lax.dynamic_slice(
                b9, (0, 0, d9[o], dz[o], 0), (fb, nco, 1, cz, kb)
            ).reshape(fb, nco * cz, kb)
            out = out + bd_terms(i_flat, jb)
        return acc + out

    acc = jax.lax.fori_loop(0, 27, fold,
                            jnp.zeros((n_out, nco * cz, k), F32))
    return pad_compact_out(acc.reshape(n_out, nco, cz, k))
