"""Neighbor-pass bodies + the executors that run them (XLA / Pallas).

Replaces the reference's per-thread 27-cell scans (src/BasicSPHSolver.cu:62-70
et al.). Each physics pass is defined by TERM functions — pair math in
vector-component form (a (...,3) axis would split XLA fusions and
materialise the pair tensor):

  * ``fluid_terms(i, j, want_j) -> (out_i, out_j | None)`` — the fluid-fluid
    pair block; ``out_i`` reduces to i-particle shape (``_si``), ``out_j``
    to j-particle shape (``_sj``). The j-side reduction is the
    Newton's-third-law mirror (W symmetric, grad W antisymmetric, mass
    weight swapped), so one pair-block evaluation serves both particles of
    each pair.
  * ``bd_terms(i, jb) -> out_i`` — the fluid-boundary block (one-sided:
    boundary particles are static and receive no forces).

Bodies are written once against the convention-neutral primitives
``_ii/_jb/_si/_sj/_zi`` (see the conventions section below) and serve every
executor unchanged (differentially tested).

Executors:

  * ``column_pass_xla_sym`` (engine='xla', also the body of the sliding-box
    'xlab' engine): lane-major HALF-stencil loop — 13 offsets + the self
    offset instead of 27; each fluid pair block (K_i, K_j, cells) is
    evaluated once and reduced along both axes, the j-side partials shifted
    to their home cells by a pad + dynamic-slice on the flat cell axis (no
    gathers). The fast path on this runtime (~the VPU compute floor).
  * ``column_pass_xla`` (engine='xla27'): the plain lane-major 27-offset
    loop, kept as a differential-testing oracle for the symmetric executor.
  * ``column_pass`` (engine='pallas'/'interpret'): one program per (x, y)
    cell column over BlockSpec-pipelined candidate tensors built by
    ``build_i``/``build_j``; the (CZ, K, 27K) pair blocks live in VMEM and
    empty columns are skipped via a scalar-prefetched occupancy table.
    Validated in CI (interpret mode); on the current runtime Mosaic codegen
    measures ~2x behind the XLA executors (BENCHMARKS.md), so this is an
    alternative path, not the default.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..parallel.mesh import constrain_axis, current_mesh
from . import kernels as kn
from .dense import DenseDims

F32 = jnp.float32

# stencil offsets in the reference's m-loop order (src/BasicSPHSolver.cu:66):
# offset o -> displacement (o//9, o%9//3, o%3) into the ghosted grid;
# o and 26-o are reverses of each other; o=13 is the self offset.
_OFFS = np.array([(o // 9, (o % 9) // 3, o % 3) for o in range(27)], np.int32)


# ----------------------------------------------------------------------
# XLA-side candidate-tensor construction (Pallas executor)
#
# Mosaic tiles the last two dims of every ref (even in HBM) and rejects
# DMA slices that are not tile-aligned, so arrays whose minor dims are
# (CZ, K) < (8, 128) cannot be window-DMA'd from inside a kernel. Instead
# the i/j tensors are assembled in XLA land (pure shifted-slice stacking —
# contiguous copies at HBM bandwidth) and the Pallas kernel is a plain
# BlockSpec-pipelined compute over columns.
# ----------------------------------------------------------------------

def build_i(dense: jnp.ndarray, dims: DenseDims) -> jnp.ndarray:
    """(F, GX, GY, GZ, K) ghosted -> I: (NC, F, CZ, K), NC = CX*CY."""
    f = dense.shape[0]
    core = dense[:, 1:1 + dims.cx, 1:1 + dims.cy, 1:1 + dims.cz, :]
    return core.transpose(1, 2, 0, 3, 4).reshape(
        dims.cx * dims.cy, f, dims.cz, dims.k)


def build_j(dense: jnp.ndarray, dims: DenseDims) -> jnp.ndarray:
    """(F, GX, GY, GZ, K) ghosted -> J: (NC, F, CZ, 27K) — for each real
    column, the per-z candidate slots of the 27-cell stencil, in (dx, dy,
    dz) order."""
    f = dense.shape[0]
    tiles = []
    for dx in range(3):
        for dy in range(3):
            for s in range(3):
                tiles.append(dense[:, dx:dx + dims.cx, dy:dy + dims.cy,
                                   s:s + dims.cz, :])
    j = jnp.stack(tiles, axis=-2)           # (F, CX, CY, CZ, 27, K)
    return j.transpose(1, 2, 0, 3, 4, 5).reshape(
        dims.cx * dims.cy, f, dims.cz, 27 * dims.k)


def cols_to_ghosted(cols: jnp.ndarray, dims: DenseDims) -> jnp.ndarray:
    """(NC, n_out, CZ, K) kernel output -> ghosted (n_out, GX, GY, GZ, K)
    with a zero ghost ring (composable as a later pass input)."""
    n_out = cols.shape[1]
    core = cols.reshape(dims.cx, dims.cy, n_out, dims.cz, dims.k)
    core = core.transpose(2, 0, 1, 3, 4)
    return jnp.pad(core, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))


def column_pass(
    body: Callable,
    i_cols: jnp.ndarray,               # (NC, Fi, CZ, K)
    j_cols: jnp.ndarray,               # (NC, Fi, CZ, 27K)
    col_count: jnp.ndarray,            # (CX, CY) int32
    dims: DenseDims,
    n_out: int,
    jb_cols: Optional[jnp.ndarray] = None,  # (NC, Fb, CZ, 27Kb)
    dims_b: Optional[DenseDims] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Evaluate ``body`` for every real cell column (empty ones skipped via
    scalar-prefetched occupancy); returns (NC, n_out, CZ, K)."""
    nc, fi, cz, k = i_cols.shape
    has_b = jb_cols is not None
    kb = dims_b.k if has_b else 0
    fb = jb_cols.shape[1] if has_b else 0

    def kernel(cnt_ref, *refs):
        if has_b:
            i_ref, j_ref, jb_ref, out_ref = refs
        else:
            i_ref, j_ref, out_ref = refs
            jb_ref = None
        c = pl.program_id(0)
        occupied = cnt_ref[c] > 0

        @pl.when(jnp.logical_not(occupied))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(occupied)
        def _():
            jb = jb_ref[0] if has_b else None
            out_ref[0] = body(i_ref[0], j_ref[0], jb)

    in_specs = [
        pl.BlockSpec((1, fi, cz, k), lambda c, *_: (c, 0, 0, 0)),
        pl.BlockSpec((1, fi, cz, 27 * k), lambda c, *_: (c, 0, 0, 0)),
    ]
    operands = [i_cols, j_cols]
    if has_b:
        in_specs.append(
            pl.BlockSpec((1, fb, cz, 27 * kb), lambda c, *_: (c, 0, 0, 0)))
        operands.append(jb_cols)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_out, cz, k), lambda c, *_: (c, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nc, n_out, cz, k), F32),
        interpret=interpret,
    )(col_count.reshape(-1).astype(jnp.int32), *operands)


# ----------------------------------------------------------------------
# pair-axis conventions + geometry helper used by all bodies
#
# The physics bodies are written once against four primitives:
#   _ii(v) broadcast an i-side field into the pair block
#   _jb(v) broadcast a j-side field into the pair block
#   _si(x) reduce the pair block to i-particle shape
#   _sj(x) reduce the pair block to j-particle shape (Newton's-3rd mirror)
#   _zi(r) i-shaped zeros given the pair-distance block
# Two conventions instantiate them:
#   SLOT  — pair block (..., K_i, K_j); the Pallas column kernels' layout
#           (their candidate blocks are (CZ, K) / (CZ, 27K)).
#   LANE  — pair block (..., K_i, K_j, C) with the flattened cell axis C
#           MINOR; the XLA executors' layout (fully lane-utilized tiles).
# Executors select their convention with the `_axes` context manager; the
# switch happens at TRACE time (bodies are ordinary Python closures).
# ----------------------------------------------------------------------

import contextlib


class _Conv(NamedTuple):
    ii: Callable
    jb: Callable
    si: Callable
    sj: Callable
    zi: Callable


_SLOT = _Conv(
    ii=lambda v: v[..., :, None],
    jb=lambda v: v[..., None, :],
    si=lambda x: jnp.sum(x, -1),
    sj=lambda x: jnp.sum(x, -2),
    zi=lambda r: jnp.zeros(r.shape[:-1], F32),
)
_LANE = _Conv(
    ii=lambda v: v[..., :, None, :],
    jb=lambda v: v[..., None, :, :],
    si=lambda x: jnp.sum(x, -2),
    sj=lambda x: jnp.sum(x, -3),
    zi=lambda r: jnp.zeros(r.shape[:-3] + r.shape[-3:-2] + r.shape[-1:],
                           F32),
)

_LANE5 = _Conv(
    # 5-D cell-space variant of _LANE: pair block (..., K_i, K_j, X, Y, Z)
    # with the three cell axes trailing — the 2-D-mesh executor's layout
    # (GX and GZ shardable independently)
    ii=lambda v: v[..., :, None, :, :, :],
    jb=lambda v: v[..., None, :, :, :, :],
    si=lambda x: jnp.sum(x, -4),
    sj=lambda x: jnp.sum(x, -5),
    zi=lambda r: jnp.zeros(r.shape[:-5] + r.shape[-5:-4] + r.shape[-3:],
                           F32),
)

_AX = _SLOT


@contextlib.contextmanager
def _axes(conv: _Conv):
    global _AX
    prev = _AX
    _AX = conv
    try:
        yield
    finally:
        _AX = prev


def _ii(v):
    return _AX.ii(v)


def _jb(v):
    return _AX.jb(v)


def _si(x):
    return _AX.si(x)


def _sj(x):
    return _AX.sj(x)


def _zi(r):
    return _AX.zi(r)


class Pair(NamedTuple):
    dx: jnp.ndarray   # pair-block i - j separations per component
    dy: jnp.ndarray
    dz: jnp.ndarray
    r: jnp.ndarray


def _geom(i, j) -> Pair:
    """i, j: stacked field tensors whose first three rows are position
    components. Returns pair separations/distance as pair blocks."""
    dx = _ii(i[0]) - _jb(j[0])
    dy = _ii(i[1]) - _jb(j[1])
    dz = _ii(i[2]) - _jb(j[2])
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return Pair(dx, dy, dz, r)


# ----------------------------------------------------------------------
# executors over term functions
# ----------------------------------------------------------------------

def _flat_offsets(dims: DenseDims) -> np.ndarray:
    """Flat ghosted-axis displacement of each stencil offset o (o=13 -> 0,
    offset 26-o is the negation)."""
    return ((_OFFS[:, 0] - 1) * dims.gy * dims.gz
            + (_OFFS[:, 1] - 1) * dims.gz + (_OFFS[:, 2] - 1)).astype(
        np.int32)


def column_pass_xla(
    body: Callable,
    fl: jnp.ndarray,                  # (Fi, K, G) lane-major flat ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, Kb, G) lane-major flat
    dims_b: Optional[DenseDims] = None,
) -> jnp.ndarray:
    """Plain 27-offset lane-major XLA executor: the ghost ring makes every
    stencil offset ONE contiguous slice of the flat cell axis (zero
    gathers), and the pair blocks are (K_i, K_j, W) with the cell axis
    minor — fully lane-utilized tiles. The i window trims the leading and
    trailing P ghost cells (the interior ghost cells compute junk that the
    particle gather never reads: their slots hold POS_PAD / zero mass, so
    every contribution they receive or emit is exactly zero). Kept as the
    differential-testing oracle for ``column_pass_xla_sym``."""
    fi, k = fl.shape[0], fl.shape[1]
    p = dims.flat_p
    g = dims.g
    w = g - 2 * p
    i_flat = jax.lax.slice_in_dim(fl, p, p + w, axis=2)
    has_b = bd is not None

    offs_np = _flat_offsets(dims) + p             # slice starts in [0, 2P]
    unroll = current_mesh() is not None
    offs = jnp.asarray(offs_np)

    def offset_slice(dense, o, kk):
        start = (0, 0, int(offs_np[o]) if unroll else offs[o])
        return jax.lax.dynamic_slice(dense, start, (dense.shape[0], kk, w))

    def fold(o, acc):
        j_o = offset_slice(fl, o, k)
        jb_o = offset_slice(bd, o, dims_b.k) if has_b else None
        return acc + body(i_flat, j_o, jb_o)

    with _axes(_LANE):
        acc = jnp.zeros((n_out, k, w), F32)
        if unroll:
            # static slice starts: under a mesh, GSPMD turns each offset
            # slice into a nearest-neighbor halo exchange over ICI; a
            # TRACED start would force it to all-gather the whole grid
            # tensor instead (measured 160 MB/pass at the 1M scale)
            for o in range(27):
                acc = fold(o, acc)
        else:
            acc = jax.lax.fori_loop(0, 27, fold, acc)
    return constrain_axis(
        jnp.pad(acc, ((0, 0), (0, 0), (p, p))), 2)


def column_pass_xla_sym(
    fluid_terms: Callable,
    bd_terms: Optional[Callable],
    fl: jnp.ndarray,                  # (Fi, K, G) lane-major flat ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, Kb, G) lane-major flat
    dims_b: Optional[DenseDims] = None,
) -> jnp.ndarray:
    """Symmetric half-stencil lane-major XLA executor.

    For each of the 13 half offsets d, the fluid pair block (i in cell c,
    j in cell c+d) is evaluated once; the j-axis reduction lands on the
    i cells directly, and the i-axis reduction (the Newton's-third-law
    mirror) is shifted by +d via one pad + dynamic-slice on the flat cell
    axis and accumulated — covering the reverse offset 26-o without
    re-evaluating the block. The self offset (o=13) uses the i-reduction
    only: its full block already contains both orderings of each
    within-cell pair. Boundary blocks are one-sided and keep all 27
    offsets (o and 26-o folded per iteration)."""
    fi, k = fl.shape[0], fl.shape[1]
    p = dims.flat_p
    g = dims.g
    w = g - 2 * p
    i_flat = jax.lax.slice_in_dim(fl, p, p + w, axis=2)
    has_b = bd is not None and bd_terms is not None

    offd_np = _flat_offsets(dims)                # signed displacements
    unroll = current_mesh() is not None
    offd = jnp.asarray(offd_np)

    def slc(dense, o, kk):
        start = int(offd_np[o]) + p if unroll else offd[o] + p
        return jax.lax.dynamic_slice(
            dense, (0, 0, start), (dense.shape[0], kk, w))

    with _axes(_LANE):
        # self offset: i-reduction over the full within-cell block
        acc = fluid_terms(i_flat, i_flat, False)[0]
        if has_b:
            acc = acc + bd_terms(i_flat, slc(bd, 13, dims_b.k))

        def fold(o, acc):
            out_i, out_j = fluid_terms(i_flat, slc(fl, o, k), True)
            acc = acc + out_i
            # j-side partials: the value computed at i-cell c belongs to
            # j-cell c+d -> shift by +d = slice the P-padded array at P-d
            ojp = jnp.pad(out_j, ((0, 0), (0, 0), (p, p)))
            start_j = p - (int(offd_np[o]) if unroll else offd[o])
            acc = acc + jax.lax.dynamic_slice(
                ojp, (0, 0, start_j), acc.shape)
            if has_b:
                acc = acc + (bd_terms(i_flat, slc(bd, o, dims_b.k))
                             + bd_terms(i_flat, slc(bd, 26 - o, dims_b.k)))
            return acc

        if unroll:
            # static slice starts: under a mesh each offset slice becomes
            # a nearest-neighbor halo exchange (collective-permute) over
            # ICI; a traced start forces GSPMD to all-gather the whole
            # grid tensor per pass (measured 160 MB at the 1M scale)
            for o in range(13):
                acc = fold(o, acc)
        else:
            acc = jax.lax.fori_loop(0, 13, fold, acc)
    return constrain_axis(
        jnp.pad(acc, ((0, 0), (0, 0), (p, p))), 2)


def column_pass_halo_sym(
    fluid_terms: Callable,
    bd_terms: Optional[Callable],
    fl: jnp.ndarray,                  # (Fi, K, G) lane-major flat ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, Kb, G) lane-major flat
    dims_b: Optional[DenseDims] = None,
    mesh=None,
) -> jnp.ndarray:
    """shard_map symmetric half-stencil executor with ONE fused halo
    exchange per pass (2 ppermutes of a flat_p-wide edge), replacing
    GSPMD's per-offset collective-permutes (~14/pass, SCALING.md §2).

    Each device owns a contiguous shard [dL, dL+L) of the flat ghosted
    cell axis (L = G / n_devices). One p-wide edge exchange per direction
    (p = dims.flat_p, the maximum flat stencil displacement ~ one x-plane)
    builds a local window covering [dL-p, dL+L+p); every offset slice of
    the fold is then a LOCAL static slice. The Newton's-third-law j-side
    partials that would land in a neighbor's shard are instead recomputed
    locally: the i-window is extended to [dL, dL+L+p) (redundant p-wide
    edge compute, ~p/L extra, zero extra communication), so every
    contribution to a local output position is produced locally.

    Bitwise-identical to ``column_pass_xla_sym``: the per-position fold
    performs the same adds in the same order on the same operand bytes
    (the wider blocks only append positions whose results are discarded;
    reductions run along the K axes, never the cell axis). Positions read
    beyond the global array (first/last device) see zero words whose
    contributions vanish exactly — masses are zero there — and land only
    on ghost-ring outputs, which are masked to the zero pad ring the
    unsharded executor produces by construction."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as _P
    from ..parallel.mesh import AXIS as _MAXIS, mesh_devices as _mdev

    fi, k = fl.shape[0], fl.shape[1]
    p = dims.flat_p
    g = dims.g
    nd = _mdev(mesh)
    assert g % nd == 0 and g // nd >= p, "ineligible shapes for halo pass"
    ll = g // nd
    has_b = bd is not None and bd_terms is not None
    if has_b:
        assert dims_b.flat_p == p, "boundary grid must match fluid grid"
    offd_np = _flat_offsets(dims)                # signed displacements
    fwd = [(i, i + 1) for i in range(nd - 1)]
    bwd = [(i + 1, i) for i in range(nd - 1)]

    def local(fl_l, *bd_args):
        d = jax.lax.axis_index(_MAXIS)
        # fused halo: one p-wide edge each way; end devices receive zeros
        left = jax.lax.ppermute(
            jax.lax.slice_in_dim(fl_l, ll - p, ll, axis=2), _MAXIS, fwd)
        right = jax.lax.ppermute(
            jax.lax.slice_in_dim(fl_l, 0, p, axis=2), _MAXIS, bwd)
        ext = jnp.concatenate([left, fl_l, right], 2)  # [dL-p, dL+L+p)
        i_e = jax.lax.slice_in_dim(ext, p, 2 * p + ll, axis=2)  # [dL, dL+L+p)

        def slc_f(o):
            s = int(offd_np[o]) + p
            return jax.lax.slice_in_dim(ext, s, s + ll + p, axis=2)

        if has_b:
            # boundary is replicated: its window [dL-p, dL+L+2p) is a local
            # slice of the zero-padded full tensor (reads beyond the global
            # ghosted grid occur only at junk i-positions and carry zero
            # masses)
            pb = jnp.pad(bd_args[0], ((0, 0), (0, 0), (p, 2 * p)))
            ext_b = jax.lax.dynamic_slice(
                pb, (0, 0, d * ll),
                (pb.shape[0], pb.shape[1], ll + 3 * p))

            def slc_b(o):
                s = int(offd_np[o]) + p
                return jax.lax.slice_in_dim(ext_b, s, s + ll + p, axis=2)

        # i-positions outside the global interior [p, g-p) have no
        # counterpart in the unsharded executor (its i window IS that
        # interior); their j-side partials are exact zeros by value
        # (zero masses) but can carry a -0.0 sign from signed factors,
        # whereas the unsharded shift-add reads literal +0.0 from the
        # pad — mask them to +0.0 so the sign of an exactly-zero
        # accumulator matches bitwise (ADVICE r4 #4)
        gi_e = d * ll + jnp.arange(ll + p, dtype=jnp.int32)
        j_interior = ((gi_e >= p) & (gi_e < g - p))[None, None, :]

        with _axes(_LANE):
            # identical fold order to column_pass_xla_sym, on width L+p
            acc = fluid_terms(i_e, i_e, False)[0]
            if has_b:
                acc = acc + bd_terms(i_e, slc_b(13))
            for o in range(13):
                dlt = int(offd_np[o])
                out_i, out_j = fluid_terms(i_e, slc_f(o), True)
                out_j = jnp.where(j_interior, out_j, 0.0)
                acc = acc + out_i
                # out_j computed at i-position c belongs to c+dlt; the
                # extended i-window makes every local target's source local
                ojp = jnp.pad(out_j, ((0, 0), (0, 0), (p, p)))
                acc = acc + jax.lax.slice_in_dim(
                    ojp, p - dlt, p - dlt + ll + p, axis=2)
                if has_b:
                    acc = acc + (bd_terms(i_e, slc_b(o))
                                 + bd_terms(i_e, slc_b(26 - o)))
        core = jax.lax.slice_in_dim(acc, 0, ll, axis=2)
        gi = d * ll + jnp.arange(ll, dtype=jnp.int32)
        keep = (gi >= p) & (gi < g - p)          # the global zero pad ring
        return jnp.where(keep[None, None, :], core, 0.0)

    spec = _P(None, None, _MAXIS)
    in_specs = (spec, _P(None, None, None)) if has_b else (spec,)
    args = (fl, bd) if has_b else (fl,)
    return shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=spec,
                     check_vma=False)(*args)


def column_pass_xla_sym_5d(
    fluid_terms: Callable,
    bd_terms: Optional[Callable],
    fl: jnp.ndarray,                  # (Fi, K, G) lane-major flat ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, Kb, G) lane-major flat
    dims_b: Optional[DenseDims] = None,
    mesh=None,
) -> jnp.ndarray:
    """Symmetric half-stencil executor over the 5-D cell-space view —
    the 2-D (x,z)-slab mesh path (SCALING.md §4's v5e-8 option: halving
    per-slab surface area vs 8 x-slabs).

    The flat executor's single ghosted cell axis forces any sharding to
    be 1-D x-slabs; here every stencil offset (dx, dy, dz) is three
    static per-axis slices of the (F, K, GX, GY, GZ) view, so GSPMD can
    shard GX and GZ on independent mesh axes and lower the x/z shifts to
    nearest-neighbor halo exchanges per axis. Per output position the
    fold performs the same adds in the same order on the same operand
    bytes as ``column_pass_xla_sym`` (the flat executor's extra interior-
    ghost positions compute junk that is never read); particle positions
    match the flat executor bitwise over a multi-step window, velocities
    within 1 ulp (XLA contracts multiply-add chains differently in the
    flat vs 5-D fusions) — asserted in tests/test_parallel.py."""
    from jax.sharding import NamedSharding, PartitionSpec as _P

    f, k = fl.shape[0], fl.shape[1]
    cx, cy, cz = dims.cx, dims.cy, dims.cz
    x5 = fl.reshape(f, k, dims.gx, dims.gy, dims.gz)
    has_b = bd is not None and bd_terms is not None
    if mesh is not None:
        ax, az = mesh.axis_names
        x5 = jax.lax.with_sharding_constraint(
            x5, NamedSharding(mesh, _P(None, None, ax, None, az)))
    if has_b:
        b5 = bd.reshape(bd.shape[0], dims_b.k, dims.gx, dims.gy, dims.gz)
        if mesh is not None:
            # boundary is static data: replicate, every slice is local
            b5 = jax.lax.with_sharding_constraint(
                b5, NamedSharding(mesh, _P()))

    def cell_slice(v, o):
        dx, dy, dz = (int(x) for x in _OFFS[o])
        return v[:, :, dx:dx + cx, dy:dy + cy, dz:dz + cz]

    with _axes(_LANE5):
        i_core = cell_slice(x5, 13)
        acc = fluid_terms(i_core, i_core, False)[0]
        if has_b:
            acc = acc + bd_terms(i_core, cell_slice(b5, 13))
        for o in range(13):
            dx, dy, dz = (int(x) for x in _OFFS[o])
            out_i, out_j = fluid_terms(i_core, cell_slice(x5, o), True)
            acc = acc + out_i
            # out_j computed at core cell c belongs to c + (d-1): pad one
            # ring and slice at 1-(d-1) = 2-d per axis (static)
            ojp = jnp.pad(out_j, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
            acc = acc + ojp[:, :, 2 - dx:2 - dx + cx, 2 - dy:2 - dy + cy,
                            2 - dz:2 - dz + cz]
            if has_b:
                acc = acc + (bd_terms(i_core, cell_slice(b5, o))
                             + bd_terms(i_core, cell_slice(b5, 26 - o)))
    out = jnp.pad(acc, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    if mesh is not None:
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, _P(None, None, ax, None, az)))
    return out.reshape(n_out, k, dims.g)


CHUNK_TARGET_MB = 14.0     # per-slab fluid pair-block budget when chunking
CHUNK_MIN_PAIR_MB = 48.0   # below this, the unchunked executor runs
CHUNK_OVERRIDE: Optional[int] = None   # tests/experiments: force a slab count
CHUNK_BIAS = 0   # added to auto slab counts > 1; Simulation bumps this to
                 # dodge shape-specific XLA backend-compiler crashes (a
                 # different slab split is cost-neutral, unlike a K bump)


def _auto_nchunk(k: int, w: int) -> int:
    """Slab count that keeps each slab's fluid pair block (K*K*w_slab f32)
    small enough for XLA's fusions to stay VMEM-resident. The 20k dam's
    boxes (pair blocks 7-38 MB) measure at the VPU floor unchunked and
    stay on that proven path (CHUNK_MIN_PAIR_MB); the 1M box's ~140 MB
    pair blocks make the unchunked traversal spill pair-block temporaries
    to HBM (memory_analysis: 225-340 MB temps) or outright crash XLA's
    alternate-memory assignment — chunked to ~14 MB slabs the measured
    1M traversals drop from 20/64 ms to 11.6/24 ms (1-/3-output,
    exp/chunk_sweep.py), at the padded-slot stream+VPU floor."""
    pair_mb = k * k * w * 4 / 1e6
    if pair_mb <= CHUNK_MIN_PAIR_MB:
        return 1
    return max(2, int(np.ceil(pair_mb / CHUNK_TARGET_MB)) + CHUNK_BIAS)


def column_pass_xla_sym_chunked(
    fluid_terms: Callable,
    bd_terms: Optional[Callable],
    fl: jnp.ndarray,                  # (Fi, K, G) lane-major flat ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,
    dims_b: Optional[DenseDims] = None,
    nchunk: int = 2,
) -> jnp.ndarray:
    """Slab-chunked symmetric half-stencil executor (large-grid variant of
    ``column_pass_xla_sym``; single-chip only — under a mesh the unchunked
    executor's offset slices are what GSPMD turns into ICI halo exchanges).

    The interior cell axis is split into ``nchunk`` x-slabs. Each slab
    processes its input window with a flat_p ghost margin on both sides:
    i-side reductions land in the slab core; the Newton's-third-law j-side
    partials of offset d land at core+d and are kept in a (core + 2p) halo
    buffer instead of being cropped; slabs overlap-add into the full grid.
    Every directed pair is evaluated in exactly one slab (the one owning
    the i cell; half-stencil offsets all have negative flat displacement),
    so the result equals the unchunked executor up to f32 summation order.
    Purpose: per-slab pair blocks sized to VMEM so XLA's reduction fusions
    never materialise pair-block temporaries in HBM (see BENCHMARKS.md,
    the 1M regime)."""
    fi, k = fl.shape[0], fl.shape[1]
    p = dims.flat_p
    g = dims.g
    w = g - 2 * p
    has_b = bd is not None and bd_terms is not None
    if has_b:
        assert dims_b.flat_p == p, "boundary box must match fluid box"
    offd_np = _flat_offsets(dims)
    offd = jnp.asarray(offd_np)

    bounds = np.linspace(0, w, nchunk + 1).round().astype(int)
    acc = jnp.zeros((n_out, k, g), F32)
    with _axes(_LANE):
        for s in range(nchunk):
            a, b2 = int(bounds[s]), int(bounds[s + 1])
            cs = b2 - a
            slab = jax.lax.slice_in_dim(fl, a, a + cs + 2 * p, axis=2)
            i_s = jax.lax.slice_in_dim(slab, p, p + cs, axis=2)
            bslab = (jax.lax.slice_in_dim(bd, a, a + cs + 2 * p, axis=2)
                     if has_b else None)

            def slc(dense, start, kk):
                return jax.lax.dynamic_slice(
                    dense, (0, 0, start), (dense.shape[0], kk, cs))

            core0 = fluid_terms(i_s, i_s, False)[0]
            if has_b:
                core0 = core0 + bd_terms(i_s, slc(bslab, p, dims_b.k))

            def fold(o, carry):
                core, halo = carry
                d = offd[o]
                out_i, out_j = fluid_terms(i_s, slc(slab, p + d, k), True)
                core = core + out_i
                # out_j[c] belongs to cell c+d; in halo coords ([-p, cs+p)
                # mapped to [0, cs+2p)) that is p+d+c — i.e. halo +=
                # pad(out_j, (p+d, p-d)), expressed as a 2p-pad + slice so
                # the traced d stays a dynamic-slice start:
                ojp = jnp.pad(out_j, ((0, 0), (0, 0), (2 * p, 2 * p)))
                halo = halo + jax.lax.dynamic_slice(
                    ojp, (0, 0, p - d), halo.shape)
                if has_b:
                    core = (core
                            + bd_terms(i_s, slc(bslab, p + d, dims_b.k))
                            + bd_terms(i_s, slc(bslab, p - d, dims_b.k)))
                return core, halo

            halo0 = jnp.zeros((n_out, k, cs + 2 * p), F32)
            core, halo = jax.lax.fori_loop(0, 13, fold, (core0, halo0))
            buf = halo.at[:, :, p:p + cs].add(core)
            acc = acc.at[:, :, a:a + cs + 2 * p].add(buf)
    return acc


def column_pass_xla_onesided(
    body: Callable,
    i_fl: jnp.ndarray,                # (Fi, K_i, G) lane-major flat ghosted
    dims: DenseDims,                  # geometry of BOTH operands (same
    #                                   ghosted cell extents; K from shapes)
    n_out: int,
    j: jnp.ndarray,                   # (Fj, K_j, G) lane-major flat ghosted
    dims_j: DenseDims,
) -> jnp.ndarray:
    """Plain 27-offset ONE-SIDED lane-major executor: i reads from
    ``i_fl``, j candidates from ``j`` only — the cross-class folds of the
    occupancy split (A<-B, B<-boundary). ``body(i, jb) -> (n_out, K_i, W)``
    in the LANE convention (use ``fluid_terms(i, jb, False)[0]`` for a
    one-directional fluid contribution)."""
    assert dims_j.gy == dims.gy and dims_j.gz == dims.gz \
        and dims_j.gx == dims.gx, "operands must share cell geometry"
    k = i_fl.shape[1]
    p = dims.flat_p
    g = dims.g
    w = g - 2 * p
    i_flat = jax.lax.slice_in_dim(i_fl, p, p + w, axis=2)
    offs = jnp.asarray(_flat_offsets(dims) + p)

    with _axes(_LANE):
        def fold(o, acc):
            jb_o = jax.lax.dynamic_slice(
                j, (0, 0, offs[o]), (j.shape[0], dims_j.k, w))
            return acc + body(i_flat, jb_o)

        acc = jax.lax.fori_loop(
            0, 27, fold, jnp.zeros((n_out, k, w), F32))
    return jnp.pad(acc, ((0, 0), (0, 0), (p, p)))


def _run_split(fluid_terms, bd_terms, fl, bd, sd, dims_b, n_out):
    """Occupancy-class split execution of one pass (ops/split.py;
    measured exp/occupancy_split.py, VERDICT r4 #1). Five folds cover
    every pair class exactly once:

      1. AA + A<-boundary : symmetric half-stencil over the box at K_a
         (K_a^2 pair rows instead of K^2 — the whole point)
      2. BB               : symmetric half-stencil over the window
      3. B<-A             : one-sided 27-offset fold, j = the window
         slice of box A (rides fold 2 through the executor's bd path)
      4. B<-boundary      : one-sided fold over the boundary window
      5. A<-B             : one-sided fold added back into the box result

    Pair sums are regrouped vs the single-tier executor (A receives its
    B-neighbors in a separate fold), so results are float-close, not
    bitwise. Single-chip only."""
    from . import split as spl

    assert current_mesh() is None, "occupancy split is single-chip"
    da, dw, start = sd.a, sd.w, sd.start
    dwa = DenseDims(dw.cx, dw.cy, dw.cz, da.k)
    has_b = bd is not None and bd_terms is not None

    # 1. AA + A<-bd over the full box at K_a (recursion picks up the
    #    slab-chunked variant for large boxes)
    out_a = _run(fluid_terms, bd_terms if has_b else None, fl.a,
                 bd if has_b else None, None, da, dims_b, n_out, "xla")

    a_win = spl.slice_window(fl.a, da, dwa, start)

    def fluid_os(i, jb):
        return fluid_terms(i, jb, False)[0]

    # 2+3. BB (sym) + B<-A (all 27 offsets through the one-sided bd fold)
    out_b = column_pass_xla_sym(fluid_terms, fluid_os, fl.b, dw, n_out,
                                bd=a_win, dims_b=dwa)
    # 4. B<-boundary over the boundary window
    if has_b:
        dwb = DenseDims(dw.cx, dw.cy, dw.cz, dims_b.k)
        bd_win = spl.slice_window(bd, dims_b, dwb, start)
        out_b = out_b + column_pass_xla_onesided(
            bd_terms, fl.b, dw, n_out, bd_win, dwb)
    # 5. A<-B, accumulated into the box result at the window origin
    out_aw = column_pass_xla_onesided(fluid_os, a_win, dwa, n_out, fl.b,
                                      dw)
    out_a = spl.add_window(out_a, out_aw, da, dwa, start)
    return spl.SP(out_a, out_b)


def _std_body(fluid_terms, bd_terms):
    """Combine term functions into the (i, j, jb) body used by the Pallas
    and 27-offset executors."""
    def body(i, j, jb):
        out = fluid_terms(i, j, False)[0]
        if jb is not None and bd_terms is not None:
            out = out + bd_terms(i, jb)
        return out
    return body


def _run(fluid_terms, bd_terms, fl, bd, col_count, dims, dims_b, n_out,
         engine):
    """Dispatch a pass to an executor.

    engine: 'xla' (symmetric half-stencil), 'xla27' (plain 27-offset loop),
    'pallas' (column kernels, candidates in VMEM), or 'interpret' (Pallas
    interpreter, for CPU tests).

    fl: lane-major flat fluid dense (F, K, G) — for 'xlab' the same layout
    over the sliding fluid box, with dims = the box dims and bd the
    box-sliced boundary window (the executors are layout-agnostic: the box
    is just a smaller ghosted grid). bd: for the XLA executors the
    lane-major flat boundary dense (Fb, Kb, G); for 'pallas' / 'interpret'
    the PREBUILT candidate tensor (NC, Fb, CZ, 27Kb) from build_j.
    Returns a lane-major flat (n_out, K, G) result.

    Occupancy split (ops/split.py): when ``dims`` is a SplitDims (fl then
    an SP or tuple of SPs), the pass runs ``_run_split`` and returns an
    SP of per-tier results."""
    from . import split as _spl
    if isinstance(fl, tuple):
        if any(isinstance(x, _spl.SP) for x in fl):
            fl = _spl.SP(jnp.concatenate([x.a for x in fl], 0),
                         jnp.concatenate([x.b for x in fl], 0))
        else:
            fl = jnp.concatenate(fl, 0)
    if isinstance(dims, _spl.SplitDims):
        return _run_split(fluid_terms, bd_terms, fl, bd, dims, dims_b,
                          n_out)
    if engine == "xlab":
        engine = "xla"          # the sym executor runs the box grid as-is
    if engine == "xla":
        mesh = current_mesh()
        if mesh is not None and len(mesh.axis_names) == 2:
            # 2-D (x,z)-slab mesh: the 5-D cell-space executor, whose
            # per-axis static slices GSPMD partitions on both axes
            return column_pass_xla_sym_5d(fluid_terms, bd_terms, fl,
                                          dims, n_out, bd, dims_b, mesh)
        if mesh is not None:
            from ..parallel.halo import pass_eligible
            from ..parallel.mesh import current_halo_mode
            mode = current_halo_mode()
            ok = pass_eligible(mesh, dims.g, dims.flat_p) and (
                bd is None or dims_b.flat_p == dims.flat_p)
            if mode == "shard_map":
                assert ok, "halo='shard_map' forced on ineligible shapes"
            if ok and mode != "gspmd":
                return column_pass_halo_sym(fluid_terms, bd_terms, fl,
                                            dims, n_out, bd, dims_b, mesh)
        nchunk = (CHUNK_OVERRIDE if CHUNK_OVERRIDE is not None
                  else _auto_nchunk(fl.shape[1], dims.g - 2 * dims.flat_p))
        if nchunk > 1 and mesh is None:
            return column_pass_xla_sym_chunked(
                fluid_terms, bd_terms, fl, dims, n_out, bd, dims_b, nchunk)
        return column_pass_xla_sym(fluid_terms, bd_terms, fl, dims, n_out,
                                   bd, dims_b)
    if engine == "xla27":
        return column_pass_xla(_std_body(fluid_terms, bd_terms), fl, dims,
                               n_out, bd, dims_b)
    # Pallas path: candidate tensors use the 5-D ghosted view and the SLOT
    # pair convention (blocks (CZ, K) x (CZ, 27K) per column)
    from .dense import flat_to_ghost5
    fl5 = flat_to_ghost5(fl, dims)
    i_cols = build_i(fl5, dims)
    j_cols = build_j(fl5, dims)
    with _axes(_SLOT):
        out = column_pass(_std_body(fluid_terms, bd_terms), i_cols, j_cols,
                          col_count, dims, n_out, bd, dims_b,
                          interpret=(engine == "interpret"))
    ghosted = cols_to_ghosted(out, dims)        # (n_out, GX, GY, GZ, K)
    return ghosted.transpose(0, 4, 1, 2, 3).reshape(n_out, dims.k, dims.g)


# ----------------------------------------------------------------------
# physics pass term functions
#
# Field row conventions (stacked along axis 0 of the dense arrays):
#   positions always rows 0..2, mass row 3; extras documented per pass.
# Each fluid_terms returns (out_i, out_j): out_i reduces the pair block
# over the j axis (-1); out_j over the i axis (-2) with the mass weight
# swapped and gradient-direction terms negated (grad W antisymmetric).
# ----------------------------------------------------------------------

def density_pass(fl, bd, col_count, dims, dims_b, cfg, engine="xla"):
    """rho = sum m_j W (fluid + boundary) — src/BasicSPHSolver.cu:54-83.
    fl: [pos3, mass]; bd: [pos3, mass]. Returns ghosted (GX,GY,GZ,K)."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        out_i = _si(_jb(j[3]) * w)[None]
        out_j = _sj(_ii(i[3]) * w)[None] if want_j else None
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        return _si(_jb(jb[3]) * kn.w_cubic(gb.r, h))[None]

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 1, engine)[0]


def pressure_force_pass(fl, bd, col_count, dims, dims_b, cfg,
                        engine="xla"):
    """Symmetric pressure accel (src/BasicSPHSolver.cu:113-165), WITHOUT the
    MAX_A clamp (applied elementwise by the caller).
    fl: [pos3, mass, rho, p]; bd: [pos3, mass]. Returns (3, ghosted)."""
    h, eps = cfg.radius, cfg.epsilon

    def fluid(i, j, want_j):
        g = _geom(i, j)
        cw = kn.grad_w_cubic_coef(g.r, h)
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        over_j = _jb(j[5] / jnp.maximum(eps, j[4] * j[4]))
        s = (over_i + over_j) * cw
        sx, sy, sz = s * g.dx, s * g.dy, s * g.dz
        mj = _jb(j[3])
        out_i = jnp.stack([-_si(mj * sx), -_si(mj * sy),
                           -_si(mj * sz)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([_sj(mi * sx), _sj(mi * sy),
                           _sj(mi * sz)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = kn.grad_w_cubic_coef(gb.r, h)
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        coefb = -_jb(jb[3]) * over_i * cwb
        return jnp.stack([_si(coefb * gb.dx),
                          _si(coefb * gb.dy),
                          _si(coefb * gb.dz)])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 3, engine)


def viscosity_pass(fl, col_count, dims, cfg, engine="xla"):
    """Mueller viscosity sums (src/BasicSPHSolver.cu:183-225), fluid only;
    caller scales by visc*dt. fl: [pos3, mass, vel3]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        lap = kn.w_visc_laplacian(g.r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        mj = _jb(j[3])
        out_i = jnp.stack([_si(mj * tx), _si(mj * ty),
                           _si(mj * tz)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-_sj(mi * tx), -_sj(mi * ty),
                           -_sj(mi * tz)])
        return out_i, out_j

    return _run(fluid, None, fl, None, col_count, dims, None, 3, engine)


def xsph_pass(fl, col_count, dims, cfg, engine="xla"):
    """XSPH viscosity sums (src/PBDSolver.cu:89-125), fluid only; caller
    scales by c/rho0. fl: [pos3, mass, vel3]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        tx = w * (_jb(j[4]) - _ii(i[4]))
        ty = w * (_jb(j[5]) - _ii(i[5]))
        tz = w * (_jb(j[6]) - _ii(i[6]))
        mj = _jb(j[3])
        out_i = jnp.stack([_si(mj * tx), _si(mj * ty),
                           _si(mj * tz)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-_sj(mi * tx), -_sj(mi * ty),
                           -_sj(mi * tz)])
        return out_i, out_j

    return _run(fluid, None, fl, None, col_count, dims, None, 3, engine)


def _colorgrad_terms(i, j, g, w, cw, rho_ref, want_j):
    """Shared He-2014 color-field sums: [numx, numy, numz, den]."""
    volj = _jb(j[3]) / rho_ref
    cj = volj * cw
    out_i = jnp.stack([_si(cj * g.dx), _si(cj * g.dy),
                       _si(cj * g.dz), _si(volj * w)])
    if not want_j:
        return out_i, None
    voli = _ii(i[3]) / rho_ref
    ci = voli * cw
    out_j = jnp.stack([-_sj(ci * g.dx), -_sj(ci * g.dy),
                       -_sj(ci * g.dz), _sj(voli * w)])
    return out_i, out_j


def color_gradient_pass(fl, bd, col_count, dims, dims_b, cfg,
                        engine="xla"):
    """He-2014 color-field sums (src/BasicSPHSolver.cu:277-318): outputs
    [numx, numy, numz, den]; caller divides. fl/bd: [pos3, mass]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        return _colorgrad_terms(i, j, g, kn.w_cubic(g.r, h),
                                kn.grad_w_cubic_coef(g.r, h), cfg.rho0,
                                want_j)

    def bdry(i, jb):
        gb = _geom(i, jb)
        return _colorgrad_terms(i, jb, gb, kn.w_cubic(gb.r, h),
                                kn.grad_w_cubic_coef(gb.r, h),
                                cfg.rho_boundary, False)[0]

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 4, engine)


def surface_pass(fl, col_count, dims, cfg, engine="xla"):
    """Surface tension + air pressure accel (src/BasicSPHSolver.cu:332-370),
    fluid only. fl: [pos3, mass, cgx, cgy, cgz]."""
    h, eps = cfg.radius, cfg.epsilon
    rho0sq = cfg.rho0 * cfg.rho0

    def fluid(i, j, want_j):
        ci2 = i[4] * i[4] + i[5] * i[5] + i[6] * i[6]     # (..., K)
        cj2 = j[4] * j[4] + j[5] * j[5] + j[6] * j[6]
        ni = jnp.sqrt(ci2)
        gate_i = _ii(ni / jnp.maximum(eps, ni))
        g = _geom(i, j)
        cw = kn.grad_w_cubic_coef(g.r, h)
        st = (0.25 / rho0sq * cfg.surface_tension
              * (_ii(ci2) + _jb(cj2)) * kn.grad_w_surface_coef(g.r, h))
        si = st + (cfg.air_pressure / rho0sq) * gate_i * cw
        mj = _jb(j[3])
        out_i = jnp.stack([_si(mj * si * g.dx),
                           _si(mj * si * g.dy),
                           _si(mj * si * g.dz)])
        if not want_j:
            return out_i, None
        nj = jnp.sqrt(cj2)
        gate_j = _jb(nj / jnp.maximum(eps, nj))
        sj = st + (cfg.air_pressure / rho0sq) * gate_j * cw
        mi = _ii(i[3])
        out_j = jnp.stack([-_sj(mi * sj * g.dx),
                           -_sj(mi * sj * g.dy),
                           -_sj(mi * sj * g.dz)])
        return out_i, out_j

    return _run(fluid, None, fl, None, col_count, dims, None, 3, engine)


def density_alpha_pass(fl, bd, col_count, dims, dims_b, cfg,
                       engine="xla"):
    """DFSPH density + alpha terms (src/DFSPHSolver.cu:212-249): outputs
    [rho, gsumx, gsumy, gsumz, slam]; alpha computed by the caller.
    fl/bd: [pos3, mass] (slam over fluid neighbors only)."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h)
        r2c2 = cw * cw * (g.dx * g.dx + g.dy * g.dy + g.dz * g.dz)
        mj = _jb(j[3])
        mcj = mj * cw
        out_i = jnp.stack([
            _si(mj * w),
            _si(mcj * g.dx),
            _si(mcj * g.dy),
            _si(mcj * g.dz),
            _si(mj * mj * r2c2),
        ])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        mci = mi * cw
        out_j = jnp.stack([
            _sj(mi * w),
            -_sj(mci * g.dx),
            -_sj(mci * g.dy),
            -_sj(mci * g.dz),
            _sj(mi * mi * r2c2),
        ])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        mb = _jb(jb[3])
        mcb = mb * kn.grad_w_cubic_coef(gb.r, h)
        zero = _zi(gb.r)
        return jnp.stack([
            _si(mb * kn.w_cubic(gb.r, h)),
            _si(mcb * gb.dx),
            _si(mcb * gb.dy),
            _si(mcb * gb.dz),
            zero,
        ])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 5, engine)


def divergence_pass(fl, bd, col_count, dims, dims_b, cfg, engine="xla"):
    """e = sum_f m_j (v_i - v_j).gradW + sum_b m_b v_i.gradW
    (src/DFSPHSolver.cu:74-92). fl: [pos3, mass, vel3]; bd: [pos3, mass].
    The pair scalar (v_i-v_j).gradW_ij is i<->j symmetric (both factors
    flip sign), so out_j needs no negation."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        cw = kn.grad_w_cubic_coef(g.r, h)
        t = cw * ((_ii(i[4]) - _jb(j[4])) * g.dx
                  + (_ii(i[5]) - _jb(j[5])) * g.dy
                  + (_ii(i[6]) - _jb(j[6])) * g.dz)
        out_i = _si(_jb(j[3]) * t)[None]
        out_j = _sj(_ii(i[3]) * t)[None] if want_j else None
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = _jb(jb[3]) * kn.grad_w_cubic_coef(gb.r, h)
        e = _si(cwb * (_ii(i[4]) * gb.dx + _ii(i[5]) * gb.dy
                           + _ii(i[6]) * gb.dz))
        return e[None]

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 1, engine)[0]


def stiffness_accel_pass(fl, bd, col_count, dims, dims_b, cfg,
                         engine="xla"):
    """a = sum_f m_j (s_i + s_j) gradW + sum_b m_b s_i gradW — used by
    DFSPH correction (src/DFSPHSolver.cu:118-136) and, divided by rho0, by
    PBD delta-pos (src/PBDSolver.cu:170-210).
    fl: [pos3, mass, stiff]; bd: [pos3, mass]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        s = (_ii(i[4]) + _jb(j[4])) * kn.grad_w_cubic_coef(g.r, h)
        sx, sy, sz = s * g.dx, s * g.dy, s * g.dz
        mj = _jb(j[3])
        out_i = jnp.stack([_si(mj * sx), _si(mj * sy),
                           _si(mj * sz)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-_sj(mi * sx), -_sj(mi * sy),
                           -_sj(mi * sz)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        coefb = _jb(jb[3]) * _ii(i[4]) * kn.grad_w_cubic_coef(gb.r, h)
        return jnp.stack([_si(coefb * gb.dx),
                          _si(coefb * gb.dy),
                          _si(coefb * gb.dz)])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 3, engine)


def _lambda_terms(i, jf, h, rho0, want_j):
    """Shared PBD density+lambda sums: [rho, gsumx, gsumy, gsumz, slam]."""
    g = _geom(i, jf)
    w = kn.w_cubic(g.r, h)
    cw = kn.grad_w_cubic_coef(g.r, h) / rho0
    r2c2 = cw * cw * (g.dx * g.dx + g.dy * g.dy + g.dz * g.dz)
    mj = _jb(jf[3])
    mcj = mj * cw
    out_i = jnp.stack([
        _si(mj * w),
        _si(mcj * g.dx),
        _si(mcj * g.dy),
        _si(mcj * g.dz),
        _si(mj * mj * r2c2),
    ])
    if not want_j:
        return out_i, None
    mi = _ii(i[3])
    mci = mi * cw
    out_j = jnp.stack([
        _sj(mi * w),
        -_sj(mci * g.dx),
        -_sj(mci * g.dy),
        -_sj(mci * g.dz),
        _sj(mi * mi * r2c2),
    ])
    return out_i, out_j


def pbd_lambda_pass(fl, bd, col_count, dims, dims_b, cfg, engine="xla"):
    """PBD density + lambda terms (src/PBDSolver.cu:127-168): outputs
    [rho, gsumx, gsumy, gsumz, slam]; both fluid and boundary use the SAME
    contribution form (the reference calls one device fn for both).
    fl/bd: [pos3, mass]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        return _lambda_terms(i, j, h, cfg.rho0, want_j)

    def bdry(i, jb):
        return _lambda_terms(i, jb, h, cfg.rho0, False)[0]

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 5, engine)


# ----------------------------------------------------------------------
# fused passes — multiple physics sums that read the same candidate
# streams share one traversal (the round-1/2 perf lever: per-pair kernel
# evaluation and candidate traffic dominate; extra reductions are cheap)
# ----------------------------------------------------------------------

def density_colorgrad_pass(fl, bd, col_count, dims, dims_b, cfg,
                           engine="xla"):
    """Fused rho (src/BasicSPHSolver.cu:54-83) + color-field sums
    (ibid:277-318) — both read only [pos3, mass], so one traversal serves
    both. Outputs [rho, numx, numy, numz, den]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h)
        rho_i = _si(_jb(j[3]) * w)[None]
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([rho_i, cg_i])
        if not want_j:
            return out_i, None
        rho_j = _sj(_ii(i[3]) * w)[None]
        return out_i, jnp.concatenate([rho_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        rho_i = _si(_jb(jb[3]) * w)[None]
        cg_i = _colorgrad_terms(i, jb, gb, w, cw, cfg.rho_boundary,
                                False)[0]
        return jnp.concatenate([rho_i, cg_i])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 5, engine)


def density_colorgrad_visc_pass(fl, bd, col_count, dims, dims_b, cfg,
                                engine="xla"):
    """Fused rho + color-field + Mueller-viscosity sums — one traversal of
    [pos3, mass, vel3] serves all three (rho/colorgrad read positions only;
    the viscosity sum over velocity DIFFERENCES is invariant to the uniform
    gravity shift applied between them in the reference's kernel order,
    src/BasicSPHSolver.cu:237-260). Outputs
    [rho, numx, numy, numz, den, dvx, dvy, dvz]; caller scales dv by
    visc*dt. Boundary contributes to rho + colorgrad only."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h)
        lap = kn.w_visc_laplacian(g.r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        mj = _jb(j[3])
        rho_i = _si(mj * w)[None]
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        dv_i = jnp.stack([_si(mj * tx), _si(mj * ty),
                          _si(mj * tz)])
        out_i = jnp.concatenate([rho_i, cg_i, dv_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        rho_j = _sj(mi * w)[None]
        dv_j = jnp.stack([-_sj(mi * tx), -_sj(mi * ty),
                          -_sj(mi * tz)])
        return out_i, jnp.concatenate([rho_j, cg_j, dv_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        rho_i = _si(_jb(jb[3]) * w)[None]
        cg_i = _colorgrad_terms(i, jb, gb, w, cw, cfg.rho_boundary,
                                False)[0]
        zero3 = jnp.stack([_zi(gb.r)] * 3)
        return jnp.concatenate([rho_i, cg_i, zero3])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 8, engine)


def density_visc_pass(fl, bd, col_count, dims, dims_b, cfg, engine="xla"):
    """Fused rho + Mueller-viscosity sums (the surface-off WCSPH first
    traversal). fl: [pos3, mass, vel3]; bd: [pos3, mass]. Outputs
    [rho, dvx, dvy, dvz]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        lap = kn.w_visc_laplacian(g.r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        mj = _jb(j[3])
        out_i = jnp.stack([_si(mj * w), _si(mj * tx),
                           _si(mj * ty), _si(mj * tz)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([_sj(mi * w), -_sj(mi * tx),
                           -_sj(mi * ty), -_sj(mi * tz)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        rho_i = _si(_jb(jb[3]) * kn.w_cubic(gb.r, h))
        zero = jnp.zeros_like(rho_i)
        return jnp.stack([rho_i, zero, zero, zero])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 4, engine)


def surface_pressure_pass(fl, bd, col_count, dims, dims_b, cfg,
                          engine="xla"):
    """Fused surface tension/air pressure (src/BasicSPHSolver.cu:332-370)
    + symmetric pressure accel (ibid:113-165) — the second WCSPH traversal;
    both read [pos3, mass] plus per-particle fields computed between
    traversals. fl: [pos3, mass, rho, p, cgx, cgy, cgz]. Outputs
    [sax, say, saz, pax, pay, paz] (pa WITHOUT the MAX_A clamp, applied
    elementwise by the caller). Boundary contributes to pressure only."""
    h, eps = cfg.radius, cfg.epsilon
    rho0sq = cfg.rho0 * cfg.rho0

    def fluid(i, j, want_j):
        g = _geom(i, j)
        cw = kn.grad_w_cubic_coef(g.r, h)
        # surface terms
        ci2 = i[6] * i[6] + i[7] * i[7] + i[8] * i[8]
        cj2 = j[6] * j[6] + j[7] * j[7] + j[8] * j[8]
        ni = jnp.sqrt(ci2)
        gate_i = _ii(ni / jnp.maximum(eps, ni))
        st = (0.25 / rho0sq * cfg.surface_tension
              * (_ii(ci2) + _jb(cj2)) * kn.grad_w_surface_coef(g.r, h))
        si = st + (cfg.air_pressure / rho0sq) * gate_i * cw
        # pressure terms
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        over_j = _jb(j[5] / jnp.maximum(eps, j[4] * j[4]))
        ps = (over_i + over_j) * cw
        mj = _jb(j[3])
        out_i = jnp.stack([
            _si(mj * si * g.dx), _si(mj * si * g.dy),
            _si(mj * si * g.dz),
            -_si(mj * ps * g.dx), -_si(mj * ps * g.dy),
            -_si(mj * ps * g.dz),
        ])
        if not want_j:
            return out_i, None
        nj = jnp.sqrt(cj2)
        gate_j = _jb(nj / jnp.maximum(eps, nj))
        sj = st + (cfg.air_pressure / rho0sq) * gate_j * cw
        mi = _ii(i[3])
        out_j = jnp.stack([
            -_sj(mi * sj * g.dx), -_sj(mi * sj * g.dy),
            -_sj(mi * sj * g.dz),
            _sj(mi * ps * g.dx), _sj(mi * ps * g.dy),
            _sj(mi * ps * g.dz),
        ])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = kn.grad_w_cubic_coef(gb.r, h)
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        coefb = -_jb(jb[3]) * over_i * cwb
        zero = _zi(gb.r)
        return jnp.stack([zero, zero, zero,
                          _si(coefb * gb.dx),
                          _si(coefb * gb.dy),
                          _si(coefb * gb.dz)])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 6, engine)


def xsph_colorgrad_pass(fl, bd, col_count, dims, dims_b, cfg,
                        engine="xla"):
    """Fused XSPH viscosity (src/PBDSolver.cu:89-125) + color-field sums
    (src/BasicSPHSolver.cu:277-318) — both read [pos3, mass, vel3] /
    [pos3, mass] at the same positions in the PBD step. Outputs
    [dvx, dvy, dvz, numx, numy, numz, den]; caller scales dv by c/rho0.
    Boundary contributes to the color field only."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h)
        tx = w * (_jb(j[4]) - _ii(i[4]))
        ty = w * (_jb(j[5]) - _ii(i[5]))
        tz = w * (_jb(j[6]) - _ii(i[6]))
        mj = _jb(j[3])
        dv_i = jnp.stack([_si(mj * tx), _si(mj * ty),
                          _si(mj * tz)])
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([dv_i, cg_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        dv_j = jnp.stack([-_sj(mi * tx), -_sj(mi * ty),
                          -_sj(mi * tz)])
        return out_i, jnp.concatenate([dv_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        cg_i = _colorgrad_terms(i, jb, gb, kn.w_cubic(gb.r, h),
                                kn.grad_w_cubic_coef(gb.r, h),
                                cfg.rho_boundary, False)[0]
        zero3 = jnp.stack([_zi(gb.r)] * 3)
        return jnp.concatenate([zero3, cg_i])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 7, engine)


def density_alpha_colorgrad_pass(fl, bd, col_count, dims, dims_b, cfg,
                                 engine="xla"):
    """Fused DFSPH rho+alpha terms (src/DFSPHSolver.cu:212-249) + color
    field (src/BasicSPHSolver.cu:277-318), one traversal of [pos3, mass].
    Outputs [rho, gsumx, gsumy, gsumz, slam, numx, numy, numz, den]."""
    h = cfg.radius

    def fluid(i, j, want_j):
        g = _geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h)
        r2c2 = cw * cw * (g.dx * g.dx + g.dy * g.dy + g.dz * g.dz)
        mj = _jb(j[3])
        mcj = mj * cw
        da_i = jnp.stack([
            _si(mj * w),
            _si(mcj * g.dx),
            _si(mcj * g.dy),
            _si(mcj * g.dz),
            _si(mj * mj * r2c2),
        ])
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([da_i, cg_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        mci = mi * cw
        da_j = jnp.stack([
            _sj(mi * w),
            -_sj(mci * g.dx),
            -_sj(mci * g.dy),
            -_sj(mci * g.dz),
            _sj(mi * mi * r2c2),
        ])
        return out_i, jnp.concatenate([da_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        mb = _jb(jb[3])
        mcb = mb * cw
        zero = _zi(gb.r)
        da_i = jnp.stack([
            _si(mb * w),
            _si(mcb * gb.dx),
            _si(mcb * gb.dy),
            _si(mcb * gb.dz),
            zero,
        ])
        cg_i = _colorgrad_terms(i, jb, gb, w, cw, cfg.rho_boundary,
                                False)[0]
        return jnp.concatenate([da_i, cg_i])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 9, engine)
