"""Neighbor-pass bodies + three executors (Pallas columns / fused XLA).

Replaces the reference's per-thread 27-cell scans (src/BasicSPHSolver.cu:62-70
et al.). Each physics pass is defined by TERM functions — pair math in
vector-component form (a (...,3) axis would split XLA fusions and
materialise the pair tensor):

  * ``fluid_terms(i, j, want_j) -> (out_i, out_j | None)`` — the fluid-fluid
    pair block; ``out_i`` reduces over the j axis (axis -1), ``out_j`` over
    the i axis (axis -2). The j-side reduction is the Newton's-third-law
    mirror (W symmetric, grad W antisymmetric, mass weight swapped), so one
    pair-block evaluation serves both particles of each pair.
  * ``bd_terms(i, jb) -> out_i`` — the fluid-boundary block (one-sided:
    boundary particles are static and receive no forces).

Executors:

  * ``column_pass`` (engine='pallas'/'interpret'): one program per (x, y)
    cell column over BlockSpec-pipelined candidate tensors built by
    ``build_i``/``build_j``; the (CZ, K, 27K) pair blocks live in VMEM and
    never touch HBM, and empty columns are skipped via a scalar-prefetched
    occupancy table. The high-performance path on direct TPU runtimes.
  * ``column_pass_xla_sym`` (engine='xla'): HALF-stencil loop — 13 offsets
    + the self offset instead of 27; each fluid pair block is evaluated
    once and reduced along both axes, the j-side partials shifted to their
    home cells by a static pad + dynamic-slice (no gathers). Boundary
    blocks keep the full 27 offsets (both o and 26-o folded into the same
    iteration). ~Halves pair-kernel work and pair-stream traffic vs the
    27-offset loop. The fast path on runtimes where Pallas custom-calls
    are slow (e.g. the axon relay).
  * ``column_pass_xla`` (engine='xla27'): the plain 27-offset loop, kept
    as a differential-testing oracle for the symmetric executor.

Bodies are shape-generic over the candidate width and the leading axis, so
the same physics definition serves all executors (differentially tested).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..parallel.mesh import constrain_axis
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
# geometry helper used by all bodies
# ----------------------------------------------------------------------

class Pair(NamedTuple):
    dx: jnp.ndarray   # (..., K, Kj) i - j separations per component
    dy: jnp.ndarray
    dz: jnp.ndarray
    r: jnp.ndarray


def _geom(i, j) -> Pair:
    """i, j: stacked field tensors whose first three rows are position
    components. Returns pair separations/distance (..., K, Kj)."""
    dx = i[0][:, :, None] - j[0][:, None, :]
    dy = i[1][:, :, None] - j[1][:, None, :]
    dz = i[2][:, :, None] - j[2][:, None, :]
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return Pair(dx, dy, dz, r)


def _jb(v):
    return v[:, None, :]


def _ii(v):
    return v[:, :, None]


# ----------------------------------------------------------------------
# executors over term functions
# ----------------------------------------------------------------------

def column_pass_xla(
    body: Callable,
    fl: jnp.ndarray,                  # (Fi, GX, GY, GZ, K) ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, GX, GY, GZ, Kb) ghosted
    dims_b: Optional[DenseDims] = None,
) -> jnp.ndarray:
    """Plain 27-offset XLA executor: loop over the stencil offsets, each a
    dynamic slice of the ghosted dense grid (zero gathers), with the pair
    math fusing into a single producer->reduce loop per offset. Kept as the
    differential-testing oracle for ``column_pass_xla_sym``.

    The bodies are shape-generic: here i/j leaves are (C, K)/(C, Kj) with
    C = CX*CY*CZ flattened cells instead of per-column (CZ, K).
    """
    fi = fl.shape[0]
    c = dims.cx * dims.cy * dims.cz
    i_flat = fl[:, 1:-1, 1:-1, 1:-1, :].reshape(fi, c, dims.k)
    has_b = bd is not None

    offs = jnp.asarray(_OFFS)

    def offset_slice(dense, o, k):
        f = dense.shape[0]
        sl = jax.lax.dynamic_slice(
            dense, (0, offs[o, 0], offs[o, 1], offs[o, 2], 0),
            (f, dims.cx, dims.cy, dims.cz, k))
        return sl.reshape(f, c, k)

    def fold(o, acc):
        j_o = offset_slice(fl, o, dims.k)
        jb_o = offset_slice(bd, o, dims_b.k) if has_b else None
        return acc + body(i_flat, j_o, jb_o)

    acc = jax.lax.fori_loop(
        0, 27, fold, jnp.zeros((n_out, c, dims.k), F32))
    core = acc.reshape(n_out, dims.cx, dims.cy, dims.cz, dims.k)
    return constrain_axis(
        jnp.pad(core, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), 1)


def column_pass_xla_sym(
    fluid_terms: Callable,
    bd_terms: Optional[Callable],
    fl: jnp.ndarray,                  # (Fi, GX, GY, GZ, K) ghosted
    dims: DenseDims,
    n_out: int,
    bd: Optional[jnp.ndarray] = None,  # (Fb, GX, GY, GZ, Kb) ghosted
    dims_b: Optional[DenseDims] = None,
) -> jnp.ndarray:
    """Symmetric half-stencil XLA executor.

    For each of the 13 half offsets d, the fluid pair block (i in cell c,
    j in cell c+d) is evaluated once; the j-axis reduction lands on the
    i cells directly, and the i-axis reduction (the Newton's-third-law
    mirror) is shifted by +d via one pad + dynamic-slice and accumulated —
    covering the reverse offset 26-o without re-evaluating the block. The
    self offset (o=13) uses the i-reduction only: its full block already
    contains both orderings of each within-cell pair. Boundary blocks are
    one-sided and keep all 27 offsets (o and 26-o folded per iteration).
    """
    fi = fl.shape[0]
    cx, cy, cz, k = dims.cx, dims.cy, dims.cz, dims.k
    c = cx * cy * cz
    i_flat = fl[:, 1:-1, 1:-1, 1:-1, :].reshape(fi, c, k)
    has_b = bd is not None and bd_terms is not None

    offs = jnp.asarray(_OFFS)

    def slc(dense, o, kk):
        f = dense.shape[0]
        sl = jax.lax.dynamic_slice(
            dense, (0, offs[o, 0], offs[o, 1], offs[o, 2], 0),
            (f, cx, cy, cz, kk))
        return sl.reshape(f, c, kk)

    # self offset: i-reduction over the full within-cell block
    acc = fluid_terms(i_flat, i_flat, False)[0]
    if has_b:
        acc = acc + bd_terms(i_flat, slc(bd, 13, dims_b.k))
    acc5 = acc.reshape(n_out, cx, cy, cz, k)

    def fold(o, a5):
        out_i, out_j = fluid_terms(i_flat, slc(fl, o, k), True)
        a5 = a5 + out_i.reshape(n_out, cx, cy, cz, k)
        # j-side partials: value at i-cell c belongs to j-cell c+d; shift
        # by +d = slice the ghost-padded array at start 2-offs[o]
        ojg = jnp.pad(out_j.reshape(n_out, cx, cy, cz, k),
                      ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        a5 = a5 + jax.lax.dynamic_slice(
            ojg, (0, 2 - offs[o, 0], 2 - offs[o, 1], 2 - offs[o, 2], 0),
            a5.shape)
        if has_b:
            a5 = a5 + (bd_terms(i_flat, slc(bd, o, dims_b.k))
                       + bd_terms(i_flat, slc(bd, 26 - o, dims_b.k))
                       ).reshape(n_out, cx, cy, cz, k)
        return a5

    acc5 = jax.lax.fori_loop(0, 13, fold, acc5)
    return constrain_axis(
        jnp.pad(acc5, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))), 1)


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

    fl: ghosted fluid dense (F, GX, GY, GZ, K) — or, for 'xlac', the
    compact (F, NCO+1, GZ, K) tensor with col_count = (CompactIndex, NCO).
    bd: for the XLA executors the ghosted boundary dense
    (Fb, GX, GY, GZ, Kb); for 'pallas' / 'interpret' the PREBUILT
    candidate tensor (NC, Fb, CZ, 27Kb) from build_j. Returns a ghosted
    (n_out, GX, GY, GZ, K) result ('xlac': compact (n_out, NCO+1, GZ, K))."""
    if engine == "xlac":
        from .compact import compact_pass
        idxc, nco = col_count
        return compact_pass(fluid_terms, bd_terms, fl, idxc, dims, nco,
                            n_out, bd, dims_b)
    if isinstance(fl, tuple):
        # group splitting only pays on the compacted layout (gather
        # hoisting); the dense executors take one stacked tensor
        fl = jnp.concatenate(fl, 0)
    if engine == "xla":
        return column_pass_xla_sym(fluid_terms, bd_terms, fl, dims, n_out,
                                   bd, dims_b)
    if engine == "xla27":
        return column_pass_xla(_std_body(fluid_terms, bd_terms), fl, dims,
                               n_out, bd, dims_b)
    i_cols = build_i(fl, dims)
    j_cols = build_j(fl, dims)
    out = column_pass(_std_body(fluid_terms, bd_terms), i_cols, j_cols,
                      col_count, dims, n_out, bd, dims_b,
                      interpret=(engine == "interpret"))
    return cols_to_ghosted(out, dims)


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
        out_i = jnp.sum(_jb(j[3]) * w, -1)[None]
        out_j = jnp.sum(_ii(i[3]) * w, -2)[None] if want_j else None
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        return jnp.sum(_jb(jb[3]) * kn.w_cubic(gb.r, h), -1)[None]

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
        out_i = jnp.stack([-jnp.sum(mj * sx, -1), -jnp.sum(mj * sy, -1),
                           -jnp.sum(mj * sz, -1)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([jnp.sum(mi * sx, -2), jnp.sum(mi * sy, -2),
                           jnp.sum(mi * sz, -2)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = kn.grad_w_cubic_coef(gb.r, h)
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        coefb = -_jb(jb[3]) * over_i * cwb
        return jnp.stack([jnp.sum(coefb * gb.dx, -1),
                          jnp.sum(coefb * gb.dy, -1),
                          jnp.sum(coefb * gb.dz, -1)])

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
        out_i = jnp.stack([jnp.sum(mj * tx, -1), jnp.sum(mj * ty, -1),
                           jnp.sum(mj * tz, -1)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-jnp.sum(mi * tx, -2), -jnp.sum(mi * ty, -2),
                           -jnp.sum(mi * tz, -2)])
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
        out_i = jnp.stack([jnp.sum(mj * tx, -1), jnp.sum(mj * ty, -1),
                           jnp.sum(mj * tz, -1)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-jnp.sum(mi * tx, -2), -jnp.sum(mi * ty, -2),
                           -jnp.sum(mi * tz, -2)])
        return out_i, out_j

    return _run(fluid, None, fl, None, col_count, dims, None, 3, engine)


def _colorgrad_terms(i, j, g, w, cw, rho_ref, want_j):
    """Shared He-2014 color-field sums: [numx, numy, numz, den]."""
    volj = _jb(j[3]) / rho_ref
    cj = volj * cw
    out_i = jnp.stack([jnp.sum(cj * g.dx, -1), jnp.sum(cj * g.dy, -1),
                       jnp.sum(cj * g.dz, -1), jnp.sum(volj * w, -1)])
    if not want_j:
        return out_i, None
    voli = _ii(i[3]) / rho_ref
    ci = voli * cw
    out_j = jnp.stack([-jnp.sum(ci * g.dx, -2), -jnp.sum(ci * g.dy, -2),
                       -jnp.sum(ci * g.dz, -2), jnp.sum(voli * w, -2)])
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
        out_i = jnp.stack([jnp.sum(mj * si * g.dx, -1),
                           jnp.sum(mj * si * g.dy, -1),
                           jnp.sum(mj * si * g.dz, -1)])
        if not want_j:
            return out_i, None
        nj = jnp.sqrt(cj2)
        gate_j = _jb(nj / jnp.maximum(eps, nj))
        sj = st + (cfg.air_pressure / rho0sq) * gate_j * cw
        mi = _ii(i[3])
        out_j = jnp.stack([-jnp.sum(mi * sj * g.dx, -2),
                           -jnp.sum(mi * sj * g.dy, -2),
                           -jnp.sum(mi * sj * g.dz, -2)])
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
            jnp.sum(mj * w, -1),
            jnp.sum(mcj * g.dx, -1),
            jnp.sum(mcj * g.dy, -1),
            jnp.sum(mcj * g.dz, -1),
            jnp.sum(mj * mj * r2c2, -1),
        ])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        mci = mi * cw
        out_j = jnp.stack([
            jnp.sum(mi * w, -2),
            -jnp.sum(mci * g.dx, -2),
            -jnp.sum(mci * g.dy, -2),
            -jnp.sum(mci * g.dz, -2),
            jnp.sum(mi * mi * r2c2, -2),
        ])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        mb = _jb(jb[3])
        mcb = mb * kn.grad_w_cubic_coef(gb.r, h)
        zero = jnp.zeros(gb.r.shape[:-1], F32)
        return jnp.stack([
            jnp.sum(mb * kn.w_cubic(gb.r, h), -1),
            jnp.sum(mcb * gb.dx, -1),
            jnp.sum(mcb * gb.dy, -1),
            jnp.sum(mcb * gb.dz, -1),
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
        out_i = jnp.sum(_jb(j[3]) * t, -1)[None]
        out_j = jnp.sum(_ii(i[3]) * t, -2)[None] if want_j else None
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = _jb(jb[3]) * kn.grad_w_cubic_coef(gb.r, h)
        e = jnp.sum(cwb * (_ii(i[4]) * gb.dx + _ii(i[5]) * gb.dy
                           + _ii(i[6]) * gb.dz), -1)
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
        out_i = jnp.stack([jnp.sum(mj * sx, -1), jnp.sum(mj * sy, -1),
                           jnp.sum(mj * sz, -1)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([-jnp.sum(mi * sx, -2), -jnp.sum(mi * sy, -2),
                           -jnp.sum(mi * sz, -2)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        coefb = _jb(jb[3]) * _ii(i[4]) * kn.grad_w_cubic_coef(gb.r, h)
        return jnp.stack([jnp.sum(coefb * gb.dx, -1),
                          jnp.sum(coefb * gb.dy, -1),
                          jnp.sum(coefb * gb.dz, -1)])

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
        jnp.sum(mj * w, -1),
        jnp.sum(mcj * g.dx, -1),
        jnp.sum(mcj * g.dy, -1),
        jnp.sum(mcj * g.dz, -1),
        jnp.sum(mj * mj * r2c2, -1),
    ])
    if not want_j:
        return out_i, None
    mi = _ii(i[3])
    mci = mi * cw
    out_j = jnp.stack([
        jnp.sum(mi * w, -2),
        -jnp.sum(mci * g.dx, -2),
        -jnp.sum(mci * g.dy, -2),
        -jnp.sum(mci * g.dz, -2),
        jnp.sum(mi * mi * r2c2, -2),
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
        rho_i = jnp.sum(_jb(j[3]) * w, -1)[None]
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([rho_i, cg_i])
        if not want_j:
            return out_i, None
        rho_j = jnp.sum(_ii(i[3]) * w, -2)[None]
        return out_i, jnp.concatenate([rho_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        rho_i = jnp.sum(_jb(jb[3]) * w, -1)[None]
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
        rho_i = jnp.sum(mj * w, -1)[None]
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        dv_i = jnp.stack([jnp.sum(mj * tx, -1), jnp.sum(mj * ty, -1),
                          jnp.sum(mj * tz, -1)])
        out_i = jnp.concatenate([rho_i, cg_i, dv_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        rho_j = jnp.sum(mi * w, -2)[None]
        dv_j = jnp.stack([-jnp.sum(mi * tx, -2), -jnp.sum(mi * ty, -2),
                          -jnp.sum(mi * tz, -2)])
        return out_i, jnp.concatenate([rho_j, cg_j, dv_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        rho_i = jnp.sum(_jb(jb[3]) * w, -1)[None]
        cg_i = _colorgrad_terms(i, jb, gb, w, cw, cfg.rho_boundary,
                                False)[0]
        zero3 = jnp.zeros((3,) + gb.r.shape[:-1], F32)
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
        out_i = jnp.stack([jnp.sum(mj * w, -1), jnp.sum(mj * tx, -1),
                           jnp.sum(mj * ty, -1), jnp.sum(mj * tz, -1)])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        out_j = jnp.stack([jnp.sum(mi * w, -2), -jnp.sum(mi * tx, -2),
                           -jnp.sum(mi * ty, -2), -jnp.sum(mi * tz, -2)])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        rho_i = jnp.sum(_jb(jb[3]) * kn.w_cubic(gb.r, h), -1)
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
            jnp.sum(mj * si * g.dx, -1), jnp.sum(mj * si * g.dy, -1),
            jnp.sum(mj * si * g.dz, -1),
            -jnp.sum(mj * ps * g.dx, -1), -jnp.sum(mj * ps * g.dy, -1),
            -jnp.sum(mj * ps * g.dz, -1),
        ])
        if not want_j:
            return out_i, None
        nj = jnp.sqrt(cj2)
        gate_j = _jb(nj / jnp.maximum(eps, nj))
        sj = st + (cfg.air_pressure / rho0sq) * gate_j * cw
        mi = _ii(i[3])
        out_j = jnp.stack([
            -jnp.sum(mi * sj * g.dx, -2), -jnp.sum(mi * sj * g.dy, -2),
            -jnp.sum(mi * sj * g.dz, -2),
            jnp.sum(mi * ps * g.dx, -2), jnp.sum(mi * ps * g.dy, -2),
            jnp.sum(mi * ps * g.dz, -2),
        ])
        return out_i, out_j

    def bdry(i, jb):
        gb = _geom(i, jb)
        cwb = kn.grad_w_cubic_coef(gb.r, h)
        over_i = _ii(i[5] / jnp.maximum(eps, i[4] * i[4]))
        coefb = -_jb(jb[3]) * over_i * cwb
        zero = jnp.zeros(gb.r.shape[:-1], F32)
        return jnp.stack([zero, zero, zero,
                          jnp.sum(coefb * gb.dx, -1),
                          jnp.sum(coefb * gb.dy, -1),
                          jnp.sum(coefb * gb.dz, -1)])

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
        dv_i = jnp.stack([jnp.sum(mj * tx, -1), jnp.sum(mj * ty, -1),
                          jnp.sum(mj * tz, -1)])
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([dv_i, cg_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        dv_j = jnp.stack([-jnp.sum(mi * tx, -2), -jnp.sum(mi * ty, -2),
                          -jnp.sum(mi * tz, -2)])
        return out_i, jnp.concatenate([dv_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        cg_i = _colorgrad_terms(i, jb, gb, kn.w_cubic(gb.r, h),
                                kn.grad_w_cubic_coef(gb.r, h),
                                cfg.rho_boundary, False)[0]
        zero3 = jnp.zeros((3,) + gb.r.shape[:-1], F32)
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
            jnp.sum(mj * w, -1),
            jnp.sum(mcj * g.dx, -1),
            jnp.sum(mcj * g.dy, -1),
            jnp.sum(mcj * g.dz, -1),
            jnp.sum(mj * mj * r2c2, -1),
        ])
        cg_i, cg_j = _colorgrad_terms(i, j, g, w, cw, cfg.rho0, want_j)
        out_i = jnp.concatenate([da_i, cg_i])
        if not want_j:
            return out_i, None
        mi = _ii(i[3])
        mci = mi * cw
        da_j = jnp.stack([
            jnp.sum(mi * w, -2),
            -jnp.sum(mci * g.dx, -2),
            -jnp.sum(mci * g.dy, -2),
            -jnp.sum(mci * g.dz, -2),
            jnp.sum(mi * mi * r2c2, -2),
        ])
        return out_i, jnp.concatenate([da_j, cg_j])

    def bdry(i, jb):
        gb = _geom(i, jb)
        w = kn.w_cubic(gb.r, h)
        cw = kn.grad_w_cubic_coef(gb.r, h)
        mb = _jb(jb[3])
        mcb = mb * cw
        zero = jnp.zeros(gb.r.shape[:-1], F32)
        da_i = jnp.stack([
            jnp.sum(mb * w, -1),
            jnp.sum(mcb * gb.dx, -1),
            jnp.sum(mcb * gb.dy, -1),
            jnp.sum(mcb * gb.dz, -1),
            zero,
        ])
        cg_i = _colorgrad_terms(i, jb, gb, w, cw, cfg.rho_boundary,
                                False)[0]
        return jnp.concatenate([da_i, cg_i])

    return _run(fluid, bdry, fl, bd, col_count, dims, dims_b, 9, engine)
