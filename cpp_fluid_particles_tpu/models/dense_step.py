"""Dense-layout solver steps — the fast path for all three solvers.

Same physics contract as models/{wcsph,dfsph,pbd}.py (each formula cites the
same reference lines), but the per-step state lives in a lane-major grid —
the full ghosted domain (ops/dense.py) or the sliding fluid bounding box
(ops/box.py, the default) — with one stacked scatter in, all neighbor
passes through the executors in ops/pallas_passes.py, every intermediate
update elementwise in grid space, and one stacked gather out. No per-pass
scatter/gather round trips, no XLA row gathers.

Safety invariants used throughout: empty slots carry POS_PAD positions and
zero masses, so (a) every pair term vanishes against them (mass_j factor +
kernels zero outside support), and (b) a slot is "real" iff its x-position
is < POS_GUARD, which gates the elementwise position clamps.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops import box as bx
from ..ops import pallas_passes as pp
from ..ops.dense import (
    DenseDims,
    DenseIndex,
    build_dense_index,
    dims_for,
    fill_dense,
    flat_to_ghost5,
    read_dense,
)
from ..ops.grid import POS_PAD
from ..parallel.mesh import shard_particles
from ..state import FluidState
from . import dfsph as dfsph_mod
from .common import cheb_next as _cheb_next
from . import pbd as pbd_mod

F32 = jnp.float32
POS_GUARD = POS_PAD / 2.0


class Layout(NamedTuple):
    """Engine-dispatched grid layout for one step."""

    idx: Any                 # DenseIndex | BoxIndex
    colc: Any                # occupancy table for the Pallas executors
    fill: Any                # (fields, fills) -> stacked grid tensor
    read: Any                # grid tensor -> (F, N)
    dims: DenseDims          # effective fluid grid dims for passes
    dims_b: DenseDims        # effective boundary dims for passes
    bd: Any                  # boundary operand for passes (or None)
    touch: Any               # int32: real boundary slots in the window
    #                          (1-sentinel for full-domain engines, whose
    #                           window is the whole boundary grid)


def _layout(pos, cfg, dims, dims_b, scene_d, engine, box,
            use_bd: bool = True) -> Layout:
    """'xlab' runs the flat lane-major executors over a sliding fluid
    bounding box (ops/box.py, box = static (BX, BY, BZ) size); the other
    engines use the full ghosted dense grid (ops/dense.py).

    use_bd=False (xlab only — cfg.skip_empty_boundary): the passes get
    bd=None (executors skip the boundary folds entirely) and only posx of
    the boundary window is sliced to count real boundary slots. The
    Simulation selects this program while `touch` stays 0 and re-runs any
    chunk in which the window reached a wall; with an empty window the
    removed folds are exact zeros, so the two programs agree up to f32
    summation order (XLA tiles the fluid reduce fusions differently)."""
    if engine == "xlab":
        assert box is not None, "engine='xlab' requires the box size"
        bdims = DenseDims(box[0], box[1], box[2], dims.k)
        bdims_b = DenseDims(box[0], box[1], box[2], dims_b.k)
        idx = bx.build_box_index(pos, cfg, dims, bdims)
        if use_bd:
            bdx = bx.slice_boundary_box(scene_d.bd, dims, bdims, dims_b.k,
                                        idx.origin)
            row0 = bdx[0]
        else:
            bdx = None
            row0 = bx.slice_boundary_box(scene_d.bd[0:1], dims, bdims,
                                         dims_b.k, idx.origin)[0]
        touch = jnp.sum(row0 < POS_GUARD).astype(jnp.int32)
        return Layout(
            idx=idx, colc=None,
            fill=lambda fields, fills: bx.fill_box(idx, fields, fills,
                                                   bdims, cfg.box_fill),
            read=lambda arr: bx.read_box(idx, arr),
            dims=bdims, dims_b=bdims_b, bd=bdx, touch=touch)
    idx = build_dense_index(pos, cfg, dims)
    bd = scene_d.bd if engine in ("xla", "xla27") else scene_d.bd_jcols
    return Layout(
        idx=idx, colc=idx.col_count,
        fill=lambda fields, fills: fill_dense(idx, fields, fills, dims),
        read=lambda arr: read_dense(idx, arr),
        dims=dims, dims_b=dims_b, bd=bd, touch=jnp.int32(1))


def _base_metrics(idx, touch=None):
    if isinstance(idx, bx.BoxIndex):
        m = {"grid_overflow": idx.overflow,
             "box_overflow": idx.box_overflow,
             "box_ext": idx.ext,
             "active_cells": jnp.prod(idx.ext),
             "max_occupancy": idx.max_occupancy,
             "win_ext": idx.hi_ext}
    else:
        m = {"grid_overflow": idx.overflow,
             "box_overflow": jnp.int32(0),
             "box_ext": jnp.zeros((3,), jnp.int32),
             "active_cells": jnp.sum(idx.col_count > 0),
             "max_occupancy": idx.max_occupancy,
             "win_ext": jnp.zeros((3,), jnp.int32)}
    m["bd_touch"] = jnp.int32(1) if touch is None else touch
    # the plain programs never window-overflow; win_ext carries the
    # over-K_a cell extents that drive the occupancy-split policy
    m["win_overflow"] = jnp.int32(0)
    # packed copy of the auto-capacity scalars: ONE host fetch syncs the
    # step and reads all of them (each separate fetch is a full relay
    # round trip, ~45 ms on the tunneled runtime)
    m["capacity"] = jnp.concatenate([
        jnp.stack([m["grid_overflow"], m["box_overflow"],
                   m["max_occupancy"]]), m["box_ext"],
        m["bd_touch"][None], m["win_overflow"][None], m["win_ext"]])
    return m


class DenseScene(NamedTuple):
    """Static boundary data [posx, posy, posz, mass]: ghosted dense form
    (for the XLA executors) and the prebuilt candidate tensor
    (NC, 4, CZ, 27Kb) for the Pallas column kernels — only materialised
    (27x the ghosted size) when a Pallas engine is selected."""

    bd: jnp.ndarray
    bd_jcols: Optional[jnp.ndarray]


def build_dense_scene(cfg: SimConfig, b_pos: np.ndarray, kb: int,
                      engine: str = "xla") -> DenseScene:
    """Akinci boundary mass (src/SPHSystem.cu:92-105) computed with the
    boundary grid itself as the only neighbor source."""
    dims_b = dims_for(cfg, kb)
    b_pos = jnp.asarray(b_pos, F32)
    idx = build_dense_index(b_pos, cfg, dims_b)
    ones = jnp.ones((b_pos.shape[0],), F32)
    fl = fill_dense(idx, [b_pos[:, 0], b_pos[:, 1], b_pos[:, 2], ones],
                    [POS_PAD, POS_PAD, POS_PAD, 0.0], dims_b)
    # the "boundary" j-source contributes nothing here (zero masses): the
    # W-sum runs boundary-vs-boundary through the fluid slot
    zero_bd = fl.at[3].set(0.0)
    if engine in ("xla", "xla27", "xlab"):
        # one-time setup: the plain dense executor serves all XLA engines
        # (xlab dynamic-slices the same flat bd tensor per step)
        engine = "xla"
    else:
        zero_bd = pp.build_j(flat_to_ghost5(zero_bd, dims_b), dims_b)
    wsum = pp.density_pass(fl, zero_bd, idx.col_count, dims_b,
                           dims_b, cfg, engine)
    b_mass = cfg.rho_boundary / jnp.maximum(cfg.epsilon,
                                            read_dense(idx, wsum[None])[0])
    bd = fill_dense(idx, [b_pos[:, 0], b_pos[:, 1], b_pos[:, 2], b_mass],
                    [POS_PAD, POS_PAD, POS_PAD, 0.0], dims_b)
    jcols = None if engine == "xla" else pp.build_j(
        flat_to_ghost5(bd, dims_b), dims_b)
    return DenseScene(bd=bd, bd_jcols=jcols)


def boundary_k(b_pos: np.ndarray, cfg: SimConfig) -> int:
    coords = np.floor_divide(np.asarray(b_pos), cfg.cell_length).astype(np.int64)
    cx, cy, cz = cfg.cell_size
    flat = (coords[:, 0] * cy + coords[:, 1]) * cz + coords[:, 2]
    _, counts = np.unique(flat, return_counts=True)
    return int(counts.max())


# ----------------------------------------------------------------------
# elementwise helpers (dense space)
# ----------------------------------------------------------------------

def _real_slot(pos_d: jnp.ndarray) -> jnp.ndarray:
    return pos_d[0] < POS_GUARD


def _clamp_pos_vel(pos_d, vel_d, cfg):
    """Wall clamp + inward-velocity zeroing (src/BasicSPHSolver.cu:85-96),
    gated to real slots so padded positions stay far away."""
    real = _real_slot(pos_d)
    out_p, out_v = [], []
    for c in range(3):
        hi = 0.99 * cfg.space_size[c]
        p = pos_d[c]
        v = vel_d[c]
        at_lo = p <= 0.0
        at_hi = p >= hi
        pc = jnp.clip(p, 0.0, hi)
        vc = jnp.where(at_lo, jnp.maximum(v, 0.0), v)
        vc = jnp.where(at_hi, jnp.minimum(vc, 0.0), vc)
        out_p.append(jnp.where(real, pc, p))
        out_v.append(jnp.where(real, vc, v))
    return jnp.stack(out_p), jnp.stack(out_v)


def _clamp_pos_only(pos_d, cfg):
    """Position-only clamp used inside PBD projection
    (src/PBDSolver.cu:212-223)."""
    real = _real_slot(pos_d)
    out = []
    for c in range(3):
        hi = 0.99 * cfg.space_size[c]
        out.append(jnp.where(real, jnp.clip(pos_d[c], 0.0, hi), pos_d[c]))
    return jnp.stack(out)


def _accel_clamp(a_d, cfg):
    """MAX_A acceleration clamp (src/BasicSPHSolver.cu:159-162)."""
    norm = jnp.sqrt(a_d[0] ** 2 + a_d[1] ** 2 + a_d[2] ** 2)
    scale = jnp.where(norm > cfg.max_accel,
                      cfg.max_accel / jnp.maximum(norm, cfg.epsilon), 1.0)
    return a_d * scale[None]


def _uniform_mass_row(pos_d, cfg):
    """Grid mass row derived from slot occupancy (cfg.uniform_fluid_mass):
    real slots hold exactly the m0 a scattered uniform state.mass would,
    empty slots the 0.0 fill value — bitwise what fill() produces, minus
    one scatter row."""
    return jnp.where(_real_slot(pos_d), jnp.float32(cfg.m0),
                     jnp.float32(0.0))[None]


def _grav(vel_d, cfg, dt):
    g = jnp.asarray(cfg.gravity, F32)
    return vel_d + dt * g.reshape((3,) + (1,) * (vel_d.ndim - 1))


def _fallback(state: FluidState, cfg, dt):
    """Trajectory for particles that fell out of the grid: gravity + advect
    + clamp (they receive no pair forces — mirrors an isolated particle)."""
    vel = state.vel + dt * jnp.asarray(cfg.gravity, F32)
    space = jnp.asarray(cfg.space_size, F32)
    pos = state.pos + dt * vel
    at_lo = pos <= 0.0
    at_hi = pos >= 0.99 * space
    pos = jnp.clip(pos, 0.0, 0.99 * space)
    vel = jnp.where(at_lo, jnp.maximum(vel, 0.0), vel)
    vel = jnp.where(at_hi, jnp.minimum(vel, 0.0), vel)
    return pos, vel


def _merge_back(idx: DenseIndex, gathered: jnp.ndarray, fb_pos, fb_vel):
    """gathered: (F>=6, N) rows [pos3, vel3, ...]; invalid particles take the
    fallback trajectory."""
    v = idx.valid
    pos = jnp.where(v[:, None], gathered[0:3].T, fb_pos)
    vel = jnp.where(v[:, None], gathered[3:6].T, fb_vel)
    return pos, vel


# ----------------------------------------------------------------------
# WCSPH (src/BasicSPHSolver.cu:237-260)
# ----------------------------------------------------------------------

def wcsph_step(state: FluidState, carry, scene_d: DenseScene,
               cfg: SimConfig, dt, dims: DenseDims, dims_b: DenseDims,
               engine: str = "xla", box=None, use_bd: bool = True):
    # under spatial_sharding, particle-indexed (N,) state is sharded over
    # the mesh (not replicated) — memory and scatter/gather scale 1/devices
    state, carry = shard_particles((state, carry))
    lo = _layout(state.pos, cfg, dims, dims_b, scene_d, engine, box,
                 use_bd)
    idx, colc, fill, read = lo.idx, lo.colc, lo.fill, lo.read
    dims, dims_b, bdx = lo.dims, lo.dims_b, lo.bd
    if cfg.uniform_fluid_mass:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2]],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0],
        )
        pos_d, vel_d = base[0:3], base[3:6]
        mass_d = _uniform_mass_row(pos_d, cfg)
    else:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2], state.mass,
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2]],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0],
        )
        pos_d, mass_d, vel_d = base[0:3], base[3:4], base[4:7]
    surface_on = (cfg.surface_tension > cfg.epsilon
                  or cfg.air_pressure > cfg.epsilon)

    # Two traversals per frame (vs the reference's 7 neighbor kernels,
    # src/BasicSPHSolver.cu:237-260): T1 fuses every sum that reads
    # [pos, mass, vel] (rho, color field, viscosity); T2 fuses every sum
    # that additionally reads fields derived from T1 (surface + pressure).
    # Velocity-update order (gravity, viscosity, surface, pressure) matches
    # the reference; all four increments depend only on positions and
    # relative velocities, so fusing their traversals is exact.
    vel_d = _grav(vel_d, cfg, dt)
    pmv = jnp.concatenate([pos_d, mass_d, vel_d], 0)
    if surface_on:
        o = pp.density_colorgrad_visc_pass(pmv, bdx, colc,
                                           dims, dims_b, cfg, engine)
        rho = o[0]
        cg = o[1:4] / jnp.maximum(cfg.epsilon, o[4])[None]
        vel_d = vel_d + o[5:8] * (cfg.visc * dt)
        p = jnp.maximum(cfg.stiff * ((rho / cfg.rho0) ** 7 - 1.0), 0.0)
        sp = pp.surface_pressure_pass(
            jnp.concatenate([pos_d, mass_d, rho[None], p[None], cg], 0),
            bdx, colc, dims, dims_b, cfg, engine)
        vel_d = vel_d + sp[0:3] * dt
        vel_d = vel_d + _accel_clamp(sp[3:6], cfg) * dt
    else:
        o = pp.density_visc_pass(pmv, bdx, colc, dims,
                                 dims_b, cfg, engine)
        rho = o[0]
        vel_d = vel_d + o[1:4] * (cfg.visc * dt)
        p = jnp.maximum(cfg.stiff * ((rho / cfg.rho0) ** 7 - 1.0), 0.0)
        a = pp.pressure_force_pass(
            jnp.concatenate([pos_d, mass_d, rho[None], p[None]], 0),
            bdx, colc, dims, dims_b, cfg, engine)
        vel_d = vel_d + _accel_clamp(a, cfg) * dt

    pos_d = pos_d + dt * vel_d
    pos_d, vel_d = _clamp_pos_vel(pos_d, vel_d, cfg)

    out = read(jnp.concatenate([pos_d, vel_d, rho[None], p[None]], 0))
    fb_pos, fb_vel = _fallback(state, cfg, dt)
    pos, vel = _merge_back(idx, out, fb_pos, fb_vel)
    new_state = shard_particles(state._replace(
        pos=pos, vel=vel, density=out[6], pressure=out[7]))
    return new_state, carry, _base_metrics(idx, lo.touch)


# ----------------------------------------------------------------------
# DFSPH (src/DFSPHSolver.cu:33-72)
# ----------------------------------------------------------------------

def dfsph_step(state: FluidState, carry, scene_d: DenseScene,
               cfg: SimConfig, dt, dims: DenseDims, dims_b: DenseDims,
               engine: str = "xla", box=None, use_bd: bool = True):
    state, carry = shard_particles((state, carry))
    lo = _layout(state.pos, cfg, dims, dims_b, scene_d, engine, box,
                 use_bd)
    idx, colc, fill, read = lo.idx, lo.colc, lo.fill, lo.read
    dims, dims_b, bdx = lo.dims, lo.dims_b, lo.bd
    if cfg.uniform_fluid_mass:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
             carry.warm_stiff, carry.div_warm],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0, 0.0],
        )
        pos_d, vel_d = base[0:3], base[3:6]
        warm_d, divwarm_d = base[6], base[7]
        mass_d = _uniform_mass_row(pos_d, cfg)
    else:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2], state.mass,
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
             carry.warm_stiff, carry.div_warm],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        )
        pos_d, mass_d, vel_d = base[0:3], base[3:4], base[4:7]
        warm_d, divwarm_d = base[7], base[8]
    pm = jnp.concatenate([pos_d, mass_d], 0)

    surface_on = (cfg.surface_tension > cfg.epsilon
                  or cfg.air_pressure > cfg.epsilon)
    if surface_on:
        # fused traversal: rho/alpha + color-field sums share [pos, mass]
        da = pp.density_alpha_colorgrad_pass(
            pm, bdx, colc, dims, dims_b, cfg, engine)
        cg = da[5:8] / jnp.maximum(cfg.epsilon, da[8])[None]
    else:
        da = pp.density_alpha_pass(pm, bdx, colc, dims,
                                   dims_b, cfg, engine)
        cg = None
    rho = da[0]
    alpha = -1.0 / jnp.maximum(
        cfg.epsilon, da[1] ** 2 + da[2] ** 2 + da[3] ** 2 + da[4])

    n = state.n
    f32max = jnp.float32(jnp.finfo(jnp.float32).max)

    # the (pm, dynamic) group split documents which rows are loop-
    # invariant inside the Jacobi while_loops (XLA hoists their slices)
    def div_pass(v_d):
        return pp.divergence_pass((pm, v_d), bdx,
                                  colc, dims, dims_b, cfg, engine)

    def sa_pass(s_d):
        return pp.stiffness_accel_pass(
            (pm, s_d[None]), bdx, colc, dims,
            dims_b, cfg, engine)

    # --- divergence solve (src/DFSPHSolver.cu:331-363) ---
    tau_div = cfg.dfsph_divergence_threshold * n * cfg.rho0

    def div_error(v_d):
        e = div_pass(v_d)
        err = jnp.maximum(0.0, e)
        err = jnp.where((rho + dt * err < cfg.rho0) & (rho <= cfg.rho0),
                        0.0, err)
        # over-relaxed Jacobi (cfg.dfsph_sor; exact at the fixed point)
        return err, err * alpha * cfg.dfsph_sor

    # optional divergence warm start (cfg.dfsph_warm_divergence > 0;
    # this framework's extension — the reference warm-starts only the
    # density solve): apply last frame's accumulated stiffness before the
    # first error evaluation
    if cfg.dfsph_warm_divergence > 0.0:
        vel_d = vel_d + sa_pass(divwarm_d * cfg.dfsph_warm_divergence)
    err0, stiff0 = div_error(vel_d)

    cheb2 = float(cfg.dfsph_chebyshev_rho) ** 2
    # density-only application (cfg.dfsph_cheb_density_only): divergence
    # solve stays plain warm-started Jacobi
    cheb2_div = 0.0 if cfg.dfsph_cheb_density_only else cheb2

    if cheb2_div > 0.0:
        # Chebyshev-accelerated Jacobi (cfg.dfsph_chebyshev_rho; see
        # config.py) — extrapolates the velocity iterate of both solves
        def div_cond(c):
            it, _, _, _, _, _, total = c
            return (((it < 1) | (total > tau_div))
                    & (it < cfg.dfsph_max_iter))

        def div_body(c):
            it, v, v_prev, omega, s, w, _ = c
            v_new = v + sa_pass(s)
            omega = _cheb_next(it + 1, omega, cheb2_div,
                               cfg.chebyshev_start)
            v_acc = omega * (v_new - v_prev) + v_prev
            err, s = div_error(v_acc)
            return (it + 1, v_acc, v, omega, s, w + s,
                    jnp.sum(jnp.abs(err)))

        div_it, vel_d, _, _, _, divwarm_d, div_total = jax.lax.while_loop(
            div_cond, div_body,
            (jnp.int32(0), vel_d, vel_d, jnp.float32(1.0), stiff0, stiff0,
             f32max))
    else:
        def div_cond(c):
            it, _, _, _, total = c
            return (((it < 1) | (total > tau_div))
                    & (it < cfg.dfsph_max_iter))

        def div_body(c):
            it, v, s, w, _ = c
            v = v + sa_pass(s)
            err, s = div_error(v)
            return it + 1, v, s, w + s, jnp.sum(jnp.abs(err))

        div_it, vel_d, _, divwarm_d, div_total = jax.lax.while_loop(
            div_cond, div_body,
            (jnp.int32(0), vel_d, stiff0, stiff0, f32max))

    # --- non-pressure forces ---
    vel_d = _grav(vel_d, cfg, dt)
    vel_d = vel_d + pp.viscosity_pass(
        (pm, vel_d), colc, dims, cfg, engine) * (cfg.visc * dt)
    if surface_on:
        # cg came fused with the density/alpha traversal above
        sa = pp.surface_pass(jnp.concatenate([pos_d, mass_d, cg], 0), colc,
                             dims, cfg, engine)
        vel_d = vel_d + sa * dt

    # --- density solve with warm start (src/DFSPHSolver.cu:160-210) ---
    tau_den = cfg.dfsph_density_threshold * n * cfg.rho0

    def den_error(v_d):
        e = div_pass(v_d)
        err = jnp.maximum(0.0, dt * e + rho - cfg.rho0)
        return err, err * alpha * cfg.dfsph_sor

    # warm start applies through the same correction scale as in-loop
    # iterations: vel += a/dt (src/DFSPHSolver.cu correctDensityError_CUDA)
    vel_d = vel_d + sa_pass(warm_d) / dt
    err0, stiff0 = den_error(vel_d)
    warm_d = stiff0

    if cheb2 > 0.0:
        def den_cond(c):
            it, _, _, _, _, _, total = c
            return (((it < 2) | (total > tau_den))
                    & (it < cfg.dfsph_max_iter))

        def den_body(c):
            it, v, v_prev, omega, s, w, total = c
            v_new = v + sa_pass(s) / dt
            omega = _cheb_next(it + 1, omega, cheb2, cfg.chebyshev_start)
            v_acc = omega * (v_new - v_prev) + v_prev
            err, s = den_error(v_acc)
            w = w + s
            it = it + 1
            total = jnp.where(it >= 2, jnp.sum(jnp.abs(err)), total)
            return it, v_acc, v, omega, s, w, total

        den_it, vel_d, _, _, _, warm_d, den_total = jax.lax.while_loop(
            den_cond, den_body,
            (jnp.int32(0), vel_d, vel_d, jnp.float32(1.0), stiff0, warm_d,
             f32max))
    else:
        def den_cond(c):
            it, _, _, _, total = c
            return (((it < 2) | (total > tau_den))
                    & (it < cfg.dfsph_max_iter))

        def den_body(c):
            it, v, s, w, total = c
            v = v + sa_pass(s) / dt
            err, s = den_error(v)
            w = w + s
            it = it + 1
            total = jnp.where(it >= 2, jnp.sum(jnp.abs(err)), total)
            return it, v, s, w, total

        den_it, vel_d, _, warm_d, den_total = jax.lax.while_loop(
            den_cond, den_body,
            (jnp.int32(0), vel_d, stiff0, warm_d, f32max))

    # --- advect ---
    pos_d = pos_d + dt * vel_d
    pos_d, vel_d = _clamp_pos_vel(pos_d, vel_d, cfg)

    out = read(jnp.concatenate(
        [pos_d, vel_d, rho[None], warm_d[None], divwarm_d[None]], 0))
    fb_pos, fb_vel = _fallback(state, cfg, dt)
    pos, vel = _merge_back(idx, out, fb_pos, fb_vel)
    new_state = shard_particles(state._replace(pos=pos, vel=vel,
                                               density=out[6]))
    new_carry = shard_particles(dfsph_mod.DFSPHCarry(warm_stiff=out[7],
                                                     div_warm=out[8]))
    metrics = {
        **_base_metrics(idx, lo.touch),
        "divergence_iters": div_it,
        "density_iters": den_it,
        "divergence_error": div_total,
        "density_error": den_total,
    }
    return new_state, new_carry, metrics


# ----------------------------------------------------------------------
# PBD (src/PBDSolver.cu:34-73)
# ----------------------------------------------------------------------

def pbd_step(state: FluidState, carry, scene_d: DenseScene,
             cfg: SimConfig, dt, dims: DenseDims, dims_b: DenseDims,
             engine: str = "xla", box=None, use_bd: bool = True):
    state, carry = shard_particles((state, carry))
    lo = _layout(state.pos, cfg, dims, dims_b, scene_d, engine, box,
                 use_bd)
    idx, colc, fill, read = lo.idx, lo.colc, lo.fill, lo.read
    dims, dims_b, bdx = lo.dims, lo.dims_b, lo.bd
    warm = float(cfg.pbd_warm_start) > 0.0
    wfields = ([carry.dp_warm[:, 0], carry.dp_warm[:, 1],
                carry.dp_warm[:, 2]] if warm else [])
    wfill = [0.0, 0.0, 0.0] if warm else []
    if cfg.uniform_fluid_mass:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             carry.pos_last[:, 0], carry.pos_last[:, 1],
             carry.pos_last[:, 2]] + wfields,
            [POS_PAD, POS_PAD, POS_PAD, POS_PAD, POS_PAD, POS_PAD] + wfill,
        )
        pos_d, plast_d, dpw_d = base[0:3], base[3:6], base[6:9]
        mass_d = _uniform_mass_row(pos_d, cfg)
    else:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2], state.mass,
             carry.pos_last[:, 0], carry.pos_last[:, 1],
             carry.pos_last[:, 2]] + wfields,
            [POS_PAD, POS_PAD, POS_PAD, 0.0, POS_PAD, POS_PAD, POS_PAD]
            + wfill,
        )
        pos_d, mass_d, plast_d, dpw_d = (base[0:3], base[3:4], base[4:7],
                                         base[7:10])

    # warm-start predictor (cfg.pbd_warm_start; config.py): start the
    # projection from the advected positions shifted by the carried
    # previous-frame displacement — same constraint fixed point, closer
    # start, zero extra traversals
    pos_adv_d = pos_d
    if warm:
        pos_d = _clamp_pos_only(pos_d + cfg.pbd_warm_start * dpw_d, cfg)

    # --- projection (src/PBDSolver.cu:225-258). The reference runs a fixed
    # maxIter=20 iterations; here the loop exits exactly when an iteration's
    # lambda field is all-zero (every rho <= rho0): dp is then exactly 0 and
    # all remaining reference iterations are bitwise no-ops, so the early
    # exit is output-identical while skipping dead traversals in the fall /
    # settled phases ---
    def _project_once(p_d):
        lam5 = pp.pbd_lambda_pass((p_d, mass_d),
                                  bdx, colc, dims, dims_b,
                                  cfg, engine)
        rho = lam5[0]
        lam = jnp.where(
            rho > cfg.rho0,
            -(rho / cfg.rho0 - 1.0)
            / (lam5[1] ** 2 + lam5[2] ** 2 + lam5[3] ** 2 + lam5[4]
               + cfg.epsilon),
            0.0,
        ) * cfg.pbd_relaxation
        alive = jnp.any(lam != 0.0)
        if cfg.pbd_density_tolerance > 0.0:
            # optional convergence exit (cfg.pbd_density_tolerance; the
            # reference always runs the full 20 iterations)
            alive = alive & (jnp.max(rho) / cfg.rho0 - 1.0
                             > cfg.pbd_density_tolerance)
        dp = pp.stiffness_accel_pass(
            (p_d, mass_d, lam[None]), bdx, colc,
            dims, dims_b, cfg, engine) / cfg.rho0
        return _clamp_pos_only(p_d + dp, cfg), rho, alive

    zero_rho = jnp.zeros(pos_d.shape[1:], F32)
    if cfg.pbd_chebyshev_rho > 0.0:
        # Chebyshev-accelerated projection (cfg.pbd_chebyshev_rho; see
        # config.py — extrapolation suppressed when the plain update is
        # a no-op so the exact early exit is preserved)
        rho2 = float(cfg.pbd_chebyshev_rho) ** 2

        def project_cond(c):
            it, _, _, _, _, alive = c
            return ((it < 1) | alive) & (it < cfg.pbd_max_iter)

        def project_body(c):
            it, p_d, p_prev, omega, _, _ = c
            p_new, rho, alive = _project_once(p_d)
            omega = _cheb_next(it + 1, omega, rho2, cfg.chebyshev_start)
            p_acc = jnp.where(alive, omega * (p_new - p_prev) + p_prev,
                              p_new)
            return (it + 1, _clamp_pos_only(p_acc, cfg), p_d, omega,
                    rho, alive)

        pbd_it, pos_d, _, _, rho, _ = jax.lax.while_loop(
            project_cond, project_body,
            (jnp.int32(0), pos_d, pos_d, jnp.float32(1.0), zero_rho,
             jnp.bool_(True)))
    else:
        def project_cond(c):
            it, _, _, alive = c
            return ((it < 1) | alive) & (it < cfg.pbd_max_iter)

        def project_body(c):
            it, p_d, _, _ = c
            p_d, rho, alive = _project_once(p_d)
            return it + 1, p_d, rho, alive

        pbd_it, pos_d, rho, _ = jax.lax.while_loop(
            project_cond, project_body,
            (jnp.int32(0), pos_d, zero_rho, jnp.bool_(True)))

    # --- velocity from position delta (src/PBDSolver.cu:55-60) ---
    vel_d = (pos_d - plast_d) / dt
    # --- XSPH viscosity (src/PBDSolver.cu:89-125) fused with the surface
    # color field (src/BasicSPHSolver.cu:277-318): both traverse the same
    # projected positions ---
    if cfg.surface_tension > cfg.epsilon or cfg.air_pressure > cfg.epsilon:
        o = pp.xsph_colorgrad_pass(
            jnp.concatenate([pos_d, mass_d, vel_d], 0), bdx,
            colc, dims, dims_b, cfg, engine)
        vel_d = vel_d + o[0:3] * (cfg.pbd_xsph_c / cfg.rho0)
        cg = o[3:6] / jnp.maximum(cfg.epsilon, o[6])[None]
        sa = pp.surface_pass(jnp.concatenate([pos_d, mass_d, cg], 0), colc,
                             dims, cfg, engine)
        vel_d = vel_d + sa * dt
    else:
        vel_d = vel_d + pp.xsph_pass(
            jnp.concatenate([pos_d, mass_d, vel_d], 0), colc, dims, cfg,
            engine) * (cfg.pbd_xsph_c / cfg.rho0)
    vel_d = _grav(vel_d, cfg, dt)

    # --- remember + predict (src/PBDSolver.cu:71-79) ---
    plast_d = pos_d
    pos_d = pos_d + dt * vel_d
    pos_d, vel_d = _clamp_pos_vel(pos_d, vel_d, cfg)

    rows = [pos_d, vel_d, rho[None], plast_d]
    if warm:
        # next frame's warm carry: total projection displacement relative
        # to this frame's advected positions (pads cancel to 0 exactly)
        rows.append(plast_d - pos_adv_d)
    out = read(jnp.concatenate(rows, 0))
    fb_pos, fb_vel = _fallback(state, cfg, dt)
    pos, vel = _merge_back(idx, out, fb_pos, fb_vel)
    pos_last = jnp.where(idx.valid[:, None], out[7:10].T, state.pos)
    dp_warm = (jnp.where(idx.valid[:, None], out[10:13].T, 0.0)
               if warm else jnp.zeros_like(state.pos))
    new_state = shard_particles(state._replace(pos=pos, vel=vel,
                                               density=out[6]))
    new_carry = shard_particles(pbd_mod.PBDCarry(pos_last=pos_last,
                                                 dp_warm=dp_warm))
    metrics = {**_base_metrics(idx, lo.touch), "pbd_iters": pbd_it}
    return new_state, new_carry, metrics


DENSE_STEPS = {"wcsph": wcsph_step, "dfsph": dfsph_step, "pbd": pbd_step}
