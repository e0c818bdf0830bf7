"""Position-Based Fluids solver [Macklin & Mueller 2013].

TPU-native re-design of PBDSolver (src/PBDSolver.cu). The fixed 20-iteration
constraint projection becomes a ``lax.fori_loop``; the carried last-step
positions need no re-sorting (stable particle identity); and the reference's
exception-as-control-flow first-step initialisation (src/PBDSolver.cu:44-47)
is replaced by initialising ``pos_last = pos`` at carry creation.

Note on mid-projection neighbor candidates: the reference re-bins particle i
by its *current* (moving) position against cell ranges sorted at step start
(src/PBDSolver.cu:155-157); this framework defaults to the start-of-step
cell assignment for both sides. Both are approximations of the same stencil
and differ only for particles crossing a cell boundary mid-projection
(PARITY.md divergence #2 quantifies the gap). Setting
``cfg.pbd_rebin_moving=True`` opts into the reference semantics in this
oracle engine via ``_rebinned_reduce``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops import kernels as kn
from ..ops.grid import (POS_PAD, STENCIL, cell_coords, cell_id_from_coords,
                        scatter_to_grid)
from ..ops.neighbors import PairSource, neighbor_reduce
from ..state import FluidState
from . import common as C


class PBDCarry(NamedTuple):
    pos_last: jnp.ndarray  # (N, 3) positions at previous step
    dp_warm: jnp.ndarray   # (N, 3) previous frame's total projection shift


def init_carry(state: FluidState) -> PBDCarry:
    # jnp.copy: pos_last must not alias state.pos — the step function donates
    # both input buffers, and aliased donation is rejected by the runtime.
    return PBDCarry(pos_last=jnp.copy(state.pos),
                    dp_warm=jnp.zeros_like(state.pos))


def _rebinned_reduce(pos_now, i_fields, sources, out_init, cfg: SimConfig):
    """Particle-major 27-stencil reduce with the i-side stencil centered on
    each particle's CURRENT cell — the reference's mid-projection re-binning
    (src/PBDSolver.cu:154-156: ``make_int3(posFluid[i] / cellLength)`` is
    re-evaluated on the moving position every iteration, while the sorted
    ``cellStart`` ranges stay frozen at step start). j-side values are read
    from the padded grids, which hold CURRENT values in step-start slots —
    exactly the reference's in-place-updated sorted buffers.

    i_fields: name -> (N, ...) per-particle arrays. out_init: pytree of
    (N, ...) zeros. Opt-in oracle path (cfg.pbd_rebin_moving): the
    per-particle gather is irregular and not built for speed.
    """
    c_now = cell_coords(pos_now, cfg)  # (N, 3)
    i_view = {k: jnp.expand_dims(v, 1) for k, v in i_fields.items()}
    stencil = jnp.asarray(STENCIL)

    def body(o, acc):
        ncell = cell_id_from_coords(c_now + stencil[o], cfg)  # (N,)
        for src in sources:
            # sentinel/out-of-grid cells resolve to the clean pad row M
            jslot = src.tables.cell2active[ncell]  # (N,)
            j_raw = {k: g[jslot] for k, g in src.grids.items()}  # (N, K, ..)
            rel = pos_now[:, None, :] - j_raw["pos"]  # (N, K, 3)
            r = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
            contrib = src.pair_fn(i_view, j_raw, rel, r)
            acc = jax.tree_util.tree_map(
                lambda a, c: a + jnp.sum(c, axis=1), acc, contrib)
        return acc

    return jax.lax.fori_loop(0, 27, body, out_init)


def _zeros_n(n: int, spec: Dict[str, bool]):
    return {k: jnp.zeros((n, 3) if vec else (n,), jnp.float32)
            for k, vec in spec.items()}


def _density_lambda(fg: C.FluidGrids, scene: C.Scene, pos, cfg: SimConfig):
    """Density + constraint multiplier lambda (src/PBDSolver.cu:127-168).

    Both fluid and boundary neighbors use the same contribution form (the
    reference calls contributeDensityLambda for both, with rho0 in the
    gradient normaliser either way)."""
    h, eps = cfg.radius, cfg.epsilon
    M, K = cfg.max_active_cells, cfg.max_per_cell
    pos_g = scatter_to_grid(fg.tables, pos, M, K, fill=POS_PAD)

    def term(i, j, rel, r):
        w = kn.w_cubic(r, h)
        g = -j["mass"][..., None] * kn.grad_w_cubic(rel, h) / cfg.rho0
        return {
            "rho": j["mass"] * w,
            "gsum": -g,
            "slam": jnp.sum(g * g, axis=-1),
        }

    sources = [
        PairSource(fg.tables, {"pos": pos_g, "mass": fg.mass}, term),
        PairSource(scene.b_tables,
                   {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                   term),
    ]
    spec = {"rho": False, "gsum": True, "slam": False}
    if cfg.pbd_rebin_moving:
        acc = _rebinned_reduce(pos, {"pos": pos}, sources,
                               _zeros_n(pos.shape[0], spec), cfg)
        rho, gsum, slam = acc["rho"], acc["gsum"], acc["slam"]
    else:
        acc = neighbor_reduce(fg.tables, {"pos": pos_g}, sources,
                              C._acc_zeros(fg, spec))
        rho = C._to_particles(fg, acc["rho"])
        gsum = C._to_particles(fg, acc["gsum"])
        slam = C._to_particles(fg, acc["slam"])
    lam = jnp.where(
        rho > cfg.rho0,
        -(rho / cfg.rho0 - 1.0)
        / (jnp.sum(gsum * gsum, axis=-1) + slam + eps),
        0.0,
    )
    return rho, cfg.pbd_relaxation * lam


def _delta_pos(fg: C.FluidGrids, scene: C.Scene, pos, lam, cfg: SimConfig):
    """dp_i = [sum_f m_j (l_i + l_j) grad_W + sum_b m_b l_i grad_W] / rho0
    (src/PBDSolver.cu:170-210)."""
    h = cfg.radius
    M, K = cfg.max_active_cells, cfg.max_per_cell
    pos_g = scatter_to_grid(fg.tables, pos, M, K, fill=POS_PAD)
    lam_g = scatter_to_grid(fg.tables, lam, M, K)

    def fluid_term(i, j, rel, r):
        coef = j["mass"] * (i["lam"] + j["lam"])
        return {"dp": coef[..., None] * kn.grad_w_cubic(rel, h)}

    def boundary_term(i, j, rel, r):
        coef = j["mass"] * i["lam"]
        return {"dp": coef[..., None] * kn.grad_w_cubic(rel, h)}

    sources = [
        PairSource(fg.tables,
                   {"pos": pos_g, "mass": fg.mass, "lam": lam_g},
                   fluid_term),
        PairSource(scene.b_tables,
                   {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                   boundary_term),
    ]
    if cfg.pbd_rebin_moving:
        acc = _rebinned_reduce(pos, {"pos": pos, "lam": lam}, sources,
                               _zeros_n(pos.shape[0], {"dp": True}), cfg)
        return acc["dp"] / cfg.rho0
    acc = neighbor_reduce(fg.tables, {"pos": pos_g, "lam": lam_g}, sources,
                          C._acc_zeros(fg, {"dp": True}))
    return C._to_particles(fg, acc["dp"]) / cfg.rho0


def _xsph(fg: C.FluidGrids, scene: C.Scene, pos, vel, cfg: SimConfig):
    """XSPH viscosity against the *current* positions
    (src/PBDSolver.cu:89-125)."""
    h = cfg.radius
    M, K = cfg.max_active_cells, cfg.max_per_cell
    pos_g = scatter_to_grid(fg.tables, pos, M, K, fill=POS_PAD)
    vel_g = scatter_to_grid(fg.tables, vel, M, K)

    def term(i, j, rel, r):
        coef = j["mass"] * kn.w_cubic(r, h)
        return {"dv": coef[..., None] * (j["vel"] - i["vel"])}

    sources = [PairSource(fg.tables,
                          {"pos": pos_g, "mass": fg.mass, "vel": vel_g},
                          term)]
    if cfg.pbd_rebin_moving:
        # the reference's XSPH stencil is also centered on the current
        # (post-projection) position (src/PBDSolver.cu:100-115)
        acc = _rebinned_reduce(pos, {"pos": pos, "vel": vel}, sources,
                               _zeros_n(pos.shape[0], {"dv": True}), cfg)
        return cfg.pbd_xsph_c * acc["dv"] / cfg.rho0
    acc = neighbor_reduce(fg.tables, {"pos": pos_g, "vel": vel_g}, sources,
                          C._acc_zeros(fg, {"dv": True}))
    return cfg.pbd_xsph_c * C._to_particles(fg, acc["dv"]) / cfg.rho0


def step(
    state: FluidState,
    carry: PBDCarry,
    scene: C.Scene,
    cfg: SimConfig,
    dt: float,
) -> Tuple[FluidState, PBDCarry, Dict[str, Any]]:
    """One PBD step (src/PBDSolver.cu:34-73)."""
    fg = C.make_fluid_grids(state.pos, state.mass, scene, cfg)

    # step 2: iterative constraint projection (src/PBDSolver.cu:225-258).
    # The reference runs a fixed maxIter=20; the loop below exits exactly
    # when an iteration's lambda field is all-zero (every rho <= rho0): dp
    # is then exactly 0 and all remaining reference iterations are bitwise
    # no-ops, so the early exit is output-identical.
    def _project_once(pos):
        rho, lam = _density_lambda(fg, scene, pos, cfg)
        alive = jnp.any(lam != 0.0)
        if cfg.pbd_density_tolerance > 0.0:
            # optional convergence exit (cfg.pbd_density_tolerance; the
            # reference always runs the full 20 iterations)
            alive = alive & (jnp.max(rho) / cfg.rho0 - 1.0
                             > cfg.pbd_density_tolerance)
        dp = _delta_pos(fg, scene, pos, lam, cfg)
        return C.enforce_boundary_pos(pos + dp, cfg), rho, alive

    # warm-start predictor (cfg.pbd_warm_start; see config.py — shift by
    # the carried previous-frame projection displacement before iterating)
    if cfg.pbd_warm_start > 0.0:
        pos0 = C.enforce_boundary_pos(
            state.pos + cfg.pbd_warm_start * carry.dp_warm, cfg)
    else:
        pos0 = state.pos

    if cfg.pbd_chebyshev_rho > 0.0:
        # Chebyshev-accelerated projection (cfg.pbd_chebyshev_rho; the
        # oracle mirror of dense_step.pbd_step's accelerated loop)
        rho2 = float(cfg.pbd_chebyshev_rho) ** 2

        def project_cond(c):
            it, _, _, _, _, alive = c
            return ((it < 1) | alive) & (it < cfg.pbd_max_iter)

        def project_body(c):
            it, pos, prev, omega, _, _ = c
            new, rho, alive = _project_once(pos)
            omega = C.cheb_next(it + 1, omega, rho2, cfg.chebyshev_start)
            acc = jnp.where(alive, omega * (new - prev) + prev, new)
            acc = C.enforce_boundary_pos(acc, cfg)
            return it + 1, acc, pos, omega, rho, alive

        pbd_it, pos, _, _, density, _ = jax.lax.while_loop(
            project_cond, project_body,
            (jnp.int32(0), pos0, pos0, jnp.float32(1.0),
             state.density, jnp.bool_(True)))
    else:
        def project_cond(c):
            it, _, _, alive = c
            return ((it < 1) | alive) & (it < cfg.pbd_max_iter)

        def project_body(c):
            it, pos, _, _ = c
            pos, rho, alive = _project_once(pos)
            return it + 1, pos, rho, alive

        pbd_it, pos, density, _ = jax.lax.while_loop(
            project_cond, project_body,
            (jnp.int32(0), pos0, state.density, jnp.bool_(True))
        )
    dp_total = pos - state.pos  # next frame's warm-start carry

    # step 3: velocity from position delta (src/PBDSolver.cu:55-60)
    vel = (pos - carry.pos_last) / dt
    # step 4: XSPH viscosity, surface effects, gravity
    vel = vel + _xsph(fg, scene, pos, vel, cfg)
    if cfg.surface_tension > cfg.epsilon or cfg.air_pressure > cfg.epsilon:
        # surface pass runs on the projected positions
        fg_now = C.FluidGrids(
            tables=fg.tables,
            pos=scatter_to_grid(fg.tables, pos, cfg.max_active_cells,
                                cfg.max_per_cell, fill=POS_PAD),
            mass=fg.mass,
        )
        vel = C.apply_surface_effects(fg_now, scene, vel, cfg, dt)
    vel = C.gravity_update(vel, cfg, dt)

    # step 5: remember position, predict next (src/PBDSolver.cu:71-79)
    pos_last = pos
    pos, vel = C.advect(pos, vel, cfg, dt)

    new_state = state._replace(pos=pos, vel=vel, density=density)
    metrics = {
        "grid_overflow": fg.tables.overflow,
        "active_cells": fg.tables.num_active,
        "pbd_iters": pbd_it,
    }
    return new_state, PBDCarry(pos_last=pos_last, dp_warm=dp_total), metrics
