"""Divergence-Free SPH solver [Bender & Koschier 2015].

TPU-native re-design of DFSPHSolver (src/DFSPHSolver.cu). The reference's
only host-in-the-loop control flow — a per-iteration ``thrust::reduce`` of
the error to the CPU (src/DFSPHSolver.cu:206,360) — becomes a
``lax.while_loop`` with the reduction staying on device, so the whole step
compiles to one XLA program.

Warm-start stiffness is carried per particle across steps; because particle
identity is stable in this framework, the reference's re-sort realignment of
``denWarmStiff`` (src/DFSPHSolver.cu:170-171) is unnecessary.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops import kernels as kn
from ..ops.grid import scatter_to_grid
from ..ops.neighbors import PairSource, neighbor_reduce
from ..state import FluidState
from . import common as C

F32_MAX = jnp.finfo(jnp.float32).max


class DFSPHCarry(NamedTuple):
    warm_stiff: jnp.ndarray  # (N,) accumulated density-solve stiffness
    div_warm: jnp.ndarray    # (N,) accumulated divergence-solve stiffness
                             #     (used when cfg.dfsph_warm_divergence > 0)


def init_carry(state: FluidState) -> DFSPHCarry:
    # two distinct buffers: a shared zeros array would be donated twice
    return DFSPHCarry(warm_stiff=jnp.zeros((state.n,), jnp.float32),
                      div_warm=jnp.zeros((state.n,), jnp.float32))


# ----------------------------------------------------------------------
# passes
# ----------------------------------------------------------------------

def compute_density_alpha(fg: C.FluidGrids, scene: C.Scene, cfg: SimConfig):
    """rho_i and alpha_i = -1 / max(eps, |sum m grad_W|^2 + sum |m grad_W|^2)
    (src/DFSPHSolver.cu:212-259; the squared-norm sum runs over fluid
    neighbors only)."""
    h = cfg.radius

    def fluid_term(i, j, rel, r):
        mg = j["mass"][..., None] * kn.grad_w_cubic(rel, h)
        return {
            "rho": j["mass"] * kn.w_cubic(r, h),
            "gsum": mg,
            "slam": jnp.sum(mg * mg, axis=-1),
        }

    def boundary_term(i, j, rel, r):
        mg = j["mass"][..., None] * kn.grad_w_cubic(rel, h)
        return {
            "rho": j["mass"] * kn.w_cubic(r, h),
            "gsum": mg,
            "slam": jnp.zeros(r.shape, jnp.float32),
        }

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos},
        [
            PairSource(fg.tables, {"pos": fg.pos, "mass": fg.mass}, fluid_term),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       boundary_term),
        ],
        C._acc_zeros(fg, {"rho": False, "gsum": True, "slam": False}),
    )
    rho = C._to_particles(fg, acc["rho"])
    gsum = C._to_particles(fg, acc["gsum"])
    slam = C._to_particles(fg, acc["slam"])
    alpha = -1.0 / jnp.maximum(cfg.epsilon,
                               jnp.sum(gsum * gsum, axis=-1) + slam)
    return rho, alpha


def _velocity_divergence(fg: C.FluidGrids, scene: C.Scene, vel, cfg):
    """e_i = sum_f m_j (v_i - v_j) . grad_W + sum_b m_b v_i . grad_W
    (src/DFSPHSolver.cu:74-92 / :261-279 — both loops use the same form)."""
    h = cfg.radius
    M, K = cfg.max_active_cells, cfg.max_per_cell
    vel_g = scatter_to_grid(fg.tables, vel, M, K)

    def fluid_term(i, j, rel, r):
        gw = kn.grad_w_cubic(rel, h)
        return {"e": j["mass"] * jnp.sum((i["vel"] - j["vel"]) * gw, axis=-1)}

    def boundary_term(i, j, rel, r):
        gw = kn.grad_w_cubic(rel, h)
        return {"e": j["mass"] * jnp.sum(i["vel"] * gw, axis=-1)}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "vel": vel_g},
        [
            PairSource(fg.tables,
                       {"pos": fg.pos, "mass": fg.mass, "vel": vel_g},
                       fluid_term),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       boundary_term),
        ],
        C._acc_zeros(fg, {"e": False}),
    )
    return C._to_particles(fg, acc["e"])


def _stiffness_accel(fg: C.FluidGrids, scene: C.Scene, stiff, cfg):
    """a_i = sum_f m_j (k_i + k_j) grad_W + sum_b m_b k_i grad_W
    (src/DFSPHSolver.cu:118-136)."""
    h = cfg.radius
    M, K = cfg.max_active_cells, cfg.max_per_cell
    stiff_g = scatter_to_grid(fg.tables, stiff, M, K)

    def fluid_term(i, j, rel, r):
        coef = j["mass"] * (i["stiff"] + j["stiff"])
        return {"a": coef[..., None] * kn.grad_w_cubic(rel, h)}

    def boundary_term(i, j, rel, r):
        coef = j["mass"] * i["stiff"]
        return {"a": coef[..., None] * kn.grad_w_cubic(rel, h)}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "stiff": stiff_g},
        [
            PairSource(fg.tables,
                       {"pos": fg.pos, "mass": fg.mass, "stiff": stiff_g},
                       fluid_term),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       boundary_term),
        ],
        C._acc_zeros(fg, {"a": True}),
    )
    return C._to_particles(fg, acc["a"])


# ----------------------------------------------------------------------
# iteration loops
# ----------------------------------------------------------------------

def correct_divergence(fg, scene, vel, density, alpha, div_warm, cfg, dt):
    """Divergence-error Jacobi loop (src/DFSPHSolver.cu:331-363):
    iterate while (iter < 1 or total > thresh*N*rho0) and iter < maxIter.
    Optional warm start (cfg.dfsph_warm_divergence > 0; this framework's
    extension — the reference warm-starts only the density solve): last
    frame's accumulated stiffness is applied before the first error
    evaluation, cutting the Jacobi iterations needed to reach the SAME
    convergence threshold."""
    n = vel.shape[0]
    tau = cfg.dfsph_divergence_threshold * n * cfg.rho0
    warm_on = cfg.dfsph_warm_divergence > 0.0

    def div_error(v):
        e = _velocity_divergence(fg, scene, v, cfg)
        err = jnp.maximum(0.0, e)
        # compression-allowed clamp (src/DFSPHSolver.cu:300-304)
        err = jnp.where(
            (density + dt * err < cfg.rho0) & (density <= cfg.rho0), 0.0, err
        )
        # over-relaxed Jacobi (cfg.dfsph_sor; exact at the fixed point)
        return err, err * alpha * cfg.dfsph_sor

    if warm_on:
        vel = vel + _stiffness_accel(
            fg, scene, div_warm * cfg.dfsph_warm_divergence, cfg)
    err0, stiff0 = div_error(vel)
    warm = stiff0

    def cond(c):
        it, _, _, _, total = c
        return ((it < 1) | (total > tau)) & (it < cfg.dfsph_max_iter)

    def body(c):
        it, v, stiff, w, _ = c
        v = v + _stiffness_accel(fg, scene, stiff, cfg)  # dt folded into stiff
        err, stiff = div_error(v)
        return it + 1, v, stiff, w + stiff, jnp.sum(jnp.abs(err))

    it, vel, _, warm, total = jax.lax.while_loop(
        cond, body, (jnp.int32(0), vel, stiff0, warm, jnp.float32(F32_MAX))
    )
    return vel, warm, it, total


def correct_density(fg, scene, vel, density, alpha, warm_stiff, cfg, dt):
    """Density-error Jacobi loop with warm start
    (src/DFSPHSolver.cu:160-210)."""
    n = vel.shape[0]
    tau = cfg.dfsph_density_threshold * n * cfg.rho0

    def den_error(v):
        e = _velocity_divergence(fg, scene, v, cfg)
        err = jnp.maximum(0.0, dt * e + density - cfg.rho0)
        return err, err * alpha * cfg.dfsph_sor

    # warm start (no realignment needed — particle identity is stable);
    # applied through the same correction kernel as in-loop iterations,
    # i.e. vel += a/dt (src/DFSPHSolver.cu correctDensityError_CUDA)
    vel = vel + _stiffness_accel(fg, scene, warm_stiff, cfg) / dt
    err0, stiff0 = den_error(vel)
    warm = stiff0

    def cond(c):
        it, _, _, _, total = c
        return ((it < 2) | (total > tau)) & (it < cfg.dfsph_max_iter)

    def body(c):
        it, v, stiff, w, total = c
        v = v + _stiffness_accel(fg, scene, stiff, cfg) / dt
        err, stiff = den_error(v)
        w = w + stiff
        it = it + 1
        total = jnp.where(it >= 2, jnp.sum(jnp.abs(err)), total)
        return it, v, stiff, w, total

    it, vel, _, warm, total = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), vel, stiff0, warm, jnp.float32(F32_MAX)),
    )
    return vel, warm, it, total


# ----------------------------------------------------------------------
# step
# ----------------------------------------------------------------------

def step(
    state: FluidState,
    carry: DFSPHCarry,
    scene: C.Scene,
    cfg: SimConfig,
    dt: float,
) -> Tuple[FluidState, DFSPHCarry, Dict[str, Any]]:
    """One DFSPH step (src/DFSPHSolver.cu:33-72)."""
    fg = C.make_fluid_grids(state.pos, state.mass, scene, cfg)

    # step 2: density + alpha
    density, alpha = compute_density_alpha(fg, scene, cfg)
    # step 3: divergence solve
    vel, div_warm, div_iters, div_err = correct_divergence(
        fg, scene, state.vel, density, alpha, carry.div_warm, cfg, dt
    )
    # step 4: non-pressure forces
    vel = C.gravity_update(vel, cfg, dt)
    vel = vel + C.viscosity_dv(fg, vel, cfg, dt)
    if cfg.surface_tension > cfg.epsilon or cfg.air_pressure > cfg.epsilon:
        vel = C.apply_surface_effects(fg, scene, vel, cfg, dt)
    # step 5: density solve (with warm start)
    vel, warm, den_iters, den_err = correct_density(
        fg, scene, vel, density, alpha, carry.warm_stiff, cfg, dt
    )
    # step 6: advect
    pos, vel = C.advect(state.pos, vel, cfg, dt)

    new_state = state._replace(pos=pos, vel=vel, density=density)
    metrics = {
        "grid_overflow": fg.tables.overflow,
        "active_cells": fg.tables.num_active,
        "divergence_iters": div_iters,
        "density_iters": den_iters,
        "divergence_error": div_err,
        "density_error": den_err,
    }
    return new_state, DFSPHCarry(warm_stiff=warm, div_warm=div_warm), metrics
