"""Shared physics passes used by all three solvers.

Covers the reference's BasicSPHSolver building blocks that DFSPH and PBD
inherit (src/BasicSPHSolver.cu): density summation, Tait pressure, symmetric
pressure force with boundary mirroring, Mueller viscosity, He-2014 surface
tension + air pressure, gravity, advection, and the wall clamp — plus the
scene/boundary setup from SPHSystem's constructor (src/SPHSystem.cu:33-112).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops import kernels as kn
from ..ops.grid import (
    GridTables,
    POS_PAD,
    build_grid,
    compute_cell_ids,
    gather_from_grid,
    scatter_to_grid,
)
from ..ops.neighbors import PairSource, neighbor_reduce
from ..state import FluidState, boundary_positions


class Scene(NamedTuple):
    """Static boundary data, built once (src/SPHSystem.cu:68-71)."""

    b_pos: jnp.ndarray        # (Nb, 3)
    b_mass: jnp.ndarray       # (Nb,) Akinci boundary mass
    b_tables: GridTables
    b_pos_grid: jnp.ndarray   # (Mb+2, Kb, 3)
    b_mass_grid: jnp.ndarray  # (Mb+2, Kb)


class FluidGrids(NamedTuple):
    """Per-step gridded views of the fluid state."""

    tables: GridTables
    pos: jnp.ndarray   # (M+2, K, 3)
    mass: jnp.ndarray  # (M+2, K)


# ----------------------------------------------------------------------
# scene construction
# ----------------------------------------------------------------------

def boundary_capacities(b_pos: np.ndarray, cfg: SimConfig) -> Tuple[int, int]:
    """Exact occupied-cell count / max per-cell occupancy of the (static)
    boundary particle set, computed host-side so the padded grid has no
    wasted rows."""
    coords = np.floor_divide(b_pos, cfg.cell_length).astype(np.int64)
    cx, cy, cz = cfg.cell_size
    flat = (coords[:, 0] * cy + coords[:, 1]) * cz + coords[:, 2]
    _, counts = np.unique(flat, return_counts=True)
    return len(counts), int(counts.max())


def build_scene(
    cfg: SimConfig,
    b_pos: np.ndarray | None = None,
) -> Scene:
    """Boundary grid + Akinci boundary mass m_b = rhoB / sum_b' W
    (src/SPHSystem.cu:92-105)."""
    if b_pos is None:
        b_pos = boundary_positions(cfg)
    mb, kb = boundary_capacities(np.asarray(b_pos), cfg)
    # jit with b_pos traced: XLA (esp. on CPU) constant-folds scatter/gather
    # chains over embedded constant index arrays pathologically slowly.
    return jax.jit(_scene_compute, static_argnums=(1, 2, 3))(
        jnp.asarray(b_pos, jnp.float32), cfg, mb, kb
    )


def _scene_compute(b_pos: jnp.ndarray, cfg: SimConfig, mb: int, kb: int) -> Scene:
    tables = build_grid(b_pos, cfg, mb, kb)
    pos_grid = scatter_to_grid(tables, b_pos, mb, kb, fill=POS_PAD)

    # sum of W over boundary neighbors (self excluded because W(0) == 0)
    ones = scatter_to_grid(tables, jnp.ones(b_pos.shape[0]), mb, kb)

    def w_sum(i, j, rel, r):
        return {"w": j["one"] * kn.w_cubic(r, cfg.radius)}

    acc = neighbor_reduce(
        tables,
        {"pos": pos_grid},
        [PairSource(tables, {"pos": pos_grid, "one": ones}, w_sum)],
        {"w": jnp.zeros((mb, kb), jnp.float32)},
    )
    wsum = gather_from_grid(tables, jnp.pad(acc["w"], ((0, 2), (0, 0))))
    b_mass = cfg.rho_boundary / jnp.maximum(cfg.epsilon, wsum)
    mass_grid = scatter_to_grid(tables, b_mass, mb, kb)

    return Scene(
        b_pos=b_pos,
        b_mass=b_mass,
        b_tables=tables,
        b_pos_grid=pos_grid,
        b_mass_grid=mass_grid,
    )


def make_fluid_grids(pos: jnp.ndarray, mass: jnp.ndarray, scene: Scene,
                     cfg: SimConfig) -> FluidGrids:
    """Per-step fluid neighbor structure (src/SPHSystem.cu:136)."""
    M, K = cfg.max_active_cells, cfg.max_per_cell
    tables = build_grid(pos, cfg, M, K)
    return FluidGrids(
        tables=tables,
        pos=scatter_to_grid(tables, pos, M, K, fill=POS_PAD),
        mass=scatter_to_grid(tables, mass, M, K),
    )


def _acc_zeros(fg: FluidGrids, names_vec: Dict[str, bool]):
    M, K = fg.pos.shape[0] - 2, fg.pos.shape[1]
    return {
        k: jnp.zeros((M, K, 3) if v else (M, K), jnp.float32)
        for k, v in names_vec.items()
    }


def _to_particles(fg: FluidGrids, act: jnp.ndarray) -> jnp.ndarray:
    pad = ((0, 2), (0, 0), (0, 0))[: act.ndim]
    return gather_from_grid(fg.tables, jnp.pad(act, pad))


# ----------------------------------------------------------------------
# physics passes
# ----------------------------------------------------------------------

def compute_density(fg: FluidGrids, scene: Scene, cfg: SimConfig) -> jnp.ndarray:
    """rho_i = sum_f m_j W + sum_b m_b W (src/BasicSPHSolver.cu:54-83)."""
    h = cfg.radius

    def dens(i, j, rel, r):
        return {"rho": j["mass"] * kn.w_cubic(r, h)}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos},
        [
            PairSource(fg.tables, {"pos": fg.pos, "mass": fg.mass}, dens),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       dens),
        ],
        _acc_zeros(fg, {"rho": False}),
    )
    return _to_particles(fg, acc["rho"])


def tait_pressure(density: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """p = stiff ((rho/rho0)^7 - 1), clamped >= 0
    (src/BasicSPHSolver.cu:103-111)."""
    p = cfg.stiff * ((density / cfg.rho0) ** 7 - 1.0)
    return jnp.maximum(p, 0.0)


def pressure_accel(
    fg: FluidGrids,
    scene: Scene,
    density: jnp.ndarray,
    pressure: jnp.ndarray,
    cfg: SimConfig,
) -> jnp.ndarray:
    """Symmetric pressure acceleration with boundary mirroring and the MAX_A
    clamp (src/BasicSPHSolver.cu:113-165). Returns (N, 3)."""
    h, eps = cfg.radius, cfg.epsilon
    M, K = cfg.max_active_cells, cfg.max_per_cell
    rho_g = scatter_to_grid(fg.tables, density, M, K)
    p_g = scatter_to_grid(fg.tables, pressure, M, K)

    def fluid_term(i, j, rel, r):
        pi_over = i["p"] / jnp.maximum(eps, i["rho"] * i["rho"])
        pj_over = j["p"] / jnp.maximum(eps, j["rho"] * j["rho"])
        coef = -j["mass"] * (pi_over + pj_over)
        return {"a": coef[..., None] * kn.grad_w_cubic(rel, h)}

    def boundary_term(i, j, rel, r):
        pi_over = i["p"] / jnp.maximum(eps, i["rho"] * i["rho"])
        coef = -j["mass"] * pi_over
        return {"a": coef[..., None] * kn.grad_w_cubic(rel, h)}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "rho": rho_g, "p": p_g},
        [
            PairSource(fg.tables,
                       {"pos": fg.pos, "mass": fg.mass,
                        "rho": rho_g, "p": p_g}, fluid_term),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       boundary_term),
        ],
        _acc_zeros(fg, {"a": True}),
    )
    a = _to_particles(fg, acc["a"])
    # "dirty trick to prevent blowups in large dt" (src/BasicSPHSolver.cu:159-162)
    norm = jnp.linalg.norm(a, axis=-1, keepdims=True)
    return jnp.where(norm > cfg.max_accel, a / jnp.maximum(norm, eps) * cfg.max_accel, a)


def viscosity_dv(
    fg: FluidGrids, vel: jnp.ndarray, cfg: SimConfig, dt: float | jnp.ndarray
) -> jnp.ndarray:
    """Mueller viscosity diffusion, fluid-fluid only
    (src/BasicSPHSolver.cu:183-225): dv = visc dt sum_j m_j (v_j - v_i)/rho0
    lap_W(r)."""
    h = cfg.radius
    M, K = fg.pos.shape[0] - 2, fg.pos.shape[1]
    vel_g = scatter_to_grid(fg.tables, vel, M, K)

    def visc_term(i, j, rel, r):
        lap = kn.w_visc_laplacian(r, h)
        coef = j["mass"] * lap / cfg.rho0
        return {"dv": coef[..., None] * (j["vel"] - i["vel"])}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "vel": vel_g},
        [PairSource(fg.tables,
                    {"pos": fg.pos, "mass": fg.mass, "vel": vel_g},
                    visc_term)],
        _acc_zeros(fg, {"dv": True}),
    )
    return cfg.visc * dt * _to_particles(fg, acc["dv"])


def xsph_dv(
    fg: FluidGrids, vel: jnp.ndarray, cfg: SimConfig
) -> jnp.ndarray:
    """XSPH viscosity used by PBD (src/PBDSolver.cu:89-125):
    dv = c sum_j m_j (v_j - v_i) W / rho0."""
    h = cfg.radius
    M, K = fg.pos.shape[0] - 2, fg.pos.shape[1]
    vel_g = scatter_to_grid(fg.tables, vel, M, K)

    def xsph_term(i, j, rel, r):
        coef = j["mass"] * kn.w_cubic(r, h)
        return {"dv": coef[..., None] * (j["vel"] - i["vel"])}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "vel": vel_g},
        [PairSource(fg.tables,
                    {"pos": fg.pos, "mass": fg.mass, "vel": vel_g},
                    xsph_term)],
        _acc_zeros(fg, {"dv": True}),
    )
    return cfg.pbd_xsph_c * _to_particles(fg, acc["dv"]) / cfg.rho0


def color_gradient(fg: FluidGrids, scene: Scene, cfg: SimConfig) -> jnp.ndarray:
    """He-2014 color-field gradient over fluid + boundary
    (src/BasicSPHSolver.cu:277-318). Returns (N, 3)."""
    h, eps = cfg.radius, cfg.epsilon

    def make_term(rho_ref):
        def term(i, j, rel, r):
            vol = j["mass"] / rho_ref
            return {
                "num": vol[..., None] * kn.grad_w_cubic(rel, h),
                "den": vol * kn.w_cubic(r, h),
            }
        return term

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos},
        [
            PairSource(fg.tables, {"pos": fg.pos, "mass": fg.mass},
                       make_term(cfg.rho0)),
            PairSource(scene.b_tables,
                       {"pos": scene.b_pos_grid, "mass": scene.b_mass_grid},
                       make_term(cfg.rho_boundary)),
        ],
        _acc_zeros(fg, {"num": True, "den": False}),
    )
    num = _to_particles(fg, acc["num"])
    den = _to_particles(fg, acc["den"])
    return num / jnp.maximum(eps, den)[..., None]


def surface_accel(
    fg: FluidGrids,
    color_grad: jnp.ndarray,
    cfg: SimConfig,
) -> jnp.ndarray:
    """Surface tension + air pressure acceleration, fluid-fluid only
    (src/BasicSPHSolver.cu:332-370). Returns (N, 3)."""
    h, eps = cfg.radius, cfg.epsilon
    M, K = fg.pos.shape[0] - 2, fg.pos.shape[1]
    cg_g = scatter_to_grid(fg.tables, color_grad, M, K)
    rho0sq = cfg.rho0 * cfg.rho0

    def term(i, j, rel, r):
        ci2 = jnp.sum(i["cg"] * i["cg"], axis=-1)
        cj2 = jnp.sum(j["cg"] * j["cg"], axis=-1)
        st = (0.25 * j["mass"] / rho0sq * cfg.surface_tension
              * (ci2 + cj2))[..., None] * kn.grad_w_surface_tension(rel, h)
        # |n_i| / max(eps, |n_i|) gates interior particles (== 1 on surface)
        ni = jnp.sqrt(ci2)
        gate = ni / jnp.maximum(eps, ni)
        ap = (cfg.air_pressure * j["mass"] / rho0sq * gate)[..., None] \
            * kn.grad_w_cubic(rel, h)
        return {"a": st + ap}

    acc = neighbor_reduce(
        fg.tables,
        {"pos": fg.pos, "cg": cg_g},
        [PairSource(fg.tables,
                    {"pos": fg.pos, "mass": fg.mass, "cg": cg_g}, term)],
        _acc_zeros(fg, {"a": True}),
    )
    return _to_particles(fg, acc["a"])


def apply_surface_effects(
    fg: FluidGrids,
    scene: Scene,
    vel: jnp.ndarray,
    cfg: SimConfig,
    dt,
) -> jnp.ndarray:
    """handleSurface (src/BasicSPHSolver.cu:262-275): color gradient then
    surface forces; returns updated velocity."""
    cg = color_gradient(fg, scene, cfg)
    a = surface_accel(fg, cg, cfg)
    return vel + a * dt


def cheb_next(itn, omega, rho2, start):
    """Chebyshev semi-iteration weight for producing iterate ``itn``
    (1-based): 1 before the delayed start (identity extrapolation), then
    w = 2/(2-rho^2), then w = 4/(4-rho^2 w) ([2015][TOG][Wang]; see
    config.py pbd_chebyshev_rho / dfsph_chebyshev_rho)."""
    return jnp.where(itn < start, 1.0,
                     jnp.where(itn == start, 2.0 / (2.0 - rho2),
                               4.0 / (4.0 - rho2 * omega)))


def gravity_update(vel: jnp.ndarray, cfg: SimConfig, dt) -> jnp.ndarray:
    """force(): vel += dt * G (src/BasicSPHSolver.cu:227-235)."""
    return vel + dt * jnp.asarray(cfg.gravity, jnp.float32)


def enforce_boundary(pos: jnp.ndarray, vel: jnp.ndarray, cfg: SimConfig):
    """Wall clamp with inward-velocity zeroing
    (src/BasicSPHSolver.cu:85-96): pos clamped to [0, 0.99] * space; at the
    low wall vel >= 0, at the high wall vel <= 0 (per component)."""
    space = jnp.asarray(cfg.space_size, jnp.float32)
    lo = 0.0 * space
    hi = 0.99 * space
    at_lo = pos <= lo
    at_hi = pos >= hi
    new_pos = jnp.clip(pos, lo, hi)
    new_vel = jnp.where(at_lo, jnp.maximum(vel, 0.0), vel)
    new_vel = jnp.where(at_hi, jnp.minimum(new_vel, 0.0), new_vel)
    return new_pos, new_vel


def enforce_boundary_pos(pos: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """Position-only clamp used inside PBD projection
    (src/PBDSolver.cu:212-223)."""
    space = jnp.asarray(cfg.space_size, jnp.float32)
    return jnp.clip(pos, 0.0 * space, 0.99 * space)


def advect(pos: jnp.ndarray, vel: jnp.ndarray, cfg: SimConfig, dt):
    """pos += dt*vel then wall clamp (src/Particles.cu:28-36 +
    src/BasicSPHSolver.cu:98-101)."""
    return enforce_boundary(pos + dt * vel, vel, cfg)
