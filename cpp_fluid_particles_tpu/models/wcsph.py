"""Weakly Compressible SPH solver [Becker & Teschner 2007].

TPU-native re-design of BasicSPHSolver (src/BasicSPHSolver.cu:237-260).
One jitted, fully fused step; no kernel-launch or host-sync boundaries.

Step order matches the reference:
  gravity -> viscosity -> (surface tension/air pressure) ->
  density -> Tait EOS -> pressure force -> advect + wall clamp.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..config import SimConfig
from ..state import FluidState
from . import common as C


def init_carry(state: FluidState) -> Tuple:
    """WCSPH carries no cross-step per-particle state."""
    return ()


def step(
    state: FluidState,
    carry: Tuple,
    scene: C.Scene,
    cfg: SimConfig,
    dt: float,
) -> Tuple[FluidState, Tuple, Dict[str, Any]]:
    fg = C.make_fluid_grids(state.pos, state.mass, scene, cfg)

    # step 1: gravity (src/BasicSPHSolver.cu:244)
    vel = C.gravity_update(state.vel, cfg, dt)
    # step 2: viscosity diffusion (src/BasicSPHSolver.cu:246-248)
    vel = vel + C.viscosity_dv(fg, vel, cfg, dt)
    # surface tension + air pressure, statically gated like the reference's
    # EPSILON check (src/BasicSPHSolver.cu:249-253)
    if cfg.surface_tension > cfg.epsilon or cfg.air_pressure > cfg.epsilon:
        vel = C.apply_surface_effects(fg, scene, vel, cfg, dt)
    # step 3: pressure projection (src/BasicSPHSolver.cu:167-181)
    density = C.compute_density(fg, scene, cfg)
    pressure = C.tait_pressure(density, cfg)
    vel = vel + C.pressure_accel(fg, scene, density, pressure, cfg) * dt
    # step 4: advect + wall clamp (src/BasicSPHSolver.cu:98-101)
    pos, vel = C.advect(state.pos, vel, cfg, dt)

    new_state = state._replace(
        pos=pos, vel=vel, density=density, pressure=pressure
    )
    metrics = {
        "grid_overflow": fg.tables.overflow,
        "active_cells": fg.tables.num_active,
    }
    return new_state, carry, metrics
