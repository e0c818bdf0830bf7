"""Occupancy-split solver steps — WCSPH and PBD over the two-tier layout.

Same physics contract as models/dense_step.py (each fold cites the same
reference lines through the shared pass bodies in ops/pallas_passes.py),
but the per-step grid state is the occupancy-class split of ops/split.py:
class A = the sliding box truncated to K_a slot rows, class B = the
overflow window carrying ranks >= K_a. Every grid tensor is an ``SP``
pair; elementwise updates map over both tiers (``smap``), every neighbor
pass dispatches through ``pallas_passes._run_split``.

Float-contract note: pair sums are REGROUPED relative to dense_step (an
A-particle's B-neighbors arrive in a separate fold), so positions match
the single-tier engine float-close (~1e-6 rel per pass, measured in
exp/occupancy_split.py and tests/test_split.py), not bitwise. The
physics (who interacts with whom, with what terms) is identical.

WCSPH/PBD only: these are the traversal-bound solvers the split targets
(VERDICT r4 #1-2); DFSPH's gap is iteration count, addressed by the
validated solver modes instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops import box as bx
from ..ops import pallas_passes as pp
from ..ops import split as spl
from ..ops.dense import DenseDims
from ..ops.grid import POS_PAD
from ..state import FluidState
from . import pbd as pbd_mod
from .common import cheb_next as _cheb_next
from .dense_step import (
    DenseScene,
    _accel_clamp,
    _clamp_pos_only,
    _clamp_pos_vel,
    _fallback,
    _grav,
    _merge_back,
    _uniform_mass_row,
)

F32 = jnp.float32
SP, smap = spl.SP, spl.smap


def _layout_split(pos, cfg, dims, dims_b, scene_d, box, wbox, k_a,
                  use_bd=True):
    """Split analogue of dense_step._layout: class-A box at K_a, overflow
    window at k_b = K - K_a, one combined fill scatter / read gather."""
    assert dims.k > k_a, "split needs K > K_a"
    assert all(w <= b for w, b in zip(wbox, box)), "window exceeds box"
    da = DenseDims(box[0], box[1], box[2], k_a)
    dw = DenseDims(wbox[0], wbox[1], wbox[2], dims.k - k_a)
    idx = spl.build_split_index(pos, cfg, dims, da, dw)
    sdims = spl.SplitDims(a=da, w=dw, start=idx.start)
    bdims_b = DenseDims(box[0], box[1], box[2], dims_b.k)
    if use_bd:
        bdx = bx.slice_boundary_box(scene_d.bd, dims, bdims_b, dims_b.k,
                                    idx.origin)
        row0 = bdx[0]
    else:
        bdx = None
        row0 = bx.slice_boundary_box(scene_d.bd[0:1], dims, bdims_b,
                                     dims_b.k, idx.origin)[0]
    touch = jnp.sum(row0 < POS_PAD / 2.0).astype(jnp.int32)
    fill = lambda fields, fills: spl.fill_split(idx, fields, fills, da, dw)
    read = lambda sp: spl.read_split(idx, sp)
    return idx, fill, read, sdims, bdims_b, bdx, touch


def _split_metrics(idx: spl.SplitIndex, touch):
    """Extended capacity vector: the plain 7 scalars (_base_metrics) plus
    win_overflow and the measured hi-cell extents (the window's adaptive
    axis) — 11 int32 in ONE host fetch."""
    m = {"grid_overflow": idx.overflow,
         "box_overflow": idx.box_overflow,
         "box_ext": idx.ext,
         "active_cells": jnp.prod(idx.ext),
         "max_occupancy": idx.max_occupancy,
         "bd_touch": touch,
         "win_overflow": idx.win_overflow,
         "win_ext": idx.wext}
    m["capacity"] = jnp.concatenate([
        jnp.stack([m["grid_overflow"], m["box_overflow"],
                   m["max_occupancy"]]), m["box_ext"],
        m["bd_touch"][None], m["win_overflow"][None], m["win_ext"]])
    return m


# ----------------------------------------------------------------------
# WCSPH (dense_step.wcsph_step over the split layout)
# ----------------------------------------------------------------------

def wcsph_step_split(state: FluidState, carry, scene_d: DenseScene,
                     cfg: SimConfig, dt, dims: DenseDims,
                     dims_b: DenseDims, box: Tuple[int, int, int],
                     wbox: Tuple[int, int, int], k_a: int,
                     use_bd: bool = True):
    idx, fill, read, sdims, bdims_b, bdx, touch = _layout_split(
        state.pos, cfg, dims, dims_b, scene_d, box, wbox, k_a, use_bd)
    if cfg.uniform_fluid_mass:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2]],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0])
        pos_d, vel_d = base[0:3], base[3:6]
        mass_d = smap(lambda p: _uniform_mass_row(p, cfg), pos_d)
    else:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2], state.mass,
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2]],
            [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0])
        pos_d, mass_d, vel_d = base[0:3], base[3:4], base[4:7]
    surface_on = (cfg.surface_tension > cfg.epsilon
                  or cfg.air_pressure > cfg.epsilon)

    vel_d = smap(lambda v: _grav(v, cfg, dt), vel_d)
    pmv = smap(lambda a, b, c: jnp.concatenate([a, b, c], 0),
               pos_d, mass_d, vel_d)
    if surface_on:
        o = pp.density_colorgrad_visc_pass(pmv, bdx, None, sdims, bdims_b,
                                           cfg, "xla")
        rho = o[0]
        cg = smap(lambda n, d: n / jnp.maximum(cfg.epsilon, d)[None],
                  o[1:4], o[4])
        vel_d = vel_d + o[5:8] * (cfg.visc * dt)
        p = smap(lambda r: jnp.maximum(
            cfg.stiff * ((r / cfg.rho0) ** 7 - 1.0), 0.0), rho)
        spin = smap(lambda ps, m, r, pr, c: jnp.concatenate(
            [ps, m, r[None], pr[None], c], 0), pos_d, mass_d, rho, p, cg)
        sp_ = pp.surface_pressure_pass(spin, bdx, None, sdims, bdims_b,
                                       cfg, "xla")
        vel_d = vel_d + sp_[0:3] * dt
        vel_d = vel_d + smap(lambda a: _accel_clamp(a, cfg),
                             sp_[3:6]) * dt
    else:
        o = pp.density_visc_pass(pmv, bdx, None, sdims, bdims_b, cfg,
                                 "xla")
        rho = o[0]
        vel_d = vel_d + o[1:4] * (cfg.visc * dt)
        p = smap(lambda r: jnp.maximum(
            cfg.stiff * ((r / cfg.rho0) ** 7 - 1.0), 0.0), rho)
        a = pp.pressure_force_pass(
            smap(lambda ps, m, r, pr: jnp.concatenate(
                [ps, m, r[None], pr[None]], 0), pos_d, mass_d, rho, p),
            bdx, None, sdims, bdims_b, cfg, "xla")
        vel_d = vel_d + smap(lambda x: _accel_clamp(x, cfg), a) * dt

    pos_d = pos_d + dt * vel_d
    pos_d, vel_d = smap(lambda ps, v: _clamp_pos_vel(ps, v, cfg),
                        pos_d, vel_d)

    out = read(smap(lambda ps, v, r, pr: jnp.concatenate(
        [ps, v, r[None], pr[None]], 0), pos_d, vel_d, rho, p))
    fb_pos, fb_vel = _fallback(state, cfg, dt)
    pos, vel = _merge_back(idx, out, fb_pos, fb_vel)
    new_state = state._replace(pos=pos, vel=vel, density=out[6],
                               pressure=out[7])
    return new_state, carry, _split_metrics(idx, touch)


# ----------------------------------------------------------------------
# PBD (dense_step.pbd_step over the split layout)
# ----------------------------------------------------------------------

def pbd_step_split(state: FluidState, carry, scene_d: DenseScene,
                   cfg: SimConfig, dt, dims: DenseDims, dims_b: DenseDims,
                   box: Tuple[int, int, int], wbox: Tuple[int, int, int],
                   k_a: int, use_bd: bool = True):
    idx, fill, read, sdims, bdims_b, bdx, touch = _layout_split(
        state.pos, cfg, dims, dims_b, scene_d, box, wbox, k_a, use_bd)
    warm = float(cfg.pbd_warm_start) > 0.0
    wfields = ([carry.dp_warm[:, 0], carry.dp_warm[:, 1],
                carry.dp_warm[:, 2]] if warm else [])
    wfill = [0.0, 0.0, 0.0] if warm else []
    if cfg.uniform_fluid_mass:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             carry.pos_last[:, 0], carry.pos_last[:, 1],
             carry.pos_last[:, 2]] + wfields,
            [POS_PAD, POS_PAD, POS_PAD, POS_PAD, POS_PAD, POS_PAD] + wfill)
        pos_d, plast_d, dpw_d = base[0:3], base[3:6], base[6:9]
        mass_d = smap(lambda p: _uniform_mass_row(p, cfg), pos_d)
    else:
        base = fill(
            [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2], state.mass,
             carry.pos_last[:, 0], carry.pos_last[:, 1],
             carry.pos_last[:, 2]] + wfields,
            [POS_PAD, POS_PAD, POS_PAD, 0.0, POS_PAD, POS_PAD, POS_PAD]
            + wfill)
        pos_d, mass_d, plast_d, dpw_d = (base[0:3], base[3:4], base[4:7],
                                         base[7:10])

    pos_adv_d = pos_d
    if warm:
        pos_d = smap(lambda p: _clamp_pos_only(p, cfg),
                     pos_d + cfg.pbd_warm_start * dpw_d)

    def _project_once(p_d):
        lam5 = pp.pbd_lambda_pass((p_d, mass_d), bdx, None, sdims,
                                  bdims_b, cfg, "xla")
        rho = lam5[0]
        lam = smap(
            lambda r, g1, g2, g3, sl: jnp.where(
                r > cfg.rho0,
                -(r / cfg.rho0 - 1.0)
                / (g1 ** 2 + g2 ** 2 + g3 ** 2 + sl + cfg.epsilon),
                0.0) * cfg.pbd_relaxation,
            rho, lam5[1], lam5[2], lam5[3], lam5[4])
        alive = jnp.any(lam.a != 0.0) | jnp.any(lam.b != 0.0)
        if cfg.pbd_density_tolerance > 0.0:
            rmax = jnp.maximum(jnp.max(rho.a), jnp.max(rho.b))
            alive = alive & (rmax / cfg.rho0 - 1.0
                             > cfg.pbd_density_tolerance)
        dp = pp.stiffness_accel_pass(
            (p_d, mass_d, lam[None]), bdx, None, sdims, bdims_b, cfg,
            "xla") / cfg.rho0
        return smap(lambda p: _clamp_pos_only(p, cfg), p_d + dp), rho, \
            alive

    zero_rho = smap(lambda p: jnp.zeros(p.shape[1:], F32), pos_d)
    if cfg.pbd_chebyshev_rho > 0.0:
        rho2 = float(cfg.pbd_chebyshev_rho) ** 2

        def project_cond(c):
            it, _, _, _, _, alive = c
            return ((it < 1) | alive) & (it < cfg.pbd_max_iter)

        def project_body(c):
            it, p_d, p_prev, omega, _, _ = c
            p_new, rho, alive = _project_once(p_d)
            omega = _cheb_next(it + 1, omega, rho2, cfg.chebyshev_start)
            p_acc = smap(lambda n_, pv: jnp.where(
                alive, omega * (n_ - pv) + pv, n_), p_new, p_prev)
            return (it + 1, smap(lambda p: _clamp_pos_only(p, cfg), p_acc),
                    p_d, omega, rho, alive)

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

    vel_d = (pos_d - plast_d) / dt
    if cfg.surface_tension > cfg.epsilon or cfg.air_pressure > cfg.epsilon:
        o = pp.xsph_colorgrad_pass(
            smap(lambda p, m, v: jnp.concatenate([p, m, v], 0),
                 pos_d, mass_d, vel_d), bdx, None, sdims, bdims_b, cfg,
            "xla")
        vel_d = vel_d + o[0:3] * (cfg.pbd_xsph_c / cfg.rho0)
        cg = smap(lambda n, d: n / jnp.maximum(cfg.epsilon, d)[None],
                  o[3:6], o[6])
        sa = pp.surface_pass(
            smap(lambda p, m, c: jnp.concatenate([p, m, c], 0),
                 pos_d, mass_d, cg), None, sdims, cfg, "xla")
        vel_d = vel_d + sa * dt
    else:
        vel_d = vel_d + pp.xsph_pass(
            smap(lambda p, m, v: jnp.concatenate([p, m, v], 0),
                 pos_d, mass_d, vel_d), None, sdims, cfg,
            "xla") * (cfg.pbd_xsph_c / cfg.rho0)
    vel_d = smap(lambda v: _grav(v, cfg, dt), vel_d)

    plast_d = pos_d
    pos_d = pos_d + dt * vel_d
    pos_d, vel_d = smap(lambda p, v: _clamp_pos_vel(p, v, cfg),
                        pos_d, vel_d)

    if warm:
        out = read(smap(lambda p, v, r, pl, dw: jnp.concatenate(
            [p, v, r[None], pl, pl - dw], 0),
            pos_d, vel_d, rho, plast_d, pos_adv_d))
    else:
        out = read(smap(lambda p, v, r, pl: jnp.concatenate(
            [p, v, r[None], pl], 0), pos_d, vel_d, rho, plast_d))
    fb_pos, fb_vel = _fallback(state, cfg, dt)
    pos, vel = _merge_back(idx, out, fb_pos, fb_vel)
    pos_last = jnp.where(idx.valid[:, None], out[7:10].T, state.pos)
    dp_warm = (jnp.where(idx.valid[:, None], out[10:13].T, 0.0)
               if warm else jnp.zeros_like(state.pos))
    new_state = state._replace(pos=pos, vel=vel, density=out[6])
    new_carry = pbd_mod.PBDCarry(pos_last=pos_last, dp_warm=dp_warm)
    metrics = {**_split_metrics(idx, touch), "pbd_iters": pbd_it}
    return new_state, new_carry, metrics


SPLIT_STEPS = {"wcsph": wcsph_step_split, "pbd": pbd_step_split}
