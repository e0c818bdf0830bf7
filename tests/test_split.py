"""Occupancy-class split (ops/split.py, models/split_step.py): the
two-tier executor must be float-close to the single-tier box engine at
step level, and Simulation's adaptive window axis must preserve the
no-drop contract (VERDICT r4 #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import dense_step, split_step
from cpp_fluid_particles_tpu.models import pbd as pbd_mod
from cpp_fluid_particles_tpu.models import wcsph as wcsph_mod
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import split as spl
from cpp_fluid_particles_tpu.state import boundary_positions, \
    make_fluid_state

from helpers import SMALL_CFG, small_block

CFG = SMALL_CFG.replace(max_per_cell=12, split_k_a=4)


def _scene():
    """A near-wall block with ~8 particles/cell: every occupied cell
    exceeds K_a=4, several exceed it by 2x — both tiers populated."""
    rng = np.random.RandomState(0)
    pos = small_block(8, origin=(0.02, 0.02, 0.16), cfg=CFG)
    pos = pos + rng.uniform(-0.002, 0.002, pos.shape).astype(np.float32)
    state = make_fluid_state(pos, CFG)
    b_pos = boundary_positions(CFG)
    kb = dense_step.boundary_k(b_pos, CFG)
    scene = dense_step.build_dense_scene(CFG, b_pos, kb, engine="xlab")
    return state, scene, dn.dims_for(CFG), dn.dims_for(CFG, kb)


def test_split_index_partitions_every_particle():
    state, _, dims, _ = _scene()
    da = dn.DenseDims(8, 8, 8, 4)
    dw = dn.DenseDims(8, 8, 8, 8)
    idx = spl.build_split_index(state.pos, CFG, dims, da, dw)
    n = state.n
    assert int(idx.box_overflow) == 0
    assert int(idx.win_overflow) == 0
    assert int(idx.overflow) == 0
    assert bool(np.asarray(idx.valid).all())
    # slots injective over valid particles, within the combined space
    slots = np.asarray(idx.slots)
    assert len(np.unique(slots)) == n
    assert slots.max() < da.k * da.g + dw.k * dw.g
    # fill/read roundtrip: every particle reads back its own field value
    vals = np.arange(n, dtype=np.float32)
    sp = spl.fill_split(idx, [jnp.asarray(vals)], [0.0], da, dw)
    out = np.asarray(spl.read_split(idx, sp))[0]
    np.testing.assert_array_equal(out, vals)


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["wcsph", "pbd"])
def test_split_step_matches_plain(solver):
    state, scene, dims, dims_b = _scene()
    carry = (pbd_mod if solver == "pbd" else wcsph_mod).init_carry(state)
    box, wbox = (12, 12, 12), (12, 12, 12)
    dt = jnp.float32(CFG.dt)
    plain = dense_step.DENSE_STEPS[solver]
    split = split_step.SPLIT_STEPS[solver]
    s1, c1, m1 = jax.jit(lambda st, ca: plain(
        st, ca, scene, CFG, dt, dims, dims_b, engine="xlab",
        box=box))(state, carry)
    s2, c2, m2 = jax.jit(lambda st, ca: split(
        st, ca, scene, CFG, dt, dims, dims_b, box=box, wbox=wbox,
        k_a=4))(state, carry)
    # pair sums are regrouped (AA + A<-B separate folds): float-close,
    # not bitwise
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(s1.vel), np.asarray(s2.vel),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(s1.density),
                               np.asarray(s2.density), rtol=2e-5,
                               atol=2e-5)
    assert int(m2["grid_overflow"]) == 0
    assert int(m2["win_overflow"]) == 0


@pytest.mark.slow
def test_split_simulation_no_drop_retry():
    """A deliberately tiny initial window must grow through the retry
    contract (or fall back) without ever dropping a particle."""
    cfg = CFG.replace(occupancy_split=True, split_k_a=4)
    pos = _scene()[0].pos
    sim = cfp.Simulation(solver="pbd", cfg=cfg, fluid_pos=np.asarray(pos),
                         warmup=False)
    # force the split program with a window far too small for the block
    sim.split_on = True
    sim.wbox = (4, 4, 4)
    sim._build_step()
    sim.run_scan(3)
    assert sim.dropped_frames == 0
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0
    assert int(np.asarray(sim.metrics["win_overflow"])) == 0
    assert sim.retries >= 1
    assert np.isfinite(np.asarray(sim.state.pos)).all()
