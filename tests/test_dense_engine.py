"""Differential tests: dense (ghosted-grid, per-offset XLA) engine vs the
reference (compacted-cell gather) engine — same physics, two executors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import common as C, dense_step as D
from cpp_fluid_particles_tpu.models import dfsph, pbd, wcsph
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.state import (
    boundary_positions, dam_break_positions, make_fluid_state,
)

from helpers import SMALL_CFG as CFG, small_block


@pytest.fixture(scope="module")
def setup():
    bpos = boundary_positions(CFG)
    kb = D.boundary_k(bpos, CFG)
    dims = dn.dims_for(CFG)
    dims_b = dn.dims_for(CFG, kb)
    scene_d = D.build_dense_scene(CFG, bpos, kb, engine="xla")
    scene = C.build_scene(CFG, bpos)
    state = make_fluid_state(small_block(), CFG)
    return dict(scene=scene, scene_d=scene_d, dims=dims, dims_b=dims_b,
                state=state)


@pytest.mark.parametrize("solver,ref_mod,dense_fn", [
    ("wcsph", wcsph, D.wcsph_step),
    ("dfsph", dfsph, D.dfsph_step),
    ("pbd", pbd, D.pbd_step),
])
def test_dense_step_matches_reference_engine(setup, solver, ref_mod,
                                             dense_fn):
    s = setup
    state = s["state"]
    carry = ref_mod.init_carry(state)
    dt = jnp.float32(CFG.dt)

    ref_step = jax.jit(lambda st, ca, sc, d: ref_mod.step(st, ca, sc, CFG, d))
    dx_step = jax.jit(lambda st, ca, sc, d: dense_fn(
        st, ca, sc, CFG, d, s["dims"], s["dims_b"], engine="xla"))

    st_r, ca_r = state, carry
    st_d, ca_d = state, carry
    for _ in range(3):
        st_r, ca_r, m_r = ref_step(st_r, ca_r, s["scene"], dt)
        st_d, ca_d, m_d = dx_step(st_d, ca_d, s["scene_d"], dt)

    np.testing.assert_allclose(np.asarray(st_d.pos), np.asarray(st_r.pos),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_d.vel), np.asarray(st_r.vel),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_d.density),
                               np.asarray(st_r.density), rtol=1e-4, atol=1e-6)
    assert int(np.asarray(m_d["grid_overflow"])) == 0
    if solver == "dfsph":
        assert int(np.asarray(m_d["density_iters"])) == \
            int(np.asarray(m_r["density_iters"]))


@pytest.mark.parametrize("engine", ["xla", "xlab"])
@pytest.mark.parametrize("solver,ref_mod,dense_fn", [
    ("wcsph", wcsph, D.wcsph_step),
    ("dfsph", dfsph, D.dfsph_step),
    ("pbd", pbd, D.pbd_step),
])
def test_xla_executors_agree(setup, engine, solver, ref_mod, dense_fn):
    """The symmetric half-stencil ('xla') and sliding-box ('xlab')
    executors must reproduce the plain 27-offset loop ('xla27') for a
    full step of every solver."""
    s = setup
    state = s["state"]
    carry = ref_mod.init_carry(state)
    dt = jnp.float32(CFG.dt)
    box = (8, 8, 8) if engine == "xlab" else None

    a_step = jax.jit(lambda st, ca, sc, d: dense_fn(
        st, ca, sc, CFG, d, s["dims"], s["dims_b"], engine="xla27"))
    b_step = jax.jit(lambda st, ca, sc, d: dense_fn(
        st, ca, sc, CFG, d, s["dims"], s["dims_b"], engine=engine,
        box=box))
    st_a, _, m_a = a_step(state, carry, s["scene_d"], dt)
    st_b, _, m_b = b_step(state, carry, s["scene_d"], dt)
    np.testing.assert_allclose(np.asarray(st_b.pos), np.asarray(st_a.pos),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_b.vel), np.asarray(st_a.vel),
                               atol=2e-3)
    assert int(np.asarray(m_b["grid_overflow"])) == 0
    assert int(np.asarray(m_b.get("box_overflow", 0))) == 0


def test_dense_boundary_mass_matches(setup):
    s = setup
    # boundary mass via read-back from the dense scene vs the gather scene
    bpos = boundary_positions(CFG)
    kb = D.boundary_k(bpos, CFG)
    dims_b = dn.dims_for(CFG, kb)
    idx = jax.jit(lambda p: dn.build_dense_index(p, CFG, dims_b))(
        jnp.asarray(bpos))
    # scene_d.bd rows: [posx, posy, posz, mass]
    got = np.asarray(jax.jit(dn.read_dense)(idx, s["scene_d"].bd[3:4])[0])
    want = np.asarray(s["scene"].b_mass)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_simulation_dense_engine_runs():
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=True)
    assert sim.engine == "dense"
    for _ in range(10):
        sim.step()
    p = np.asarray(sim.state.pos)
    assert np.isfinite(p).all()
    assert (p >= 0).all() and (p <= 0.99).all()


def test_run_scan_matches_stepwise():
    sim1 = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                          warmup=False)
    sim2 = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                          warmup=False)
    for _ in range(5):
        sim1.step()
    sim2.run_scan(5)
    # scan and single-step compile to different fusions; same physics up to
    # f32 reassociation
    np.testing.assert_allclose(np.asarray(sim1.state.pos),
                               np.asarray(sim2.state.pos), atol=1e-6)
