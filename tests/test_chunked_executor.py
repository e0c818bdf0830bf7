"""Slab-chunked symmetric executor + uniform-mass fill row.

The chunked executor (ops/pallas_passes.column_pass_xla_sym_chunked) is
the large-grid fast path (engaged automatically above CHUNK_MIN_PAIR_MB,
e.g. the 1M-particle scene); it must be BITWISE equal to the unchunked
symmetric executor — every directed pair is evaluated in the same
(i-cell, offset) fold either way, only the j-partial routing differs, and
that routing is pure zero-padding + adds of the same partials.

The uniform-mass path (cfg.uniform_fluid_mass) derives the grid mass row
from slot occupancy instead of scattering state.mass; with the m0-uniform
masses make_fluid_state produces it must also be bitwise-identical.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import dense_step as D
from cpp_fluid_particles_tpu.models import dfsph, pbd, wcsph
from cpp_fluid_particles_tpu.ops import box as bx
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
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
    state = make_fluid_state(small_block(), CFG)
    return dict(scene_d=scene_d, dims=dims, dims_b=dims_b, state=state,
                kb=kb)


@pytest.fixture()
def chunk_override():
    """Restore the module knob even when an assertion fails."""
    yield
    pp.CHUNK_OVERRIDE = None


@pytest.mark.parametrize("nchunk", [2, 3])
def test_chunked_passes_bitwise_equal(setup, chunk_override, nchunk):
    s = setup
    cfg = CFG
    rng = np.random.default_rng(7)
    pos = (small_block() + rng.normal(0, 1e-3, small_block().shape)
           ).astype(np.float32)
    n = pos.shape[0]
    mass = np.full((n,), cfg.m0, np.float32)
    extra = rng.normal(0, 1.0, (n,)).astype(np.float32)
    dims, dims_b = s["dims"], s["dims_b"]

    def run(engine):
        fl = dn.fill_dense(
            dn.build_dense_index(jnp.asarray(pos), cfg, dims),
            [pos[:, 0], pos[:, 1], pos[:, 2], mass, extra],
            [dn.POS_PAD] * 3 + [0.0, 0.0], dims)
        d = pp.density_pass(fl[:4], s["scene_d"].bd, None, dims, dims_b,
                            cfg, engine=engine)
        sa = pp.stiffness_accel_pass(fl, s["scene_d"].bd, None, dims,
                                     dims_b, cfg, engine=engine)
        v = pp.viscosity_pass(
            jnp.concatenate([fl[:4], fl[3:4] * 0, fl[4:5], fl[3:4]], 0),
            None, dims, cfg, engine=engine)
        return d, sa, v

    pp.CHUNK_OVERRIDE = 1
    want = jax.jit(run, static_argnums=0)("xla")
    pp.CHUNK_OVERRIDE = nchunk
    got = jax.jit(run, static_argnums=0)("xla")
    for w, g in zip(want, got):
        assert (np.asarray(w) == np.asarray(g)).all()


def test_auto_nchunk_policy():
    # 20k dam shapes stay unchunked; the 1M box chunks to ~CHUNK_TARGET
    assert pp._auto_nchunk(22, 19683) == 1           # splash box, 38 MB
    assert pp._auto_nchunk(12, 230514) > 4           # 1M box, 137 MB
    assert pp._auto_nchunk(4, 1000) == 1


@pytest.mark.parametrize("solver,ref_mod,dense_fn", [
    ("wcsph", wcsph, D.wcsph_step),
    ("dfsph", dfsph, D.dfsph_step),
    ("pbd", pbd, D.pbd_step),
])
def test_uniform_mass_row_bitwise_equal(setup, solver, ref_mod, dense_fn):
    s = setup
    state = s["state"]
    carry = ref_mod.init_carry(state)
    dt = jnp.float32(CFG.dt)
    outs = {}
    for uni in (True, False):
        cfg = CFG.replace(uniform_fluid_mass=uni)
        st, _, m = jax.jit(lambda st_, ca_, c=cfg: dense_fn(
            st_, ca_, s["scene_d"], c, dt, s["dims"], s["dims_b"],
            engine="xla"))(state, carry)
        outs[uni] = (np.asarray(st.pos), np.asarray(st.vel),
                     np.asarray(st.density))
    for a, b in zip(outs[True], outs[False]):
        assert (a == b).all()


def test_nonuniform_mass_honored_when_disabled(setup):
    """With cfg.uniform_fluid_mass=False the dense path must stream the
    stored per-particle masses (a heavier particle raises its neighbors'
    densities); with the flag on, custom masses are deliberately ignored
    in favor of the documented m0 contract."""
    s = setup
    state = s["state"]
    heavy = state._replace(mass=state.mass * 3.0)
    dt = jnp.float32(CFG.dt)

    def run(cfg, st):
        out, _, _ = jax.jit(lambda st_, c=cfg: D.wcsph_step(
            st_, None, s["scene_d"], c, dt, s["dims"], s["dims_b"],
            engine="xla"))(st)
        return np.asarray(out.density)

    base = run(CFG.replace(uniform_fluid_mass=False), state)
    heavy_off = run(CFG.replace(uniform_fluid_mass=False), heavy)
    heavy_on = run(CFG.replace(uniform_fluid_mass=True), heavy)
    assert (heavy_off > base * 1.5).all()
    assert (heavy_on == base).all()
