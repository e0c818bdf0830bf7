"""Multi-chip spatial sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu import parallel
from cpp_fluid_particles_tpu.models import common as C, dfsph, wcsph
from cpp_fluid_particles_tpu.state import make_fluid_state


@pytest.fixture(scope="module")
def setup():
    cfg = cfp.dam_break_config(max_active_cells=512, max_per_cell=16)
    scene = C.build_scene(cfg)
    s = cfg.spacing
    pos = np.array(
        [(0.3 + s * i, 0.2 + s * j, 0.3 + s * k)
         for i in range(6) for j in range(6) for k in range(6)], np.float32)
    state = make_fluid_state(pos, cfg)
    return cfg, scene, state


def test_mesh_has_8_devices():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("solver_mod", [wcsph, dfsph], ids=["wcsph", "dfsph"])
def test_sharded_step_matches_single_device(setup, solver_mod):
    cfg, scene, state = setup
    carry = solver_mod.init_carry(state)

    def step(state, carry, scene, dt):
        st, ca, m = solver_mod.step(state, carry, scene, cfg, dt)
        return st, ca

    ref_st, ref_ca = jax.jit(step)(state, carry, scene,
                                   jnp.float32(cfg.dt))

    mesh = parallel.make_mesh(8)
    with parallel.spatial_sharding(mesh):
        sh_st, sh_ca = jax.jit(step)(state, carry, scene,
                                     jnp.float32(cfg.dt))

    np.testing.assert_allclose(np.asarray(sh_st.pos), np.asarray(ref_st.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_st.vel), np.asarray(ref_st.vel),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sh_st.density),
                               np.asarray(ref_st.density), rtol=1e-5)


def test_multi_step_sharded_trajectory(setup):
    """10 sharded steps stay finite and contained."""
    cfg, scene, state = setup
    carry = wcsph.init_carry(state)
    mesh = parallel.make_mesh(8)
    with parallel.spatial_sharding(mesh):
        @jax.jit
        def step(state, carry, scene, dt):
            st, ca, m = wcsph.step(state, carry, scene, cfg, dt)
            return st, ca

        for _ in range(10):
            state, carry = step(state, carry, scene, jnp.float32(cfg.dt))
    p = np.asarray(state.pos)
    assert np.isfinite(p).all()
    assert (p >= 0).all() and (p <= 0.99).all()


def test_distributed_bootstrap_noop_single_process():
    """ensure_initialized is a safe no-op outside a multi-process job, and
    the local-shard helper covers the whole range in single-process."""
    from cpp_fluid_particles_tpu.parallel import distributed
    assert distributed.ensure_initialized() is False
    assert distributed.is_multiprocess_env() is False
    sl = distributed.local_device_slice(1000)
    assert (sl.start, sl.stop) == (0, 1000)
    assert distributed.process_index() == 0


def test_graft_entry_contract():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    st = out[0]
    assert np.isfinite(np.asarray(st.pos)).all()


def test_sharded_particle_state_100k_matches():
    """Sharded-vs-single equivalence at >=100k particles with the particle
    state sharded along N (not replicated): one dense WCSPH step on the
    scaled dam scene over the 8-device mesh must match the single-device
    run, and the jit must accept explicitly N-sharded inputs (the memory
    layout the 1M-particle v5e-8 configuration uses)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cpp_fluid_particles_tpu.models import dense_step as D
    from cpp_fluid_particles_tpu.ops import dense as dn
    from cpp_fluid_particles_tpu.state import boundary_positions

    cfg, pos = cfp.scaled_dam_scene(110_000)
    assert pos.shape[0] >= 100_000
    state = make_fluid_state(pos, cfg)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    dt = jnp.float32(cfg.dt)

    def step(st, sd, d):
        s2, _, m = D.wcsph_step(st, (), sd, cfg, d, dims, dims_b,
                                engine="xla")
        return s2, m["grid_overflow"]

    ref, ov = jax.jit(step)(state, scene_d, dt)
    assert int(np.asarray(ov)) == 0

    mesh = parallel.make_mesh(8)
    npart = NamedSharding(mesh, P(parallel.AXIS))
    sharded_in = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, npart) if a.ndim >= 1 else a, state)
    with parallel.spatial_sharding(mesh):
        sh, _ = jax.jit(step)(sharded_in, scene_d, dt)
    # outputs stay sharded along N — no O(N x devices) replication
    out_sharding = sh.pos.sharding
    assert not out_sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(sh.pos), np.asarray(ref.pos),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh.density),
                               np.asarray(ref.density), rtol=1e-5)


def test_simulation_under_mesh_matches_single(setup):
    """The ORCHESTRATOR-level multi-chip path: a Simulation constructed
    with a mesh, running the DEFAULT engine (the sliding box — its stencil
    slices unroll to static offsets under a mesh, so GSPMD lowers them to
    halo exchanges), must track a single-device default-engine Simulation
    through several frames, with auto-capacity live on both. This is the
    exact recipe README's 1M multi-chip section prescribes."""
    cfg, _, _ = setup
    pos = small_block_pos()
    mesh = parallel.make_mesh(8)
    sim_m = cfp.Simulation(solver="dfsph", cfg=cfg, fluid_pos=pos,
                           warmup=False, mesh=mesh)
    assert sim_m.engine == "dense", "mesh keeps the default (box) engine"
    sim_1 = cfp.Simulation(solver="dfsph", cfg=cfg, fluid_pos=pos,
                           warmup=False)
    for _ in range(3):
        sim_m.step()
        sim_1.step()
    # identical program modulo GSPMD partitioning: reductions stay on the
    # unsharded K/offset axes, so results match to float tolerance
    np.testing.assert_allclose(np.asarray(sim_m.state.pos),
                               np.asarray(sim_1.state.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sim_m.state.vel),
                               np.asarray(sim_1.state.vel), atol=1e-4)
    assert int(np.asarray(sim_m.metrics["grid_overflow"])) == 0
    # the particle state comes back sharded, not replicated
    assert not sim_m.state.pos.sharding.is_fully_replicated


def test_sharded_box_engine_matches_bitwise(setup):
    """The DEFAULT (sliding-box) executor under the 8-device mesh is
    bitwise-identical to the single-device run: the box's flat cell axis
    is x-slab-sharded, its static-offset stencil slices become
    collective-permute halos, and the boundary window (a dynamic slice of
    replicated static data at the traced box origin) needs no gather."""
    from cpp_fluid_particles_tpu.models import dense_step as D
    from cpp_fluid_particles_tpu.ops import dense as dn
    from cpp_fluid_particles_tpu.state import boundary_positions

    cfg, _, state = setup
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xlab")
    dt = jnp.float32(cfg.dt)
    box = (12, 12, 12)

    def step(st, sd, d):
        s2, _, m = D.wcsph_step(st, (), sd, cfg, d, dims, dims_b,
                                engine="xlab", box=box)
        return s2, m["box_overflow"]

    ref, ov = jax.jit(step)(state, scene_d, dt)
    assert int(np.asarray(ov)) == 0
    with parallel.spatial_sharding(parallel.make_mesh(8)):
        sh, _ = jax.jit(step)(state, scene_d, dt)
    np.testing.assert_array_equal(np.asarray(sh.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(sh.vel), np.asarray(ref.vel))


def test_simulation_under_mesh_run_scan_and_capacity(setup):
    """run_scan (the benchmark path) under a mesh: several chained-scan
    chunks execute, auto-capacity machinery stays live (overflow fetch,
    downshift votes), and the trajectory stays finite/contained."""
    cfg, _, _ = setup
    mesh = parallel.make_mesh(8)
    sim = cfp.Simulation(solver="wcsph", cfg=cfg,
                         fluid_pos=small_block_pos(), warmup=False,
                         mesh=mesh)
    for _ in range(3):
        sim.run_scan(4)
    p = np.asarray(sim.state.pos)
    assert np.isfinite(p).all()
    assert (p >= 0).all() and (p <= 0.99 * np.asarray(cfg.space_size)).all()
    assert sim.dropped_frames == 0


def small_block_pos():
    s = 0.02
    return np.array(
        [(0.3 + s * i, 0.2 + s * j, 0.3 + s * k)
         for i in range(6) for j in range(6) for k in range(6)], np.float32)


def test_sharded_dense_engine_matches(setup):
    """The dense engine under x-slab spatial sharding must match the
    unsharded run exactly (GSPMD halo exchange over the ghosted grid)."""
    from cpp_fluid_particles_tpu.models import dense_step as D
    from cpp_fluid_particles_tpu.ops import dense as dn
    from cpp_fluid_particles_tpu.state import boundary_positions

    cfg, _, state = setup
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    dt = jnp.float32(cfg.dt)

    def step(st, sd, d):
        s2, _, _m = D.wcsph_step(st, (), sd, cfg, d, dims, dims_b,
                                 engine="xla")
        return s2

    ref = jax.jit(step)(state, scene_d, dt)
    with parallel.spatial_sharding(parallel.make_mesh(8)):
        sh = jax.jit(step)(state, scene_d, dt)
    np.testing.assert_allclose(np.asarray(sh.pos), np.asarray(ref.pos),
                               atol=1e-6)
