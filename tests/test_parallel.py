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
    cfg = cfp.dam_break_config(mode="parity", max_active_cells=512, max_per_cell=16)
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


def test_distributed_two_process():
    """REAL multi-process coverage: two OS processes, each owning one CPU
    device, bootstrap via ``distributed.ensure_initialized()`` (the env-var
    contract), form a global 2-device mesh, and step a tiny dam scene
    through one sharded WCSPH step. Both workers must exit 0 and print the
    same checksum line (cross-process collective agreement)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # one CPU device per process (conftest's 8-device flag must not leak)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "force_host_platform_device_count" not in f)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        ok = [ln for ln in out.splitlines() if ln.startswith("DIST_OK ")]
        assert ok, f"no DIST_OK line:\n{out}\n{err}"
        outs.append(ok[0])
    assert outs[0] == outs[1], f"process disagreement: {outs}"


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

    cfg, pos = cfp.scaled_dam_scene(110_000, mode="parity")
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


def test_halo_engine_bitwise_and_fewer_permutes(setup):
    """The shard_map halo engine (halo_comm='auto'/'shard_map') is
    bitwise-identical to both the single-device run and the GSPMD path
    (halo_comm='gspmd'), and its compiled step carries ~an order of
    magnitude fewer collective-permutes (one fused p-wide edge exchange
    per traversal instead of one permute per stencil offset) and no
    grid-sized all-gathers at the particle<->grid boundary."""
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
    box = (12, 12, 12)     # g=14^3=2744 and N=216 both divide 8

    def step(st, sd, d):
        s2, _, m = D.wcsph_step(st, (), sd, cfg, d, dims, dims_b,
                                engine="xlab", box=box)
        return s2, m["box_overflow"]

    ref, ov = jax.jit(step)(state, scene_d, dt)
    assert int(np.asarray(ov)) == 0
    mesh = parallel.make_mesh(8)
    hlo = {}
    outs = {}
    for mode in ("shard_map", "gspmd"):
        with parallel.spatial_sharding(mesh, halo=mode):
            f = jax.jit(step)
            hlo[mode] = f.lower(state, scene_d, dt).compile().as_text()
            outs[mode] = f(state, scene_d, dt)[0]
    for mode in ("shard_map", "gspmd"):
        np.testing.assert_array_equal(np.asarray(outs[mode].pos),
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(outs[mode].vel),
                                      np.asarray(ref.vel))
    n_perm = {m: hlo[m].count("collective-permute-start(")
              + hlo[m].count("collective-permute(") for m in hlo}
    assert n_perm["shard_map"] * 3 <= n_perm["gspmd"], n_perm
    # no all-gather result in the halo program is grid-sized (K*G words);
    # the only gathers left are N-sized particle-boundary traffic
    import re as _re
    grid_words = dims.k * (box[0] + 2) * (box[1] + 2) * (box[2] + 2)
    for line in hlo["shard_map"].splitlines():
        if "all-gather" not in line or "=" not in line:
            continue
        shape = _re.search(r"\[([\d,]+)\]", line.split("=")[0])
        if shape is None:
            continue
        words = int(np.prod([int(v) for v in shape.group(1).split(",")]))
        assert words < grid_words, line


def test_fill_read_sharded_bitwise_negative_zero():
    """Unit: the shard_map fill/read round trip is bit-exact vs the
    single-device scatter/gather, including stored -0.0 values (the
    psum_scatter combine runs on bit patterns)."""
    from cpp_fluid_particles_tpu.ops.box import BoxIndex, fill_box, read_box
    from cpp_fluid_particles_tpu.ops.dense import DenseDims

    rng = np.random.default_rng(7)
    n, bxs = 64, (6, 6, 6)
    box = DenseDims(*bxs, 4)
    g, total = box.g, box.k * box.g
    # injective valid slots + some invalid (trash) entries
    perm = rng.permutation(total)[:n].astype(np.int32)
    valid = rng.random(n) > 0.2
    slots = np.where(valid, perm, total).astype(np.int32)
    vals = rng.standard_normal((2, n)).astype(np.float32)
    vals[0, ::5] = -0.0
    idx = BoxIndex(slots=jnp.asarray(slots), valid=jnp.asarray(valid),
                   origin=jnp.zeros(3, jnp.int32),
                   ext=jnp.zeros(3, jnp.int32), overflow=jnp.int32(0),
                   box_overflow=jnp.int32(0), max_occupancy=jnp.int32(0),
                   hi_ext=jnp.zeros(3, jnp.int32))
    fields = [jnp.asarray(vals[0]), jnp.asarray(vals[1])]

    def run():
        dense = fill_box(idx, fields, [0.5, 0.0], box, mode="scatter")
        return dense, read_box(idx, dense)

    d1, r1 = jax.jit(run)()
    with parallel.spatial_sharding(parallel.make_mesh(8)):
        d8, r8 = jax.jit(run)()
    np.testing.assert_array_equal(
        np.asarray(d8).view(np.uint32), np.asarray(d1).view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(r8).view(np.uint32), np.asarray(r1).view(np.uint32))


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


def test_mesh2d_box_engine_matches_bitwise(setup):
    """2-D (4x2) x,z-slab mesh (parallel.make_mesh2d): the 5-D cell-space
    executor (ops/pallas_passes.column_pass_xla_sym_5d) under GSPMD
    reproduces the single-device flat executor's POSITIONS bitwise over
    the window — per output position the fold performs the same adds in
    the same order (the flat executor's interior-ghost junk positions
    are never read). Velocities carry a 1-ulp envelope: XLA contracts
    multiply-add chains (FMA) differently in the flat vs 5-D fusions
    (measured max 1.7e-10 abs / 1.1e-5 rel on this scene)."""
    cfg, _, _ = setup
    s = cfg.spacing
    pos = np.array(
        [(0.3 + s * i, 0.2 + s * j, 0.3 + s * k)
         for i in range(6) for j in range(6) for k in range(6)], np.float32)
    mesh2 = parallel.make_mesh2d((4, 2))
    assert parallel.mesh_is_2d(mesh2)
    sim2 = cfp.Simulation(solver="wcsph", cfg=cfg, fluid_pos=pos,
                          warmup=False, mesh=mesh2)
    sim1 = cfp.Simulation(solver="wcsph", cfg=cfg, fluid_pos=pos,
                          warmup=False)
    assert sim2.engine == "dense"
    for _ in range(2):
        sim2.step()
        sim1.step()
    p2 = np.asarray(sim2.state.pos)
    assert np.isfinite(p2).all()
    np.testing.assert_array_equal(p2, np.asarray(sim1.state.pos))
    np.testing.assert_allclose(np.asarray(sim2.state.vel),
                               np.asarray(sim1.state.vel),
                               rtol=5e-5, atol=1e-9)


def test_mesh2d_pbd_run_scan(setup):
    """PBD (while_loop projection) under the 2-D mesh: chained run_scan
    with auto-capacity, no drops, finite."""
    cfg, _, _ = setup
    s = cfg.spacing
    pos = np.array(
        [(0.3 + s * i, 0.2 + s * j, 0.3 + s * k)
         for i in range(6) for j in range(6) for k in range(6)], np.float32)
    mesh2 = parallel.make_mesh2d((4, 2))
    sim = cfp.Simulation(solver="pbd", cfg=cfg, fluid_pos=pos,
                         warmup=False, mesh=mesh2)
    sim.run_scan(3)
    assert sim.dropped_frames == 0
    assert np.isfinite(np.asarray(sim.state.pos)).all()
