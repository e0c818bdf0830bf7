"""Every physics pass vs the brute-force O(N^2) reference implementation.

These are the framework's golden correctness anchors: the grid-based engine
must reproduce all-pairs sums exactly (up to f32 summation order) because
the kernel support fits inside one cell length.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import common as C, dfsph, pbd
from cpp_fluid_particles_tpu.state import make_fluid_state
import reference_impl as ref


@pytest.fixture(scope="module")
def setup():
    cfg = cfp.dam_break_config(mode="parity", max_active_cells=2048, max_per_cell=16)
    scene = C.build_scene(cfg)
    rng = np.random.default_rng(42)
    # bulk cluster + a shell near the floor so boundary terms are exercised
    bulk = rng.uniform(0.30, 0.55, size=(250, 3))
    floor = np.stack([
        rng.uniform(0.3, 0.6, 120), rng.uniform(0.006, 0.04, 120),
        rng.uniform(0.3, 0.6, 120),
    ], -1)
    pos = np.concatenate([bulk, floor]).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, size=(pos.shape[0],)).astype(np.float32) * cfg.m0
    vel = rng.normal(0, 0.5, size=pos.shape).astype(np.float32)

    fg = jax.jit(
        lambda p, m, sc: C.make_fluid_grids(p, m, sc, cfg)
    )(jnp.asarray(pos), jnp.asarray(mass), scene)
    assert int(fg.tables.overflow) == 0

    bpos = np.asarray(scene.b_pos, np.float64)
    bmass = np.asarray(scene.b_mass, np.float64)
    return dict(cfg=cfg, scene=scene, pos=pos, mass=mass, vel=vel, fg=fg,
                bpos=bpos, bmass=bmass)


def test_boundary_mass_matches_brute_force(setup):
    s = setup
    want = ref.boundary_mass(s["bpos"], s["cfg"].radius, s["cfg"].rho_boundary)
    np.testing.assert_allclose(np.asarray(s["scene"].b_mass), want, rtol=1e-4)


def test_density(setup):
    s = setup
    got = jax.jit(lambda fg, sc: C.compute_density(fg, sc, s["cfg"]))(
        s["fg"], s["scene"])
    want = ref.density(s["pos"], s["mass"], s["bpos"], s["bmass"],
                       s["cfg"].radius)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-7)


def test_pressure_accel(setup):
    s = setup
    cfg = s["cfg"]
    rho = ref.density(s["pos"], s["mass"], s["bpos"], s["bmass"], cfg.radius)
    p = ref.tait_pressure(rho, cfg.rho0, cfg.stiff)
    got = jax.jit(
        lambda fg, sc, r_, p_: C.pressure_accel(fg, sc, r_, p_, cfg)
    )(s["fg"], s["scene"], jnp.asarray(rho, jnp.float32),
      jnp.asarray(p, jnp.float32))
    want = ref.pressure_accel(s["pos"], s["mass"], rho, p,
                              s["bpos"], s["bmass"], cfg.radius)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)


def test_viscosity(setup):
    s = setup
    cfg = s["cfg"]
    got = jax.jit(
        lambda fg, v: C.viscosity_dv(fg, v, cfg, cfg.dt)
    )(s["fg"], jnp.asarray(s["vel"]))
    want = ref.viscosity_dv(s["pos"], s["vel"], s["mass"], cfg.radius,
                            cfg.rho0, cfg.visc, cfg.dt)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-8)


def test_xsph(setup):
    s = setup
    cfg = s["cfg"]
    got = jax.jit(lambda fg, sc, p, v: pbd._xsph(fg, sc, p, v, cfg))(
        s["fg"], s["scene"], jnp.asarray(s["pos"]), jnp.asarray(s["vel"]))
    want = ref.xsph_dv(s["pos"], s["vel"], s["mass"], cfg.radius,
                       cfg.rho0, cfg.pbd_xsph_c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-8)


def test_color_gradient_and_surface(setup):
    s = setup
    cfg = s["cfg"]
    got_cg = jax.jit(lambda fg, sc: C.color_gradient(fg, sc, cfg))(
        s["fg"], s["scene"])
    want_cg = ref.color_gradient(s["pos"], s["mass"], s["bpos"], s["bmass"],
                                 cfg.radius, cfg.rho0, cfg.rho_boundary)
    # color gradients divide by small denominators; f32 cancellation gives
    # up to ~2% relative error on large-magnitude rows
    np.testing.assert_allclose(np.asarray(got_cg), want_cg, rtol=3e-2,
                               atol=0.05)

    got_a = jax.jit(lambda fg, cg: C.surface_accel(fg, cg, cfg))(
        s["fg"], jnp.asarray(want_cg, jnp.float32))
    want_a = ref.surface_accel(s["pos"], s["mass"], want_cg, cfg.radius,
                               cfg.rho0, cfg.surface_tension, cfg.air_pressure)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=5e-3, atol=1e-5)


def test_dfsph_density_alpha(setup):
    s = setup
    cfg = s["cfg"]
    got_rho, got_alpha = jax.jit(
        lambda fg, sc: dfsph.compute_density_alpha(fg, sc, cfg)
    )(s["fg"], s["scene"])
    want_rho, want_alpha = ref.density_alpha(
        s["pos"], s["mass"], s["bpos"], s["bmass"], cfg.radius, cfg.epsilon)
    np.testing.assert_allclose(np.asarray(got_rho), want_rho, rtol=2e-4,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_alpha), want_alpha, rtol=1e-2)


def test_dfsph_velocity_divergence(setup):
    s = setup
    cfg = s["cfg"]
    got = jax.jit(
        lambda fg, sc, v: dfsph._velocity_divergence(fg, sc, v, cfg)
    )(s["fg"], s["scene"], jnp.asarray(s["vel"]))
    want = ref.velocity_divergence(s["pos"], s["vel"], s["mass"],
                                   s["bpos"], s["bmass"], cfg.radius)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_dfsph_stiffness_accel(setup):
    s = setup
    cfg = s["cfg"]
    rng = np.random.default_rng(7)
    stiff = rng.normal(0, 1e-4, size=(s["pos"].shape[0],)).astype(np.float32)
    got = jax.jit(
        lambda fg, sc, st: dfsph._stiffness_accel(fg, sc, st, cfg)
    )(s["fg"], s["scene"], jnp.asarray(stiff))
    want = ref.stiffness_accel(s["pos"], s["mass"], stiff,
                               s["bpos"], s["bmass"], cfg.radius)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=1e-9)


def test_pbd_density_lambda_and_delta_pos(setup):
    s = setup
    cfg = s["cfg"]
    got_rho, got_lam = jax.jit(
        lambda fg, sc, p: pbd._density_lambda(fg, sc, p, cfg)
    )(s["fg"], s["scene"], jnp.asarray(s["pos"]))
    want_rho, want_lam = ref.density_lambda(
        s["pos"], s["mass"], s["bpos"], s["bmass"], cfg.radius,
        cfg.rho0, cfg.pbd_relaxation)
    np.testing.assert_allclose(np.asarray(got_rho), want_rho, rtol=2e-4,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_lam), want_lam, rtol=2e-3,
                               atol=1e-8)

    got_dp = jax.jit(
        lambda fg, sc, p, l: pbd._delta_pos(fg, sc, p, l, cfg)
    )(s["fg"], s["scene"], jnp.asarray(s["pos"]),
      jnp.asarray(want_lam, jnp.float32))
    want_dp = ref.delta_pos(s["pos"], s["mass"], want_lam,
                            s["bpos"], s["bmass"], cfg.radius, cfg.rho0)
    np.testing.assert_allclose(np.asarray(got_dp), want_dp, rtol=2e-3,
                               atol=1e-9)
