"""Renderer, image writers, checkpoint/resume, metrics."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.utils import images, io, metrics
from cpp_fluid_particles_tpu.utils.render import (
    Camera, density_colormap, draw_cube_edges, render,
)

from helpers import SMALL_CFG as CFG, small_block


def test_density_colormap_matches_vbo():
    """src/vbo.cu:32-43 thresholds."""
    c = np.asarray(density_colormap(
        jnp.array([0.5, 0.75 - 1e-4, 1.0, 2.0], jnp.float32)))
    np.testing.assert_allclose(c[0], [0.34, 0.46, 0.70], atol=1e-6)
    np.testing.assert_allclose(c[1], [0.34, 0.46, 0.70], atol=1e-3)
    np.testing.assert_allclose(c[2], [0.9, 0.9, 0.9], atol=1e-6)
    np.testing.assert_allclose(c[3], [1.0, 0.4, 0.7], atol=1e-6)  # capped w=1


def test_render_produces_image():
    pos = jnp.asarray(small_block())
    rho = jnp.full((pos.shape[0],), 0.9, jnp.float32)
    cam = Camera(rot_x=15, rot_y=-20, zoom=0.4, width=128, height=128)
    img = np.asarray(render(pos, rho, cam, *draw_cube_edges()))
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    bg = np.all(np.abs(img - np.array([0.9, 0.9, 0.92])) < 1e-6, -1)
    assert 0.001 < (~bg).mean() < 0.9  # something was drawn


def test_png_gif_roundtrippable(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (32, 40, 3)).astype(np.float32)
    png = tmp_path / "x.png"
    gif = tmp_path / "x.gif"
    images.write_png(str(png), img)
    images.write_gif(str(gif), [img, img * 0.5], fps=10)
    assert png.stat().st_size > 100
    data = gif.read_bytes()
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3B"


def test_checkpoint_roundtrip(tmp_path):
    sim = cfp.Simulation(solver="dfsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=True)
    for _ in range(5):
        sim.step()
    path = str(tmp_path / "ckpt.npz")
    io.save_checkpoint(path, sim)

    sim2 = io.load_checkpoint(path)
    assert sim2.solver_name == "dfsph"
    assert sim2.frame == sim.frame
    np.testing.assert_array_equal(np.asarray(sim2.state.pos),
                                  np.asarray(sim.state.pos))
    np.testing.assert_array_equal(np.asarray(sim2.carry.warm_stiff),
                                  np.asarray(sim.carry.warm_stiff))
    # deterministic resume: both continue identically
    sim.step(); sim2.step()
    np.testing.assert_array_equal(np.asarray(sim2.state.pos),
                                  np.asarray(sim.state.pos))


def test_nan_guard_and_diagnostics():
    sim = cfp.Simulation(solver="wcsph", cfg=CFG, fluid_pos=small_block(),
                         warmup=True)
    assert bool(metrics.nan_guard(sim.state))
    bad = sim.state._replace(pos=sim.state.pos.at[0, 0].set(jnp.nan))
    assert not bool(metrics.nan_guard(bad))
    d = metrics.physical_diagnostics(sim.state, CFG)
    assert float(d["kinetic_energy"]) >= 0
    assert float(d["max_density"]) > 0


def test_cli_headless(tmp_path):
    from cpp_fluid_particles_tpu.simulate import main
    png = tmp_path / "frame.png"
    # tiny run through the real CLI entry point
    rc = main(["--solver", "wcsph", "--steps", "3", "--png", str(png),
               "--size", "96", "--render-every", "1", "--quiet"])
    assert rc == 0
    assert png.stat().st_size > 100


def test_step_timer_format():
    t = metrics.StepTimer()
    line = t.record(4.4)
    assert "4.40 ms" in line and "FPS" in line


def test_native_gif_palette_parity(tmp_path):
    """The native C++ encoder's custom-palette path (cfp_write_gif_pal)
    must produce bitwise-identical output to the pure-Python fallback —
    same 32^3-LUT quantisation, same LZW."""
    from cpp_fluid_particles_tpu.runtime import native
    from cpp_fluid_particles_tpu.utils.render import renderer_palette
    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(3)
    frames = [rng.random((24, 32, 3)).astype(np.float32) for _ in range(2)]
    pal = renderer_palette()
    pn = tmp_path / "native.gif"
    pp = tmp_path / "python.gif"
    native.write_gif(str(pn), [images.to_uint8(f) for f in frames], 12,
                     palette=pal)
    images._write_gif_py(str(pp), frames, 12, pal)
    assert pn.read_bytes() == pp.read_bytes()


def test_custom_palette_gif(tmp_path):
    from cpp_fluid_particles_tpu.utils.render import renderer_palette
    pal = renderer_palette()
    assert pal.shape == (256, 3) and pal.dtype == np.uint8
    # the background color must be representable near-exactly
    bg = np.array([229, 229, 234])
    assert np.abs(pal.astype(int) - bg).sum(1).min() <= 6
    img = np.full((16, 24, 3), 0.9, np.float32)
    img[:, :, 2] = 0.92
    gif = tmp_path / "p.gif"
    images.write_gif(str(gif), [img], fps=10, palette=pal)
    data = gif.read_bytes()
    assert data[:6] == b"GIF89a"
