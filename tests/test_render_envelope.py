"""Quantified envelopes for the renderer's deliberate divergences
(PARITY.md divergence #4, VERDICT r4 weak #5): the 16-px sprite clamp
and the arbitrary equal-depth tie-breaking had no measured bound the way
the physics divergences do. This file pins both against a float64
same-model oracle (numpy painter's algorithm with an exact per-pixel
depth test)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from cpp_fluid_particles_tpu.utils import render as R


def _oracle(pos, density, cam, max_sprite):
    """Float64 reference of the same sprite model (same camera math,
    sizing, circle discard, exp(-mag^2) falloff, nearest-depth-wins),
    with an exact per-pixel depth buffer and a configurable (or
    unbounded) sprite clamp."""
    H, W = cam.height, cam.width
    fov = cam.fov * math.pi / 180.0
    focal = 1.0 / math.tan(0.5 * fov)
    point_scale = H / math.tan(0.5 * fov)
    eye_dist = 1.0 / cam.zoom
    colors = np.asarray(R.density_colormap(jnp.asarray(density)),
                        np.float64)

    ax, ay = math.radians(cam.rot_x), math.radians(cam.rot_y)
    rx = np.array([[1, 0, 0], [0, math.cos(ax), -math.sin(ax)],
                   [0, math.sin(ax), math.cos(ax)]])
    ry = np.array([[math.cos(ay), 0, math.sin(ay)], [0, 1, 0],
                   [-math.sin(ay), 0, math.cos(ay)]])
    p = (pos.astype(np.float64) - 0.5) @ (rx @ ry).T
    eye = p - np.array([0.0, 0.0, eye_dist])
    dist = np.linalg.norm(eye, axis=-1)
    z = eye[:, 2]
    sx = (focal * eye[:, 0] / -z + 1.0) * 0.5 * W
    sy = (1.0 - focal * eye[:, 1] / -z) * 0.5 * H
    size = np.clip(cam.point_radius * point_scale / dist, 1.0,
                   max_sprite if max_sprite else np.inf)

    depth = np.full((H, W), np.inf)
    img = np.tile(np.asarray(R.BACKGROUND), (H, W, 1)).astype(np.float64)
    for i in range(pos.shape[0]):
        if z[i] >= -1e-6:
            continue
        half = size[i] * 0.5
        r = int(math.ceil(half)) + 1
        cx, cy = sx[i], sy[i]
        for py in range(int(math.floor(cy)) - r, int(math.floor(cy)) + r + 1):
            if not 0 <= py < H:
                continue
            for px in range(int(math.floor(cx)) - r,
                            int(math.floor(cx)) + r + 1):
                if not 0 <= px < W:
                    continue
                u = (px + 0.5 - cx) / max(half, 0.5)
                v = (py + 0.5 - cy) / max(half, 0.5)
                mag = u * u + v * v
                if mag > 1.0 or dist[i] >= depth[py, px]:
                    continue
                depth[py, px] = dist[i]
                img[py, px] = colors[i] * math.exp(-mag * mag)
    return img, size


def _scene(n=160, seed=3):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0.15, 0.85, (n, 3)).astype(np.float32)
    density = rng.uniform(0.6, 1.2, (n,)).astype(np.float32)
    return pos, density


@pytest.mark.slow
def test_render_matches_float64_oracle_envelope():
    """Default camera: the JAX rasteriser agrees with the float64 oracle
    on > 99% of pixels; disagreements are confined to sprite-edge
    rounding (f32 mag at the circle boundary) and depth ties."""
    pos, density = _scene()
    cam = R.Camera(rot_x=15.0, rot_y=-25.0, width=96, height=96)
    img = np.asarray(R.render(jnp.asarray(pos), jnp.asarray(density), cam),
                     np.float64)
    ref, size = _oracle(pos, density, cam, R.MAX_SPRITE)
    # at the reference's default view the 16-px clamp never binds
    assert size.max() < R.MAX_SPRITE
    mismatch = (np.abs(img - ref).max(-1) > 1e-3).mean()
    assert mismatch < 0.01, f"{mismatch:.4f} of pixels diverge"
    # matching pixels agree to float32 shading precision
    close = np.abs(img - ref).max(-1) <= 1e-3
    assert np.abs(img - ref)[close].max() <= 1e-3


def _sprite_sizes(pos, cam):
    """Unclamped sprite sizes for a camera (the sizing formula only)."""
    ax, ay = math.radians(cam.rot_x), math.radians(cam.rot_y)
    rx = np.array([[1, 0, 0], [0, math.cos(ax), -math.sin(ax)],
                   [0, math.sin(ax), math.cos(ax)]])
    ry = np.array([[math.cos(ay), 0, math.sin(ay)], [0, 1, 0],
                   [-math.sin(ay), 0, math.cos(ay)]])
    p = (pos.astype(np.float64) - 0.5) @ (rx @ ry).T
    eye = p - np.array([0.0, 0.0, 1.0 / cam.zoom])
    dist = np.linalg.norm(eye, axis=-1)
    fov = cam.fov * math.pi / 180.0
    return cam.point_radius * (cam.height / math.tan(0.5 * fov)) / dist


@pytest.mark.slow
def test_sprite_clamp_envelope_quantified():
    """The 16-px sprite clamp binds only on close approach. Quantified:
    at the Camera() default view (700 px, zoom 0.3) the largest possible
    in-domain sprite stays under 16 px — the clamp is a NO-OP for the
    app's default presentation; at a 3x close-up it binds, and the
    clamped image differs from the unbounded-sprite float64 oracle on a
    bounded fraction of pixels."""
    pos, density = _scene(60)

    # default view: even a particle at the domain corner nearest the
    # camera stays under the clamp
    corners = np.array([(x, y, z) for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.float32)
    s_def = _sprite_sizes(np.concatenate([pos, corners]), R.Camera())
    assert s_def.max() < R.MAX_SPRITE, (
        f"clamp binds at the default camera ({s_def.max():.1f} px)")

    # close-up: clamp active, envelope measured against the unbounded
    # oracle (same scene rendered at 96 px for oracle cost)
    cam = R.Camera(rot_x=10.0, rot_y=-20.0, width=96, height=96, zoom=3.0)
    ref_clamped, size = _oracle(pos, density, cam, R.MAX_SPRITE)
    ref_free, _ = _oracle(pos, density, cam, None)
    assert size.max() == R.MAX_SPRITE  # the clamp binds at this zoom
    frac = (np.abs(ref_clamped - ref_free).max(-1) > 1e-3).mean()
    # pin an upper envelope for the divergence the clamp introduces
    assert frac < 0.2, f"clamp affects {frac:.3f} of pixels"
    # the JAX render still tracks the CLAMPED oracle closely
    img = np.asarray(R.render(jnp.asarray(pos), jnp.asarray(density), cam),
                     np.float64)
    mismatch = (np.abs(img - ref_clamped).max(-1) > 1e-3).mean()
    assert mismatch < 0.02, f"{mismatch:.4f} of pixels diverge"
