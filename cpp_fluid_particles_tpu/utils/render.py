"""TPU point-splat renderer.

Replaces the reference's CUDA-GL interop render path (src/vbo.cu +
src/particles.vert/.frag + the GL camera setup in src/main.cpp:308-352)
with a pure-JAX rasteriser: ``render(pos, density, camera) -> (H, W, 3)``
float32 image entirely on device — frames never leave the TPU until
explicitly fetched.

Faithfully reproduced pieces:
  * density -> RGB colormap (src/vbo.cu:32-43): navy below 0.75, lerp to
    white up to 1.0, white -> magenta by (rho^2 - 1) above;
  * camera: gluPerspective(fov=30, aspect 1) + gluLookAt(0,0,1/zoom) with
    x/y rotations and the model translate(-0.5) (src/main.cpp:313-345);
  * sprite sizing pointRadius * pointScale / dist with
    pointScale = H / tan(fov/2) (src/main.cpp:337-338, particles.vert:33-37);
  * sphere-imposter shading exp(-mag^2) * color with circle discard
    (src/particles.frag:29-42), nearest-depth-wins compositing (the GL
    depth test).

Deliberate differences: sprites are clamped to a static MAX_SPRITE patch
(XLA needs fixed shapes); equal-depth ties resolve arbitrarily; the
wireframe cube outline is drawn by ``draw_cube_edges``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NAVY = (0.34, 0.46, 0.70)
WHITE = (0.9, 0.9, 0.9)
MAGENTA = (1.0, 0.4, 0.7)
BACKGROUND = (0.9, 0.9, 0.92)   # glClearColor (src/main.cpp:313)

MAX_SPRITE = 16  # static sprite patch side in pixels


class Camera(NamedTuple):
    """Mirrors the reference's view state (src/main.cpp:44-47,313-345)."""

    rot_x: float = 0.0         # degrees, mouse-drag pitch
    rot_y: float = 0.0         # degrees, mouse-drag yaw
    zoom: float = 0.3
    width: int = 700           # m_window_h
    height: int = 700
    fov: float = 30.0          # m_fov
    point_radius: float = 0.01  # particle_radius


def density_colormap(density: jnp.ndarray) -> jnp.ndarray:
    """(N,) density -> (N, 3) RGB (src/vbo.cu:32-43)."""
    navy = jnp.asarray(NAVY)
    white = jnp.asarray(WHITE)
    magenta = jnp.asarray(MAGENTA)
    w_mid = (density - 0.75) * 4.0
    mid = w_mid[:, None] * white + (1.0 - w_mid[:, None]) * navy
    w_hi = jnp.minimum((density ** 2 - 1.0) * 4.0, 1.0)
    hi = (1.0 - w_hi[:, None]) * white + w_hi[:, None] * magenta
    out = jnp.where(density[:, None] < 0.75, navy,
                    jnp.where(density[:, None] < 1.0, mid, hi))
    return out.astype(jnp.float32)


def _rotation(rot_x_deg, rot_y_deg):
    ax = jnp.deg2rad(rot_x_deg)
    ay = jnp.deg2rad(rot_y_deg)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], jnp.float32)
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], jnp.float32)
    return rx @ ry


def render(
    pos: jnp.ndarray,
    density: jnp.ndarray,
    camera: Camera = Camera(),
    extra_points: jnp.ndarray | None = None,
    extra_colors: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Rasterise particles to an (H, W, 3) float32 image in [0, 1].

    extra_points/extra_colors: optional decoration points (e.g. the cube
    edges from draw_cube_edges), splatted as 1px dots.
    """
    H, W = camera.height, camera.width
    fov_rad = camera.fov * math.pi / 180.0
    focal = 1.0 / math.tan(0.5 * fov_rad)
    point_scale = H / math.tan(0.5 * fov_rad)
    eye_dist = 1.0 / camera.zoom

    colors = density_colormap(density)
    if extra_points is not None:
        pos = jnp.concatenate([pos, extra_points], 0)
        colors = jnp.concatenate([colors, extra_colors], 0)
        dec = jnp.zeros((pos.shape[0],), bool).at[-extra_points.shape[0]:].set(True)
    else:
        dec = jnp.zeros((pos.shape[0],), bool)

    n = pos.shape[0]
    rot = _rotation(camera.rot_x, camera.rot_y)
    p = (pos - 0.5) @ rot.T                      # model: translate + rotate
    eye = p - jnp.array([0.0, 0.0, eye_dist])    # view: camera at +z
    dist = jnp.linalg.norm(eye, axis=-1)
    z = eye[:, 2]
    behind = z >= -1e-6                          # behind the camera plane

    ndc_x = focal * eye[:, 0] / -z
    ndc_y = focal * eye[:, 1] / -z
    sx = (ndc_x + 1.0) * 0.5 * W
    sy = (1.0 - ndc_y) * 0.5 * H
    size_px = jnp.where(
        dec, 2.0,
        jnp.clip(camera.point_radius * point_scale / dist, 1.0, MAX_SPRITE),
    )

    # splat patches
    half = size_px * 0.5
    du = jnp.arange(MAX_SPRITE, dtype=jnp.float32) - (MAX_SPRITE - 1) / 2.0
    px = jnp.floor(sx[:, None] + du[None, :])              # (N, S)
    py = jnp.floor(sy[:, None] + du[None, :])              # (N, S)
    u = (px + 0.5 - sx[:, None]) / jnp.maximum(half, 0.5)[:, None]
    v = (py + 0.5 - sy[:, None]) / jnp.maximum(half, 0.5)[:, None]
    mag = u[:, :, None] ** 2 + v[:, None, :] ** 2           # (N, S, S)
    inside = (mag <= 1.0) & ~behind[:, None, None]

    pix_x = jnp.clip(px, 0, W - 1).astype(jnp.int32)
    pix_y = jnp.clip(py, 0, H - 1).astype(jnp.int32)
    on_x = (px >= 0) & (px < W)
    on_y = (py >= 0) & (py < H)
    valid = inside & on_x[:, :, None] & on_y[:, None, :]
    flat = (pix_y[:, None, :] * W + pix_x[:, :, None])      # (N, S, S)
    flat = jnp.where(valid, flat, H * W)                    # trash pixel

    depth = jnp.broadcast_to(dist[:, None, None], mag.shape)
    depth_min = (
        jnp.full((H * W + 1,), jnp.inf, jnp.float32)
        .at[flat.reshape(-1)]
        .min(depth.reshape(-1))
    )
    win = depth.reshape(-1) <= depth_min[flat.reshape(-1)]
    target = jnp.where(win, flat.reshape(-1), H * W)

    falloff = jnp.exp(-mag * mag)                           # frag shader
    rgb = colors[:, None, None, :] * jnp.where(
        dec[:, None, None, None], 1.0, falloff[..., None])
    img = (
        jnp.zeros((H * W + 1, 3), jnp.float32)
        .at[target]
        .set(rgb.reshape(-1, 3), mode="drop")
    )
    covered = depth_min[: H * W] < jnp.inf
    bg = jnp.asarray(BACKGROUND, jnp.float32)
    out = jnp.where(covered[:, None], img[: H * W], bg)
    return out.reshape(H, W, 3)


def draw_cube_edges(samples_per_edge: int = 200):
    """The wireframe unit-cube outline (glutSolidCube in line mode,
    src/main.cpp:331-334) as a point set + grey colors."""
    t = np.linspace(0.0, 1.0, samples_per_edge, dtype=np.float32)
    pts = []
    for a in (0.0, 1.0):
        for b in (0.0, 1.0):
            pts.append(np.stack([t, np.full_like(t, a), np.full_like(t, b)], -1))
            pts.append(np.stack([np.full_like(t, a), t, np.full_like(t, b)], -1))
            pts.append(np.stack([np.full_like(t, a), np.full_like(t, b), t], -1))
    pts = np.concatenate(pts, 0)
    colors = np.full((pts.shape[0], 3), 0.7, np.float32)  # glColor4f 0.7 grey
    return jnp.asarray(pts), jnp.asarray(colors)


def renderer_palette() -> np.ndarray:
    """A 256-color GIF palette derived from this renderer's actual output
    gamut: the density colormap ramp x the sphere-imposter Gaussian shading
    levels, plus the background/cube colors — far less banding than a
    generic RGB cube for simulator frames."""
    dens = np.concatenate([
        np.linspace(0.3, 0.99, 22), np.linspace(1.0, 1.25, 19),
    ])
    ramp = np.asarray(density_colormap(jnp.asarray(dens, jnp.float32)))
    falloff = np.exp(-np.linspace(0.0, 1.0, 6) ** 2)
    shaded = (falloff[:, None, None] * ramp[None]).reshape(-1, 3)  # 246
    extras = np.array([
        BACKGROUND, (0.7, 0.7, 0.7), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
        (0.85, 0.85, 0.87), (0.5, 0.5, 0.52), (0.95, 0.95, 0.96),
        (0.2, 0.27, 0.41), (0.6, 0.24, 0.42), (0.45, 0.45, 0.46),
    ])
    pal = np.concatenate([extras, shaded])[:256]
    return np.clip(pal * 255.0 + 0.5, 0, 255).astype(np.uint8)
