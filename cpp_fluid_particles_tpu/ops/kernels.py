"""SPH smoothing kernels as pure jnp functions.

TPU-native re-implementation of the device kernel library in
reference src/CUDAFunctions.cuh:23-98. All functions are shape-polymorphic,
vectorized over arbitrary leading axes, and safe on padded/garbage lanes
(they return exactly 0 outside the support, including at r == 0, matching the
reference's ``q < EPSILON`` early-out so self-contributions vanish).

Conventions (match the reference exactly):
  * ``h`` is the smoothing radius parameter ("radius"); kernel support is
    r <= h (the reference uses q = 2 r / h with support q <= 2).
  * Everything is float32.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import PI

EPS = 1e-6  # src/global.h:21


def w_cubic(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Cubic-spline kernel W(r, h) (src/CUDAFunctions.cuh:23-35).

    q = 2r/h; support q in [EPS, 2]; normalisation 1/(4 pi h^3).
    Returns 0 for q < EPS (so W(0) == 0 — the reference excludes
    self-contributions this way) and for q > 2.
    """
    q = 2.0 * jnp.abs(r) / h
    a = 0.25 / (PI * h * h * h)
    near = (3.0 * q - 6.0) * q * q + 4.0          # q <= 1: 3q^3 - 6q^2 + 4
    t = 2.0 - q
    far = t * t * t                               # 1 < q <= 2: (2-q)^3
    val = a * jnp.where(q > 1.0, far, near)
    return jnp.where((q >= EPS) & (q <= 2.0), val, 0.0)


def grad_w_cubic(rvec: jnp.ndarray, h: float) -> jnp.ndarray:
    """Cubic-spline kernel gradient dW/dx (src/CUDAFunctions.cuh:37-50).

    rvec: (..., 3). Returns (..., 3). Uses the reference's form
      grad = rvec / (pi (q+EPS) h^5) * f(q),
      f(q) = (12-3q)q - 12  for q in (1, 2]   [= -3(2-q)^2]
           = (9q-12)q       for q <= 1.
    Zero for q > 2; finite (0) at r -> 0 because f(0) = 0.
    """
    r = jnp.sqrt(jnp.sum(rvec * rvec, axis=-1))
    q = 2.0 * r / h
    f = jnp.where(q > 1.0, (12.0 - 3.0 * q) * q - 12.0, (9.0 * q - 12.0) * q)
    coef = jnp.where(q <= 2.0, f / (PI * (q + EPS) * h ** 5), 0.0)
    return coef[..., None] * rvec


def w_visc_laplacian(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Mueller viscosity kernel Laplacian (src/CUDAFunctions.cuh:52-54).

    45 (h - r) / (pi h^6) for r <= h, else 0.
    """
    return jnp.where(r <= h, 45.0 * (h - r) / (PI * h ** 6), 0.0)


def grad_w_surface_tension(rvec: jnp.ndarray, h: float) -> jnp.ndarray:
    """Akinci-2013 surface-tension/cohesion kernel gradient
    (src/CUDAFunctions.cuh:80-98; [2013][SIGGRAPH ASIA][Versatile Surface
    Tension and Adhesion for SPH Fluids], 3-D spherically normalised).

    rvec: (..., 3). Support x = |r| in [EPS, h]. Piecewise:
      2x <= h : 2 (h-x)^3 x^3 - 0.0156 h^6
      x  <= h : (h-x)^3 x^3
    scaled by 136.0241 * (-rvec) / (pi h^9 x).
    """
    x = jnp.sqrt(jnp.sum(rvec * rvec, axis=-1))
    hx = h - x
    piece = jnp.where(
        2.0 * x <= h,
        2.0 * hx ** 3 * x ** 3 - 0.0156 * h ** 6,
        hx ** 3 * x ** 3,
    )
    denom = PI * h ** 9 * jnp.maximum(x, EPS)
    coef = jnp.where((x >= EPS) & (x <= h), -136.0241 * piece / denom, 0.0)
    return coef[..., None] * rvec


def grad_w_cubic_coef(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Scalar multiplier c(r) with grad W = c(r) * rvec — component form of
    ``grad_w_cubic`` for kernels that carry vector components separately
    (the Pallas engine's layout)."""
    q = 2.0 * r / h
    f = jnp.where(q > 1.0, (12.0 - 3.0 * q) * q - 12.0, (9.0 * q - 12.0) * q)
    return jnp.where(q <= 2.0, f / (PI * (q + EPS) * h ** 5), 0.0)


def grad_w_surface_coef(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """Scalar multiplier for the Akinci surface-tension kernel gradient
    (component form of ``grad_w_surface_tension``)."""
    hx = h - r
    piece = jnp.where(
        2.0 * r <= h,
        2.0 * hx ** 3 * r ** 3 - 0.0156 * h ** 6,
        hx ** 3 * r ** 3,
    )
    denom = PI * h ** 9 * jnp.maximum(r, EPS)
    return jnp.where((r >= EPS) & (r <= h), -136.0241 * piece / denom, 0.0)


def w_cubic_max(h: float) -> float:
    """Peak value the cubic spline would take at q=0 if self-contribution
    were not excluded; handy for tests."""
    return 4.0 * 0.25 / (math.pi * h ** 3)
