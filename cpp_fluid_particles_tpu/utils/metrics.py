"""Observability: per-step metrics, timing, NaN guard.

The reference's only observability is a per-frame printf of ms/FPS
(src/main.cpp:300-306) and CUDA error macros (src/global.h:23-25). Here we
expose structured per-step metrics (including solver iteration counts that
the reference computes but discards, src/DFSPHSolver.cu:49,65), physical
diagnostics, a NaN guard, and jax.profiler hooks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def physical_diagnostics(state, cfg) -> Dict[str, jnp.ndarray]:
    """On-device summary of the fluid state (jit-friendly)."""
    speed2 = jnp.sum(state.vel * state.vel, axis=-1)
    return {
        "kinetic_energy": 0.5 * jnp.sum(state.mass * speed2),
        "max_speed": jnp.sqrt(jnp.max(speed2)),
        "max_density": jnp.max(state.density),
        "mean_density": jnp.mean(state.density),
        "min_pos": jnp.min(state.pos),
        "max_pos": jnp.max(state.pos),
    }


def nan_guard(state) -> jnp.ndarray:
    """True when the state is healthy (all finite)."""
    ok = jnp.bool_(True)
    for leaf in jax.tree_util.tree_leaves(state):
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok


class StepTimer:
    """Running average + FPS, mirroring the reference's printed line
    'Frame %d - %.2f ms, avg ... (FPS)' (src/main.cpp:304-305)."""

    def __init__(self):
        self.frames = 0
        self.total_ms = 0.0
        self.last_ms = 0.0

    def record(self, ms: float) -> str:
        self.frames += 1
        self.total_ms += ms
        self.last_ms = ms
        avg = self.total_ms / self.frames
        fps = 1000.0 * self.frames / max(self.total_ms, 1e-9)
        return (f"Frame {self.frames % 10000} - {ms:5.2f} ms, "
                f"avg time - {avg:5.2f} ms/frame ({fps:6.2f} FPS)")


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """Optional jax.profiler trace around a region (view with TensorBoard /
    xprof). No-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
