"""Device-mesh spatial parallelism.

The reference is strictly single-GPU (SURVEY.md §2.3: no DP/TP/PP, no
communication backend). The TPU-native scaling dimension for SPH is
*spatial domain decomposition*: the compacted active-cell axis (ops/grid.py)
is ordered by flat cell id — x-major — so sharding it across a mesh axis
splits space into contiguous x-slabs per device.

Implementation is the idiomatic GSPMD recipe: the per-step (M, K, ...)
cell-grid tensors get ``with_sharding_constraint(P("cells", ...))`` and XLA
partitions the pair-interaction compute along cells, inserting the
halo/all-gather collectives over ICI automatically. Particle-indexed (N,)
state stays replicated (it is small relative to pair compute; a
fully-sharded particle state is the round-2 optimisation).

Activated via the ``spatial_sharding(mesh)`` context during trace time —
solver code is unchanged.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "cells"

_ACTIVE_MESH: ContextVar[Optional[Mesh]] = ContextVar("sph_mesh",
                                                      default=None)
# Particle<->grid + halo communication strategy under a mesh:
#   "auto"      — use the shard_map halo engine (fused +/-1-plane ppermute
#                 halos, N-sized particle boundary collectives) whenever
#                 the static shapes divide the mesh; GSPMD inference
#                 otherwise (parallel/halo.py eligibility).
#   "gspmd"     — always let GSPMD infer collectives from sharding
#                 constraints (the round-3 path; per-offset permutes and
#                 grid-sized all-gathers at the particle<->grid boundary).
#   "shard_map" — require the shard_map engine (assert if ineligible).
_HALO_MODE: ContextVar[str] = ContextVar("sph_halo_mode", default="auto")


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


# 2-D (x,z)-slab decomposition (SCALING.md §4): the executors run over
# the 5-D cell view with GX on "gx" and GZ on "gz"
# (ops/pallas_passes.column_pass_xla_sym_5d); halves per-slab surface
# area vs 1-D x-slabs on a v5e-8 (4x2).
AXES_2D = ("gx", "gz")


def make_mesh2d(shape=(4, 2), devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    nx, nz = shape
    devs = np.asarray(devs[:nx * nz]).reshape(nx, nz)
    return Mesh(devs, AXES_2D)


def mesh_is_2d(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and len(mesh.axis_names) == 2


@contextlib.contextmanager
def spatial_sharding(mesh: Mesh, halo: str = "auto"):
    """While active, the neighbor engine constrains per-cell tensors to be
    sharded along ``mesh``'s 'cells' axis; ``halo`` selects the
    communication strategy (see ``_HALO_MODE``)."""
    token = _ACTIVE_MESH.set(mesh)
    htoken = _HALO_MODE.set(halo)
    try:
        yield
    finally:
        _HALO_MODE.reset(htoken)
        _ACTIVE_MESH.reset(token)


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH.get()


def current_halo_mode() -> str:
    return _HALO_MODE.get()


def mesh_devices(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))


def constrain_cells(x: jax.Array) -> jax.Array:
    """Shard a (M, ...) active-cell tensor along the mesh; no-op without an
    active spatial_sharding context."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None or mesh_is_2d(mesh):
        return x
    spec = P(AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_axis(x: jax.Array, axis: int) -> jax.Array:
    """Shard one axis of a tensor along the mesh (used by the dense engine:
    axis 1 = the ghosted GX axis, so each device owns an x-slab of cells and
    GSPMD turns the 27-offset stencil slices into halo exchanges over ICI).
    No-op without an active spatial_sharding context, and under a 2-D
    mesh (the 5-D executor constrains its own operands per cell axis;
    the flat axis cannot express the (gx, gz) tiling)."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None or mesh_is_2d(mesh):
        return x
    spec = [None] * x.ndim
    spec[axis] = AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(x):
    """Constrain a pytree to be replicated on the active mesh."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return x
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P())), x)


def shard_particles(tree):
    """Constrain every (N, ...) array leaf of a particle-state pytree to be
    sharded along axis 0 over the mesh — memory and scatter/gather work
    then scale 1/devices instead of replicating O(N x devices) (the 1M-
    particle configuration's requirement). No-op without an active
    spatial_sharding context."""
    mesh = _ACTIVE_MESH.get()
    if mesh is None:
        return tree

    def con(a):
        if getattr(a, "ndim", 0) < 1:
            return a
        # 1-D mesh: P("cells", ...); 2-D: N sharded over both axes jointly
        spec = P(tuple(mesh.axis_names), *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(con, tree)
