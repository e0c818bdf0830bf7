"""shard_map particle<->grid boundary — N-sized collectives, no grid
all-gathers.

Under pure GSPMD inference (the round-3 path) the two ends of the
particle<->grid boundary — the fill scatter of (N,)-sharded particle
fields into the x-slab-sharded box, and the read gather of slab-sharded
grid values back at particle slots — are resolved by all-gathering
GRID-sized tensors (measured ~130 MB/step at the 1M DFSPH configuration,
SCALING.md §2). Both operations only ever need N-sized traffic:

* ``fill_sharded``: every device all-gathers the (F, N) particle fields
  (~F*N*4 bytes, ~28 MB at 1M vs 130 MB) plus the (N,) slot row, then
  scatters ONLY the particles whose slot falls in its own slab into its
  local (F, K, G/nd) box shard. Valid slots are injective and non-local
  particles land on the local trash column (sliced off), so the
  assembled global box is bitwise what the single-device scatter
  produces. The local scatter/gather fill-mode choice mirrors
  ``ops.box.fill_box`` with per-shard sizes.

* ``read_sharded``: every device all-gathers the (N,) slot row (4 MB at
  1M), takes the rows that live in its slab from its local shard (others
  contribute a zero word), and a ``psum_scatter`` over the particle axis
  returns each device its own (F, N/nd) chunk. Exactly one device owns
  any valid slot, so the sum combines one value with zero words — done on
  the uint32 bit patterns so even a stored -0.0 survives bit-exactly.

Both are bitwise-identical to the single-device fill/read (asserted in
tests/test_parallel.py) and eliminate every grid-sized collective from
the particle<->grid boundary. The stencil-pass halos are handled by the
shard_map executor in ops/pallas_passes.py (``column_pass_halo_sym``).

Requires N and the flat ghosted cell count G to divide the mesh; callers
fall back to the GSPMD path otherwise (``fill_read_eligible``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import AXIS, mesh_devices

F32 = jnp.float32


def fill_read_eligible(mesh: Mesh, n: int, g: int) -> bool:
    if len(mesh.axis_names) != 1:
        return False  # the shard_map boundary is 1-D x-slab only
    nd = mesh_devices(mesh)
    return n % nd == 0 and g % nd == 0


def pass_eligible(mesh: Mesh, g: int, flat_p: int) -> bool:
    """The halo executor needs whole shards and a halo no wider than one
    shard (edges then touch only nearest neighbors); 1-D meshes only —
    a 2-D mesh routes to the 5-D executor instead."""
    if len(mesh.axis_names) != 1:
        return False
    nd = mesh_devices(mesh)
    return g % nd == 0 and g // nd >= flat_p


def _slot_split(slots_f: jnp.ndarray, d, k: int, g: int, local_g: int):
    """Global flat slot (rank*G + gcell, trash = K*G) -> local slot
    (rank*Lg + local gcell) on device ``d`` plus the ownership mask."""
    kid = slots_f // g
    lg = (slots_f - kid * g) - d * local_g
    ok = (slots_f < k * g) & (lg >= 0) & (lg < local_g)
    return jnp.where(ok, kid * local_g + lg, k * local_g), ok


def fill_sharded(slots: jnp.ndarray, fields: Sequence[jnp.ndarray],
                 fills: Sequence[float], k: int, g: int, mesh: Mesh,
                 mode: str) -> jnp.ndarray:
    """(N,) fields -> (F, K, G) lane-major grid, sharded on the flat cell
    axis, with N-sized collectives only. ``mode``: "scatter" | "gather"
    (the local analogues of ops.box.fill_box's modes)."""
    f = len(fields)
    n = slots.shape[0]
    nd = mesh_devices(mesh)
    lg = g // nd
    trash = k * lg
    vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)
    fills_a = jnp.asarray(fills, F32)

    def local(vals_l, slots_l):
        d = jax.lax.axis_index(AXIS)
        vals_f = jax.lax.all_gather(vals_l, AXIS, axis=1, tiled=True)
        slots_f = jax.lax.all_gather(slots_l, AXIS, axis=0, tiled=True)
        lslot, _ = _slot_split(slots_f, d, k, g, lg)
        if mode == "gather":
            pid = jnp.full((trash + 1,), n, jnp.int32).at[lslot].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            padded = jnp.concatenate([vals_f, fills_a[:, None]], 1)
            dense = padded[:, pid[:trash]]
        else:
            init = jnp.broadcast_to(fills_a[:, None], (f, trash + 1))
            dense = init.at[:, lslot].set(vals_f, mode="drop")[:, :trash]
        return dense.reshape(f, k, lg)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(None, AXIS), P(AXIS)),
                     out_specs=P(None, None, AXIS),
                     check_vma=False)(vals, slots)


def read_sharded(dense: jnp.ndarray, slots: jnp.ndarray,
                 mesh: Mesh) -> jnp.ndarray:
    """(F, K, G) slab-sharded grid -> (F, N) per-particle values (sharded
    along N), N-sized collectives only. Invalid slots (>= K*G) read 0.0;
    the caller applies its valid/fill mask exactly as after the
    single-device gather."""
    f, k = dense.shape[0], dense.shape[1]
    g = dense.shape[2]
    nd = mesh_devices(mesh)
    lg = g // nd

    def local(dense_l, slots_l):
        d = jax.lax.axis_index(AXIS)
        slots_f = jax.lax.all_gather(slots_l, AXIS, axis=0, tiled=True)
        lslot, ok = _slot_split(slots_f, d, k, g, lg)
        flat = dense_l.reshape(f, k * lg)
        taken = flat[:, jnp.where(ok, lslot, 0)]
        # exactly one device owns each valid slot; summing BIT PATTERNS
        # (one value + zero words) reproduces the owner's bytes exactly,
        # -0.0 included
        bits = jnp.where(ok[None, :],
                         jax.lax.bitcast_convert_type(taken, jnp.uint32),
                         jnp.uint32(0))
        out = jax.lax.psum_scatter(bits, AXIS, scatter_dimension=1,
                                   tiled=True)
        return jax.lax.bitcast_convert_type(out, F32)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(None, None, AXIS), P(AXIS)),
                     out_specs=P(None, AXIS),
                     check_vma=False)(dense, slots)
