"""Multi-host (multi-process) plumbing over DCN.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3 — no
NCCL/MPI). The TPU-native scaling story is: GSPMD spatial sharding over
the in-process device mesh (parallel/mesh.py, ICI collectives), and —
for pod slices spanning hosts — the standard JAX multi-controller
runtime: every host runs the same program, `jax.distributed.initialize`
wires the DCN coordination plane, and `jax.devices()` becomes the GLOBAL
device list, so the existing `make_mesh()` + `spatial_sharding()` path
works unchanged (XLA routes halo exchange over ICI within a slice and
DCN across slices).

This module is the thin bootstrap around that recipe. It is a no-op in
single-process runs (the default everywhere in the test suite and the
single-chip benchmarks), so it is safe to call unconditionally at program
start:

    from cpp_fluid_particles_tpu.parallel import distributed
    distributed.ensure_initialized()     # no-op unless multi-process env
    mesh = parallel.make_mesh()          # global mesh across all hosts

Environment contract (the standard JAX one): either the TPU runtime
provides topology discovery (GKE/TPU-VM metadata — zero-config), or set
JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID explicitly.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def is_multiprocess_env() -> bool:
    """True when this process is part of a declared multi-process job."""
    if os.environ.get("JAX_NUM_PROCESSES", "1") not in ("", "1"):
        return True
    # TPU pod runtime sets this for multi-host slices
    return os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None


def ensure_initialized(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime if (and only if) this is a
    multi-process job. Returns True when the distributed runtime is live.

    Explicit arguments win over the JAX_* environment variables; with
    neither present this is a no-op returning False (single-process)."""
    global _initialized
    if _initialized:
        return True
    explicit = coordinator_address is not None
    if not explicit and not is_multiprocess_env():
        return False

    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    env_np = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_NUM_PROCESSES") else None)
    env_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if os.environ.get("JAX_PROCESS_ID") else None)
    if env_np is not None:
        kwargs["num_processes"] = env_np
    if env_id is not None:
        kwargs["process_id"] = env_id
    if not explicit and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def process_index() -> int:
    import jax
    return jax.process_index()


def local_device_slice(n: int) -> slice:
    """The contiguous range of the global x-slab decomposition owned by
    this process — handy for scene construction that only materialises
    the local shard of a very large particle set."""
    import jax
    per = n // jax.process_count()
    p = jax.process_index()
    lo = p * per
    hi = n if p == jax.process_count() - 1 else lo + per
    return slice(lo, hi)
