"""Worker process for the real 2-process distributed test.

Launched (twice) by ``tests/test_parallel.py::test_distributed_two_process``
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set —
the exact environment contract ``distributed.ensure_initialized`` documents.
Each process owns one CPU device; together they form a global 2-device
mesh and step a tiny dam scene through one sharded WCSPH step. Both
processes print the same ``DIST_OK <checksum>`` line on success (the
parent asserts rc==0 and checksum equality).

NOTE: this environment's sitecustomize pins ``jax_platforms='axon,cpu'``
(the TPU tunnel); the platform MUST be overridden via jax.config before
any backend initialises, and the CPU cross-process collectives need the
gloo implementation enabled.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpp_fluid_particles_tpu.parallel import distributed  # noqa: E402


def main():
    assert distributed.is_multiprocess_env(), "env contract not set"
    live = distributed.ensure_initialized()
    assert live is True, "ensure_initialized must report a live runtime"
    # idempotent
    assert distributed.ensure_initialized() is True

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert len(jax.local_devices()) == 1
    assert distributed.process_index() == int(os.environ["JAX_PROCESS_ID"])

    # the local-shard helper must tile [0, N) without gaps across processes
    sl = distributed.local_device_slice(101)
    expect = (0, 50) if jax.process_index() == 0 else (50, 101)
    assert (sl.start, sl.stop) == expect, (sl, expect)

    import numpy as np
    import jax.numpy as jnp

    import cpp_fluid_particles_tpu as cfp
    from cpp_fluid_particles_tpu import parallel
    from cpp_fluid_particles_tpu.models import common as C, wcsph
    from cpp_fluid_particles_tpu.state import make_fluid_state

    cfg = cfp.dam_break_config(mode="parity", max_active_cells=512, max_per_cell=16)
    scene = C.build_scene(cfg)
    s = cfg.spacing
    pos = np.array(
        [(0.3 + s * i, 0.2 + s * j, 0.3 + s * k)
         for i in range(4) for j in range(4) for k in range(4)], np.float32)
    state = make_fluid_state(pos, cfg)
    carry = wcsph.init_carry(state)

    from cpp_fluid_particles_tpu.parallel.mesh import mesh_devices
    mesh = parallel.make_mesh()  # GLOBAL mesh: one device per process
    assert mesh_devices(mesh) == 2

    with parallel.spatial_sharding(mesh):
        @jax.jit
        def step(state, carry, scene, dt):
            st, ca, m = wcsph.step(state, carry, scene, cfg, dt)
            # scalar outputs are fully replicated -> addressable everywhere
            return (jnp.sum(st.density), jnp.max(jnp.abs(st.pos)),
                    jnp.sum(st.vel))

        rho_sum, pos_max, vel_sum = step(state, carry, scene,
                                         jnp.float32(cfg.dt))

    rho_sum = float(np.asarray(rho_sum))
    pos_max = float(np.asarray(pos_max))
    vel_sum = float(np.asarray(vel_sum))
    assert np.isfinite([rho_sum, pos_max, vel_sum]).all()
    assert 0.0 < pos_max <= 1.0, pos_max
    print(f"DIST_OK {rho_sum:.6e} {pos_max:.6e} {vel_sum:.6e}", flush=True)


if __name__ == "__main__":
    main()
