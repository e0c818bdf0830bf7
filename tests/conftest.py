"""Test harness configuration.

All tests run on CPU with 8 virtual devices so the multi-chip sharding path
can be exercised without TPU hardware (the standard JAX recipe:
``--xla_force_host_platform_device_count``). NOTE: this environment's
sitecustomize registers the axon TPU plugin and forces
``jax_platforms='axon,cpu'`` at interpreter start, so the env var alone is
not enough — we must override via ``jax.config.update`` before any backend
initialises.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-dominated on CPU; reruns
# drop from ~50 min to minutes
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
