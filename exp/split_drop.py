"""Occupancy split on its DESIGN scene: the drop-into-pool.

BENCHMARKS.md round 5 closed the split as an end-to-end rejection ON THE
DAM — the over-K_a population wanders the whole domain across a scan
chunk, so the fitted overflow window degenerates to the full box. The
engine was kept opt-in "for scenes whose high-occupancy region is
spatially coherent by construction". `state.drop_scene` is now such a
scene in the tree: a resting pool at ~8 particles/cell with compression
confined to the impact column under a centered falling cube. This
harness delivers the measurement behind that claim — or falsifies it.

Methodology identical to exp/split_bench.py (clean-chunk + all-in
averages, parity physics, split auto-engaged by the break-even policy).

Run on the TPU: python exp/split_drop.py [chain] [solvers...]
Env: SPLIT_KA (default 10), SPLIT_SAFETY (policy override).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import cpp_fluid_particles_tpu as cfp
    from bench import _avg_run_ms, _all_in_ms

    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    solvers = sys.argv[2:] or ["wcsph", "pbd"]
    dts = {"wcsph": 0.001, "pbd": 0.004}

    ident = jax.jit(lambda p: p + 1.0)
    x = jnp.zeros((16384, 3), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    fetch_ms = (time.perf_counter() - t0) * 1e3 / 5
    print(f"fetch baseline {fetch_ms:.1f} ms", flush=True)

    k_a = int(os.environ.get("SPLIT_KA", "10"))
    if "SPLIT_SAFETY" in os.environ:
        cfp.Simulation.SPLIT_SAFETY = float(os.environ["SPLIT_SAFETY"])
        print(f"SPLIT_SAFETY forced to {cfp.Simulation.SPLIT_SAFETY}",
              flush=True)
    for solver in solvers:
        for split in (False, True):
            cfg, pos = cfp.drop_scene(
                mode="parity",
                cfg_overrides=dict(occupancy_split=split, split_k_a=k_a))
            sim = cfp.Simulation(solver=solver, cfg=cfg, fluid_pos=pos,
                                 warmup=True)
            ms, _, dirty = _avg_run_ms(sim, dts[solver], fetch_ms,
                                       total=3 * chain,
                                       measure_steady=False)
            all_in = _all_in_ms(sim, dts[solver], fetch_ms,
                                total=3 * chain)
            tag = f"split(ka={k_a})" if split else "plain"
            print(f"{solver} {tag}: {ms:.3f} ms/frame clean, all-in "
                  f"{all_in:.3f}, dirty {dirty}, K={sim.max_per_cell}, "
                  f"box={sim.box}, split_on={sim.split_on} "
                  f"wbox={sim.wbox} split_chunks={sim.split_chunks} "
                  f"retries={sim.retries} drops={sim.dropped_frames}",
                  flush=True)
            assert sim.dropped_frames == 0


if __name__ == "__main__":
    main()
