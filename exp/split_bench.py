"""End-to-end occupancy-split measurement on the real dam (VERDICT r4
#1-2 "done" criterion): 300-frame clean-chunk average + all-inclusive
average for WCSPH and PBD, parity physics, split program auto-selected
(cfg.occupancy_split=True) vs the plain single-tier engine.

Run on the TPU: python exp/split_bench.py [chain] [solvers...]
"""

from __future__ import annotations

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
    base = {"wcsph": 4.4, "pbd": 11.3}

    ident = jax.jit(lambda p: p + 1.0)
    x = jnp.zeros((20736, 3), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    fetch_ms = (time.perf_counter() - t0) * 1e3 / 5
    print(f"fetch baseline {fetch_ms:.1f} ms", flush=True)

    import os
    k_a = int(os.environ.get("SPLIT_KA", "10"))
    skip_plain = os.environ.get("SPLIT_ONLY", "") == "1"
    # SPLIT_SAFETY overrides the engagement policy's safety factor —
    # a huge value forces the split on whenever any cell exceeds K_a
    # (the policy-calibration experiment: is the break-even model too
    # conservative, or does forced engagement lose end-to-end?)
    if "SPLIT_SAFETY" in os.environ:
        cfp.Simulation.SPLIT_SAFETY = float(os.environ["SPLIT_SAFETY"])
        print(f"SPLIT_SAFETY forced to {cfp.Simulation.SPLIT_SAFETY}",
              flush=True)
    for solver in solvers:
        for split in ((True,) if skip_plain else (False, True)):
            cfg = cfp.dam_break_config(mode="parity",
                                       occupancy_split=split,
                                       split_k_a=k_a)
            sim = cfp.Simulation(solver=solver, cfg=cfg, warmup=True)
            ms, _, dirty = _avg_run_ms(sim, dts[solver], fetch_ms,
                                       total=3 * chain,
                                       measure_steady=False)
            all_in = _all_in_ms(sim, dts[solver], fetch_ms,
                                total=3 * chain)
            tag = f"split(ka={k_a})" if split else "plain"
            print(f"{solver} {tag}: {ms:.3f} ms/frame clean "
                  f"({base[solver]/ms:.2f}x vs ref), all-in "
                  f"{all_in:.3f}, dirty {dirty}, K={sim.max_per_cell}, "
                  f"split_on={sim.split_on} wbox={sim.wbox} "
                  f"split_chunks={sim.split_chunks} "
                  f"retries={sim.retries} drops={sim.dropped_frames}",
                  flush=True)
            assert sim.dropped_frames == 0


if __name__ == "__main__":
    main()
