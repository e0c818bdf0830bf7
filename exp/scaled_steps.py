"""Full-step DFSPH throughput at the 1M-particle scaled scene (real chip).

The round-2 figure was 781 ms/step (1.28 steps/s) with the unchunked
executor; the slab-chunked executor (ops/pallas_passes.
column_pass_xla_sym_chunked) re-measures here. Usage:

    python exp/scaled_steps.py [n=1000000] [solver=dfsph] [steps=20]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import cpp_fluid_particles_tpu as cfp


def fetch_baseline():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    solver = sys.argv[2] if len(sys.argv) > 2 else "dfsph"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    cfg, pos = cfp.scaled_dam_scene(n_target)
    print(f"n={pos.shape[0]} solver={solver}", flush=True)

    sim = cfp.Simulation(solver=solver, cfg=cfg, fluid_pos=pos, warmup=True)
    fetch = fetch_baseline()
    chunk = 5
    for i in range(steps // chunk):
        t0 = time.perf_counter()
        per = sim.run_scan(chunk, cfg.dt)
        wall = (time.perf_counter() - t0) * 1e3
        m = sim.metrics
        print(f"chunk {i}: {per:.1f} ms/step (wall {wall:.0f} ms, "
              f"K={sim.max_per_cell} box={sim.box} "
              f"div_it={np.asarray(m.get('divergence_iters', 0))} "
              f"den_it={np.asarray(m.get('density_iters', 0))} "
              f"ov={np.asarray(m.get('grid_overflow', 0))})", flush=True)
    ok = bool(np.isfinite(np.asarray(sim.state.pos)).all())
    print(f"finite={ok} fetch_baseline={fetch:.1f} ms")


if __name__ == "__main__":
    main()
