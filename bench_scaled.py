"""Scaled-scene benchmark — the 1M-particle DFSPH target (BASELINE.md:
>10 steps/s on v5e-8; this environment exposes ONE chip, so the measured
number here is the single-chip steps/s and the v5e-8 figure is the
sharded path's projection, validated for correctness on the 8-virtual-
device mesh by tests/test_parallel.py).

Usage: python bench_scaled.py [n_particles] [solver] [n_steps] [cheb_rho]
Prints one JSON line: {"metric": "dfsph_steps_per_s_1m", ...}.
cheb_rho > 0 enables the Chebyshev-accelerated mode (PARITY.md #11).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    solver = sys.argv[2] if len(sys.argv) > 2 else "dfsph"
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cheb_rho = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

    import jax
    import jax.numpy as jnp
    import cpp_fluid_particles_tpu as cfp

    # persistent XLA compile cache shared with bench.py (untracked)
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # cheb_rho == 0 measures the parity contract (comparable across
    # rounds); > 0 measures the accelerated mode at that rho
    cfg, pos = cfp.scaled_dam_scene(n_target, mode="parity")
    if cheb_rho > 0.0:
        cfg = cfg.replace(dfsph_chebyshev_rho=cheb_rho,
                          pbd_chebyshev_rho=cheb_rho,
                          pbd_density_tolerance=0.01)
    t0 = time.perf_counter()
    sim = cfp.Simulation(solver=solver, cfg=cfg, fluid_pos=pos,
                         warmup=False)
    build_s = time.perf_counter() - t0

    # dispatch+fetch baseline (tunnel round trip)
    ident = jax.jit(lambda p: p + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    fetch_ms = (time.perf_counter() - t0) * 1e3 / 5

    # warm with the SAME chunk length as the measurement (run_scan caches
    # one compiled program per n) until the capacity configuration
    # stabilises — an auto-capacity bump or a first-time scan length
    # inside the timed window would bill a full XLA recompile to the
    # physics
    t0 = time.perf_counter()
    for _ in range(5):
        before = sim.build_id
        sim.run_scan(n_steps)
        if sim.build_id == before and _ > 0:
            break
    warm_s = time.perf_counter() - t0
    per_step = sim.run_scan(n_steps) - fetch_ms / n_steps
    ok = bool(np.isfinite(np.asarray(sim.state.pos)).all())
    m = {k: (np.asarray(v).item() if np.asarray(v).size == 1 else None)
         for k, v in sim.metrics.items()}

    steps_per_s = 1e3 / per_step
    print(json.dumps({
        "metric": (f"{solver}_steps_per_s_{n_target}"
                   + ("_cheb" if cheb_rho > 0.0 else "")),
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 10.0, 3),
        "details": {
            "n_fluid": sim.fluid_size,
            "n_boundary": sim.boundary_size,
            "ms_per_step": round(per_step, 1),
            "timed_steps": n_steps,
            "build_s": round(build_s, 1),
            "compile_s": round(warm_s, 1),
            "fetch_baseline_ms": round(fetch_ms, 2),
            "max_per_cell": sim.max_per_cell,
            "box": sim.box,
            "finite": ok,
            "grid_overflow": m.get("grid_overflow"),
            "density_iters": m.get("density_iters"),
            "divergence_iters": m.get("divergence_iters"),
            "note": "single chip via axon relay; the >10 steps/s "
                    "BASELINE target is for v5e-8 (8 chips)",
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
