"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): WCSPH ms/frame at 20,736 particles, dt=0.001,
vs the reference's 4.4 ms on a GTX 1070 (README.md:7). ``vs_baseline`` is
the speedup factor baseline_ms / our_ms (> 1 means faster than the
reference). DFSPH and PBD frame times (dt=0.004, reference 23.0/11.3 ms)
ride along in "details".

Timing method: the axon TPU backend does not block in
``jax.block_until_ready``, so we chain N jitted steps device-side, force a
single host fetch, and subtract a measured dispatch+fetch baseline —
equivalent to the reference's CUDA-event bracketing (src/SPHSystem.cu:131-157)
amortised over N frames.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _chain_ms(sim, n_steps: int, dt: float, fetch_baseline_ms: float) -> float:
    """n steps in one lax.scan call; subtract the single dispatch+fetch."""
    per_step = sim.run_scan(n_steps, dt)
    return max(per_step - fetch_baseline_ms / n_steps, 0.0)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import cpp_fluid_particles_tpu as cfp

    chain = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    # dispatch+fetch baseline (tunnel round trip)
    ident = jax.jit(lambda p: p + 1.0)
    x = jnp.zeros((20736, 3), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _ = np.asarray(ident(x))
    fetch_ms = (time.perf_counter() - t0) * 1e3 / reps

    results = {}
    baselines = {"wcsph": 4.4, "dfsph": 23.0, "pbd": 11.3}
    for solver, dt in [("wcsph", 0.001), ("dfsph", 0.004), ("pbd", 0.004)]:
        sim = cfp.Simulation(solver=solver, cfg=cfp.dam_break_config(),
                             warmup=True)  # warmup compiles + fills density
        _ = _chain_ms(sim, chain, dt, fetch_ms)  # compiles the n-step scan
        ms = _chain_ms(sim, chain, dt, fetch_ms)
        ok = bool(np.isfinite(np.asarray(sim.state.pos)).all())
        results[solver] = {"ms_per_frame": round(ms, 3),
                           "fps": round(1e3 / ms, 1),
                           "vs_baseline": round(baselines[solver] / ms, 2),
                           "finite": ok}
        print(f"# {solver}: {ms:.2f} ms/frame ({1e3/ms:.1f} FPS), "
              f"speedup vs {baselines[solver]} ms baseline: "
              f"{baselines[solver]/ms:.2f}x", file=sys.stderr)

    headline = results["wcsph"]
    print(json.dumps({
        "metric": "wcsph_ms_per_frame_20736",
        "value": headline["ms_per_frame"],
        "unit": "ms",
        "vs_baseline": headline["vs_baseline"],
        "details": {
            "baseline": "GTX 1070: wcsph 4.4 ms, dfsph 23.0 ms, pbd 11.3 ms "
                        "(reference README.md:6-9)",
            "chain_steps": chain,
            "fetch_baseline_ms": round(fetch_ms, 2),
            **{f"{k}_{kk}": vv for k, v in results.items()
               for kk, vv in v.items()},
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
