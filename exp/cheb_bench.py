"""Chebyshev acceleration payoff on the real dam break (real chip).

Measures ms/frame (bench.py's clean-chunk methodology, frames 0-300) and
iteration counts for:

  dfsph plain            — the parity baseline (tolerance exits per the
                           reference's own criterion)
  dfsph cheb 0.9/0.96    — cfg.dfsph_chebyshev_rho
  pbd parity             — fixed-20-iteration reference contract
  pbd tol 1%             — SPlisHSPlasH-style convergence exit
  pbd tol 1% + cheb 0.9  — accelerated convergence on the same criterion

The Chebyshev knob cannot win in PBD parity mode (the contract is a fixed
iteration count); its value is reaching the SAME residual in fewer
iterations, so it is measured on the tolerance criterion. For DFSPH the
reference itself iterates to tolerance, so acceleration is directly
comparable.

Run on the TPU: python exp/cheb_bench.py [frames] [case-substring]
(the optional second arg filters cases by substring, e.g. "warm")
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp


def fetch_baseline_ms():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def run_case(name, solver, cfg, dt, frames, fetch_ms, chunk=25):
    sim = cfp.Simulation(solver=solver, cfg=cfg, warmup=True)
    times, iters = [], []
    compiled = set()
    for _ in range(frames // chunk):
        before = sim.config_key
        r0 = sim.retries
        per_step = sim.run_scan(chunk, dt)
        ms = max(per_step - fetch_ms / chunk, 0.0)
        if sim.retries == r0 and before in compiled:
            times.append(ms)
        compiled.add(before)
        if solver == "dfsph":
            iters.append((float(np.asarray(
                sim.metrics["divergence_iters"])), float(np.asarray(
                    sim.metrics["density_iters"]))))
        else:
            iters.append((float(np.asarray(sim.metrics["pbd_iters"])), 0.0))
        # hard safety: a diverging accelerated run must fail loudly
        assert np.isfinite(np.asarray(sim.state.pos)).all(), name
    ms = float(np.mean(times)) if times else float("nan")
    it = np.asarray(iters)
    rho_max = float(np.asarray(sim.state.density).max())
    print(f"{name:24s} {ms:8.2f} ms/frame | iters "
          f"{it[:, 0].mean():5.1f}/{it[:, 1].mean():5.1f} "
          f"(last-frame-of-chunk avg) | max rho {rho_max:7.1f} | "
          f"K={sim.max_per_cell}", flush=True)
    return ms


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    fetch = fetch_baseline_ms()
    cfg = cfp.dam_break_config(mode="parity")
    cases = [
        ("dfsph plain", "dfsph", cfg, 0.004),
        ("dfsph cheb 0.9", "dfsph",
         cfg.replace(dfsph_chebyshev_rho=0.9), 0.004),
        ("dfsph cheb 0.96", "dfsph",
         cfg.replace(dfsph_chebyshev_rho=0.96), 0.004),
        ("pbd parity", "pbd", cfg, 0.004),
        ("pbd tol 1%", "pbd",
         cfg.replace(pbd_density_tolerance=0.01), 0.004),
        ("pbd tol 1% cheb 0.9", "pbd",
         cfg.replace(pbd_density_tolerance=0.01,
                     pbd_chebyshev_rho=0.9), 0.004),
        # round 4: Dp warm-start predictor (cfg.pbd_warm_start) — zero
        # extra traversals; measured on the tolerance criterion, alone
        # and composed with Chebyshev
        ("pbd tol 1% warm 1.0", "pbd",
         cfg.replace(pbd_density_tolerance=0.01,
                     pbd_warm_start=1.0), 0.004),
        ("pbd tol1% cheb+warm", "pbd",
         cfg.replace(pbd_density_tolerance=0.01, pbd_chebyshev_rho=0.9,
                     pbd_warm_start=1.0), 0.004),
        ("pbd tol1% warm 0.5", "pbd",
         cfg.replace(pbd_density_tolerance=0.01,
                     pbd_warm_start=0.5), 0.004),
        # round 5: the intermediate scale 0.25 PASSED the full-dam
        # validation gate (exp/dfsph_sweep.py / PARITY.md #12) — timed
        # here composed with tol+cheb (the validated stack)
        ("pbd tol1% cheb+warm.25", "pbd",
         cfg.replace(pbd_density_tolerance=0.01, pbd_chebyshev_rho=0.9,
                     pbd_warm_start=0.25), 0.004),
        # round-5 continuation (exp/warm_dt_sweep.py): the two points
        # that VALIDATED at dt 0.004 — the dt-scaled warm predictor
        # (0.125 at 0.004 ~ the same absolute perturbation as the
        # 0.25-at-0.002 pass) and the higher Chebyshev rho
        ("pbd tol1% cheb 0.95", "pbd",
         cfg.replace(pbd_density_tolerance=0.01,
                     pbd_chebyshev_rho=0.95), 0.004),
        ("pbd tol1% cheb+w.125", "pbd",
         cfg.replace(pbd_density_tolerance=0.01, pbd_chebyshev_rho=0.9,
                     pbd_warm_start=0.125), 0.004),
        ("pbd tol1% cheb 0.975", "pbd",
         cfg.replace(pbd_density_tolerance=0.01,
                     pbd_chebyshev_rho=0.975), 0.004),
        ("pbd tc95+w.125", "pbd",
         cfg.replace(pbd_density_tolerance=0.01, pbd_chebyshev_rho=0.95,
                     pbd_warm_start=0.125), 0.004),
    ]
    if len(sys.argv) > 2:
        cases = [c for c in cases if sys.argv[2] in c[0]]
    for case in cases:
        try:
            run_case(*case, frames, fetch)
        except AssertionError as e:
            print(f"{case[0]}: DIVERGED ({e})", flush=True)


if __name__ == "__main__":
    main()
