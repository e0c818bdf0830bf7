"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): WCSPH ms/frame at 20,736 particles, dt=0.001,
vs the reference's 4.4 ms on a GTX 1070 (README.md:7). ``vs_baseline`` is
the speedup factor baseline_ms / our_ms (> 1 means faster than the
reference). DFSPH and PBD frame times (dt=0.004, reference 23.0/11.3 ms)
ride along in "details", together with the roofline attribution per
solver: traversals/frame, pair counts, estimated GFLOP and bytes moved,
and the achieved TFLOP/s / HBM GB/s they imply — so a perf regression is
attributable to "more traversals", "more pairs", or "slower traversals".

Timing method: the axon TPU backend does not block in
``jax.block_until_ready``, so we chain N jitted steps device-side, force a
single host fetch, and subtract a measured dispatch+fetch baseline —
equivalent to the reference's CUDA-event bracketing (src/SPHSystem.cu:131-157)
amortised over N frames.

The three main runs measure PARITY mode (the reference's own solver
contract — fixed-20 PBD, plain Jacobi DFSPH) for an apples-to-apples
comparison; the framework's validated fast DEFAULT (dam_break_config():
PBD 1% tolerance exit + Chebyshev, physics-validated in
exp/pbd_mode_validation.py) is measured by the `default_mode` rider and
reported as `pbd_default_mode_ms_per_frame`.

Two averages are reported per solver: `ms_per_frame` (the filtered
headline — chunks that paid a first-compile or capacity retry inside the
timed window are excluded) and `all_in_ms_per_frame` (the same window
rerun warm via Simulation.restart() with NOTHING excluded — retries,
program switches, residual compiles — like the reference's every-frame
average, src/main.cpp:300-306).

Output contract: the headline JSON line is printed (and flushed) IMMEDIATELY
after the three parity-mode solver runs, so a driver timeout during the
optional rider modes (default mode / PBD tolerance / Chebyshev / 1M) can
never kill the round's perf record. When the riders complete, the SAME headline metric is
re-emitted as the final line enriched with the rider details — both lines
parse standalone, so first-line and last-line consumers agree on the metric.
``--budget-min M`` (or env BENCH_BUDGET_MIN) trims the measurement windows
and skips riders when the remaining wall-clock budget runs short.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Rough per-pair cost model for the roofline attribution (documented
# estimates, not measurements): one pair evaluation computes the geometry
# (3 subs, 3 muls, 2 adds, 1 sqrt), 1-3 piecewise kernel values and a
# handful of weighted reductions — ~50 flops; and the fused XLA executor
# streams ~1.5 f32 operands per pair (BENCHMARKS.md measurement).
FLOP_PER_PAIR = 50.0
BYTES_PER_PAIR = 6.0


def _pair_counts(sim):
    """Fluid-fluid and fluid-boundary pair counts per traversal for the
    CURRENT particle configuration (27-cell stencil, counted once per
    ordered pair like the executors evaluate them; the symmetric executor
    halves the fluid evaluations)."""
    import jax.numpy as jnp
    from cpp_fluid_particles_tpu.ops.grid import cell_coords

    cfg = sim.cfg
    cx, cy, cz = cfg.cell_size

    def cell_hist(pos):
        c = np.asarray(cell_coords(jnp.asarray(pos), cfg))
        inb = ((c >= 0).all(1) & (c[:, 0] < cx) & (c[:, 1] < cy)
               & (c[:, 2] < cz))
        c = c[inb]
        flat = (c[:, 0] * cy + c[:, 1]) * cz + c[:, 2]
        return np.bincount(flat, minlength=cx * cy * cz).reshape(cx, cy, cz)

    hf = cell_hist(np.asarray(sim.state.pos))
    from cpp_fluid_particles_tpu.state import boundary_positions
    hb = cell_hist(boundary_positions(cfg))

    def stencil_sum(h):
        p = np.pad(h, 1)
        s = np.zeros_like(h, np.float64)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    s += p[dx:dx + cx, dy:dy + cy, dz:dz + cz]
        return s

    pairs_f = float((hf * stencil_sum(hf)).sum())
    pairs_b = float((hf * stencil_sum(hb)).sum())
    return pairs_f, pairs_b


def _traversals_per_frame(solver, metrics):
    """Traversal count per frame from the solver structure + measured
    iteration counts (see models/dense_step.py)."""
    if solver == "wcsph":
        return 2.0  # fused rho+colorgrad+visc, fused surface+pressure
    if solver == "dfsph":
        div_it = float(np.asarray(metrics.get("divergence_iters", 0)))
        den_it = float(np.asarray(metrics.get("density_iters", 0)))
        # rho/alpha/colorgrad + div err0 + 2/div iter + visc + surface
        # + warm sa + den err0 + 2/den iter
        return 5.0 + 2.0 * div_it + 2.0 * den_it
    if solver == "pbd":
        # iters x (lambda + delta-pos) + fused xsph+colorgrad + surface;
        # the projection while_loop exits early (exactly) once all
        # lambda are zero, so the iteration count is data-dependent
        it = float(np.asarray(metrics.get("pbd_iters", 20)))
        return 2.0 * it + 2.0
    return 0.0


def _chain_ms(sim, n_steps: int, dt: float, fetch_baseline_ms: float) -> float:
    """n steps in one lax.scan call; subtract the single dispatch+fetch."""
    per_step = sim.run_scan(n_steps, dt)
    return max(per_step - fetch_baseline_ms / n_steps, 0.0)


def _avg_run_ms(sim, dt, fetch_ms, total=300, chunk=25, measure_steady=True):
    """Average per-frame ms over the first ``total`` frames (fall, impact,
    splash, settling — the same averaging the reference README reports),
    timed in scan chunks. Chunks whose capacity configuration was not yet
    compiled, or changed mid-chunk (auto-capacity retry), pay XLA compiles
    inside the timed window and are excluded from the average; their
    frames still advance the simulation, so coverage is unbroken.

    Then frames ``total``..2*``total`` are run and averaged with NOTHING
    excluded (every chunk counts, compiles and capacity retries included)
    — the steady-state wall-clock: by then the splash has visited most
    capacity configs, so this is what sustained operation costs, honest
    against the filtered first-window headline."""
    times = []
    all_times = []
    dirty = 0
    compiled = set()
    for _ in range(total // chunk):
        before = sim.config_key
        r0 = sim.retries
        ms = _chain_ms(sim, chunk, dt, fetch_ms)
        all_times.append(ms)
        # a chunk is clean iff no capacity retry re-ran it mid-window and
        # its program was already compiled (Simulation caches compiled
        # steps per config, so config revisits are free; an end-of-chunk
        # downshift changes config_key AFTER the timed window and is fine)
        if sim.retries == r0 and before in compiled:
            times.append(ms)
        else:
            dirty += 1
        # only configs that EXECUTED a scan chunk have their scan program
        # compiled (an end-of-chunk downshift's new config compiles on its
        # first chunk, which must count dirty)
        compiled.add(before)
    # rerun one clean chunk if everything was dirty (pathological)
    if not times:
        times.append(_chain_ms(sim, chunk, dt, fetch_ms))
    if not measure_steady:
        return float(np.mean(times)), float("nan"), dirty
    # steady state = frames total..2*total, ALL chunks — XLA compiles of
    # any config not yet visited and capacity retries included
    steady = [_chain_ms(sim, chunk, dt, fetch_ms)
              for _ in range(total // chunk)]
    return float(np.mean(times)), float(np.mean(steady)), dirty


def _all_in_ms(sim, dt, fetch_ms, total=300, chunk=25):
    """The all-inclusive number (VERDICT r4 #6): restart the SAME
    Simulation (its compiled-step cache survives restart()) and average
    the full frame-0..total window with NOTHING excluded — capacity
    retries, program switches, and any residual compiles all count,
    exactly like the reference's every-frame README average
    (src/main.cpp:300-306). "Warm cache" = the first window already
    compiled every capacity config this trajectory visits; what remains
    in the timed window is what sustained operation actually costs."""
    sim.restart()
    times = [_chain_ms(sim, chunk, dt, fetch_ms)
             for _ in range(total // chunk)]
    return float(np.mean(times))


def _emit(results, chain, fetch_ms):
    """Print the headline JSON line (flushed). Called twice: right after
    the parity-mode runs (the driver-safe record) and again after the
    riders with the enriched details — both parse standalone."""
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
            "flop_per_pair_model": FLOP_PER_PAIR,
            "bytes_per_pair_model": BYTES_PER_PAIR,
            **{f"{k}_{kk}": vv for k, v in results.items()
               for kk, vv in v.items()},
        },
    }), flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import cpp_fluid_particles_tpu as cfp

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("chain", nargs="?", type=int, default=100,
                    help="frames per measurement third (window = 3*chain)")
    ap.add_argument("--budget-min", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_MIN", "45")),
                    help="wall-clock budget in minutes; the measurement "
                         "windows shrink and riders are skipped as it runs "
                         "short (headline always runs)")
    ap.add_argument("--no-riders", action="store_true",
                    help="stop after the headline JSON line")
    args = ap.parse_args()
    t_start = time.perf_counter()

    def minutes_left():
        return args.budget_min - (time.perf_counter() - t_start) / 60.0

    # persistent XLA compile cache (untracked): the dam's adaptive
    # capacity visits ~5-8 (K, box) configs per solver and each pays a
    # 20-40 s TPU compile cold; cached, a bench rerun is compile-free
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    chain = args.chain

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
        # parity mode: the reference's own solver contract (fixed-20 PBD,
        # plain Jacobi DFSPH) — apples-to-apples with the GTX 1070 numbers;
        # the framework's validated fast default rides below
        sim = cfp.Simulation(solver=solver,
                             cfg=cfp.dam_break_config(mode="parity"),
                             warmup=True)  # warmup compiles + fills density
        # under a short budget trim the window to one chain third and skip
        # the steady-state pass — coverage of fall/impact/splash shrinks
        # but the headline still lands inside the driver's timeout
        tight = minutes_left() < 12.0
        ms, steady_ms, dirty_chunks = _avg_run_ms(
            sim, dt, fetch_ms,
            total=(chain if tight else 3 * chain),
            measure_steady=not tight)
        # all-inclusive rerun of the same window, warm-cache (VERDICT r4
        # #6) — the filtered headline's cherry-picking check
        all_in = (float("nan") if tight
                  else _all_in_ms(sim, dt, fetch_ms, total=3 * chain))
        ok = bool(np.isfinite(np.asarray(sim.state.pos)).all())

        # roofline attribution at the end-of-run configuration
        pairs_f, pairs_b = _pair_counts(sim)
        trav = _traversals_per_frame(solver, sim.metrics)
        # symmetric executor: fluid pair blocks evaluated once per
        # unordered pair; boundary one-sided
        evals = trav * (pairs_f / 2.0 + pairs_b)
        gflop = evals * FLOP_PER_PAIR / 1e9
        gbytes = evals * BYTES_PER_PAIR / 1e9
        results[solver] = {
            "ms_per_frame": round(ms, 3),
            "steady_state_ms_per_frame": (round(steady_ms, 3)
                                          if np.isfinite(steady_ms) else None),
            "all_in_ms_per_frame": (round(all_in, 3)
                                    if np.isfinite(all_in) else None),
            "all_in_vs_baseline": (round(baselines[solver] / all_in, 2)
                                   if np.isfinite(all_in) else None),
            "fps": round(1e3 / ms, 1),
            "vs_baseline": round(baselines[solver] / ms, 2),
            "finite": ok,
            "max_per_cell": sim.max_per_cell,
            "dirty_chunks": dirty_chunks,
            "grid_overflow": int(np.asarray(sim.metrics["grid_overflow"])),
            "traversals": round(trav, 1),
            "pairs_fluid_m": round(pairs_f / 1e6, 1),
            "pairs_boundary_m": round(pairs_b / 1e6, 1),
            "est_gflop_per_frame": round(gflop, 2),
            "achieved_tflops": round(gflop / ms, 3),
            "hbm_gbps": round(gbytes / ms * 1e3, 1),
        }
        print(f"# {solver}: {ms:.2f} ms/frame ({1e3/ms:.1f} FPS), "
              f"speedup vs {baselines[solver]} ms baseline: "
              f"{baselines[solver]/ms:.2f}x | all-in "
              f"{all_in:.2f} ms | {trav:.0f} traversals, "
              f"{results[solver]['achieved_tflops']} TFLOP/s, "
              f"K={sim.max_per_cell}", file=sys.stderr)

    # the round's perf record lands here, BEFORE any rider can eat the
    # driver's timeout (round 3 died rc=124 with the JSON never printed)
    _emit(results, chain, fetch_ms)
    if args.no_riders:
        return 0

    def rider(name, min_budget, fn):
        """Run one optional rider: skipped when the remaining budget is
        below its estimated cost, and a failure can never take down the
        record already emitted above."""
        if minutes_left() < min_budget:
            print(f"# rider {name}: skipped ({minutes_left():.1f} min left "
                  f"< {min_budget} needed)", file=sys.stderr)
            return
        try:
            fn()
        except Exception as e:
            print(f"# rider {name}: failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # PBD tolerance mode (SPlisHSPlasH-style convergence exit at 1% max
    # density error) next to the parity-mode number above — the reference
    # contract is 20 fixed iterations (src/PBDSolver.cu:225-258), so the
    # headline keeps parity mode; this shows what the same framework does
    # when allowed a convergence criterion.
    def pbd_tol():
        sim = cfp.Simulation(
            solver="pbd",
            cfg=cfp.dam_break_config(mode="parity").replace(pbd_density_tolerance=0.01),
            warmup=True)
        tol_ms, _, _ = _avg_run_ms(sim, 0.004, fetch_ms, total=3 * chain,
                                   measure_steady=False)
        results["pbd"]["tol_mode_ms_per_frame"] = round(tol_ms, 3)
        results["pbd"]["tol_mode_vs_baseline"] = round(11.3 / tol_ms, 2)
        print(f"# pbd (tolerance 1%): {tol_ms:.2f} ms/frame "
              f"({11.3/tol_ms:.2f}x vs 11.3 ms baseline)", file=sys.stderr)

    # Chebyshev-accelerated modes (PARITY.md #11; exp/cheb_bench.py is
    # the standalone sweep): same convergence criteria, fewer Jacobi /
    # projection iterations via semi-iterative extrapolation.
    def pbd_cheb():
        sim = cfp.Simulation(
            solver="pbd",
            cfg=cfp.dam_break_config(mode="parity").replace(pbd_density_tolerance=0.01,
                                               pbd_chebyshev_rho=0.9),
            warmup=True)
        cheb_ms, _, _ = _avg_run_ms(sim, 0.004, fetch_ms, total=3 * chain,
                                    measure_steady=False)
        results["pbd"]["cheb_mode_ms_per_frame"] = round(cheb_ms, 3)
        results["pbd"]["cheb_mode_vs_baseline"] = round(11.3 / cheb_ms, 2)
        print(f"# pbd (tol 1% + chebyshev 0.9): {cheb_ms:.2f} ms/frame "
              f"({11.3/cheb_ms:.2f}x vs 11.3 ms baseline)", file=sys.stderr)

    def dfsph_cheb():
        sim = cfp.Simulation(
            solver="dfsph",
            cfg=cfp.dam_break_config(mode="parity").replace(dfsph_chebyshev_rho=0.9),
            warmup=True)
        dcheb_ms, _, _ = _avg_run_ms(sim, 0.004, fetch_ms, total=3 * chain,
                                     measure_steady=False)
        results["dfsph"]["cheb_mode_ms_per_frame"] = round(dcheb_ms, 3)
        results["dfsph"]["cheb_mode_vs_baseline"] = round(23.0 / dcheb_ms, 2)
        print(f"# dfsph (chebyshev 0.9): {dcheb_ms:.2f} ms/frame "
              f"({23.0/dcheb_ms:.2f}x vs 23.0 ms baseline)", file=sys.stderr)

    # BASELINE target #2 rider: 1M-particle DFSPH steps/s on the one
    # reachable chip (the >10 steps/s target is for v5e-8; SCALING.md
    # carries the 8-chip projection; bench_scaled.py is the standalone
    # harness with the full detail line).
    def one_m():
        cfg1m, pos1m = cfp.scaled_dam_scene(1_000_000, mode="parity")
        sim = cfp.Simulation(solver="dfsph", cfg=cfg1m, fluid_pos=pos1m,
                             warmup=False)
        for i in range(5):  # warm until the capacity config stabilises
            before = sim.build_id
            sim.run_scan(5)
            if sim.build_id == before and i > 0:
                break
        per = sim.run_scan(5) - fetch_ms / 5
        results["dfsph"]["steps_per_s_1m_single_chip"] = round(1e3 / per, 2)
        results["dfsph"]["ms_per_step_1m_single_chip"] = round(per, 1)
        print(f"# dfsph @1M: {per:.0f} ms/step ({1e3/per:.2f} steps/s "
              f"single chip; v5e-8 target >10)", file=sys.stderr)

    # The framework's DEFAULT configuration (dam_break_config() mode="fast":
    # PBD 1% tolerance exit + Chebyshev, physics-validated against parity
    # over the full dam at BOTH dt 0.002 and 0.004 —
    # exp/pbd_mode_validation.py, PARITY.md #11-12): what a user gets out
    # of the box. Only PBD's default differs from parity (DFSPH Chebyshev
    # at every engaging setting, and the warm-start predictor at this
    # benchmark's dt 0.004, failed validation and stay opt-in), so only
    # PBD is re-measured here.
    def default_mode():
        sim = cfp.Simulation(solver="pbd", cfg=cfp.dam_break_config(),
                             warmup=True)
        dms, _, _ = _avg_run_ms(sim, 0.004, fetch_ms, total=3 * chain,
                                measure_steady=False)
        results["pbd"]["default_mode_ms_per_frame"] = round(dms, 3)
        results["pbd"]["default_mode_vs_baseline"] = round(11.3 / dms, 2)
        print(f"# pbd (framework default, validated fast mode): "
              f"{dms:.2f} ms/frame ({11.3/dms:.2f}x vs 11.3 ms baseline)",
              file=sys.stderr)

    # Round 5 (PARITY.md #12): the quarter-scale Δp warm-start predictor
    # stacked on tol+cheb — VALIDATED at the code-default dt 0.002,
    # DIVERGES at this benchmark's dt 0.004 (dKE 7.8%, the dual-dt gate),
    # so it is NOT the default; timed here as the opt-in it is, at the
    # dt where it is validated, next to the same-dt default comparator.
    def pbd_warm():
        warm_cfg = cfp.dam_break_config().replace(pbd_warm_start=0.25)
        ms_by = {}
        for tag, cfg_i in (("warm", warm_cfg), ("default", cfp.dam_break_config())):
            sim = cfp.Simulation(solver="pbd", cfg=cfg_i, warmup=True)
            wms, _, _ = _avg_run_ms(sim, 0.002, fetch_ms, total=3 * chain,
                                    measure_steady=False)
            ms_by[tag] = wms
        results["pbd"]["warm_mode_dt002_ms_per_frame"] = round(ms_by["warm"], 3)
        results["pbd"]["default_mode_dt002_ms_per_frame"] = round(ms_by["default"], 3)
        print(f"# pbd @dt=0.002 (its validated regime): warm 0.25 stack "
              f"{ms_by['warm']:.2f} ms/frame vs default {ms_by['default']:.2f}",
              file=sys.stderr)

    # Occupancy-class split riders (VERDICT r4 #1: the two-tier K
    # program, ops/split.py — parity physics, float-close executor):
    # the end-to-end 300-frame dam measurement next to the plain
    # single-tier headline.
    def split_mode(solver, dt, baseline):
        sim = cfp.Simulation(
            solver=solver,
            cfg=cfp.dam_break_config(mode="parity", occupancy_split=True),
            warmup=True)
        sms, _, _ = _avg_run_ms(sim, dt, fetch_ms, total=3 * chain,
                                measure_steady=False)
        results[solver]["split_ms_per_frame"] = round(sms, 3)
        results[solver]["split_vs_baseline"] = round(baseline / sms, 2)
        print(f"# {solver} (occupancy split): {sms:.2f} ms/frame "
              f"({baseline/sms:.2f}x vs {baseline} ms baseline), "
              f"split_on={sim.split_on} wbox={sim.wbox}", file=sys.stderr)

    rider("wcsph_split", 4.0, lambda: split_mode("wcsph", 0.001, 4.4))
    rider("pbd_split", 6.0, lambda: split_mode("pbd", 0.004, 11.3))
    rider("default_mode", 8.0, default_mode)
    rider("pbd_tolerance", 4.0, pbd_tol)
    rider("pbd_chebyshev", 4.0, pbd_cheb)
    rider("dfsph_chebyshev", 4.0, dfsph_cheb)
    rider("dfsph_1m", 5.0, one_m)
    # last: the dt-0.002 opt-in documentation rider must never starve
    # the long-standing record fields above of budget
    rider("pbd_warm_dt002", 8.0, pbd_warm)

    # re-emit the same headline enriched with whatever riders landed —
    # last-line consumers get the full details, first-line consumers got
    # the identical metric/value either way
    _emit(results, chain, fetch_ms)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
