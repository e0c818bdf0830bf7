"""DFSPH fast-mode sweep through the full-dam validation gate (VERDICT
r4 #3) + the PBD intermediate-scale warm-start candidates (#7).

Round 4 validated ONE DFSPH acceleration point (chebyshev rho=0.9 applied
to both solves) and rejected it — a one-sample conclusion. This sweep
explores the knob space the verdict names:

  stage 1:  dfsph_chebyshev_rho in {0.75, 0.8, 0.85}
            x applied-to {density-only, both}        (start=6, sor=1.0)
  stage 2:  around the fastest VALIDATED stage-1 point:
            chebyshev_start in {4, 8} x dfsph_sor in {0.8, 0.9}
  pbd:      warm-start scale {0.25, 0.5} + tol 1% + cheb 0.9 (the round-4
            full-scale 1.0 exploded; 0.5 was stable but unvalidated)

Every candidate runs the FULL dam (default 300 frames) and is compared
against the parity baseline with the same statistical envelopes as
exp/pbd_mode_validation.py (impact timing, KE envelope, peak density,
settled quantiles, free-surface height). Results append to
exp/dfsph_sweep_results.json as they land, so a partial sweep still
records evidence.

Run on the TPU: python exp/dfsph_sweep.py [frames] [chunk]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")

import cpp_fluid_particles_tpu as cfp
from pbd_mode_validation import compare, run_mode

RESULTS = "/root/repo/exp/dfsph_sweep_results.json"


def verdict(r):
    return (r["dt_impact"] <= 1 and r["dke"] < 0.05
            and r["drho_max"] < 0.05 and r["dq"] < 0.01
            and r["dh_sp"] < 1.0)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = {"frames": frames, "dfsph": [], "pbd": []}

    def flush():
        with open(RESULTS, "w") as f:
            json.dump(out, f, indent=1)

    cfg = cfp.dam_break_config(mode="parity")

    # ---------------- DFSPH ----------------
    t0 = time.perf_counter()
    base = run_mode("dfsph-parity", cfg, frames, chunk, "dfsph")
    base_wall = time.perf_counter() - t0
    out["dfsph_parity_wall_s"] = round(base_wall, 1)
    flush()

    def run_candidate(solver, name, flags, basepair):
        t0 = time.perf_counter()
        try:
            run = run_mode(name, cfg.replace(**flags), frames, chunk,
                           solver)
        except Exception as e:  # instability (NaN/capacity) is a verdict
            rec = {"name": name, "flags": flags, "error": repr(e)[:200],
                   "validated": False}
            out[solver].append(rec)
            flush()
            print(f"{name}: CRASHED ({e})", flush=True)
            return rec
        wall = time.perf_counter() - t0
        r = compare(f"{name:28s} vs parity", basepair, run, cfg, chunk)
        rec = {"name": name, "flags": flags, "wall_s": round(wall, 1),
               "ms_per_frame_rough": round(wall * 1e3 / frames, 1),
               **{k: round(float(v), 4) for k, v in r.items()},
               "validated": bool(verdict(r))}
        out[solver].append(rec)
        flush()
        print(f"{name}: {'VALIDATED' if rec['validated'] else 'DIVERGES'} "
              f"(~{rec['ms_per_frame_rough']} ms/frame rough)", flush=True)
        return rec

    stage1 = []
    for rho in (0.75, 0.8, 0.85):
        for dens_only in (True, False):
            nm = f"cheb{rho}-{'den' if dens_only else 'both'}-s6"
            stage1.append(run_candidate("dfsph", nm, dict(
                dfsph_chebyshev_rho=rho, chebyshev_start=6,
                dfsph_cheb_density_only=dens_only), base))

    # stage 2: refine around the fastest validated stage-1 point
    ok1 = [r for r in stage1 if r.get("validated")]
    if ok1:
        best = min(ok1, key=lambda r: r["ms_per_frame_rough"])
        bf = dict(best["flags"])
        for start in (4, 8):
            f2 = dict(bf, chebyshev_start=start)
            run_candidate("dfsph", best["name"] + f"+start{start}", f2,
                          base)
        for sor in (0.8, 0.9):
            f2 = dict(bf, dfsph_sor=sor)
            run_candidate("dfsph", best["name"] + f"+sor{sor}", f2, base)
    else:
        print("stage 1: nothing validated — no refinement", flush=True)

    # ---------------- PBD warm start at intermediate scale ----------------
    pbase = run_mode("pbd-parity", cfg, frames, chunk, "pbd")
    for scale in (0.25, 0.5):
        run_candidate("pbd", f"tol1%+cheb+warm{scale}", dict(
            pbd_density_tolerance=0.01, pbd_chebyshev_rho=0.9,
            pbd_warm_start=scale), pbase)

    flush()
    print("sweep complete ->", RESULTS, flush=True)


if __name__ == "__main__":
    main()
