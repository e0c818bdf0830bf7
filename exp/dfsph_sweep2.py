"""DFSPH fast-mode sweep, stage 2: chaos-floor-calibrated gate.

Stage 1 (exp/dfsph_sweep.py) produced a decisive methodological finding:
the three "density-only" candidates returned BIT-IDENTICAL stats across
rho in {0.75, 0.8, 0.85} — the density solve runs ~2 iterations, below
chebyshev_start=6, so extrapolation never engages and those runs are
FLOAT-EXACT PHYSICS (the Chebyshev loop's omega=1 arithmetic is an
algebraic identity, reassociated). Their divergence from parity is
therefore the 300-frame dam's CHAOS FLOOR for DFSPH:

    dCOM 0.63 sp, dKE 2.4%, drho_max 1.11, dq 0.0235, dh 0.27 sp

— which exceeds the absolute envelopes (drho_max < 0.05, dq < 0.01) the
PBD gate uses. DFSPH at frame 300 is still sloshing (parity q50 = 0.72),
so instantaneous-density statistics are chaos-dominated and an absolute
gate rejects even exact physics. This stage therefore:

  1. measures a SECOND independent float-exact control (parity with the
     executor forced to a 2-slab chunking — pure summation-order change)
     to bound the floor from two samples;
  2. gates candidates RELATIVE to the floor: every criterion must stay
     within 2x the worst control;
  3. sweeps the divergence-solve-engaging candidates (in stage 1,
     "both" == div-only: the density solve never reaches the start) at
     gentler rho {0.6, 0.7} x start {6, 10}.

Run on the TPU: python exp/dfsph_sweep2.py [frames] [chunk]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/exp")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from pbd_mode_validation import compare, run_mode

RESULTS = "/root/repo/exp/dfsph_sweep2_results.json"
CRITERIA = ("dcom_sp", "dke", "drho_max", "dq", "dh_sp")


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cfg = cfp.dam_break_config(mode="parity")
    out = {"frames": frames, "controls": [], "candidates": []}

    def flush():
        with open(RESULTS, "w") as f:
            json.dump(out, f, indent=1)

    base = run_mode("dfsph-parity", cfg, frames, chunk, "dfsph")

    # control A: omega=1 Chebyshev loop (start > max_iter: extrapolation
    # never engages on either solve — algebraically exact, reassociated)
    runa = run_mode("ctrl-omega1", cfg.replace(
        dfsph_chebyshev_rho=0.5, chebyshev_start=25), frames, chunk,
        "dfsph")
    ra = compare("ctrl-omega1    vs parity", base, runa, cfg, chunk)
    out["controls"].append({"name": "ctrl-omega1",
                            **{k: round(float(v), 4)
                               for k, v in ra.items()}})
    flush()

    # control B: forced 2-slab chunked executor (pure summation order)
    pp.CHUNK_OVERRIDE = 2
    try:
        runb = run_mode("ctrl-chunk2", cfg, frames, chunk, "dfsph")
    finally:
        pp.CHUNK_OVERRIDE = None
    rb = compare("ctrl-chunk2    vs parity", base, runb, cfg, chunk)
    out["controls"].append({"name": "ctrl-chunk2",
                            **{k: round(float(v), 4)
                               for k, v in rb.items()}})
    floor = {k: max(ra[k], rb[k]) for k in CRITERIA}
    floor["dt_impact"] = 1
    out["floor"] = {k: round(float(v), 4) for k, v in floor.items()}
    flush()
    print("chaos floor (worst of 2 float-exact controls):",
          out["floor"], flush=True)

    def gated(name, flags):
        t0 = time.perf_counter()
        try:
            run = run_mode(name, cfg.replace(**flags), frames, chunk,
                           "dfsph")
        except Exception as e:
            rec = {"name": name, "flags": flags, "error": repr(e)[:200],
                   "validated": False}
            out["candidates"].append(rec)
            flush()
            print(f"{name}: CRASHED ({e})", flush=True)
            return
        wall = time.perf_counter() - t0
        r = compare(f"{name:22s} vs parity", base, run, cfg, chunk)
        ok = (r["dt_impact"] <= 1
              and all(r[k] <= 2.0 * max(floor[k], 1e-9)
                      for k in CRITERIA))
        rec = {"name": name, "flags": flags, "wall_s": round(wall, 1),
               "ms_per_frame_rough": round(wall * 1e3 / frames, 1),
               **{k: round(float(v), 4) for k, v in r.items()},
               "vs_floor": {k: round(float(r[k] / max(floor[k], 1e-9)), 2)
                            for k in CRITERIA},
               "validated": bool(ok)}
        out["candidates"].append(rec)
        flush()
        print(f"{name}: {'VALIDATED (2x floor)' if ok else 'DIVERGES'} "
              f"vs_floor={rec['vs_floor']}", flush=True)

    for rho in (0.6, 0.7):
        for start in (6, 10):
            gated(f"cheb{rho}-s{start}",
                  dict(dfsph_chebyshev_rho=rho, chebyshev_start=start))
    flush()
    print("stage-2 sweep complete ->", RESULTS, flush=True)


if __name__ == "__main__":
    main()
