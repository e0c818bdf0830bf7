"""Round-5 continuation: the two PBD fast-mode points never swept.

1. `warm 0.125` — the dual-dt gate rejected warm 0.25 at dt 0.004
   because the predictor re-applies the previous frame's projection
   displacement, which grows with dt (BENCHMARKS.md round-5 warm-start
   section). Halving the scale at the doubled dt restores the same
   absolute warm perturbation that VALIDATED at (0.25, dt 0.002) — if
   the stability window really is displacement-bound, 0.125 should pass
   at dt 0.004. A scale that passes at BOTH dts is promotable under the
   repo's dual-dt default rule.

2. `cheb rho 0.95` — the PBD Chebyshev knob has only ever been measured
   at rho 0.9 (round 3, exp/cheb_bench.py); the DFSPH failure at 0.96
   (overshoot -> K escalation) is a different solver. A higher rho cuts
   iterations on the same 1% residual criterion if the extrapolation
   stays stable.

Candidates gate through the exact envelopes of exp/pbd_mode_validation.py
(imported, not copied) vs a parity run at the same dt.

Run on the TPU:  python exp/warm_dt_sweep.py [dt] [frames] [chunk]
(dt defaults to 0.004 — the regime that rejected 0.25; re-run at 0.002
for the dual-dt verdict on any candidate that passes.)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from pbd_mode_validation import compare, run_mode  # noqa: E402

CANDIDATES = [
    ("tol1%+cheb", dict(pbd_density_tolerance=0.01,
                        pbd_chebyshev_rho=0.9)),
    ("tc+warm0.125", dict(pbd_density_tolerance=0.01,
                          pbd_chebyshev_rho=0.9,
                          pbd_warm_start=0.125)),
    ("tol1%+cheb0.95", dict(pbd_density_tolerance=0.01,
                            pbd_chebyshev_rho=0.95)),
    # round-5 continuation 2: cheb 0.95 timed -15% vs 0.9 (86.1 vs 101.2
    # ms/frame) and validated at dt 0.004 — probe one notch higher, and
    # the 0.95 + dt-scaled-warm compose
    ("tol1%+cheb0.975", dict(pbd_density_tolerance=0.01,
                             pbd_chebyshev_rho=0.975)),
    ("tc95+w.125", dict(pbd_density_tolerance=0.01,
                        pbd_chebyshev_rho=0.95,
                        pbd_warm_start=0.125)),
]


def main():
    dt = float(sys.argv[1]) if len(sys.argv) > 1 else 0.004
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    pick = sys.argv[4] if len(sys.argv) > 4 else ""
    candidates = [c for c in CANDIDATES if pick in c[0]]
    cfg = cfp.dam_break_config(mode="parity")
    print(f"gating at dt={dt}: {[c[0] for c in candidates]}", flush=True)
    t0 = time.perf_counter()
    parity = run_mode("parity", cfg, frames, chunk, "pbd", dt)
    walls = {"parity": time.perf_counter() - t0}
    results = []
    for nm, flags in candidates:
        t0 = time.perf_counter()
        run = run_mode(nm, cfg.replace(**flags), frames, chunk, "pbd", dt)
        walls[nm] = time.perf_counter() - t0
        results.append((nm, compare(f"{nm:15s} vs parity", parity, run,
                                    cfg, chunk)))
    out = {"dt": dt, "frames": frames, "walls": walls, "verdicts": {}}
    for nm, r in results:
        ok = (r["dt_impact"] <= 1 and r["dke"] < 0.05
              and r["drho_max"] < 0.05 and r["dq"] < 0.01
              and r["dh_sp"] < 1.0)
        out["verdicts"][nm] = {"ok": bool(ok), **{k: float(v)
                                                  for k, v in r.items()}}
        print(f"{nm}: {'VALIDATED' if ok else 'DIVERGES'}", flush=True)
    path = f"/root/repo/exp/warm_dt_sweep_dt{dt}.json"
    try:  # merge with prior (possibly filtered) runs at this dt
        with open(path) as f:
            prior = json.load(f)
        out["walls"] = {**prior.get("walls", {}), **out["walls"]}
        out["verdicts"] = {**prior.get("verdicts", {}), **out["verdicts"]}
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
