"""Physics validation of the beyond-parity solver modes on the real dam.

VERDICT r3 #4b: the Chebyshev+tolerance mode (pbd_density_tolerance=0.01,
pbd_chebyshev_rho=0.9 — the measured 101.5 ms/frame configuration,
BENCHMARKS.md "Beyond parity") was only smoke-tested. This harness runs
the FULL 300-frame dam break per solver in each mode —

  pbd:   parity          — fixed-20-iteration contract (src/PBDSolver.cu:52)
         tol1%           — SPlisHSPlasH-style 1% max-density-residual exit
         tol1%+cheb      — the accelerated mode on the same criterion
         tol1%+cheb+warm — plus the Dp warm-start predictor at the
                           round-5-validated quarter scale (0.25)
  dfsph: parity          — plain warm-started Jacobi (src/DFSPHSolver.cu)
         cheb0.9         — Chebyshev-extrapolated Jacobi, same criteria

— and compares trajectory/energy/density-distribution statistics over
time: center of mass, kinetic energy, peak/mean density, the compressed
fraction, and the settled-state density quantiles. Trajectories are
chaotic particle-wise; physically meaningful equivalence is statistical:
same impact timing, same energy envelope, same settled state, residual
criterion respected. Numbers feed PARITY.md and gate which modes may be
production defaults.

Run on the TPU: python exp/pbd_mode_validation.py [solver] [frames] [chunk] [dt]

dt defaults to the code default (cfg.dt = 0.002 — what a CLI user runs,
and the dt every validation verdict in PARITY.md was gated at); pass
0.004 to additionally gate at the reference's published benchmark
timestep (heavier per-step splash, new capacity configs — expect extra
compile time on a cold cache).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp


def run_mode(name, cfg, frames, chunk, solver="pbd", dt=None):
    sim = cfp.Simulation(solver=solver, cfg=cfg, warmup=True)
    trace = []
    t0 = time.perf_counter()
    for _ in range(frames // chunk):
        sim.run_scan(chunk, dt)
        pos = np.asarray(sim.state.pos)
        vel = np.asarray(sim.state.vel)
        rho = np.asarray(sim.state.density) / cfg.rho0
        assert np.isfinite(pos).all() and np.isfinite(rho).all(), name
        trace.append({
            "com": pos.mean(0),
            "ke": 0.5 * cfg.m0 * float((vel ** 2).sum()),
            "rho_max": float(rho.max()),
            "rho_mean": float(rho.mean()),
            "over1pct": float((rho > 1.01).mean()),
            "vmax": float(np.abs(vel).max()),
            "iters": float(np.asarray(
                sim.metrics.get("pbd_iters",
                                sim.metrics.get("density_iters", 0)))),
        })
    wall = time.perf_counter() - t0
    # settled-state density distribution (final frame)
    rho = np.asarray(sim.state.density) / cfg.rho0
    q = np.quantile(rho, [0.5, 0.9, 0.99])
    h = np.asarray(sim.state.pos)[:, 1]
    print(f"{name:12s} wall {wall:6.1f}s  K={sim.max_per_cell} "
          f"iters(last) {trace[-1]['iters']:.0f}  final rho q50/90/99 "
          f"{q[0]:.4f}/{q[1]:.4f}/{q[2]:.4f}  height p95 "
          f"{np.quantile(h, 0.95):.4f}", flush=True)
    return trace, q, float(np.quantile(h, 0.95))


def compare(name, base, other, cfg, chunk):
    n = min(len(base[0]), len(other[0]))
    b, o = base[0][:n], other[0][:n]
    sp = cfg.spacing
    dcom = max(np.linalg.norm(x["com"] - y["com"]) for x, y in zip(b, o))
    kes_b = np.array([x["ke"] for x in b])
    kes_o = np.array([x["ke"] for x in o])
    ke_scale = kes_b.max()
    dke = np.abs(kes_b - kes_o).max() / ke_scale
    # impact timing: chunk index of peak KE (free fall -> impact)
    t_b, t_o = int(kes_b.argmax()), int(kes_o.argmax())
    drho_max = max(abs(x["rho_max"] - y["rho_max"]) for x, y in zip(b, o))
    dover = max(abs(x["over1pct"] - y["over1pct"]) for x, y in zip(b, o))
    dq = np.abs(base[1] - other[1]).max()
    dh = abs(base[2] - other[2])
    print(f"{name}: max|dCOM| {dcom / sp:.3f} sp ({dcom:.5f} m), "
          f"max|dKE|/peak {dke * 100:.2f}%, peak-KE chunk {t_b} vs {t_o}, "
          f"max|d rho_max| {drho_max:.4f}, max|d over1%| {dover * 100:.2f}pp, "
          f"settled dq {dq:.4f}, d height95 {dh / sp:.3f} sp", flush=True)
    return dict(dcom_sp=dcom / sp, dke=dke, dt_impact=abs(t_b - t_o),
                drho_max=drho_max, dq=dq, dh_sp=dh / sp)


MODES = {
    "pbd": [
        ("tol1%", dict(pbd_density_tolerance=0.01)),
        ("tol1%+cheb", dict(pbd_density_tolerance=0.01,
                            pbd_chebyshev_rho=0.9)),
        # warm scale history: 1.0 exploded (round 4, K escalates to 128
        # mid-splash), 0.5 diverges (round 5 sweep: dKE 10.9%, height-p95
        # 3.2 sp), 0.25 passed the identical envelopes in the round-5
        # sweep (exp/dfsph_sweep.py PBD stage) — gated here canonically.
        ("tol1%+cheb+warm", dict(pbd_density_tolerance=0.01,
                                 pbd_chebyshev_rho=0.9,
                                 pbd_warm_start=0.25)),
    ],
    "dfsph": [
        ("cheb0.9", dict(dfsph_chebyshev_rho=0.9)),
    ],
}


def main():
    solver = sys.argv[1] if len(sys.argv) > 1 else "pbd"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dt = float(sys.argv[4]) if len(sys.argv) > 4 else None
    cfg = cfp.dam_break_config(mode="parity")
    if dt:
        print(f"gating at dt={dt}", flush=True)
    parity = run_mode("parity", cfg, frames, chunk, solver, dt)
    results = []
    for nm, flags in MODES[solver]:
        run = run_mode(nm, cfg.replace(**flags), frames, chunk, solver, dt)
        results.append((nm, compare(f"{nm:15s} vs parity", parity, run,
                                    cfg, chunk)))
    # validation bar: same impact timing, energy envelope within a few %,
    # settled state statistically identical, no compression blow-up
    for nm, r in results:
        ok = (r["dt_impact"] <= 1 and r["dke"] < 0.05
              and r["drho_max"] < 0.05 and r["dq"] < 0.01
              and r["dh_sp"] < 1.0)
        print(f"{nm}: {'VALIDATED' if ok else 'DIVERGES'}", flush=True)


if __name__ == "__main__":
    main()
