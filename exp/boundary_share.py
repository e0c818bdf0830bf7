"""Measure the boundary-candidate share of a traversal on the real chip.

The sym executor evaluates the one-sided boundary block for all 27 stencil
offsets (vs 13+self for fluid), over a (K, Kb, W) pair block per offset —
for the dam scene Kb=boundary max occupancy. Hypothesis (VERDICT round 2):
a large fraction of a traversal's cost is boundary work, most of it wasted
because only box cells within one cell of a wall have ANY boundary
candidates.

Times pbd_lambda_pass / stiffness_accel_pass over the ACTUAL mid-run box
layout (frame ~120 of the PBD dam) with and without the boundary operand.

MEASURED (v5e, 2026-08-17): boundary share is 37-39% of a with-boundary
traversal (lambda 5.77 ms with bd / 3.84 without; sa 3.17 / 1.62). BUT
both wall-shell trim implementations LOST to the untrimmed executor:
  * 6 shell slabs, each running the flat 27-offset fold over its ghosted
    sub-window: 9.8 ms (1.7x worse) — thin slabs' flat windows are
    dominated by ring cells (~93% of the full grid's boundary pair-ops).
  * 6 shell slabs computing CORE cells only via static 5-D slices of the
    ghosted grids (41% of boundary pair slots, bitwise-exact): 13.4 ms
    (2.3x worse) — the strided y/z-slab windows break the contiguous
    lane-major cell-minor layout; XLA materialises every slice+reshape.
Conclusion: on this toolchain any spatial sub-box restriction of a pass
loses to the big contiguous stream, consistent with the round-2 dead-end
map (BENCHMARKS.md). The boundary block stays in the main fused traversal.

Run on the TPU: python exp/boundary_share.py [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import dense_step
from cpp_fluid_particles_tpu.ops import box as bx
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.ops.grid import POS_PAD
from cpp_fluid_particles_tpu.state import boundary_positions

F32 = jnp.float32


def fetch_baseline_ms():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_fn(fn, reps, iters=30):
    @jax.jit
    def chained(seed):
        def body(c, _):
            out = fn(c)
            return jnp.sum(out) * 1e-30, None

        c, _ = jax.lax.scan(body, seed, None, length=iters)
        return c

    _ = np.asarray(chained(jnp.float32(0.0)))
    base = fetch_baseline_ms()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(jnp.float32(0.0)))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = cfp.dam_break_config(mode="parity")
    sim = cfp.Simulation(solver="pbd", cfg=cfg, warmup=True)
    # advance to mid-splash (the expensive regime)
    for _ in range(5):
        sim.run_scan(25, 0.004)
    print(f"frame {sim.frame}: K={sim.max_per_cell} box={sim.box}",
          flush=True)

    cfg_ = cfg.replace(max_per_cell=sim.max_per_cell)
    dims = dn.dims_for(cfg_)
    b_pos = boundary_positions(cfg_)
    kb = dense_step.boundary_k(b_pos, cfg_)
    dims_b = dn.dims_for(cfg_, kb)
    box = sim.box
    bdims = dn.DenseDims(box[0], box[1], box[2], dims.k)
    bdims_b = dn.DenseDims(box[0], box[1], box[2], dims_b.k)
    pos = jnp.asarray(sim.state.pos)
    mass = jnp.asarray(sim.state.mass)

    idx = bx.build_box_index(pos, cfg_, dims, bdims)
    bd_full = sim.scene.bd
    bdx = bx.slice_boundary_box(bd_full, dims, bdims, dims_b.k, idx.origin)
    fl = bx.fill_box(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass],
                     [POS_PAD, POS_PAD, POS_PAD, 0.0], bdims)
    print(f"kb={kb} box_cells={np.prod(box)} "
          f"occ={int(idx.max_occupancy)}", flush=True)

    def lam_with(c):
        return pp.pbd_lambda_pass(fl + c * 1e-30, bdx, None, bdims,
                                  bdims_b, cfg_, "xla")

    def lam_without(c):
        return pp.pbd_lambda_pass(fl + c * 1e-30, None, None, bdims,
                                  None, cfg_, "xla")

    def sa_with(c):
        return pp.stiffness_accel_pass(
            (fl, fl[0:1] * 0 + c * 1e-30), bdx, None, bdims, bdims_b,
            cfg_, "xla")

    def sa_without(c):
        return pp.stiffness_accel_pass(
            (fl, fl[0:1] * 0 + c * 1e-30), None, None, bdims, None,
            cfg_, "xla")

    t_lw = time_fn(lam_with, reps)
    t_sw = time_fn(sa_with, reps)
    t_lo = time_fn(lam_without, reps)
    t_so = time_fn(sa_without, reps)
    print(f"lambda pass: with bd {t_lw:.3f} ms, without {t_lo:.3f} ms "
          f"-> boundary share {(t_lw - t_lo) / t_lw * 100:.1f}%")
    print(f"sa pass:     with bd {t_sw:.3f} ms, without {t_so:.3f} ms "
          f"-> boundary share {(t_sw - t_so) / t_sw * 100:.1f}%")


if __name__ == "__main__":
    main()
