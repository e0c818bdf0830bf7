"""Multi-chip load-skew census (VERDICT r4 weak #3): turn SCALING.md §4's
"near-uniform x-spread" claim into a measurement.

Two loads exist under the mesh:

* PAIR-PASS COMPUTE is structurally uniform per cell — the dense
  executor evaluates every cell column at identical K^2 cost regardless
  of occupancy, and slabs divide the box into equal cell counts, so the
  traversal work per device is exactly balanced BY CONSTRUCTION (the
  only imbalance is the +-1 cell rounding of G/nd). No census needed;
  this is the dense formulation's structural answer to load balancing.

* PARTICLE-SIDED WORK skews with the fluid distribution: the shard_map
  fill scatters only the particles whose slot lands in the local slab
  (parallel/halo.fill_sharded), so its per-device cost is proportional
  to particles-per-slab. This census measures that: particles per 8
  x-slab and per (4x2) x,z-tile of the fluid's bounding box, over the
  real 300-frame dam (sampled every 10 frames, CPU run — positions are
  engine-exact) and over the 1M scene's fall window (the bench window;
  free fall moves y only, so the x/z histogram is the initial lattice's).

Reported: worst-over-time max/mean slab share (1.0 = perfectly even).

Run: python exp/slab_skew.py [frames] [sample_every]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax


def slab_stats(pos, cell_length, nx=8, tiles=(4, 2)):
    """-> (max/mean over 8 x-slabs, max/mean over 4x2 xz-tiles) of the
    particle counts, slabs equal-width in CELLS over the fluid AABB
    (how GSPMD splits the box's cell axis)."""
    c = np.floor(pos / cell_length).astype(np.int64)
    lo, hi = c.min(0), c.max(0) + 1
    ext = hi - lo
    xs = np.clip((c[:, 0] - lo[0]) * nx // max(ext[0], 1), 0, nx - 1)
    hx = np.bincount(xs, minlength=nx)
    tx, tz = tiles
    xt = np.clip((c[:, 0] - lo[0]) * tx // max(ext[0], 1), 0, tx - 1)
    zt = np.clip((c[:, 2] - lo[2]) * tz // max(ext[2], 1), 0, tz - 1)
    ht = np.bincount(xt * tz + zt, minlength=tx * tz)
    return hx.max() / hx.mean(), ht.max() / ht.mean()


def main():
    jax.config.update("jax_platforms", "cpu")
    import cpp_fluid_particles_tpu as cfp

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    # ---- real dam, 300 frames ----
    cfg = cfp.dam_break_config(mode="parity")
    sim = cfp.Simulation(solver="wcsph", cfg=cfg, warmup=True)
    rows = []
    for f in range(0, frames, every):
        sim.run_scan(every, 0.001)
        pos = np.asarray(sim.state.pos)
        s1, s2 = slab_stats(pos, cfg.cell_length)
        rows.append((sim.frame, s1, s2))
        print(f"frame {sim.frame:4d}: x-slab max/mean {s1:.3f}, "
              f"(4x2) xz-tile max/mean {s2:.3f}", flush=True)
    w1 = max(r[1] for r in rows)
    w2 = max(r[2] for r in rows)
    print(f"dam worst-case: 8 x-slabs {w1:.3f}, 4x2 xz-tiles {w2:.3f}",
          flush=True)

    # ---- 1M scene, fall window (bench window: x/z static in free fall)
    cfg1m, pos1m = cfp.scaled_dam_scene(1_000_000)
    s1, s2 = slab_stats(np.asarray(pos1m), cfg1m.cell_length)
    print(f"1M fall window: 8 x-slabs {s1:.3f}, 4x2 xz-tiles {s2:.3f}",
          flush=True)
    print("pair-pass compute itself is uniform per cell (K^2 slot rows "
          "regardless of occupancy): slab traversal work is balanced by "
          "construction; the numbers above bound the particle-sided "
          "(fill/read) skew only.", flush=True)


if __name__ == "__main__":
    main()
