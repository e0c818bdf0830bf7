"""Measure the dam-break's occupancy geometry over the bench window.

The dense sliding-box executor pays K^2 pair slots for EVERY box cell and
13.5 folds per traversal; at mid-splash the fluid AABB is mostly empty
(exp/mass_factor.py run: box 25^3 = 15,625 cells for 20,736 particles,
avg occupied-cell load ~9) -> ~84M pair slots per pass vs ~0.6M real
pairs. This script quantifies, across representative frames of the
300-frame bench window, the candidate structures' cost drivers:

  * fraction of box cells occupied;
  * occupied BLOCK fraction at 2^3 / 4^3 granularity, with and without
    the 1-cell stencil halo (the sparse-block executor streams blocks
    with halos; win = occupied-with-halo fraction x duplication);
  * per-(x,y)-column loads and 3-z-cell band widths (the z-sorted
    column-banded executor's padding bounds);
  * the dense executor's actual pair-slot count vs each scheme.

Run on the TPU: python exp/occupancy_geometry.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import dense as dn


def analyze(pos: np.ndarray, cfg, k: int, tag: str):
    cell = cfg.cell_length
    ijk = np.floor(pos / cell).astype(np.int64)
    lo = ijk.min(0)
    ijk -= lo
    nx, ny, nz = (ijk.max(0) + 1).astype(int)
    ncell = nx * ny * nz
    flat = (ijk[:, 0] * ny + ijk[:, 1]) * nz + ijk[:, 2]
    occ = np.bincount(flat, minlength=ncell)
    occ3 = occ.reshape(nx, ny, nz)
    n_occ = int((occ > 0).sum())
    kmax = int(occ.max())
    n = pos.shape[0]

    # dense executor pair slots (sym: 13.5 folds x K^2 x cells)
    dense_slots = 13.5 * k * k * ncell

    # real pairs bound (within 27-stencil candidate cells)
    # approximated by sum over occupied cells of occ_c * (sum of occ over
    # 27 neighbors) / 2
    occp = np.pad(occ3, 1)
    cand = np.zeros_like(occ3, dtype=np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cand += occp[1 + dx:1 + dx + nx, 1 + dy:1 + dy + ny,
                             1 + dz:1 + dz + nz]
    real_cand = int((occ3 * cand).sum())  # i-j candidate pairs (both dirs)

    out = [f"[{tag}] n={n} box=({nx},{ny},{nz})={ncell} K={k} "
           f"occ_cells={n_occ} ({100 * n_occ / ncell:.0f}%) "
           f"avg_load={n / max(1, n_occ):.1f} max_load={kmax}"]
    out.append(f"  dense slots {dense_slots / 1e6:.1f}M | stencil "
               f"candidate pairs {real_cand / 1e6:.2f}M "
               f"(ratio {dense_slots / max(1, real_cand):.0f}x)")

    # sparse blocks: occupied blocks at bs^3, halo'd streams
    for bs in (2, 4):
        bx = -(-nx // bs)
        by = -(-ny // bs)
        bz = -(-nz // bs)
        blk = np.zeros((bx, by, bz), bool)
        bi = ijk // bs
        blk[bi[:, 0], bi[:, 1], bi[:, 2]] = True
        n_blk = int(blk.sum())
        # ghosted block = (bs+2)^3 cells streamed per occupied block
        ghost_cells = n_blk * (bs + 2) ** 3
        blk_slots = 13.5 * k * k * n_blk * bs ** 3
        out.append(
            f"  blocks {bs}^3: occupied {n_blk}/{bx * by * bz} "
            f"({100 * n_blk / (bx * by * bz):.0f}%), pair slots "
            f"{blk_slots / 1e6:.1f}M ({dense_slots / blk_slots:.1f}x "
            f"fewer), ghost stream {ghost_cells * k / 1e3:.0f}K slots "
            f"(dense streams {ncell * k / 1e3:.0f}K)")

    # column-banded: per-(x,y) column loads + 3-cell band widths
    col_load = occ3.sum(2)           # (nx, ny)
    wcol = int(col_load.max())
    band3 = occ3 + np.pad(occ3, ((0, 0), (0, 0), (1, 1)))[:, :, :nz] \
        + np.pad(occ3, ((0, 0), (0, 0), (1, 1)))[:, :, 2:]
    bmax = int(band3.max())
    ncols = nx * ny
    col_slots = ncols * wcol * 9 * bmax
    out.append(
        f"  columns: {ncols}, load avg {n / ncols:.1f} max {wcol}, "
        f"3z-band max {bmax}, banded slots {col_slots / 1e6:.1f}M "
        f"({dense_slots / col_slots:.1f}x fewer)")
    print("\n".join(out), flush=True)


def main():
    import jax
    cfg = cfp.dam_break_config(mode="parity")
    sim = cfp.Simulation(solver="wcsph", cfg=cfg, warmup=True)
    frames = [0, 50, 100, 125, 150, 200, 250, 300]
    last = 0
    for f in frames:
        if f > last:
            sim.run_scan(f - last, cfg.dt)
            last = f
        pos = np.asarray(sim.state.pos)
        analyze(pos, cfg, sim.max_per_cell, f"frame {f:3d}")


if __name__ == "__main__":
    main()
