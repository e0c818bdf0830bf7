"""Occupancy-class partitioning: can splitting cells into a low-K class
(the ~90% of cells holding <= K_a particles) and a high-K overflow class
(splash cells) beat the single dense K-slot traversal?

The waste census (exp/occupancy_geometry.py, BENCHMARKS.md "floor" #1)
shows occupied cells average 4.3-7.1 particles while K rides at 18-22 —
the K^2 pair-slot structure is the dominant overcount. The one structure
not yet measured is a SLOT-CLASS split:

  * box A: the full sliding box with K_a slot rows — every cell's first
    K_a ranked particles (complete for ~90% of cells);
  * box B: a small window fit to the cells whose occupancy exceeds K_a
    (the splash front), with k_b = K - K_a slot rows holding ONLY the
    overflow ranks;
  * passes: sym AA over box A (K_a^2 pair rows instead of K^2)
    + one sym pass over box B whose one-sided source concatenates
    [A-window; boundary-window] along the slot axis (covers BB, B<-A and
    B<-boundary)
    + one 27-offset one-sided pass i=A-window, j=B (covers A<-B; the
    window A-slots' outputs are read additively).
  All window operands are ONE dynamic slice of box A / the boundary grid
  at the window origin per iteration (the slice_boundary_box pattern) —
  no gathers, so the gather wall (floor #2) is not triggered.

Verified float-close (not bitwise: the pair sums are regrouped) against
the production pass on the REAL mid-splash dam state, then timed on the
real chip for the two PBD projection passes (the 42-traversal solver's
inner loop) and the WCSPH density pass.

Run on the TPU: python exp/occupancy_split.py [reps] [K_a]
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
from cpp_fluid_particles_tpu.ops import kernels as kn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.ops.grid import POS_PAD, cell_coords
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


def one_sided_pass(bd_terms, i_fl, dims, n_out, jb, dims_b):
    """27-offset one-sided pass: i from ``i_fl``, j from ``jb`` only (the
    fluid-fluid folds of column_pass_xla with a j-ignoring body are dead
    code, but spelling it directly keeps the trace lean)."""
    p = dims.flat_p
    g = dims.g
    w = g - 2 * p
    i_flat = jax.lax.slice_in_dim(i_fl, p, p + w, axis=2)
    offs = pp._flat_offsets(dims) + p

    with pp._axes(pp._LANE):
        acc = jnp.zeros((n_out, i_fl.shape[1], w), F32)
        for o in range(27):
            jb_o = jax.lax.dynamic_slice(
                jb, (0, 0, int(offs[o])), (jb.shape[0], jb.shape[1], w))
            acc = acc + bd_terms(i_flat, jb_o)
    return jnp.pad(acc, ((0, 0), (0, 0), (p, p)))


def slice_window(flat, dims_a, wdims, start):
    """(F, K, G_A) flat ghosted -> the window's ghosted flat (F, K, G_W).
    ``start`` = window core origin - box core origin (cells): the window
    ghost ring at that origin begins at exactly that ghosted offset."""
    f, k = flat.shape[0], flat.shape[1]
    v5 = flat.reshape(f, k, dims_a.gx, dims_a.gy, dims_a.gz)
    win = jax.lax.dynamic_slice(
        v5, (0, 0, start[0], start[1], start[2]),
        (f, k, wdims.gx, wdims.gy, wdims.gz))
    return win.reshape(f, k, wdims.g)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_a = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = cfp.dam_break_config(mode="parity")
    sim = cfp.Simulation(solver="pbd", cfg=cfg, warmup=True)
    for _ in range(5):
        sim.run_scan(25, 0.004)
    k_full = sim.max_per_cell
    box = sim.box
    print(f"frame {sim.frame}: K={k_full} box={box}", flush=True)

    cfg_ = cfg.replace(max_per_cell=k_full)
    dims = dn.dims_for(cfg_)
    b_pos = boundary_positions(cfg_)
    kb = dense_step.boundary_k(b_pos, cfg_)
    dims_b = dn.dims_for(cfg_, kb)
    bdims = dn.DenseDims(box[0], box[1], box[2], k_full)
    bdims_b = dn.DenseDims(box[0], box[1], box[2], kb)
    pos = np.asarray(sim.state.pos)
    mass = np.asarray(sim.state.mass)
    n = pos.shape[0]

    # ---- host-side census + class split on the real state ----
    c = np.asarray(cell_coords(jnp.asarray(pos), cfg_))
    cx, cy, cz = cfg_.cell_size
    inb = ((c >= 0).all(1) & (c[:, 0] < cx) & (c[:, 1] < cy)
           & (c[:, 2] < cz))
    assert inb.all()
    flat_cell = (c[:, 0] * cy + c[:, 1]) * cz + c[:, 2]
    order = np.argsort(flat_cell, kind="stable")
    rank = np.empty(n, np.int64)
    sk = flat_cell[order]
    newrun = np.r_[True, sk[1:] != sk[:-1]]
    run_start = np.maximum.accumulate(np.where(newrun, np.arange(n), 0))
    rank[order] = np.arange(n) - run_start
    occ = np.bincount(flat_cell, minlength=cx * cy * cz)
    occupied = occ[occ > 0]
    hi_cells = np.argwhere(occ.reshape(cx, cy, cz) > k_a)
    lo_frac = float((occupied <= k_a).mean())
    origin_a = np.asarray(bx.build_box_index(
        jnp.asarray(pos), cfg_, dims, bdims).origin)
    # window extents of the high-occupancy cells + 1 cell margin (clamped
    # to the box core): A-particles one cell outside the hi-occ extents
    # still neighbor B-particles, so the A<-B i-window must cover them;
    # B's slots use the same (slightly larger) window with an empty rim
    wlo = np.maximum(hi_cells.min(0) - 1, origin_a)
    whi = np.minimum(hi_cells.max(0) + 1, origin_a + np.asarray(box) - 1)
    wext = whi - wlo + 1
    print(f"census: {occupied.size} occupied cells, mean load "
          f"{occupied.mean():.1f}, max {occupied.max()}, "
          f"{lo_frac*100:.1f}% hold <= K_a={k_a}; "
          f"{hi_cells.shape[0]} cells over K_a, window ext {wext} "
          f"({np.prod(wext)/np.prod(box)*100:.1f}% of box volume), "
          f"overflow particles {(rank >= k_a).sum()} "
          f"({(rank >= k_a).mean()*100:.2f}% of N)", flush=True)

    k_b = int(k_full - k_a)
    wdims = dn.DenseDims(int(wext[0]), int(wext[1]), int(wext[2]), k_b)
    wdims_a = dn.DenseDims(int(wext[0]), int(wext[1]), int(wext[2]), k_a)
    origin_w = wlo
    start = (origin_w - origin_a).astype(np.int32)
    assert (start >= 0).all() and \
        (origin_w + wext <= origin_a + np.asarray(box)).all()

    # ---- fills (host-derived slots; production integration would extend
    # build_box_index — setup cost excluded from pass timing either way)
    jpos, jmass = jnp.asarray(pos), jnp.asarray(mass)

    def fill_from_slots(slots_np, valid_np, fields, fills, d):
        slots = jnp.asarray(np.where(valid_np, slots_np, d.k * d.g)
                            .astype(np.int32))
        vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)
        init = jnp.broadcast_to(jnp.asarray(fills, F32)[:, None],
                                (len(fields), d.k * d.g + 1))
        return init.at[:, slots].set(vals, mode="drop")[:, :d.k * d.g] \
            .reshape(len(fields), d.k, d.g)

    # production fill at K
    idx = bx.build_box_index(jpos, cfg_, dims, bdims)
    fl_full = bx.fill_box(
        idx, [jpos[:, 0], jpos[:, 1], jpos[:, 2], jmass],
        [POS_PAD, POS_PAD, POS_PAD, 0.0], bdims)
    bdx = bx.slice_boundary_box(sim.scene.bd, dims, bdims, kb, idx.origin)

    # class-A fill at K_a (full box): ranks < K_a
    rel = c - origin_a[None, :]
    gcell_a = (((rel[:, 0] + 1) * bdims.gy + (rel[:, 1] + 1)) * bdims.gz
               + (rel[:, 2] + 1))
    slots_a = rank * bdims.g + gcell_a
    fl_a = fill_from_slots(
        slots_a, rank < k_a,
        [jpos[:, 0], jpos[:, 1], jpos[:, 2], jmass],
        [POS_PAD, POS_PAD, POS_PAD, 0.0],
        dn.DenseDims(box[0], box[1], box[2], k_a))

    # class-B fill at k_b (window): ranks >= K_a, slot rank-K_a
    relw = c - origin_w[None, :]
    gcell_w = (((relw[:, 0] + 1) * wdims.gy + (relw[:, 1] + 1)) * wdims.gz
               + (relw[:, 2] + 1))
    in_w = ((relw >= 0).all(1) & (relw < wext[None, :]).all(1))
    assert (in_w | (rank < k_a)).all(), "overflow particle outside window"
    slots_b = (rank - k_a) * wdims.g + gcell_w
    fl_b = fill_from_slots(
        slots_b, (rank >= k_a) & in_w,
        [jpos[:, 0], jpos[:, 1], jpos[:, 2], jmass],
        [POS_PAD, POS_PAD, POS_PAD, 0.0], wdims)

    bdims_a = dn.DenseDims(box[0], box[1], box[2], k_a)
    start_j = jnp.asarray(start)

    # ---------------------------------------------------------------- rho
    def rho_prod(s):
        return pp.density_pass(fl_full + s * 1e-30, bdx, None, bdims,
                               bdims_b, cfg_, "xla")

    def rho_split(s):
        fla = fl_a + s * 1e-30
        # window operands: one slice each of box A and the boundary window
        a_win = slice_window(fla, bdims_a, wdims_a, start_j)
        b_win = slice_window(bdx, bdims_b, dn.DenseDims(
            wdims.cx, wdims.cy, wdims.cz, kb), start_j)
        side = jnp.concatenate([a_win, b_win], 1)  # (4, K_a+kb, G_W)
        sdims = dn.DenseDims(wdims.cx, wdims.cy, wdims.cz, k_a + kb)
        # AA over the full box at K_a (+ boundary)
        rho_a = pp.density_pass(fla, bdx, None, bdims_a, bdims_b, cfg_,
                                "xla")
        # BB + B<-A + B<-boundary over the window
        rho_b = pp.density_pass(fl_b, side, None, wdims, sdims, cfg_,
                                "xla")
        # A<-B over the window (one-sided)
        h = cfg_.radius

        def bdry(i, jb):
            gb = pp._geom(i, jb)
            return pp._si(pp._jb(jb[3]) * kn.w_cubic(gb.r, h))[None]

        rho_aw = one_sided_pass(bdry, a_win, wdims_a, 1, fl_b, wdims)[0]
        return rho_a, rho_b[None][0], rho_aw

    # correctness: per-particle rho identical to production read
    rr = np.asarray(jax.jit(rho_prod)(jnp.float32(0.0)))
    ra, rbb, raw = jax.jit(rho_split)(jnp.float32(0.0))
    ra, rbb, raw = np.asarray(ra), np.asarray(rbb), np.asarray(raw)
    rho_ref = rr.reshape(-1)[np.where(rank < k_full,
                                      rank * bdims.g + gcell_a, 0)]
    rho_new = np.where(
        rank < k_a,
        ra.reshape(-1)[np.where(rank < k_a, slots_a, 0)]
        + np.where(in_w, raw.reshape(-1)[np.where(
            in_w & (rank < k_a), rank * wdims_a.g + gcell_w, 0)], 0.0),
        rbb.reshape(-1)[np.where(rank >= k_a, slots_b, 0)])
    d = np.max(np.abs(rho_ref - rho_new)) / (np.abs(rho_ref).max() + 1e-30)
    print(f"rho: split vs production rel max |diff| = {d:.3e}", flush=True)
    assert d < 2e-5, "occupancy split diverges"

    t_prod = time_fn(lambda s: rho_prod(s)[0], reps)
    t_split = time_fn(
        lambda s: sum(jnp.sum(x) for x in rho_split(s)), reps)
    print(f"density: production K={k_full}: {t_prod:.3f} ms | "
          f"split K_a={k_a}+window k_b={k_b}: {t_split:.3f} ms "
          f"({(1 - t_split / t_prod) * 100:+.1f}%)", flush=True)

    # ------------------------------------------------- PBD lambda (5-out)
    def lam_prod(s):
        return pp.pbd_lambda_pass(fl_full + s * 1e-30, bdx, None, bdims,
                                  bdims_b, cfg_, "xla")

    def lam_split(s):
        fla = fl_a + s * 1e-30
        a_win = slice_window(fla, bdims_a, wdims_a, start_j)
        b_win = slice_window(bdx, bdims_b, dn.DenseDims(
            wdims.cx, wdims.cy, wdims.cz, kb), start_j)
        side = jnp.concatenate([a_win, b_win], 1)
        sdims = dn.DenseDims(wdims.cx, wdims.cy, wdims.cz, k_a + kb)
        la = pp.pbd_lambda_pass(fla, bdx, None, bdims_a, bdims_b, cfg_,
                                "xla")
        lb = pp.pbd_lambda_pass(fl_b, side, None, wdims, sdims, cfg_,
                                "xla")
        h = cfg_.radius

        def bdry(i, jb):
            return pp._lambda_terms(i, jb, h, cfg_.rho0, False)[0]

        law = one_sided_pass(bdry, a_win, wdims_a, 5, fl_b, wdims)
        return la, lb, law

    t_lp = time_fn(lambda s: jnp.sum(lam_prod(s)), reps)
    t_ls = time_fn(
        lambda s: sum(jnp.sum(x) for x in lam_split(s)), reps)
    print(f"lambda:  production K={k_full}: {t_lp:.3f} ms | "
          f"split: {t_ls:.3f} ms ({(1 - t_ls / t_lp) * 100:+.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
