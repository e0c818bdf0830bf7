"""The MXU question: can the pair traversal ride the systolic array?

Every floor argument in BENCHMARKS.md is VPU/HBM/gather-based; this
experiment closes the obvious remaining hole — SPH pair interactions CAN
be written as matmuls, the canonical TPU move:

  * pair distances:   r2_ij = |x_i|^2 + |x_j|^2 - 2 x_i . x_j, with the
    cross term a (M, 3) @ (3, N) dot — MXU;
  * pair reductions:  out_i = sum_j W_ij g_j = W @ G, with W the
    (M, N) kernel-value matrix and G the (N, R) per-j quantities — MXU,
    where extra output columns R are nearly free (the N dim of one dot)
    vs ~2 VPU flops/pair/row in the elementwise executor.

The catch is geometry: the kernel weights W_ij vary per pair, so the
reduction dot's contraction axis is the per-cell candidate count — K~20
against the MXU's native 128x128 tile. Two formulations are measured
against the production executors on the real chip:

  A. per-cell batched dots (27 offsets, batch = flat cells, M = N = K):
     the direct rewrite of column_pass_xla;
  B. z-supercell dots (batch = (cx, cy, z-tiles), M = sc*K rows pairing
     against an N = (sc+2)*K z-halo, 9 (dx,dy) offsets): feeds the MXU
     real tiles at the cost of an (sc+2)/3-fold candidate inflation —
     each particle sees (sc+2)K z-candidates instead of 3K
     (sc=2: 1.33x, sc=4: 2.0x, sc=8: 3.33x).

Numerical safety: the r2-via-dot form suffers f32 cancellation at global
coordinates (|x|^2 ~ 1e2 vs r^2 ~ 1e-4); both matmul forms therefore use
CELL-RELATIVE coordinates (subtract the i-cell/tile center before the
dot; see PAPERS.md — arXiv 2401.08586 uses the same trick for
mixed-precision SPH). Padded slots stay inert because the j mass row is
0 there.

Measured: density (1 output, m_j W reduction) and an 8-output variant
(the PBD-lambda-shaped stress test where MXU reductions should shine).

Run on the TPU: python exp/mxu_pair.py [reps]
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
from cpp_fluid_particles_tpu.ops.grid import POS_PAD

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


def bdot(a, b, precision=jax.lax.Precision.HIGHEST):
    """Batched dot over all leading axes: (..., M, C) @ (..., C, N).

    precision HIGHEST: TPU f32 dots default to bf16 passes, which puts a
    ~0.4%-of-|x|^2 absolute error on the r^2 cross term — fatal when
    r^2 ~ 1e-3 (measured rel 0.87 vs the oracle). The 6-pass f32
    emulation costs ~6x the bf16 MXU rate but stays ~1-2 orders above
    the VPU."""
    nb = a.ndim - 2
    dims = (((a.ndim - 1,), (b.ndim - 2,)),
            (tuple(range(nb)), tuple(range(nb))))
    return jax.lax.dot_general(a, b, dims, precision=precision)


def cell_centers_flat(dims, cfg, w, p):
    """(w, 3) world-space center of each flat ghosted cell in the i
    window [p, p+w) — the per-batch relative-coordinate origin."""
    idx = np.arange(p, p + w)
    x = idx // (dims.gy * dims.gz)
    rem = idx % (dims.gy * dims.gz)
    y = rem // dims.gz
    z = rem % dims.gz
    # ghost coord -> cell coord (-1 ring); cell center in world units
    c = np.stack([x, y, z], 1).astype(np.float32) - 1.0 + 0.5
    return jnp.asarray(c * np.float32(cfg.cell_length))


# ------------------------------------------------------------------ A
def density_mm_percell(fl, dims, cfg, gj_rows=None, prec=jax.lax.Precision.HIGHEST):
    """27-offset density with per-cell batched dots (batch = flat cells,
    M = N = K). gj_rows: optional (R, K, G) extra per-j quantities — the
    reduction dot then returns R+... outputs to test MXU column scaling."""
    h = cfg.radius
    fi, k = fl.shape[0], fl.shape[1]
    p, g = dims.flat_p, dims.g
    w = g - 2 * p
    ctr = cell_centers_flat(dims, cfg, w, p)           # (w, 3)
    i_flat = jax.lax.slice_in_dim(fl, p, p + w, axis=2)
    xi = i_flat[0:3].transpose(2, 1, 0) - ctr[:, None, :]   # (w, K, 3)
    ni = jnp.sum(xi * xi, -1)                               # (w, K)
    offs_np = pp._flat_offsets(dims) + p
    nr = 1 if gj_rows is None else 1 + gj_rows.shape[0]
    acc = jnp.zeros((w, k, nr), F32)
    for o in range(27):
        j_o = jax.lax.dynamic_slice(fl, (0, 0, int(offs_np[o])),
                                    (fi, k, w))
        xj = j_o[0:3].transpose(2, 1, 0) - ctr[:, None, :]  # (w, K, 3)
        nj = jnp.sum(xj * xj, -1)
        gmat = bdot(xi, xj.transpose(0, 2, 1), prec)              # (w, K, K)
        r2 = ni[:, :, None] + nj[:, None, :] - 2.0 * gmat
        r = jnp.sqrt(jnp.maximum(r2, 0.0))
        wk = kn.w_cubic(r, h)                               # (w, K, K)
        if o == 13:
            # self pairs: r2 here is ni+ni-2*dot(xi,xi) = 0 only up to
            # f32 reassociation (~1e-10), which defeats the reference's
            # q < EPS self-exclusion — mask the diagonal exactly
            wk = wk * (1.0 - jnp.eye(k, dtype=F32))
        mj = j_o[3].transpose(1, 0)                         # (w, K)
        if gj_rows is None:
            gq = mj[:, :, None]
        else:
            gj = jax.lax.dynamic_slice(
                gj_rows, (0, 0, int(offs_np[o])),
                (gj_rows.shape[0], k, w)).transpose(2, 1, 0)
            gq = jnp.concatenate([mj[:, :, None], gj * mj[:, :, None]], -1)
        acc = acc + bdot(wk, gq, prec)                            # (w, K, nr)
    out = acc.transpose(2, 1, 0)                            # (nr, K, w)
    return jnp.pad(out, ((0, 0), (0, 0), (p, p)))


# ------------------------------------------------------------------ B
def density_mm_zsc(fl, dims, cfg, sc, gj_rows=None, prec=jax.lax.Precision.HIGHEST):
    """z-supercell dots: batch (cx, cy, zt), M = sc*K, N = (sc+2)*K,
    9 (dx, dy) offsets (the z stencil is folded into the halo)."""
    h = cfg.radius
    k = fl.shape[1]
    cx, cy, cz = dims.cx, dims.cy, dims.cz
    zt = -(-cz // sc)
    zpad = zt * sc - cz
    nr = 1 if gj_rows is None else 1 + gj_rows.shape[0]

    def ghost5(a):
        return a.reshape(a.shape[0], k, dims.gx, dims.gy,
                         dims.gz).transpose(0, 2, 3, 4, 1)

    fl5 = ghost5(fl)                          # (F, GX, GY, GZ, K)
    if zpad:
        padv = jnp.asarray([POS_PAD, POS_PAD, POS_PAD, 0.0],
                           F32)[:, None, None, None, None]
        fl5 = jnp.concatenate(
            [fl5, jnp.broadcast_to(
                padv, (4, dims.gx, dims.gy, zpad, k))], 3)
    gj5 = None
    if gj_rows is not None:
        gj5 = ghost5(gj_rows)
        if zpad:
            gj5 = jnp.pad(gj5, ((0, 0), (0, 0), (0, 0), (0, zpad), (0, 0)))

    # i tiles: real z cells [1, 1+zt*sc) -> (F, GX, GY, zt, sc*K)
    def tiles_i(a5):
        t = jax.lax.slice_in_dim(a5, 1, 1 + zt * sc, axis=3)
        return t.reshape(a5.shape[0], dims.gx, dims.gy, zt, sc * k)

    # z halos: ghost z cells [t*sc, t*sc + sc + 2) -> (..., zt, (sc+2)*K)
    def halo_j(a5):
        slabs = [jax.lax.slice_in_dim(a5, r, r + (zt - 1) * sc + 1,
                                      axis=3, stride=sc)
                 for r in range(sc + 2)]
        hs = jnp.stack(slabs, 4)              # (F, GX, GY, zt, sc+2, K)
        return hs.reshape(a5.shape[0], dims.gx, dims.gy, zt,
                          (sc + 2) * k)

    it = tiles_i(fl5)
    hj = halo_j(fl5)
    gj_h = halo_j(gj5) if gj5 is not None else None

    # tile centers (world space): x,y per real cell, z per supercell mid
    cl = float(cfg.cell_length)
    gx_c = (jnp.arange(cx, dtype=F32) + 0.5) * cl
    gy_c = (jnp.arange(cy, dtype=F32) + 0.5) * cl
    gz_c = (jnp.arange(zt, dtype=F32) * sc + 0.5 * sc) * cl
    ctr = jnp.stack(jnp.broadcast_arrays(
        gx_c[:, None, None], gy_c[None, :, None],
        gz_c[None, None, :]), -1)             # (cx, cy, zt, 3)

    # self-pair mask for the center (dx, dy) offset: i tile slot (zi, ki)
    # is the same particle as halo slot (zi+1, ki)
    selfmask_np = np.ones((sc * k, (sc + 2) * k), np.float32)
    for zi in range(sc):
        for ki in range(k):
            selfmask_np[zi * k + ki, (zi + 1) * k + ki] = 0.0
    selfmask = jnp.asarray(selfmask_np)

    acc = jnp.zeros((cx, cy, zt, sc * k, nr), F32)
    for dx in range(3):
        for dy in range(3):
            xi = it[0:3, 1:1 + cx, 1:1 + cy]      # (3, cx, cy, zt, scK)
            xi = jnp.moveaxis(xi, 0, -1) - ctr[..., None, :]
            xj = hj[0:3, dx:dx + cx, dy:dy + cy]
            xj = jnp.moveaxis(xj, 0, -1) - ctr[..., None, :]
            ni = jnp.sum(xi * xi, -1)
            nj = jnp.sum(xj * xj, -1)
            gmat = bdot(xi, jnp.swapaxes(xj, -1, -2), prec)
            r2 = ni[..., :, None] + nj[..., None, :] - 2.0 * gmat
            r = jnp.sqrt(jnp.maximum(r2, 0.0))
            wk = kn.w_cubic(r, h)
            if dx == 1 and dy == 1:
                wk = wk * selfmask
            mj = hj[3, dx:dx + cx, dy:dy + cy]
            if gj_h is None:
                gq = mj[..., None]
            else:
                gjs = jnp.moveaxis(gj_h[:, dx:dx + cx, dy:dy + cy], 0, -1)
                gq = jnp.concatenate([mj[..., None],
                                      gjs * mj[..., None]], -1)
            acc = acc + bdot(wk, gq, prec)
    # (cx, cy, zt, scK, nr) -> (nr, K, G) ghosted flat, interior only
    out = acc.reshape(cx, cy, zt * sc, k, nr)[:, :, :cz]
    out = jnp.moveaxis(out, -1, 0).transpose(0, 4, 1, 2, 3)  # nr,K,cx,cy,cz
    out = jnp.pad(out, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)))
    return out.reshape(nr, k, dims.g)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = cfp.dam_break_config(mode="parity")
    sim = cfp.Simulation(solver="pbd", cfg=cfg, warmup=True)
    for _ in range(5):
        sim.run_scan(25, 0.004)
    print(f"frame {sim.frame}: K={sim.max_per_cell} box={sim.box}",
          flush=True)

    cfg_ = cfg.replace(max_per_cell=sim.max_per_cell)
    dims = dn.dims_for(cfg_)
    box = sim.box
    bdims = dn.DenseDims(box[0], box[1], box[2], dims.k)
    pos = jnp.asarray(sim.state.pos)
    mass = jnp.asarray(sim.state.mass)
    idx = bx.build_box_index(pos, cfg_, dims, bdims)
    fl4 = bx.fill_box(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass],
                      [POS_PAD, POS_PAD, POS_PAD, 0.0], bdims)
    rng = np.random.default_rng(0)
    g7 = jnp.asarray(rng.standard_normal(
        (7,) + fl4.shape[1:]).astype(np.float32))

    def cur27(c):
        return pp.density_pass(fl4 + c * 1e-30, None, None, bdims, None,
                               cfg_, "xla27")

    def cur_sym(c):
        return pp.density_pass(fl4 + c * 1e-30, None, None, bdims, None,
                               cfg_, "xla")

    def mm_a(c):
        return density_mm_percell(fl4 + c * 1e-30, bdims, cfg_)

    def mm_b2(c):
        return density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 2)

    def mm_b4(c):
        return density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 4)

    def mm_b8(c):
        return density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 8)

    # 8-output variants (density + 7 weighted quantities)
    def cur27_8(c):
        h = cfg_.radius

        def fluid(i, j, want_j):
            g = pp._geom(i, j)
            w = kn.w_cubic(g.r, h)
            mw = pp._jb(j[3]) * w
            rows = [pp._si(mw)]
            for q in range(7):
                rows.append(pp._si(mw * pp._jb(j[4 + q])))
            return jnp.stack(rows), None

        fl11 = jnp.concatenate([fl4 + c * 1e-30, g7], 0)
        return pp.column_pass_xla(pp._std_body(fluid, None), fl11, bdims,
                                  8)

    def mm_a8(c):
        return density_mm_percell(fl4 + c * 1e-30, bdims, cfg_, g7)

    def mm_b4_8(c):
        return density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 4, g7)

    # numerics: matmul forms vs the 27-offset oracle (interior window)
    ref = np.asarray(jax.jit(cur27)(jnp.float32(0.0)))
    occ = np.asarray(jnp.sum(fl4[3] > 0))
    print(f"occupied slots: {occ}", flush=True)
    dump = {"fl4": np.asarray(fl4), "ref": ref,
            "box": np.asarray(box), "k": dims.k}
    bad = False
    checks = [("mm_percell", mm_a), ("mm_zsc2", mm_b2),
              ("mm_zsc4", mm_b4),
              ("mm_zsc4_bf16dots (report only)",
               lambda c: density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 4,
                                        prec=jax.lax.Precision.DEFAULT))]
    for name, fn in checks:
        try:
            got = np.asarray(jax.jit(fn)(jnp.float32(0.0)))[0:1]
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)
            np.savez("/tmp/mxu_dump.npz", **dump)
            bad = True
            continue
        dump[name] = got
        mask = np.asarray(fl4[3]) > 0           # real slots only
        d = np.max(np.abs((ref - got[0]) * mask))
        s = np.max(np.abs(ref * mask)) + 1e-30
        print(f"{name}: rel max |diff| = {d / s:.3e}", flush=True)
        bad = bad or (d / s >= 2e-4 and 'report only' not in name)
    np.savez("/tmp/mxu_dump.npz", **dump)
    if bad:
        print("DIVERGED — dumped to /tmp/mxu_dump.npz; timing skipped",
              flush=True)
        return
    r8 = np.asarray(jax.jit(cur27_8)(jnp.float32(0.0)))
    g8 = np.asarray(jax.jit(mm_a8)(jnp.float32(0.0)))
    mask = np.asarray(fl4[3]) > 0
    d = np.max(np.abs((r8 - g8) * mask)) / (np.max(np.abs(r8 * mask))
                                            + 1e-30)
    print(f"mm_percell_8out: rel max |diff| = {d:.3e}", flush=True)

    rows = [("density xla27 (oracle)", cur27),
            ("density sym (production)", cur_sym),
            ("density mm per-cell", mm_a),
            ("density mm z-sc2", mm_b2),
            ("density mm z-sc4", mm_b4),
            ("density mm z-sc8", mm_b8),
            ("density mm z-sc4 bf16dots",
             lambda c: density_mm_zsc(fl4 + c * 1e-30, bdims, cfg_, 4,
                                      prec=jax.lax.Precision.DEFAULT)),
            ("8-out xla27", cur27_8),
            ("8-out mm per-cell", mm_a8),
            ("8-out mm z-sc4", mm_b4_8)]
    for name, fn in rows:
        t = time_fn(fn, reps)
        print(f"{name:28s} {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
