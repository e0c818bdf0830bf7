"""Experiment: z-subdivided cells (z-cell = cell_length/SZ, 3x3x(2SZ+1)
stencil, K/SZ-ish slots) vs the standard 27-stencil layout, on a real
post-impact particle distribution (occupancy ~16-20 in the standard grid).

Usage: python exp/zsplit_bench.py [state.npz]
With no argument, runs 150 WCSPH frames to generate /tmp/dam_state.npz.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import kernels as kn
from cpp_fluid_particles_tpu.ops.grid import POS_PAD, cell_coords

F32 = jnp.float32
STATE = "/tmp/dam_state.npz"


def fetch_baseline():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_fn(fn, args, reps=3, iters=30):
    @jax.jit
    def chained(args):
        def body(c, _):
            out = fn(args, c)
            return jnp.sum(out) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    _ = np.asarray(chained(args))
    base = fetch_baseline()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(args))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def gen_state():
    sim = cfp.Simulation(solver="wcsph", cfg=cfp.dam_break_config(mode="parity"),
                         warmup=True)
    for _ in range(6):
        sim.run_scan(25, 0.001)
    np.savez(STATE, pos=np.asarray(sim.state.pos),
             vel=np.asarray(sim.state.vel))
    print(f"saved {STATE} (K ended at {sim.max_per_cell})", flush=True)


def main():
    if not os.path.exists(STATE) and len(sys.argv) < 2:
        gen_state()
    d = np.load(sys.argv[1] if len(sys.argv) > 1 else STATE)
    pos_np, vel_np = d["pos"], d["vel"]
    cfg = cfp.dam_break_config(mode="parity")
    n = pos_np.shape[0]
    h = cfg.radius
    cl = cfg.cell_length
    cx, cy, cz = cfg.cell_size
    pos = jnp.asarray(pos_np)
    vel = jnp.asarray(vel_np)
    mass = jnp.full((n,), cfg.m0, F32)

    def occupancy(sz):
        c = np.floor(pos_np / np.array([cl, cl, cl / sz])).astype(np.int64)
        ok = ((c >= 0).all(1) & (c[:, 0] < cx) & (c[:, 1] < cy)
              & (c[:, 2] < cz * sz))
        c = c[ok]
        flat = (c[:, 0] * cy + c[:, 1]) * (cz * sz) + c[:, 2]
        u, cnt = np.unique(flat, return_counts=True)
        return int(cnt.max())

    print(f"n={n}; occupancy sz=1: {occupancy(1)}, sz=2: {occupancy(2)}, "
          f"sz=3: {occupancy(3)}", flush=True)

    # generic z-subdivided lane-major layout + 27/45/63-offset pass
    def build(sz, k):
        czz = cz * sz
        gx, gy, gzz = cx + 2, cy + 2, czz + 2 * sz  # z ghosts = sz deep
        G = gx * gy * gzz
        c = jnp.floor(pos / jnp.array([cl, cl, cl / sz])).astype(jnp.int32)
        inb = ((c[:, 0] >= 0) & (c[:, 0] < cx) & (c[:, 1] >= 0)
               & (c[:, 1] < cy) & (c[:, 2] >= 0) & (c[:, 2] < czz))
        cc = jnp.clip(c, 0, jnp.array([cx - 1, cy - 1, czz - 1]))
        cell = (cc[:, 0] * cy + cc[:, 1]) * czz + cc[:, 2]
        key = jnp.where(inb, cell, cx * cy * czz)
        order = jnp.argsort(key, stable=True)
        sk = key[order]
        iota = jnp.arange(n, dtype=jnp.int32)
        newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
        rank = jnp.zeros((n,), jnp.int32).at[order].set(iota - run_start)
        valid = inb & (rank < k)
        gcell = (((cc[:, 0] + 1) * gy + (cc[:, 1] + 1)) * gzz
                 + (cc[:, 2] + sz))
        slots = jnp.where(valid, rank * G + gcell, k * G)
        ov = int(jnp.sum(inb & ~valid))
        fields = [pos[:, 0], pos[:, 1], pos[:, 2], mass,
                  vel[:, 0], vel[:, 1], vel[:, 2]]
        fills = [POS_PAD] * 3 + [0.0] * 4
        init = jnp.broadcast_to(jnp.asarray(fills, F32)[:, None],
                                (7, k * G + 1))
        fl = init.at[:, slots].set(jnp.stack(fields, 0), mode="drop")
        fl = fl[:, :k * G].reshape(7, k, G)
        offs = [(dx - 1) * gy * gzz + (dy - 1) * gzz + dz
                for dx in range(3) for dy in range(3)
                for dz in range(-sz, sz + 1)]
        return fl, np.asarray(offs, np.int32), G, gy * gzz + gzz + sz, ov

    def dcv_terms(i, j):
        _ii = lambda v: v[:, None, :]
        _jb = lambda v: v[None, :, :]
        dx = _ii(i[0]) - _jb(j[0])
        dy = _ii(i[1]) - _jb(j[1])
        dz = _ii(i[2]) - _jb(j[2])
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        w = kn.w_cubic(r, h)
        cw = kn.grad_w_cubic_coef(r, h)
        mj = _jb(j[3])
        volj = mj / cfg.rho0
        cj = volj * cw
        lap = kn.w_visc_laplacian(r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        return jnp.stack([
            jnp.sum(mj * w, 1),
            jnp.sum(cj * dx, 1), jnp.sum(cj * dy, 1), jnp.sum(cj * dz, 1),
            jnp.sum(volj * w, 1),
            jnp.sum(mj * tx, 1), jnp.sum(mj * ty, 1), jnp.sum(mj * tz, 1),
        ])

    def density_terms(i, j):
        _jb = lambda v: v[None, :, :]
        dx = i[0][:, None, :] - j[0][None, :, :]
        dy = i[1][:, None, :] - j[1][None, :, :]
        dz = i[2][:, None, :] - j[2][None, :, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        return jnp.sum(_jb(j[3]) * kn.w_cubic(r, h), 1)[None]

    results = {}
    for sz, k in [(1, 20), (2, 12), (3, 8), (2, 10)]:
        fl, offs, G, P, ov = build(sz, k)
        W = G - 2 * P
        offs_j = jnp.asarray(offs + P)

        def make(terms, n_out, fl=fl, offs_j=offs_j, G=G, P=P, W=W, k=k,
                 n_off=len(offs)):
            def run(args, c):
                flp = args.at[3].add(c)
                i = jax.lax.dynamic_slice_in_dim(flp, P, W, 2)

                def fold(o, acc):
                    j = jax.lax.dynamic_slice(
                        flp, (0, 0, offs_j[o]), (7, k, W))
                    return acc + terms(i, j)
                return jax.lax.fori_loop(
                    0, n_off, fold, jnp.zeros((n_out, k, W), F32))
            return run

        ms1 = time_fn(make(density_terms, 1), fl)
        ms8 = time_fn(make(dcv_terms, 8), fl)
        print(f"sz={sz} K={k:2d} (overflow={ov:4d}): density {ms1:6.3f} ms, "
              f"8-out fused {ms8:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
