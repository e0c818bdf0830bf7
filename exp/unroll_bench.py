"""Experiment: accumulator-traffic reduction via z-triple unrolling.

The 27-offset fold re-reads/writes the (n_out, K, W) accumulator every
offset — for multi-output passes that's the dominant HBM term. Unrolling
the 3 z-offsets of each (dx, dy) pair into one fold iteration (one acc
update per 3 pair blocks) should cut it ~3x; full unroll (one update)
even more, unless XLA's fusion falls over.

Usage: python exp/unroll_bench.py (expects /tmp/dam_state.npz from
exp/zsplit_bench.py)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import kernels as kn
from cpp_fluid_particles_tpu.ops.grid import POS_PAD

F32 = jnp.float32


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


def main():
    d = np.load("/tmp/dam_state.npz")
    pos = jnp.asarray(d["pos"])
    vel = jnp.asarray(d["vel"])
    cfg = cfp.dam_break_config(mode="parity")
    n = pos.shape[0]
    h = cfg.radius
    K = 20
    dims = dn.dims_for(cfg, K)
    mass = jnp.full((n,), cfg.m0, F32)
    idx = dn.build_dense_index(pos, cfg, dims)
    print(f"n={n} K={K} overflow={int(idx.overflow)}", flush=True)
    fl = dn.fill_dense(
        idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
              vel[:, 0], vel[:, 1], vel[:, 2]],
        [POS_PAD] * 3 + [0.0] * 4, dims)

    G, P = dims.g, dims.flat_p
    W = G - 2 * P
    gy, gz = dims.gy, dims.gz
    OFF = np.asarray(
        [(dx - 1) * gy * gz + (dy - 1) * gz + (dz - 1)
         for dx in range(3) for dy in range(3) for dz in range(3)],
        np.int32)

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

    def mk(terms, n_out, unroll):
        offs_np = OFF + P
        n_grp = 27 // unroll

        def run(args, c):
            flp = args.at[3].add(c)
            i = jax.lax.dynamic_slice_in_dim(flp, P, W, 2)
            offs = jnp.asarray(offs_np.reshape(n_grp, unroll))

            def fold(g, acc):
                out = None
                for u in range(unroll):
                    j = jax.lax.dynamic_slice(
                        flp, (0, 0, offs[g, u]), (7, K, W))
                    t = terms(i, j)
                    out = t if out is None else out + t
                return acc + out

            return jax.lax.fori_loop(0, n_grp, fold,
                                     jnp.zeros((n_out, K, W), F32))
        return run

    for name, terms, n_out in [("density(1)", density_terms, 1),
                               ("dcv(8)    ", dcv_terms, 8)]:
        line = name
        for unroll in (1, 3, 9, 27):
            ms = time_fn(mk(terms, n_out, unroll), fl)
            line += f"  u{unroll}:{ms:7.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
