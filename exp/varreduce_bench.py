"""Experiment: multi-operand lax.reduce vs N separate jnp.sum reductions
for a multi-output pair pass (does XLA share the fused producer across
sibling reductions when they are ONE variadic reduce op?).

Usage: python exp/varreduce_bench.py  (expects /tmp/dam_state.npz)
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
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l) for l in leaves)
            return s * 1e-30, None
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
    fl = dn.fill_dense(
        idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
              vel[:, 0], vel[:, 1], vel[:, 2]],
        [POS_PAD] * 3 + [0.0] * 4, dims)
    print(f"n={n} K={K}", flush=True)

    p, g = dims.flat_p, dims.g
    w = g - 2 * p
    offs = np.asarray(
        [(dx - 1) * dims.gy * dims.gz + (dy - 1) * dims.gz + (dz - 1)
         for dx in range(3) for dy in range(3) for dz in range(3)],
        np.int32) + p
    offs_j = jnp.asarray(offs)

    def pair_contribs(i, j):
        """8 per-pair contribution blocks (K_i, K_j, W)."""
        _ii = lambda v: v[:, None, :]
        _jb = lambda v: v[None, :, :]
        dx = _ii(i[0]) - _jb(j[0])
        dy = _ii(i[1]) - _jb(j[1])
        dz = _ii(i[2]) - _jb(j[2])
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        wv = kn.w_cubic(r, h)
        cw = kn.grad_w_cubic_coef(r, h)
        mj = _jb(j[3])
        volj = mj / cfg.rho0
        cj = volj * cw
        lap = kn.w_visc_laplacian(r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        return (mj * wv, cj * dx, cj * dy, cj * dz, volj * wv,
                mj * tx, mj * ty, mj * tz)

    def mk(reduce_mode):
        def run(args, c):
            flp = args.at[3].add(c)
            i = jax.lax.dynamic_slice_in_dim(flp, p, w, 2)

            def fold(o, acc):
                j = jax.lax.dynamic_slice(
                    flp, (0, 0, offs_j[o]), (flp.shape[0], K, w))
                cs = pair_contribs(i, j)
                if reduce_mode == "sums":
                    outs = tuple(jnp.sum(x, 1) for x in cs)
                else:  # variadic lax.reduce over the K_j axis
                    zeros = tuple(jnp.float32(0.0) for _ in cs)
                    outs = jax.lax.reduce(
                        cs, zeros,
                        lambda a, b: tuple(x + y for x, y in zip(a, b)),
                        (1,))
                return tuple(a + o_ for a, o_ in zip(acc, outs))

            acc0 = tuple(jnp.zeros((K, w), F32) for _ in range(8))
            return jax.lax.fori_loop(0, 27, fold, acc0)
        return run

    for mode in ("sums", "variadic"):
        ms = time_fn(mk(mode), fl)
        print(f"dcv 8-out via {mode:9s}: {ms:7.3f} ms", flush=True)

    a = mk("sums")(fl, jnp.float32(0))
    b = mk("variadic")(fl, jnp.float32(0))
    diff = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
    print(f"maxdiff: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
