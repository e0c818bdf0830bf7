"""Prototype: lane-major flat Pallas executor with VMEM-resident halo
windows (no candidate materialization, no per-offset HBM re-streaming).

Per W-tile of the flat ghosted cell axis: one DMA of the (F, K,
TILE+halo) window into VMEM, 27 static in-VMEM shifted slices, pair math
in (K_i, K_j, TILE) blocks, accumulator in VMEM, one aligned store.

Usage: python exp/flat_pallas_proto.py  (expects /tmp/dam_state.npz)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _compiler_params():
    cls = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    return cls(vmem_limit_bytes=100 * 2**20)


def flat_pallas_pass(terms, fl, dims, n_out, tile=512, interpret=False):
    """fl: (F, K, G) lane-major flat ghosted. Returns (n_out, K, G)
    (ghost cells zero)."""
    f, k, g = fl.shape
    p = dims.flat_p
    w = g - 2 * p
    nt = -(-w // tile)                      # tiles over the i-window
    size = -(-(tile + 2 * p) // 128) * 128  # VMEM window (128-aligned DMA)
    # pad so tile t's window [t*tile, t*tile + size) is in range
    gpad = nt * tile + size
    flp = jnp.pad(fl, ((0, 0), (0, 0), (0, gpad - g)))

    offs = [(dx - 1) * dims.gy * dims.gz + (dy - 1) * dims.gz + (dz - 1)
            for dx in range(3) for dy in range(3) for dz in range(3)]

    def kernel(fl_hbm, out_ref, win, sem):
        t = pl.program_id(0)
        o = pl.program_id(1)

        # the window persists in scratch across the 27 offset steps of
        # tile t; DMA it once (a 2-D (tile, offset) grid keeps ONE
        # offset's temporaries live at a time — a fully unrolled offset
        # loop blows the Mosaic stack allocator past VMEM)
        @pl.when(o == 0)
        def _():
            cp = pltpu.make_async_copy(
                fl_hbm.at[:, :, pl.ds(t * tile, size)], win, sem)
            cp.start()
            cp.wait()

        i = win[:, :, p:p + tile]
        j = jax.lax.switch(
            o, [lambda d=d: win[:, :, p + d:p + d + tile] for d in offs])
        contrib = terms(i, j)

        @pl.when(o == 0)
        def _():
            out_ref[...] = contrib

        @pl.when(o > 0)
        def _():
            out_ref[...] = out_ref[...] + contrib

    cls = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
    out = pl.pallas_call(
        kernel,
        grid=(nt, 27),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((n_out, k, tile), lambda t, o: (0, 0, t)),
        out_shape=jax.ShapeDtypeStruct((n_out, k, nt * tile), F32),
        scratch_shapes=[
            pltpu.VMEM((f, k, size), F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=cls(
            vmem_limit_bytes=100 * 2**20,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(flp)
    return jnp.pad(out[:, :, :w], ((0, 0), (0, 0), (p, p)))


def main():
    d = np.load("/tmp/dam_state.npz")
    pos = jnp.asarray(d["pos"])
    vel = jnp.asarray(d["vel"])
    cfg = cfp.dam_break_config(mode="parity")
    n = pos.shape[0]
    h = cfg.radius
    K = 24  # pallas: K must be a multiple of 8 (sublane tiling)
    dims = dn.dims_for(cfg, K)
    mass = jnp.full((n,), cfg.m0, F32)
    idx = dn.build_dense_index(pos, cfg, dims)
    fl = dn.fill_dense(
        idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
              vel[:, 0], vel[:, 1], vel[:, 2]],
        [POS_PAD] * 3 + [0.0] * 4, dims)
    print(f"n={n} K={K} overflow={int(idx.overflow)} G={dims.g} "
          f"P={dims.flat_p}", flush=True)

    def density_terms(i, j):
        _jb = lambda v: v[None, :, :]
        dx = i[0][:, None, :] - j[0][None, :, :]
        dy = i[1][:, None, :] - j[1][None, :, :]
        dz = i[2][:, None, :] - j[2][None, :, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        return jnp.sum(_jb(j[3]) * kn.w_cubic(r, h), 1)[None]

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

    def sa_terms(i, j):
        _ii = lambda v: v[:, None, :]
        _jb = lambda v: v[None, :, :]
        dx = _ii(i[0]) - _jb(j[0])
        dy = _ii(i[1]) - _jb(j[1])
        dz = _ii(i[2]) - _jb(j[2])
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        cw = kn.grad_w_cubic_coef(r, h)
        s = (_ii(i[4]) + _jb(j[4])) * cw * _jb(j[3])
        return jnp.stack([jnp.sum(s * dx, 1), jnp.sum(s * dy, 1),
                          jnp.sum(s * dz, 1)])

    # XLA 27-offset reference for correctness + timing comparison
    def xla27(terms, n_out):
        p, g = dims.flat_p, dims.g
        w = g - 2 * p
        offs = np.asarray(
            [(dx - 1) * dims.gy * dims.gz + (dy - 1) * dims.gz + (dz - 1)
             for dx in range(3) for dy in range(3) for dz in range(3)],
            np.int32) + p
        offs_j = jnp.asarray(offs)

        def run(args, c):
            flp = args.at[3].add(c)
            i = jax.lax.dynamic_slice_in_dim(flp, p, w, 2)

            def fold(o, acc):
                j = jax.lax.dynamic_slice(
                    flp, (0, 0, offs_j[o]), (flp.shape[0], K, w))
                return acc + terms(i, j)
            return jax.lax.fori_loop(0, 27, fold,
                                     jnp.zeros((n_out, K, w), F32))
        return run

    # correctness check
    ref = np.asarray(xla27(density_terms, 1)(fl, jnp.float32(0)))
    got = np.asarray(flat_pallas_pass(density_terms, fl, dims, 1))
    p = dims.flat_p
    diff = np.abs(np.nan_to_num(got[:, :, p:p + ref.shape[2]])
                  - np.nan_to_num(ref)).max()
    print(f"pallas-vs-xla density maxdiff: {diff:.3e}", flush=True)

    for name, terms, n_out in [("density(1)", density_terms, 1),
                               ("sa(3)     ", sa_terms, 3),
                               ("dcv(8)    ", dcv_terms, 8)]:
        ms_x = time_fn(xla27(terms, n_out), fl)
        ms_p = time_fn(
            lambda args, c, te=terms, no=n_out: flat_pallas_pass(
                te, args.at[3].add(c), dims, no), fl)
        print(f"{name}: xla27 {ms_x:7.3f} ms | flat-pallas {ms_p:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
