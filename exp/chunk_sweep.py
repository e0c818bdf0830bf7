"""Slab-count sweep for the chunked sym executor at the 1M box.

Usage: python exp/chunk_sweep.py [box=60] [k=12]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import dense_step as D
from cpp_fluid_particles_tpu.ops import box as bx
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.state import boundary_positions

F32 = jnp.float32


def fetch_baseline():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_fn(fn, args, reps=2, iters=5):
    @jax.jit
    def chained(args):
        def body(c, _):
            out = fn(args, c)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(jnp.asarray(l, F32)) for l in leaves)
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
    bx_n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg, pos_np = cfp.scaled_dam_scene(1_000_000, mode="parity")
    cfg = cfg.replace(max_per_cell=k)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np)
    mass = jnp.full((n,), cfg.m0, F32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    box = (bx_n, bx_n, bx_n)
    bdims = dn.DenseDims(*box, dims.k)
    bdims_b = dn.DenseDims(*box, dims_b.k)
    idx0 = bx.build_box_index(pos, cfg, dims, bdims)
    print(f"n={n} box={box} K={k} kb={kb} k_ov={int(idx0.overflow)} "
          f"pair_MB={k * k * bdims.g * 4 / 1e6:.0f} "
          f"auto_nchunk={pp._auto_nchunk(k, bdims.g - 2 * bdims.flat_p)}",
          flush=True)
    base = bx.fill_box(idx0, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
                              mass * 0 + 1],
                       [dn.POS_PAD] * 3 + [0.0, 0.0], bdims)
    bdx = bx.slice_boundary_box(scene_d.bd, dims, bdims, dims_b.k,
                                idx0.origin)

    def f_density(args, c):
        g, bb = args
        return pp.density_pass(g[:4].at[3].add(c), bb, None, bdims,
                               bdims_b, cfg, engine="xla")

    def f_sa(args, c):
        g, bb = args
        return pp.stiffness_accel_pass(g.at[3].add(c), bb, None, bdims,
                                       bdims_b, cfg, engine="xla")

    for nc in (1, 2, 4, 6, 10, 15):
        pp.CHUNK_OVERRIDE = nc
        for name, fn in (("density", f_density), ("sa3out ", f_sa)):
            try:
                ms = time_fn(fn, (base, bdx))
                print(f"nc={nc:2d} {name}: {ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"nc={nc:2d} {name}: FAILED "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
    pp.CHUNK_OVERRIDE = None


if __name__ == "__main__":
    main()
