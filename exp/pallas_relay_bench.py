"""Re-measure Pallas column-kernel cost through the axon relay (round-1
claim: custom-calls execute at ~0.1 GB/s, making the Pallas engine
unusable on this runtime — verify that still holds).

Usage: python exp/pallas_relay_bench.py
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
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.state import boundary_positions, dam_break_positions

F32 = jnp.float32


def fetch_baseline():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_fn(fn, args, reps=3, iters=10):
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
    K = 16
    cfg = cfp.dam_break_config(mode="parity", max_per_cell=K)
    dims = dn.dims_for(cfg)
    pos = jnp.asarray(dam_break_positions(cfg))
    n = pos.shape[0]
    mass = jnp.full((n,), cfg.m0, F32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_x = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    scene_p = D.build_dense_scene(cfg, bpos, kb, engine="pallas")
    idx = dn.build_dense_index(pos, cfg, dims)
    fl = dn.fill_dense(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass],
                       [dn.POS_PAD] * 3 + [0.0], dims)
    colc = idx.col_count
    print(f"n={n} K={K}", flush=True)

    def run_xla(args, c):
        return pp.density_pass(args.at[3].add(c), scene_x.bd, colc, dims,
                               dims_b, cfg, engine="xla")

    def run_pallas(args, c):
        return pp.density_pass(args.at[3].add(c), scene_p.bd_jcols, colc,
                               dims, dims_b, cfg, engine="pallas")

    ms = time_fn(run_xla, fl)
    print(f"density pass, sym XLA   : {ms:8.3f} ms", flush=True)
    ms = time_fn(run_pallas, fl)
    print(f"density pass, Pallas    : {ms:8.3f} ms", flush=True)

    # correctness spot check
    a = np.asarray(run_xla(fl, jnp.float32(0)))
    b = np.asarray(run_pallas(fl, jnp.float32(0)))
    print(f"maxdiff: {np.abs(a - b).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
