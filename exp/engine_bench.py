"""Per-engine pass timing through the public pass API on the dam scene.

Usage: python exp/engine_bench.py [reps]
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


def fetch_ms_baseline():
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
    base = fetch_ms_baseline()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(args))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    K = 12
    cfg = cfp.dam_break_config(mode="parity", max_per_cell=K)
    dims = dn.dims_for(cfg)
    pos = jnp.asarray(dam_break_positions(cfg))
    n = pos.shape[0]
    mass = jnp.full((n,), cfg.m0, F32)
    vel = jnp.zeros((n, 3), F32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    nco = 224

    idx = dn.build_dense_index(pos, cfg, dims)
    rows = [pos[:, 0], pos[:, 1], pos[:, 2], mass,
            vel[:, 0], vel[:, 1], vel[:, 2],
            jnp.ones((n,), F32), jnp.zeros((n,), F32)]
    fl = dn.fill_dense(idx, rows, [dn.POS_PAD] * 3 + [0.0] * 6, dims)
    print(f"n={n} K={K} ov={int(idx.overflow)}", flush=True)

    def mk(fn_name, rows_end, engine, grid):
        passfn = getattr(pp, fn_name)
        colc = idx.col_count

        def run(args, c):
            g = args.at[3].add(c)
            return passfn(g[:rows_end], scene_d.bd, colc, dims, dims_b,
                          cfg, engine=engine)
        return run, grid

    for fn_name, rows_end in [
        ("density_pass", 4),
        ("stiffness_accel_pass", 5),
        ("pbd_lambda_pass", 4),
        ("density_colorgrad_visc_pass", 7),
        ("surface_pressure_pass", 9),  # rows 4-8 stand in for rho/p/cg
    ]:
        line = f"{fn_name:32s}"
        for engine in ("xla27", "xla"):
            grid = fl
            run, g = mk(fn_name, rows_end, engine, grid)
            try:
                ms = time_fn(run, g, reps)
                line += f" {engine}:{ms:7.3f}"
            except Exception as e:  # noqa
                line += f" {engine}: ERR({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
