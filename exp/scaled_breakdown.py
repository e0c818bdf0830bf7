"""Component timing for the 1M-particle scaled scene on TPU.

Usage: python exp/scaled_breakdown.py [n]
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
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cfg, pos_np = cfp.scaled_dam_scene(n_target, mode="parity")
    cfg = cfg.replace(max_per_cell=12)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np)
    vel = jnp.zeros((n, 3), F32)
    mass = jnp.full((n,), cfg.m0, F32)
    t0 = time.perf_counter()
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    print(f"n={n} cells={cfg.cell_size} kb={kb} "
          f"scene_build={time.perf_counter()-t0:.1f}s", flush=True)
    box = (60, 60, 60)
    bdims = dn.DenseDims(box[0], box[1], box[2], dims.k)
    bdims_b = dn.DenseDims(box[0], box[1], box[2], dims_b.k)

    idx0 = bx.build_box_index(pos, cfg, dims, bdims)
    print(f"box_ov={int(idx0.box_overflow)} k_ov={int(idx0.overflow)} "
          f"ext={np.asarray(idx0.ext)}", flush=True)

    def f_index(args, c):
        p, _ = args
        return bx.build_box_index(p + c, cfg, dims, bdims).slots

    def f_fill(args, c):
        p, v = args
        idx = bx.build_box_index(p + c, cfg, dims, bdims)
        return bx.fill_box(idx, [p[:, 0], p[:, 1], p[:, 2], mass,
                                 v[:, 0], v[:, 1], v[:, 2]],
                           [dn.POS_PAD] * 3 + [0.0] * 4, bdims)

    def f_fill_read(args, c):
        p, v = args
        idx = bx.build_box_index(p + c, cfg, dims, bdims)
        g = bx.fill_box(idx, [p[:, 0], p[:, 1], p[:, 2], mass,
                              v[:, 0], v[:, 1], v[:, 2]],
                        [dn.POS_PAD] * 3 + [0.0] * 4, bdims)
        return bx.read_box(idx, g)

    base = bx.fill_box(idx0, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
                              vel[:, 0], vel[:, 1], vel[:, 2]],
                       [dn.POS_PAD] * 3 + [0.0] * 4, bdims)
    bdx = bx.slice_boundary_box(scene_d.bd, dims, bdims, dims_b.k,
                                idx0.origin)

    def f_density(args, c):
        g, bb = args
        return pp.density_pass(g[:4].at[3].add(c), bb, None, bdims,
                               bdims_b, cfg, engine="xla")

    def f_density27(args, c):
        g, bb = args
        return pp.density_pass(g[:4].at[3].add(c), bb, None, bdims,
                               bdims_b, cfg, engine="xla27")

    def f_sa27(args, c):
        g, bb = args
        g5 = jnp.concatenate([g[:4], g.at[3].add(c)[4:5]], 0)
        return pp.stiffness_accel_pass(g5, bb, None, bdims, bdims_b, cfg,
                                       engine="xla27")

    def f_density_nobd(args, c):
        g, bb = args
        return pp.density_pass(g[:4].at[3].add(c), None, None, bdims,
                               None, cfg, engine="xla")

    def f_sa(args, c):
        g, bb = args
        g5 = jnp.concatenate([g[:4], g.at[3].add(c)[4:5]], 0)
        return pp.stiffness_accel_pass(g5, bb, None, bdims, bdims_b, cfg,
                                       engine="xla")

    from cpp_fluid_particles_tpu.models import dfsph as dmod
    from cpp_fluid_particles_tpu.state import make_fluid_state
    state = make_fluid_state(pos_np, cfg)
    carry = dmod.init_carry(state)

    def f_step(args, c):
        st = args
        st2, _, m = D.dfsph_step(
            st._replace(pos=st.pos + c), carry, scene_d, cfg,
            jnp.float32(0.004), dims, dims_b, engine="xlab", box=box)
        return st2.pos

    for name, fn, args in [
        ("index only      ", f_index, (pos, vel)),
        ("index+fill      ", f_fill, (pos, vel)),
        ("index+fill+read ", f_fill_read, (pos, vel)),
        ("density sym     ", f_density, (base, bdx)),
        ("density 27      ", f_density27, (base, bdx)),
        ("sa 27           ", f_sa27, (base, bdx)),
        ("density no bd   ", f_density_nobd, (base, bdx)),
        ("stiffness accel ", f_sa, (base, bdx)),
        ("FULL dfsph step ", f_step, state),
    ]:
        ms = time_fn(fn, args)
        print(f"{name}: {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
