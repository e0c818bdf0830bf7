"""Break a WCSPH box-engine step into components and time each on TPU.

Usage: python exp/step_breakdown.py  (expects /tmp/dam_state.npz)
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


def time_fn(fn, args, reps=3, iters=30):
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
    d = np.load("/tmp/dam_state.npz")
    pos = jnp.asarray(d["pos"])
    vel = jnp.asarray(d["vel"])
    cfg = cfp.dam_break_config(mode="parity", max_per_cell=20)
    n = pos.shape[0]
    mass = jnp.full((n,), cfg.m0, F32)
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scene_d = D.build_dense_scene(cfg, bpos, kb, engine="xla")
    box = (25, 16, 25)
    bdims = dn.DenseDims(box[0], box[1], box[2], dims.k)
    bdims_b = dn.DenseDims(box[0], box[1], box[2], dims_b.k)

    idx0 = bx.build_box_index(pos, cfg, dims, bdims)
    print(f"n={n} K={dims.k} box={box} box_ov={int(idx0.box_overflow)} "
          f"k_ov={int(idx0.overflow)} ext={np.asarray(idx0.ext)}",
          flush=True)

    def f_index(args, c):
        p, _ = args
        return bx.build_box_index(p + c, cfg, dims, bdims).slots

    def f_index_fill(args, c):
        p, v = args
        idx = bx.build_box_index(p + c, cfg, dims, bdims)
        return bx.fill_box(idx, [p[:, 0], p[:, 1], p[:, 2], mass,
                                 v[:, 0], v[:, 1], v[:, 2]],
                           [dn.POS_PAD] * 3 + [0.0] * 4, bdims)

    def f_index_fill_read(args, c):
        p, v = args
        idx = bx.build_box_index(p + c, cfg, dims, bdims)
        g = bx.fill_box(idx, [p[:, 0], p[:, 1], p[:, 2], mass,
                              v[:, 0], v[:, 1], v[:, 2]],
                        [dn.POS_PAD] * 3 + [0.0] * 4, bdims)
        return bx.read_box(idx, g)

    def f_bd_slice(args, c):
        p, _ = args
        idx = bx.build_box_index(p + c, cfg, dims, bdims)
        return bx.slice_boundary_box(scene_d.bd, dims, bdims, dims_b.k,
                                     idx.origin)

    # full passes on prebuilt grid tensors
    idx = idx0
    base = bx.fill_box(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass,
                             vel[:, 0], vel[:, 1], vel[:, 2]],
                       [dn.POS_PAD] * 3 + [0.0] * 4, bdims)
    bdx = bx.slice_boundary_box(scene_d.bd, dims, bdims, dims_b.k,
                                idx.origin)

    def f_pass1(args, c):
        g, bb = args
        return pp.density_colorgrad_visc_pass(
            g.at[3].add(c), bb, None, bdims, bdims_b, cfg, engine="xla")

    def f_pass2(args, c):
        g, bb = args
        g9 = jnp.concatenate([g, g.at[3].add(c)[4:6]], 0)
        return pp.surface_pressure_pass(
            g9, bb, None, bdims, bdims_b, cfg, engine="xla")

    from cpp_fluid_particles_tpu.models import wcsph as wmod
    from cpp_fluid_particles_tpu.state import make_fluid_state
    state = make_fluid_state(np.asarray(pos), cfg)
    state = state._replace(vel=vel)
    carry = wmod.init_carry(state)

    def f_step(args, c):
        st = args
        st2, _, m = D.wcsph_step(
            st._replace(pos=st.pos + c), carry, scene_d, cfg,
            jnp.float32(0.001), dims, dims_b, engine="xlab", box=box)
        return st2.pos

    for name, fn, args in [
        ("index only          ", f_index, (pos, vel)),
        ("index+fill          ", f_index_fill, (pos, vel)),
        ("index+fill+read     ", f_index_fill_read, (pos, vel)),
        ("index+bd slice      ", f_bd_slice, (pos, vel)),
        ("pass1 dcv (8 out)   ", f_pass1, (base, bdx)),
        ("pass2 surf+p (6 out)", f_pass2, (base, bdx)),
        ("FULL wcsph step     ", f_step, state),
    ]:
        ms = time_fn(fn, args)
        print(f"{name}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
