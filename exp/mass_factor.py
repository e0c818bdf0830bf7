"""Uniform-mass factoring: measure the win of pulling the constant fluid
mass m0 out of the pair blocks.

The reference fills every fluid particle's mass with the same m0
(src/SPHSystem.cu:73) — mass only varies on the boundary (Akinci). The
current pass bodies still stream a mass row per fluid candidate slot and
multiply it into every pair term (it doubles as the padding-slot mask).
But all pair terms carry a compact-support kernel factor that is exactly 0
for padded slots (POS_PAD separations > h; W(0)=0 for pad-pad), so with
uniform mass the mass row can be dropped from the fluid stream entirely
and m0 applied once to the reduced (n_out, K, C) output:

  * lambda pass: fluid stream 4 rows -> 3 (-25% fluid stream bytes),
    pair block loses ~11 multiplies (incl. the j-side mirror re-products).
  * delta-pos/stiffness pass: 5 rows -> 4, -6 multiplies.

Times both variants over the ACTUAL mid-splash PBD box layout on the real
chip and checks numerical agreement (not bitwise: f32 m0*sum vs sum(m0*w)
round differently).

Run on the TPU: python exp/mass_factor.py [reps]
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
from cpp_fluid_particles_tpu.state import boundary_positions

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


# ---------------------------------------------------------------- factored
def lambda_pass_factored(fl, bd, col_count, dims, dims_b, cfg, engine):
    """fl: [pos3] (no mass row); fluid mass = cfg.m0 static."""
    h = cfg.radius
    m0 = float(cfg.m0)

    def fluid(i, j, want_j):
        g = pp._geom(i, j)
        w = kn.w_cubic(g.r, h)
        cw = kn.grad_w_cubic_coef(g.r, h) / cfg.rho0
        r2c2 = cw * cw * (g.dx * g.dx + g.dy * g.dy + g.dz * g.dz)
        cwx, cwy, cwz = cw * g.dx, cw * g.dy, cw * g.dz
        out_i = jnp.stack([
            pp._si(w), pp._si(cwx), pp._si(cwy), pp._si(cwz),
            pp._si(r2c2),
        ])
        out_i = out_i * jnp.asarray([m0, m0, m0, m0, m0 * m0],
                                    F32)[:, None, None]
        if not want_j:
            return out_i, None
        out_j = jnp.stack([
            pp._sj(w), -pp._sj(cwx), -pp._sj(cwy), -pp._sj(cwz),
            pp._sj(r2c2),
        ])
        out_j = out_j * jnp.asarray([m0, m0, m0, m0, m0 * m0],
                                    F32)[:, None, None]
        return out_i, out_j

    def bdry(i, jb):
        return pp._lambda_terms(i, jb, h, cfg.rho0, False)[0]

    return pp._run(fluid, bdry, fl, bd, col_count, dims, dims_b, 5, engine)


def sa_pass_factored(fl, bd, col_count, dims, dims_b, cfg, engine):
    """fl: [pos3, stiff] (no mass row); fluid mass = cfg.m0 static."""
    h = cfg.radius
    m0 = float(cfg.m0)

    def fluid(i, j, want_j):
        g = pp._geom(i, j)
        s = (pp._ii(i[3]) + pp._jb(j[3])) * kn.grad_w_cubic_coef(g.r, h)
        sx, sy, sz = s * g.dx, s * g.dy, s * g.dz
        out_i = jnp.stack([pp._si(sx), pp._si(sy), pp._si(sz)]) * m0
        if not want_j:
            return out_i, None
        out_j = jnp.stack([-pp._sj(sx), -pp._sj(sy), -pp._sj(sz)]) * m0
        return out_i, out_j

    def bdry(i, jb):
        gb = pp._geom(i, jb)
        coefb = pp._jb(jb[3]) * pp._ii(i[3]) * kn.grad_w_cubic_coef(gb.r, h)
        return jnp.stack([pp._si(coefb * gb.dx),
                          pp._si(coefb * gb.dy),
                          pp._si(coefb * gb.dz)])

    return pp._run(fluid, bdry, fl, bd, col_count, dims, dims_b, 3, engine)


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
    b_pos = boundary_positions(cfg_)
    kb = dense_step.boundary_k(b_pos, cfg_)
    dims_b = dn.dims_for(cfg_, kb)
    box = sim.box
    bdims = dn.DenseDims(box[0], box[1], box[2], dims.k)
    bdims_b = dn.DenseDims(box[0], box[1], box[2], dims_b.k)
    pos = jnp.asarray(sim.state.pos)
    mass = jnp.asarray(sim.state.mass)
    stiff = jnp.asarray(np.random.default_rng(0).standard_normal(
        pos.shape[0]).astype(np.float32) * 1e-6)

    idx = bx.build_box_index(pos, cfg_, dims, bdims)
    bdx = bx.slice_boundary_box(sim.scene.bd, dims, bdims, dims_b.k,
                                idx.origin)
    fl4 = bx.fill_box(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass],
                      [POS_PAD, POS_PAD, POS_PAD, 0.0], bdims)
    fl3 = fl4[0:3]
    fl5 = bx.fill_box(idx, [pos[:, 0], pos[:, 1], pos[:, 2], mass, stiff],
                      [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0], bdims)
    fl4s = jnp.concatenate([fl5[0:3], fl5[4:5]], 0)

    def lam_cur(c):
        return pp.pbd_lambda_pass(fl4 + c * 1e-30, bdx, None, bdims,
                                  bdims_b, cfg_, "xla")

    def lam_fac(c):
        return lambda_pass_factored(fl3 + c * 1e-30, bdx, None, bdims,
                                    bdims_b, cfg_, "xla")

    def sa_cur(c):
        return pp.stiffness_accel_pass(fl5 + c * 1e-30, bdx, None, bdims,
                                       bdims_b, cfg_, "xla")

    def sa_fac(c):
        return sa_pass_factored(fl4s + c * 1e-30, bdx, None, bdims,
                                bdims_b, cfg_, "xla")

    # numerical agreement (m0 factored out of f32 sums: not bitwise)
    lc = np.asarray(jax.jit(lam_cur)(jnp.float32(0.0)))
    lf = np.asarray(jax.jit(lam_fac)(jnp.float32(0.0)))
    sc = np.asarray(jax.jit(sa_cur)(jnp.float32(0.0)))
    sf = np.asarray(jax.jit(sa_fac)(jnp.float32(0.0)))
    for name, a, b in [("lambda", lc, lf), ("sa", sc, sf)]:
        scale = np.max(np.abs(a)) + 1e-30
        d = np.max(np.abs(a - b)) / scale
        print(f"{name}: rel max |diff| = {d:.3e}", flush=True)
        assert d < 1e-4, f"{name} factored variant diverges"

    t_lc = time_fn(lam_cur, reps)
    t_lf = time_fn(lam_fac, reps)
    t_sc = time_fn(sa_cur, reps)
    t_sf = time_fn(sa_fac, reps)
    print(f"lambda: current {t_lc:.3f} ms, factored {t_lf:.3f} ms "
          f"({(1 - t_lf / t_lc) * 100:+.1f}%)")
    print(f"sa:     current {t_sc:.3f} ms, factored {t_sf:.3f} ms "
          f"({(1 - t_sf / t_sc) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
