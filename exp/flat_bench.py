"""Layout experiment: pair-pass cost, slot-minor vs cell-minor (lane-major).

Hypothesis: the current executors form pair blocks with minor dims
(K_i, K_j) ~ (12, 12); TPU tiles the last two dims as (8, 128), so the
block occupies ~7% of each tile -> the VPU runs at a few percent of peak.
A layout with the flattened cell axis MINOR (pair block (K_i, K_j, G))
should be fully lane-utilized.

Run: python exp/flat_bench.py [reps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cpp_fluid_particles_tpu.config import dam_break_config
from cpp_fluid_particles_tpu.models import dense_step
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.ops import kernels as kn
from cpp_fluid_particles_tpu.ops.grid import POS_PAD
from cpp_fluid_particles_tpu.state import dam_break_positions

F32 = jnp.float32


def fetch_baseline_ms():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), jnp.float32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_pass(fn, args, reps, iters=30):
    """fn(args) -> array; chained iters times inside one jit via carrying a
    scalar perturbation (serializes iterations, prevents CSE)."""

    @jax.jit
    def chained(args):
        def body(c, _):
            out = fn(args, c)
            return jnp.sum(out) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    _ = np.asarray(chained(args))  # compile+warm
    base = fetch_baseline_ms()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(args))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = dam_break_config(mode="parity")
    K = 12
    cfg = cfg.replace(max_per_cell=K)
    dims = dn.dims_for(cfg)
    pos = jnp.asarray(dam_break_positions(cfg))
    n = pos.shape[0]
    mass = jnp.full((n,), cfg.m0, F32)
    vel = jnp.zeros((n, 3), F32)
    idx = dn.build_dense_index(pos, cfg, dims)
    print(f"n={n} dims=({dims.cx},{dims.cy},{dims.cz}) K={K} "
          f"overflow={int(idx.overflow)}", flush=True)

    fl = dn.fill_dense(
        idx,
        [pos[:, 0], pos[:, 1], pos[:, 2], mass,
         vel[:, 0], vel[:, 1], vel[:, 2]],
        [POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0], dims)

    h = cfg.radius

    # ------------------------------------------------------------------
    # A: current 27-offset slot-minor executor (density 1-out and fused
    #    rho+colorgrad+visc 8-out)
    # ------------------------------------------------------------------
    def run_a_density(args, c):
        fl = args
        flp = fl.at[3].add(c)
        return pp.density_pass(flp, None, None, dims, None, cfg,
                               engine="xla27")

    def run_a_dcv(args, c):
        fl = args
        flp = fl.at[3].add(c)
        return pp.density_colorgrad_visc_pass(flp, None, None, dims, None,
                                              cfg, engine="xla27")

    # ------------------------------------------------------------------
    # B: flat lane-major executor. Layout (F, K, G) with G = GX*GY*GZ
    #    flattened ghosted; j for stencil offset d is a contiguous slice
    #    of a (F, K, G+2P) padded tensor.
    # ------------------------------------------------------------------
    gx, gy, gz = dims.cx + 2, dims.cy + 2, dims.cz + 2
    G = gx * gy * gz
    P = gy * gz + gz + 1

    fl_flat = fl.reshape(fl.shape[0], G, K).transpose(0, 2, 1)  # (F,K,G)

    def flat_pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (P, P)),
                       constant_values=POS_PAD)

    OFF = [(dx - 1) * gy * gz + (dy - 1) * gz + (dz - 1)
           for dx in range(3) for dy in range(3) for dz in range(3)]

    def flat_pass(flp_padded, terms, n_out):
        i = jax.lax.dynamic_slice_in_dim(flp_padded, P, G, 2)

        def fold(o, acc):
            d = jnp.asarray(np.asarray(OFF, np.int32))[o] + P
            j = jax.lax.dynamic_slice(
                flp_padded, (0, 0, d), (flp_padded.shape[0], K, G))
            return acc + terms(i, j)

        return jax.lax.fori_loop(0, 27, fold,
                                 jnp.zeros((n_out, K, G), F32))

    def density_terms(i, j):
        dx = i[0][:, None, :] - j[0][None, :, :]
        dy = i[1][:, None, :] - j[1][None, :, :]
        dz = i[2][:, None, :] - j[2][None, :, :]
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        w = kn.w_cubic(r, h)
        return jnp.sum(j[3][None, :, :] * w, 1)[None]

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

    def run_b_density(args, c):
        fl_flat = args
        flp = flat_pad(fl_flat.at[3].add(c))
        return flat_pass(flp, density_terms, 1)

    def run_b_dcv(args, c):
        fl_flat = args
        flp = flat_pad(fl_flat.at[3].add(c))
        return flat_pass(flp, dcv_terms, 8)

    # correctness cross-check (density): flat result vs dense executor
    ref = np.asarray(pp.density_pass(fl, None, None, dims, None, cfg,
                                     engine="xla27"))
    got = np.asarray(flat_pass(flat_pad(fl_flat), density_terms, 1))
    ref_flat = ref.reshape(G, K).transpose(1, 0)
    err = np.abs(np.nan_to_num(got[0]) - np.nan_to_num(ref_flat)).max()
    print(f"flat-vs-dense density maxdiff: {err:.3e}", flush=True)

    # ------------------------------------------------------------------
    # Bsym: lane-major symmetric half-stencil — each fluid pair block
    # evaluated once (13 offsets + self), j-side partial shifted by +d via
    # pad+slice on the flat axis.
    # ------------------------------------------------------------------
    def dcv_terms2(i, j):
        """Returns (out_i, out_j) both (8, K, G)."""
        _ii = lambda v: v[:, None, :]
        _jb = lambda v: v[None, :, :]
        dx = _ii(i[0]) - _jb(j[0])
        dy = _ii(i[1]) - _jb(j[1])
        dz = _ii(i[2]) - _jb(j[2])
        r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        w = kn.w_cubic(r, h)
        cw = kn.grad_w_cubic_coef(r, h)
        mj, mi = _jb(j[3]), _ii(i[3])
        volj, voli = mj / cfg.rho0, mi / cfg.rho0
        cj, ci = volj * cw, voli * cw
        lap = kn.w_visc_laplacian(r, h) / cfg.rho0
        tx = lap * (_jb(j[4]) - _ii(i[4]))
        ty = lap * (_jb(j[5]) - _ii(i[5]))
        tz = lap * (_jb(j[6]) - _ii(i[6]))
        out_i = jnp.stack([
            jnp.sum(mj * w, 1),
            jnp.sum(cj * dx, 1), jnp.sum(cj * dy, 1), jnp.sum(cj * dz, 1),
            jnp.sum(volj * w, 1),
            jnp.sum(mj * tx, 1), jnp.sum(mj * ty, 1), jnp.sum(mj * tz, 1),
        ])
        out_j = jnp.stack([
            jnp.sum(mi * w, 0),
            -jnp.sum(ci * dx, 0), -jnp.sum(ci * dy, 0), -jnp.sum(ci * dz, 0),
            jnp.sum(voli * w, 0),
            -jnp.sum(mi * tx, 0), -jnp.sum(mi * ty, 0), -jnp.sum(mi * tz, 0),
        ])
        return out_i, out_j

    OFFN = np.asarray(OFF, np.int32)

    def flat_pass_sym(flp_padded, terms2, n_out):
        i = jax.lax.dynamic_slice_in_dim(flp_padded, P, G, 2)
        offs = jnp.asarray(OFFN)

        # self offset: i-reduction of the full within-cell block
        oi, _ = terms2(i, i)
        acc = oi

        def fold(o, acc):
            doff = offs[o]
            j = jax.lax.dynamic_slice(
                flp_padded, (0, 0, P + doff), (flp_padded.shape[0], K, G))
            oi, oj = terms2(i, j)
            acc = acc + oi
            ojp = jnp.pad(oj, ((0, 0), (0, 0), (P, P)))
            acc = acc + jax.lax.dynamic_slice(
                ojp, (0, 0, P - doff), acc.shape)
            return acc

        # offsets 0..12 are the half stencil (13 is self, 14..26 mirrors)
        return jax.lax.fori_loop(0, 13, fold, acc)

    def run_b_sym(args, c):
        fl_flat = args
        flp = flat_pad(fl_flat.at[3].add(c))
        return flat_pass_sym(flp, dcv_terms2, 8)

    # correctness: sym vs 27-offset, both lane-major
    ref8 = np.asarray(flat_pass(flat_pad(fl_flat), dcv_terms, 8))
    got8 = np.asarray(flat_pass_sym(flat_pad(fl_flat), dcv_terms2, 8))
    err8 = np.abs(np.nan_to_num(got8) - np.nan_to_num(ref8)).max()
    print(f"sym-vs-27 dcv maxdiff: {err8:.3e}", flush=True)

    # ------------------------------------------------------------------
    # 3-out accel-like pass (the DFSPH/PBD hot inner pass)
    # ------------------------------------------------------------------
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

    def run_b_sa(args, c):
        fl_flat = args
        flp = flat_pad(fl_flat.at[3].add(c))
        return flat_pass(flp, sa_terms, 3)

    def run_a_sa(args, c):
        fl = args
        flp = fl.at[3].add(c)
        return pp.stiffness_accel_pass(
            jnp.concatenate([flp[0:4], flp[4:5]], 0), None, None, dims,
            None, cfg, engine="xla27")

    for name, fn, args in [
        ("A density (slot-minor, 1 out)  ", run_a_density, fl),
        ("B density (lane-major, 1 out)  ", run_b_density, fl_flat),
        ("A rho+cg+visc (slot-minor, 8)  ", run_a_dcv, fl),
        ("B rho+cg+visc (lane-major, 8)  ", run_b_dcv, fl_flat),
        ("Bsym rho+cg+visc (half-sten, 8)", run_b_sym, fl_flat),
        ("A accel (slot-minor, 3 out)    ", run_a_sa, fl),
        ("B accel (lane-major, 3 out)    ", run_b_sa, fl_flat),
    ]:
        ms = time_pass(fn, args, reps)
        print(f"{name}: {ms:7.3f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
