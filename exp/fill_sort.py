"""Scatter-fill alternatives for the dense grid build.

At 1M particles the 7-row fill scatter costs 62 ms (~0.45 GB/s — TPU
scatter is the write-side twin of the gather wall, exp/gather_bw.py).
Variants, all producing the IDENTICAL (F, K, GB) lane-major box grid:

  V0  current fill_box: one scatter into (F, K*GB+1) at slots
      rank*GB+gcell (indices unordered in particle order).
  V1  scatter into the transposed (F, GB*K+1) layout at gcell*K+rank with
      unique_indices=True, then reshape/transpose back to (K, GB) —
      same data motion, but the hint + layout may pick a faster lowering.
  V2  sort-with-payload: lax.sort (key, f0..f6) moves the field values at
      sort-network (regular, vectorized) speeds, ranks from a run scan on
      the sorted keys, then the scatter indices gcell*K+rank are
      NON-DECREASING -> scatter with indices_are_sorted=True +
      unique_indices=True into (GB*K+1), transpose back.
  V3  gather-fill: scatter ONE int32 row (slot -> particle id, sentinel N
      for empty) then fetch all F rows with one shared-index row take
      (the read_box pattern — the fastest gather on this chip,
      exp/gather_bw.py: pays per INDEX, not per element like scatter).
      Cost model: N/scatter_bw + F*slots/take_bw vs F*N/scatter_bw —
      wins when slots/N is small (the 1M scene: 2.2x) and loses when the
      box is slot-inflated (the 20k dam: 12.6x).

Run on the TPU: python exp/fill_sort.py [n]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import box as bx
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops.grid import POS_PAD, cell_coords

F32 = jnp.float32
FILLS = (POS_PAD, POS_PAD, POS_PAD, 0.0, 0.0, 0.0, 0.0)


def fetch_baseline_ms():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), F32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_fn(fn, args, reps=3, iters=20):
    @jax.jit
    def chained(a, seed):
        def body(c, _):
            out = fn(*a, c)
            return jnp.sum(out[:, 0, :4]) * 1e-30 + c * 0.0, None
        c, _ = jax.lax.scan(body, seed, None, length=iters)
        return c

    _ = np.asarray(chained(args, jnp.float32(0.0)))
    base = fetch_baseline_ms()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(args, jnp.float32(0.0)))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def v0(idx_slots, fields, box, c):
    f = fields.shape[0]
    total = box.k * box.g
    init = jnp.broadcast_to(jnp.asarray(FILLS[:f], F32)[:, None],
                            (f, total + 1))
    dense = init.at[:, idx_slots].set(fields + c * 1e-30, mode="drop")
    return dense[:, :total].reshape(f, box.k, box.g)


def v1(slots_gk, fields, box, c):
    f = fields.shape[0]
    total = box.k * box.g
    init = jnp.broadcast_to(jnp.asarray(FILLS[:f], F32)[:, None],
                            (f, total + 1))
    dense = init.at[:, slots_gk].set(fields + c * 1e-30, mode="drop",
                                     unique_indices=True)
    return (dense[:, :total].reshape(f, box.g, box.k)
            .transpose(0, 2, 1))


def v2(key, gcell, fields, box, c):
    """key: flat ghosted-box cell id (invalid -> GB), gcell rides along."""
    f = fields.shape[0]
    n = key.shape[0]
    total = box.k * box.g
    ops = jax.lax.sort((key, gcell) + tuple(fields + c * 1e-30),
                       num_keys=1, is_stable=True)
    sk, sg, sf = ops[0], ops[1], jnp.stack(ops[2:], 0)
    iota = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = iota - run_start
    valid = (sk < box.g) & (rank < box.k)
    slots = jnp.where(valid, sg * box.k + rank, total).astype(jnp.int32)
    init = jnp.broadcast_to(jnp.asarray(FILLS[:f], F32)[:, None],
                            (f, total + 1))
    dense = init.at[:, slots].set(sf, mode="drop", indices_are_sorted=True,
                                  unique_indices=True)
    return (dense[:, :total].reshape(f, box.g, box.k)
            .transpose(0, 2, 1))


def v3(idx_slots, fields, box, c):
    f, n = fields.shape
    total = box.k * box.g
    pid = jnp.full((total + 1,), n, jnp.int32).at[idx_slots].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    padded = jnp.concatenate(
        [fields + c * 1e-30, jnp.asarray(FILLS[:f], F32)[:, None]], 1)
    dense = padded[:, pid]
    return dense[:, :total].reshape(f, box.k, box.g)


def v4(idx_slots, fields_t, box, c):
    """Row-slice scatter: ONE index per particle carrying all F fields as
    a contiguous (1, F) slice into a (total+1, F) target, then transpose
    back to the lane-major (F, K, GB) layout. If XLA scatter pays per
    INDEX (serialization) rather than per element, this cuts the index
    count 7x for the price of a dense transpose."""
    f = fields_t.shape[1]
    total = box.k * box.g
    init = jnp.broadcast_to(jnp.asarray(FILLS[:f], F32)[None, :],
                            (total + 1, f))
    dense = init.at[idx_slots].set(fields_t + c * 1e-30, mode="drop",
                                   unique_indices=True)
    return dense[:total].T.reshape(f, box.k, box.g)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if n >= 500_000:
        cfg, pos = cfp.scaled_dam_scene(n, mode="parity")
        pos = np.asarray(pos)
    else:
        cfg = cfp.dam_break_config(mode="parity")
        sim = cfp.Simulation(solver="wcsph", cfg=cfg, warmup=True)
        sim.run_scan(125, cfg.dt)
        pos = np.asarray(sim.state.pos)
        cfg = cfg.replace(max_per_cell=sim.max_per_cell)
    dims = dn.dims_for(cfg)
    rng = np.random.default_rng(0)
    fields_np = np.concatenate(
        [pos.T, rng.standard_normal((4, pos.shape[0])).astype(np.float32)],
        0)

    idx = bx.build_box_index(jnp.asarray(pos), cfg, dims, dims)
    ext = np.asarray(idx.ext)
    kmax = int(np.asarray(idx.max_occupancy))
    box = dn.DenseDims(int(ext[0]), int(ext[1]), int(ext[2]),
                       min(dims.k, kmax + 2))
    idx = bx.build_box_index(jnp.asarray(pos), cfg, dims, box)
    print(f"n={n} box=({box.cx},{box.cy},{box.cz}) K={box.k} "
          f"GB={box.g}", flush=True)

    fields = jnp.asarray(fields_np)
    slots = idx.slots                       # rank*GB + gcell  (V0)
    rank = slots // box.g
    gcell = slots - rank * box.g
    total = box.k * box.g
    slots_gk = jnp.where(slots >= total, total,
                         gcell * box.k + rank).astype(jnp.int32)  # V1

    # V2 inputs: ghosted flat cell id per particle + validity
    c = cell_coords(jnp.asarray(pos), cfg)
    rel = c.astype(jnp.int32) - idx.origin[None, :]
    inbox = ((rel >= 0).all(1)
             & (rel < jnp.array([box.cx, box.cy, box.cz])[None]).all(1))
    g_id = (((rel[:, 0] + 1) * box.gy + (rel[:, 1] + 1)) * box.gz
            + (rel[:, 2] + 1)).astype(jnp.int32)
    key = jnp.where(inbox, g_id, box.g).astype(jnp.int32)
    gq = jnp.where(inbox, g_id, 0).astype(jnp.int32)

    j0 = jax.jit(lambda s, f_, c: v0(s, f_, box, c))
    j1 = jax.jit(lambda s, f_, c: v1(s, f_, box, c))
    j2 = jax.jit(lambda k_, g_, f_, c: v2(k_, g_, f_, box, c))
    r0 = np.asarray(j0(slots, fields, jnp.float32(0.0)))
    r1 = np.asarray(j1(slots_gk, fields, jnp.float32(0.0)))
    r2 = np.asarray(j2(key, gq, fields, jnp.float32(0.0)))
    j3 = jax.jit(lambda s, f_, c: v3(s, f_, box, c))
    r3 = np.asarray(j3(slots, fields, jnp.float32(0.0)))
    fields_t = jnp.asarray(fields_np.T.copy())
    j4 = jax.jit(lambda s, f_, c: v4(s, f_, box, c))
    r4 = np.asarray(j4(slots, fields_t, jnp.float32(0.0)))
    print("v1 bitwise ==", np.array_equal(r0, r1),
          "| v2 bitwise ==", np.array_equal(r0, r2),
          "| v3 bitwise ==", np.array_equal(r0, r3),
          "| v4 bitwise ==", np.array_equal(r0, r4), flush=True)

    t0 = time_fn(lambda s, f_, c: v0(s, f_, box, c), (slots, fields))
    print(f"V0 current (K,G) scatter:        {t0:8.3f} ms", flush=True)
    t1 = time_fn(lambda s, f_, c: v1(s, f_, box, c), (slots_gk, fields))
    print(f"V1 (G,K) unique + transpose:     {t1:8.3f} ms", flush=True)
    t2 = time_fn(lambda k_, g_, f_, c: v2(k_, g_, f_, box, c),
                 (key, gq, fields))
    print(f"V2 sort-payload + sorted scatter:{t2:8.3f} ms", flush=True)
    t3 = time_fn(lambda s, f_, c: v3(s, f_, box, c), (slots, fields))
    print(f"V3 id-scatter + row take:        {t3:8.3f} ms", flush=True)
    t4 = time_fn(lambda s, f_, c: v4(s, f_, box, c), (slots, fields_t))
    print(f"V4 row-slice scatter + transpose:{t4:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
