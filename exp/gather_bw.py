"""TPU gather bandwidth vs contiguous-run length.

Round 2 measured gathers of 27-float (108 B) rows as catastrophic and
wrote off all gather-based compaction. Every sparse-traversal design
(occupied-block streams, column z-compaction, banded windows) reduces to
one question: at what contiguous-run length does a batched gather

    out[i] = src[starts[i] : starts[i] + run]

approach HBM stream bandwidth? This sweeps run length with total output
fixed at ~64 MB and reports effective GB/s (relay-safe timing: chained
scan + one scalar fetch, minus dispatch baseline).

Run on the TPU: python exp/gather_bw.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
TOTAL = 16 << 20          # floats out per gather (= 64 MB)
SRC = 32 << 20            # source pool floats (= 128 MB)


def fetch_baseline_ms():
    ident = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((4,), F32)
    _ = np.asarray(ident(x))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(ident(x))
    return (time.perf_counter() - t0) * 1e3 / 5


def time_ms(fn, arg, iters=20, reps=3):
    @jax.jit
    def chained(a, seed):
        def body(c, _):
            return jnp.sum(fn(a, c)) * 1e-30, None
        c, _ = jax.lax.scan(body, seed, None, length=iters)
        return c

    _ = np.asarray(chained(arg, jnp.float32(0.0)))
    base = fetch_baseline_ms()
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(chained(arg, jnp.float32(0.0)))
        best = min(best, (time.perf_counter() - t0) * 1e3 - base)
    return best / iters


def main():
    src = jnp.arange(SRC, dtype=F32)
    rng = np.random.default_rng(0)

    # stream reference: one contiguous 64 MB read
    t = time_ms(lambda a, c: jax.lax.dynamic_slice(
        a, (jnp.int32(c * 0).astype(jnp.int32),), (TOTAL,)), src)
    print(f"contiguous stream: {t:.3f} ms  "
          f"{TOTAL * 4 / t / 1e6:.0f} GB/s", flush=True)

    for run in (16, 32, 64, 128, 256, 1024, 4096, 16384):
        nidx = TOTAL // run
        starts = jnp.asarray(
            rng.integers(0, SRC - run, size=nidx, dtype=np.int64)
            .astype(np.int32))

        def g(a, c, starts=starts, run=run):
            st = (starts + jnp.int32(c * 0)).astype(jnp.int32)
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(a, (s,), (run,)))(st)

        t = time_ms(g, src)
        print(f"run {run:6d} floats ({run * 4:7d} B) x {nidx:8d}: "
              f"{t:8.3f} ms  {TOTAL * 4 / t / 1e6:6.0f} GB/s", flush=True)


def take_variants():
    """jnp.take-style gathers (XLA GatherOp via indexing) — read_box's 1M
    gather measures ~10 GB/s, 250x faster than the vmapped-dynamic_slice
    lowering above; quantify take at element / window / shared-row
    granularities."""
    src = jnp.arange(SRC, dtype=F32)
    rng = np.random.default_rng(1)

    # single-element take, 16M random indices
    idx = jnp.asarray(rng.integers(0, SRC, size=TOTAL, dtype=np.int64)
                      .astype(np.int32))
    t = time_ms(lambda a, c: a[(idx + jnp.int32(c * 0)).astype(jnp.int32)],
                src)
    print(f"take single x {TOTAL}: {t:8.3f} ms  "
          f"{TOTAL * 4 / t / 1e6:6.0f} GB/s", flush=True)

    # windowed take: indices = starts[:,None] + iota(run), one big take
    for run in (32, 128, 1024):
        nidx = TOTAL // run
        starts = jnp.asarray(
            rng.integers(0, SRC - run, size=nidx, dtype=np.int64)
            .astype(np.int32))

        def g(a, c, starts=starts, run=run):
            st = (starts + jnp.int32(c * 0)).astype(jnp.int32)
            ix = st[:, None] + jnp.arange(run, dtype=jnp.int32)[None, :]
            return a[ix]

        t = time_ms(g, src)
        print(f"take window {run:5d} floats x {nidx:8d}: {t:8.3f} ms  "
              f"{TOTAL * 4 / t / 1e6:6.0f} GB/s", flush=True)

    # shared-index row take: (8, SRC/8)[:, idx] — the read_box pattern
    src2 = src.reshape(8, SRC // 8)
    idx2 = jnp.asarray(rng.integers(0, SRC // 8, size=TOTAL // 8,
                                    dtype=np.int64).astype(np.int32))
    t = time_ms(lambda a, c: a[:, (idx2 + jnp.int32(c * 0))
                               .astype(jnp.int32)], src2)
    print(f"take rows (8, n)[:, idx] x {TOTAL // 8}: {t:8.3f} ms  "
          f"{TOTAL * 4 / t / 1e6:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "take":
        take_variants()
    else:
        main()
