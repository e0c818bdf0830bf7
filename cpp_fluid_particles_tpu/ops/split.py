"""Occupancy-class split layout — the two-tier K fast path.

The waste census (BENCHMARKS.md "floor" #1) shows the splash-phase dense
traversal pays K^2 pair-slot rows against occupied cells averaging
4.3-7.1 particles: most slot rows above rank ~8 are empty almost
everywhere except the splash front. This layout splits the sliding box
(ops/box.py) into two classes (measured first in exp/occupancy_split.py,
+12-16% density / +15-40% lambda per pass; productionised per VERDICT r4
#1):

  * class A — the full sliding box truncated to ``K_a`` slot rows: every
    cell's first K_a ranked particles (complete for the ~90% of cells
    holding <= K_a);
  * class B — a small window (static size, dynamic position) fitted to
    the cells whose occupancy exceeds K_a, holding ONLY the overflow
    ranks (slot r holds rank K_a + r) with ``k_b = K - K_a`` rows.

Every neighbor pass then covers AA (symmetric half-stencil over the box
at K_a^2 instead of K^2), BB + B<-A + B<-boundary (window-sized passes),
and A<-B (one-sided window pass added back into the box result) — see
``pallas_passes._run_split``. All window operands are ONE dynamic slice
at the window origin (the slice_boundary_box pattern): no gathers, so
the gather wall (floor #2) is not triggered.

Safety contract (the same no-drop rules as ops/box.py): B particles must
sit at least one cell inside every window face (or on a face that
coincides with a box face, where no fluid can be beyond) so that every
A-cell neighboring a B-cell lies inside the window core and receives its
A<-B contribution; violations count into ``win_overflow`` and trigger
Simulation's refit-and-retry. Pair sums are REGROUPED relative to the
single-tier executor (AA + A<-B instead of one fold), so split results
are float-close (~2e-7 rel, exp/occupancy_split.py), not bitwise.

Reference economics being recovered: src/BasicSPHSolver.cu:62-70 pays
only real neighbors via sorted cellStart ranges; this split is the
padded-dense analogue that stays on contiguous streams.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import SimConfig
from .dense import DenseDims
from .grid import cell_coords

F32 = jnp.float32


@jax.tree_util.register_pytree_node_class
class SP:
    """A grid tensor in split layout: ``a`` (F, K_a, G_A) over the box,
    ``b`` (F, k_b, G_W) over the overflow window. Elementwise arithmetic
    maps over both tiers; use ``smap`` for anything else."""

    __slots__ = ("a", "b")

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def tree_flatten(self):
        return (self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def _zip(self, other, f):
        if isinstance(other, SP):
            return SP(f(self.a, other.a), f(self.b, other.b))
        return SP(f(self.a, other), f(self.b, other))

    def __add__(self, o):
        return self._zip(o, lambda x, y: x + y)

    __radd__ = __add__

    def __sub__(self, o):
        return self._zip(o, lambda x, y: x - y)

    def __rsub__(self, o):
        return self._zip(o, lambda x, y: y - x)

    def __mul__(self, o):
        return self._zip(o, lambda x, y: x * y)

    __rmul__ = __mul__

    def __truediv__(self, o):
        return self._zip(o, lambda x, y: x / y)

    def __neg__(self):
        return SP(-self.a, -self.b)

    def __getitem__(self, k):
        return SP(self.a[k], self.b[k])

    @property
    def shape(self):  # pragma: no cover - debugging aid
        return (self.a.shape, self.b.shape)


def smap(f, *args):
    """Apply an elementwise function across both tiers; non-SP args are
    broadcast to both. A tuple-returning f yields a tuple of SPs."""
    a = f(*[x.a if isinstance(x, SP) else x for x in args])
    b = f(*[x.b if isinstance(x, SP) else x for x in args])
    if isinstance(a, tuple):
        return tuple(SP(x, y) for x, y in zip(a, b))
    return SP(a, b)


class SplitDims(NamedTuple):
    """Static split geometry + the traced window position, passed through
    the pass API as the ``dims`` argument (pallas_passes._run dispatches
    on it)."""

    a: DenseDims           # sliding box at K_a
    w: DenseDims           # overflow window at k_b
    start: jnp.ndarray     # (3,) int32 window origin - box origin (cells)


class SplitIndex(NamedTuple):
    """Per-step particle -> split-slot assignment (flat combined space:
    A slots [0, K_a*G_A), B slots [K_a*G_A, K_a*G_A + k_b*G_W))."""

    slots: jnp.ndarray
    valid: jnp.ndarray
    origin: jnp.ndarray        # (3,) box core origin (domain cells)
    start: jnp.ndarray         # (3,) window origin - box origin
    ext: jnp.ndarray           # (3,) measured fluid extents (box fit)
    wext: jnp.ndarray          # (3,) measured hi-cell extents + margin
    overflow: jnp.ndarray      # () rank >= K_a + k_b (total K exhausted)
    box_overflow: jnp.ndarray  # () fluid outside the box
    win_overflow: jnp.ndarray  # () overflow particle outside the window
    #                               (or too close to a non-box-face edge)
    max_occupancy: jnp.ndarray


def hi_extents(rel: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Cell extents (+1 margin each side, so the window covers every
    A-cell neighboring a B-cell) of the cells holding overflow ranks;
    zeros when there are none. ``rel``: box-relative cell coords."""
    big = jnp.int32(1 << 20)
    lo = jnp.min(jnp.where(hi[:, None], rel, big), axis=0) - 1
    hi_ = jnp.max(jnp.where(hi[:, None], rel, -big), axis=0) + 1
    return jnp.maximum(hi_ - lo + 1, 0).astype(jnp.int32)


def build_split_index(pos: jnp.ndarray, cfg: SimConfig, full: DenseDims,
                      da: DenseDims, dw: DenseDims) -> SplitIndex:
    """Rank particles within full-domain cells (the ops/box.py contract),
    then classify: rank < K_a -> box slot, else -> window slot. The
    window origin tracks the overflow cells' minimum corner with a one-
    cell margin, clamped inside the box."""
    n = pos.shape[0]
    c = cell_coords(pos, cfg)
    inb = ((c[:, 0] >= 0) & (c[:, 0] < full.cx)
           & (c[:, 1] >= 0) & (c[:, 1] < full.cy)
           & (c[:, 2] >= 0) & (c[:, 2] < full.cz))
    hi_clip = jnp.array([full.cx - 1, full.cy - 1, full.cz - 1])
    cc = jnp.clip(c, 0, hi_clip)

    cell = (cc[:, 0] * full.cy + cc[:, 1]) * full.cz + cc[:, 2]
    key = jnp.where(inb, cell, full.cx * full.cy * full.cz)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    newrun = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = jnp.zeros((n,), jnp.int32).at[order].set(iota - run_start)

    # box origin / extents (identical to ops/box.py)
    big = jnp.int32(1 << 20)
    cmin = jnp.min(jnp.where(inb[:, None], cc, big), axis=0)
    cmax = jnp.max(jnp.where(inb[:, None], cc, -1), axis=0)
    ext = jnp.maximum(cmax - cmin + 1, 0).astype(jnp.int32)
    bsz = jnp.array([da.cx, da.cy, da.cz], jnp.int32)
    origin = jnp.clip(jnp.minimum(cmin, big - 1).astype(jnp.int32), 0,
                      jnp.array([full.cx - da.cx, full.cy - da.cy,
                                 full.cz - da.cz], jnp.int32))
    rel = cc.astype(jnp.int32) - origin[None, :]
    inbox = inb & (rel >= 0).all(1) & (rel < bsz[None, :]).all(1)

    # class A: first K_a ranks of every box cell
    a_valid = inbox & (rank < da.k)
    gcell_a = (((rel[:, 0] + 1) * da.gy + (rel[:, 1] + 1)) * da.gz
               + (rel[:, 2] + 1))
    slot_a = rank * da.g + gcell_a

    # overflow window: minimum corner of the hi cells - 1 margin
    hi = inbox & (rank >= da.k)
    wlo = jnp.min(jnp.where(hi[:, None], rel, big), axis=0) - 1
    wmax = jnp.max(jnp.where(hi[:, None], rel, -big), axis=0) + 1
    wext = jnp.maximum(wmax - wlo + 1, 0).astype(jnp.int32)
    wsz = jnp.array([dw.cx, dw.cy, dw.cz], jnp.int32)
    start = jnp.clip(jnp.minimum(wlo, big - 1).astype(jnp.int32), 0,
                     bsz - wsz)
    relw = rel - start[None, :]

    # a B particle is safely placed iff on every axis it sits >= 1 cell
    # from the window face, or that face coincides with a box face (no
    # fluid can be beyond a box face without box_overflow); otherwise an
    # A-cell outside the window could neighbor it and silently miss its
    # A<-B term — count those into win_overflow instead
    lo_ok = (relw >= 1) | ((start == 0)[None, :] & (relw == 0))
    hi_ok = ((relw <= (wsz - 2)[None, :])
             | (((start + wsz) == bsz)[None, :]
                & (relw == (wsz - 1)[None, :])))
    in_w = hi & (relw >= 0).all(1) & (relw < wsz[None, :]).all(1) \
        & lo_ok.all(1) & hi_ok.all(1)
    b_valid = in_w & (rank < da.k + dw.k)
    gcell_w = (((relw[:, 0] + 1) * dw.gy + (relw[:, 1] + 1)) * dw.gz
               + (relw[:, 2] + 1))
    slot_b = da.k * da.g + (rank - da.k) * dw.g + gcell_w

    total = da.k * da.g + dw.k * dw.g
    slots = jnp.where(a_valid, slot_a,
                      jnp.where(b_valid, slot_b, total)).astype(jnp.int32)
    valid = a_valid | b_valid

    box_overflow = jnp.sum(inb & ~inbox).astype(jnp.int32)
    win_overflow = jnp.sum(hi & ~in_w).astype(jnp.int32)
    overflow = jnp.sum(in_w & (rank >= da.k + dw.k)).astype(jnp.int32)
    max_occ = (jnp.max(jnp.where(inb, rank, -1)) + 1).astype(jnp.int32)
    return SplitIndex(slots=slots, valid=valid, origin=origin, start=start,
                      ext=ext, wext=wext, overflow=overflow,
                      box_overflow=box_overflow, win_overflow=win_overflow,
                      max_occupancy=max_occ)


def fill_split(idx: SplitIndex, fields: Sequence[jnp.ndarray],
               fills: Sequence[float], da: DenseDims,
               dw: DenseDims) -> SP:
    """Stack (N,) fields into both tiers with ONE scatter over the
    combined flat slot space (A slots then B slots; disjoint targets)."""
    f = len(fields)
    na, nb = da.k * da.g, dw.k * dw.g
    vals = jnp.stack([jnp.asarray(x, F32) for x in fields], 0)
    init = jnp.broadcast_to(jnp.asarray(fills, F32)[:, None],
                            (f, na + nb + 1))
    dense = init.at[:, idx.slots].set(vals, mode="drop")
    return SP(dense[:, :na].reshape(f, da.k, da.g),
              dense[:, na:na + nb].reshape(f, dw.k, dw.g))


def read_split(idx: SplitIndex, sp: SP, fill: float = 0.0) -> jnp.ndarray:
    """Both tiers -> (F, N) per-particle values in ONE gather over the
    concatenated flat space."""
    f = sp.a.shape[0]
    flat = jnp.concatenate([sp.a.reshape(f, -1), sp.b.reshape(f, -1)], 1)
    out = flat[:, jnp.minimum(idx.slots, flat.shape[1] - 1)]
    return jnp.where(idx.valid[None, :], out, fill)


def slice_window(flat: jnp.ndarray, d_from: DenseDims, d_to: DenseDims,
                 start: jnp.ndarray) -> jnp.ndarray:
    """(F, K, G_from) ghosted -> the window's ghosted (F, K, G_to) via one
    dynamic slice of the 5-D view. ``start`` is in core cell coords; the
    window ghost ring at that origin begins at exactly that ghosted
    offset (ring-aligned, like ops/box.slice_boundary_box)."""
    f, k = flat.shape[0], flat.shape[1]
    v5 = flat.reshape(f, k, d_from.gx, d_from.gy, d_from.gz)
    win = jax.lax.dynamic_slice(
        v5, (0, 0, start[0], start[1], start[2]),
        (f, k, d_to.gx, d_to.gy, d_to.gz))
    return win.reshape(f, k, d_to.g)


def add_window(out_a: jnp.ndarray, out_w: jnp.ndarray, da: DenseDims,
               dwa: DenseDims, start: jnp.ndarray) -> jnp.ndarray:
    """Add a window-shaped (n_out, K_a, G_W) result (the A<-B pass) back
    into the box-shaped (n_out, K_a, G_A) result at the window origin."""
    n, k = out_a.shape[0], out_a.shape[1]
    v5 = out_a.reshape(n, k, da.gx, da.gy, da.gz)
    w5 = out_w.reshape(n, k, dwa.gx, dwa.gy, dwa.gz)
    cur = jax.lax.dynamic_slice(
        v5, (0, 0, start[0], start[1], start[2]), w5.shape)
    v5 = jax.lax.dynamic_update_slice(
        v5, cur + w5, (0, 0, start[0], start[1], start[2]))
    return v5.reshape(n, k, da.g)
