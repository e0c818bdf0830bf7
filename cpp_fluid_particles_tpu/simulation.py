"""Simulation orchestrator — the SPHSystem equivalent.

TPU-native re-design of src/SPHSystem.{h,cu}: owns the scene (boundary grid
+ Akinci masses), the fluid state, the solver carry, and a single jitted
step function per (solver, config). Where the reference launches ~10-60 CUDA
kernels + thrust calls per frame with a host sync (src/SPHSystem.cu:129-158),
here the entire frame — neighbor build, solver iteration loops, integration —
is ONE compiled XLA program.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig, dam_break_config
from .models import common, dfsph, pbd, wcsph
from .parallel import mesh as _meshmod
from .state import FluidState, dam_break_positions, make_fluid_state

SOLVERS = {
    "wcsph": wcsph,
    "dfsph": dfsph,
    "pbd": pbd,
}
# key-1/2/3 aliases from the reference UI (src/main.cpp:69-71,223-239)
SOLVER_ALIASES = {"sph": "wcsph", "1": "wcsph", "2": "dfsph", "3": "pbd"}


def resolve_solver(name: str) -> str:
    name = name.lower()
    return SOLVER_ALIASES.get(name, name)


class Simulation:
    """Owns state + compiled step; mirrors SPHSystem's public surface
    (src/SPHSystem.h:42-61): step() -> ms, size(), fluid/boundary accessors.
    """

    # Adaptive per-cell capacity: the slot bound K is a static shape on a
    # fixed-shape machine, and pair cost scales with K^2 — so K tracks the
    # measured max cell occupancy. A step reporting overflow (a cell
    # holding more fluid than K — the reference's dynamic cellStart ranges
    # never drop, src/SPHSystem.cu:114-127) is re-run from the pre-step
    # state at an occupancy-fitted K; calm stretches shift K back down
    # (with hysteresis) to reclaim the (K_fit/K)^2 pair-cost factor.
    K_MAX = 128
    K_HEADROOM = 1.1      # downshift target: ceil(occ * headroom) to mult 2
    DOWN_VOTES = 2        # consecutive calm checks before a downshift

    def __init__(
        self,
        solver: str = "pbd",  # reference default (src/main.cpp:73)
        cfg: Optional[SimConfig] = None,
        fluid_pos: Optional[np.ndarray] = None,
        boundary_pos: Optional[np.ndarray] = None,
        warmup: bool = True,
        donate: bool = True,
        nan_rollback: bool = False,
        auto_capacity: bool = True,
        mesh: Optional[Any] = None,
    ):
        # multi-chip: pass a jax.sharding.Mesh (or construct the Simulation
        # inside a parallel.spatial_sharding(mesh) context — the ambient
        # mesh is adopted). Every trace/compile then runs under the mesh:
        # the cell grid is x-slab-sharded (stencil slices become ICI halo
        # exchanges) and the (N,) particle state is sharded along N.
        self.mesh = mesh if mesh is not None else _meshmod.current_mesh()
        # failure detection/recovery (SURVEY.md §5 — absent in the
        # reference): when enabled, a step producing non-finite state is
        # rolled back and raises FloatingPointError
        self.nan_rollback = nan_rollback
        self.cfg = cfg if cfg is not None else dam_break_config()
        self.solver_name = resolve_solver(solver)
        if self.solver_name not in SOLVERS:
            raise ValueError(
                f"unknown solver {solver!r}; choose from {sorted(SOLVERS)}"
            )
        self._solver = SOLVERS[self.solver_name]

        if fluid_pos is None:
            fluid_pos = dam_break_positions(self.cfg)
        self.state = make_fluid_state(np.asarray(fluid_pos), self.cfg)
        self.carry = self._solver.init_carry(self.state)
        if self.mesh is not None:
            # place the (N,) state sharded along N from the start — device
            # memory scales 1/devices instead of starting replicated (the
            # step's internal shard_particles constraints keep it that way)
            from jax.sharding import NamedSharding, PartitionSpec
            nd = int(np.prod(list(self.mesh.shape.values())))
            if self.state.n % nd == 0:
                npart = NamedSharding(
                    self.mesh, PartitionSpec(tuple(self.mesh.axis_names)))

                def _put(a):
                    return (jax.device_put(a, npart)
                            if getattr(a, "ndim", 0) >= 1 else a)

                self.state = jax.tree_util.tree_map(_put, self.state)
                self.carry = jax.tree_util.tree_map(_put, self.carry)
        self.metrics: Dict[str, Any] = {}
        self.frame = 0
        self.total_ms = 0.0

        engine = self.cfg.engine
        if engine == "auto":
            engine = "dense"
        valid = ("dense", "xlab", "xla", "xla27", "pallas", "interpret",
                 "reference")
        if engine not in valid:
            raise ValueError(
                f"unknown engine {engine!r}; choose from {valid}")
        if (self.cfg.pbd_rebin_moving and solver == "pbd"
                and engine != "reference"):
            # the mid-projection re-bin (src/PBDSolver.cu:154-156) exists
            # only in the oracle engine's particle-major traversal; fail
            # loudly rather than silently ignore the fidelity flag
            raise ValueError(
                "pbd_rebin_moving requires engine='reference' "
                "(oracle-only fidelity mode)")
        if (self.cfg.pbd_warm_start > 0.0 and solver == "pbd"
                and self.cfg.pbd_density_tolerance <= 0.0):
            # a different projection start changes parity-mode
            # trajectories without saving any of its fixed iterations
            raise ValueError(
                "pbd_warm_start requires pbd_density_tolerance > 0 "
                "(the parity contract is a fixed iteration count)")
        # Under a mesh the DEFAULT engine stays the sliding box ('xlab'):
        # with the executors' stencil slices at static offsets (unrolled
        # when a mesh is active, ops/pallas_passes.py), GSPMD partitions
        # the box's flat cell axis into x-slabs and the offset slices
        # lower to nearest-neighbor collective-permute halos — verified
        # bitwise-equal to the single-device run (tests/test_parallel.py)
        # — while keeping the box's empty-cell trim (~4.6x fewer pass
        # cells than the full domain at the 1M scale, exp/scaling_analysis).
        self.engine = engine
        self._donate = donate
        # no-drop guarantee: only the dense engines can swap K cheaply
        self.auto_capacity = auto_capacity and engine != "reference"
        self.max_per_cell = self.cfg.max_per_cell
        if self.auto_capacity:
            # fit K to the initial scene right away (occupancy is exact
            # here; a wrong guess costs a full compile + retry — at the
            # 1M scale the lattice aliases to 27/cell and the default 16
            # would fail its first step)
            self.max_per_cell = self._fit_k(
                self._initial_occupancy(), self.K_HEADROOM)
        self.box: Optional[Tuple[int, int, int]] = None  # xlab box size
        self.retries = 0      # capacity-overflow re-runs (bench cleanliness)
        self.dropped_frames = 0  # frames committed WITH particle drops
        #                          (capacity exhausted — see step())
        self._down_votes = 0
        # boundary-skip program selection (cfg.skip_empty_boundary): while
        # the box's boundary window is empty every boundary fold is exactly
        # zero, so a boundary-free step program matches up to f32
        # summation order (see config.py) while skipping the boundary
        # share of each traversal. use_bd=False is
        # only ever COMMITTED when the on-device bd_touch detector stayed 0
        # for the whole chunk; a violating chunk is re-run with the
        # boundary program from the pre-chunk state (same retry contract
        # as the capacity bounds — exactness does not depend on the
        # switching heuristic).
        self.use_bd = True
        self._bd_votes = 0
        self._bd_skippable = (self.cfg.skip_empty_boundary
                              and self.auto_capacity
                              and engine in ("dense", "xlab"))
        # occupancy-class split program selection (cfg.occupancy_split,
        # ops/split.py): while the splash escalates K, a two-tier program
        # (box truncated to split_k_a rows + an overflow window) replaces
        # the K^2 traversal; the window size is a third adaptive capacity
        # axis under the same no-drop retry contract. Selected per chunk
        # from measured occupancy + over-K_a cell extents with hysteresis
        # (like use_bd); any window-overflowing chunk is re-run from the
        # pre-chunk state with a refitted window (or the plain program).
        self.split_on = False
        self.wbox: Optional[Tuple[int, int, int]] = None
        self.split_chunks = 0   # run_scan chunks executed split (telemetry)
        self._split_votes = 0
        self._split_capable = (self.cfg.occupancy_split
                               and self.auto_capacity
                               and engine in ("dense", "xlab")
                               and self.solver_name in ("wcsph", "pbd")
                               and self.mesh is None)
        self._boundary_pos_arg = boundary_pos
        # restart() re-invokes __init__ with these (keys 1/2/3 rebuild the
        # same scene, src/main.cpp:223-239 — including a custom one)
        self._ctor_args = dict(
            fluid_pos=None if fluid_pos is None else np.asarray(fluid_pos),
            boundary_pos=boundary_pos, warmup=warmup, donate=donate,
            auto_capacity=auto_capacity, mesh=self.mesh)
        self._fetch_ms: Optional[float] = None
        self._build_step()

        if warmup:
            # the reference's constructor runs one warm-up step to fill
            # density etc. (src/SPHSystem.cu:76); it also triggers
            # compilation here.
            self.step()
            self.frame = 0
            self.total_ms = 0.0

    def _build_step(self) -> None:
        """(Re)bind the jitted step for the current capacity config.

        Compiled steps are CACHED per (max_per_cell, box) — the adaptive
        capacity machinery switches configs many times over a run (splash
        escalates, settling shrinks), and each jax.jit of a fresh closure
        would recompile; revisiting a config this way costs nothing."""
        if self.box is None and self.engine in ("dense", "xlab"):
            self.box = self._initial_box(self.cfg)
        # solver_name is part of the key: restart() re-__init__s the SAME
        # object (keys 1/2/3 switch solvers), so the cache outlives a
        # solver change and must not serve another solver's compiled step.
        # CHUNK_BIAS is part of the key: the compile-crash retry bumps it
        # to get a DIFFERENT program for the same (K, box).
        from .ops import pallas_passes as _pp
        key = (self.solver_name, self.engine, self.max_per_cell, self.box,
               _pp.CHUNK_BIAS, self.use_bd, self.split_on, self.wbox)
        cache = getattr(self, "_step_cache", None)
        if cache is None:
            cache = self._step_cache = {}
        hit = cache.get(key)
        if hit is not None:
            self._raw_step, self._jit_step, self._multi_cache = hit
            self.build_id = getattr(self, "build_id", 0) + 1
            return
        self._build_step_uncached()
        cache[key] = (self._raw_step, self._jit_step, self._multi_cache)

    def _mesh_ctx(self):
        """Context under which every trace/compile/execute runs — the
        spatial-sharding mesh when multi-chip, else a no-op."""
        if self.mesh is None:
            return contextlib.nullcontext()
        return _meshmod.spatial_sharding(self.mesh,
                                         halo=self.cfg.halo_comm)

    def _build_step_uncached(self) -> None:
        engine = self.engine
        cfg_ = self.cfg.replace(max_per_cell=self.max_per_cell)
        boundary_pos = self._boundary_pos_arg

        # NOTE: scene is a jit *argument*, not a closure constant — XLA
        # (notably on CPU) constant-folds gathers over embedded index arrays
        # extremely slowly at compile time.
        if engine == "reference":
            self.scene = common.build_scene(cfg_, boundary_pos)
            self._n_boundary = int(self.scene.b_pos.shape[0])
            solver_step = self._solver.step

            def _step(state, carry, scene, dt):
                return solver_step(state, carry, scene, cfg_, dt)
        else:
            from .models import dense_step
            from .ops import dense as _dense
            from .state import boundary_positions as _bpos

            b_pos = boundary_pos if boundary_pos is not None \
                else _bpos(cfg_)
            kb = dense_step.boundary_k(b_pos, cfg_)
            self._n_boundary = int(np.asarray(b_pos).shape[0])
            # 'dense' resolves to the sliding-box executor (ops/box.py):
            # the lane-major flat passes run over the fluid's cell-space
            # bounding box (static size, dynamic position) instead of the
            # whole domain — fastest measured on this runtime.
            exec_engine = "xlab" if engine == "dense" else engine
            # the boundary-side scene tensors depend only on kb, not on
            # the fluid K — rebuilds on a K bump reuse them
            # built OUTSIDE the mesh context: eager sharding constraints
            # reject non-divisible axes; the jitted step's internal
            # constraints shard the scene at trace time instead
            if not hasattr(self, "scene"):
                self.scene = dense_step.build_dense_scene(
                    cfg_, b_pos, kb, engine=exec_engine)
            dims = _dense.dims_for(cfg_)
            dims_b = _dense.dims_for(cfg_, kb)
            dense_solver_step = dense_step.DENSE_STEPS[self.solver_name]
            if exec_engine == "xlab" and self.box is None:
                self.box = self._initial_box(cfg_)
            box = self.box if exec_engine == "xlab" else None

            use_bd = self.use_bd

            if self.split_on:
                from .models import split_step
                assert exec_engine == "xlab" and self.wbox is not None \
                    and self.max_per_cell > cfg_.split_k_a
                split_fn = split_step.SPLIT_STEPS[self.solver_name]
                wbox, k_a = self.wbox, cfg_.split_k_a

                def _step(state, carry, scene, dt):
                    return split_fn(state, carry, scene, cfg_, dt,
                                    dims, dims_b, box=box, wbox=wbox,
                                    k_a=k_a, use_bd=use_bd)
            else:
                def _step(state, carry, scene, dt):
                    return dense_solver_step(
                        state, carry, scene, cfg_, dt, dims, dims_b,
                        engine=exec_engine, box=box, use_bd=use_bd)

        donate_args = (0, 1) if self._donate else ()
        self._raw_step = _step
        self._jit_step = jax.jit(_step, donate_argnums=donate_args)
        self._multi_cache: Dict[int, Any] = {}
        # monotone id of the compiled-step generation: bumps/downshifts
        # rebuild the jitted step, so anything caching against it (e.g.
        # bench.py's clean-chunk detection) keys on this
        self.build_id = getattr(self, "build_id", 0) + 1

    def _initial_occupancy(self) -> int:
        """Max cell occupancy of the initial particle layout (host-side)."""
        pos = np.asarray(self.state.pos)
        cfg_ = self.cfg
        cx, cy, cz = cfg_.cell_size
        c = (pos / cfg_.cell_length).astype(np.int64)
        ok = ((c >= 0).all(1) & (c[:, 0] < cx) & (c[:, 1] < cy)
              & (c[:, 2] < cz))
        c = c[ok]
        flat = (c[:, 0] * cy + c[:, 1]) * cz + c[:, 2]
        return int(np.bincount(flat).max()) if flat.size else 1

    def _fit_box(self, ext, cfg_=None) -> Tuple[int, int, int]:
        """Box size from measured cell extents: headroom on each axis
        (room to slosh without a refit; additive beyond 32 cells — a
        large box's 25% multiplicative slack costs real pass time while
        the fluid can only move a few cells per chunk), rounded up to
        multiples of 4, capped at the domain."""
        cfg_ = cfg_ or self.cfg
        out = []
        for e, c in zip(ext, cfg_.cell_size):
            e = max(int(e), 4)
            e = int(min(min(e * 1.25, e + 8.0) + 2, c))
            out.append(int(min(c, int(np.ceil(e / 4)) * 4)))
        return tuple(out)

    def _initial_box(self, cfg_) -> Tuple[int, int, int]:
        """Initial box from the initial particle layout (host-side)."""
        pos = np.asarray(self.state.pos)
        cx, cy, cz = cfg_.cell_size
        c = (pos / cfg_.cell_length).astype(np.int64)
        ok = ((c >= 0).all(1) & (c[:, 0] < cx) & (c[:, 1] < cy)
              & (c[:, 2] < cz))
        c = c[ok]
        if not c.size:
            return self._fit_box((4, 4, 4), cfg_)
        ext = c.max(0) - c.min(0) + 1
        return self._fit_box(ext, cfg_)

    @staticmethod
    def _fit_k(occ: int, headroom: float) -> int:
        return max(8, int(np.ceil(occ * headroom / 2)) * 2)

    def _fit_wbox(self, wext) -> Tuple[int, int, int]:
        """Overflow-window size from the measured over-K_a extents
        (which already carry a one-cell margin per side): +4 slosh
        headroom (the splash front spreads a few cells per 25-frame
        chunk, and a window-overflow retry re-executes the whole chunk —
        headroom is much cheaper than a retry), multiples of 4, capped
        at the box."""
        out = []
        for e, b in zip(wext, self.box):
            e = max(int(e), 4) + 4
            out.append(int(min(b, int(np.ceil(e / 4)) * 4)))
        return tuple(out)

    def _grow_window(self, wext) -> None:
        """A split chunk reported window overflow: refit the window to
        the measured extents (never shrinking, +4 minimum growth); if it
        cannot grow further, fall back to the plain program — either way
        the retry cannot drop particles."""
        fit = self._fit_wbox(wext)
        new = tuple(min(b, max(f, w + 8))
                    for f, w, b in zip(fit, self.wbox, self.box))
        if new == self.wbox:
            self.split_on = False
        else:
            self.wbox = new
        self._split_votes = 0
        self._build_step()

    def _bump_capacity(self, reason: str = "k", occ: int = 0,
                       ext=None) -> bool:
        """Escalate a capacity bound; False if maxed. reason: 'k' =
        per-cell slots (max_per_cell), 'box' = the sliding-box size.
        occ/ext: the failed step's measured occupancy / extents — the
        retry jumps straight to a fitted bound."""
        if reason == "box":
            if self.box is None:
                return False
            fit = self._fit_box(ext) if ext is not None else None
            new = tuple(max(b + 4, f) if f else b + 4
                        for b, f in zip(self.box,
                                        fit or (0, 0, 0)))
            new = tuple(min(n, c) for n, c in zip(new, self.cfg.cell_size))
            if new == self.box:
                return False
            self.box = new
        else:
            if self.max_per_cell >= self.K_MAX:
                return False
            fit = self._fit_k(occ, self.K_HEADROOM) if occ > 0 else 0
            self.max_per_cell = int(min(
                self.K_MAX, max(fit, self.max_per_cell + 2)))
        self._down_votes = 0
        self._build_step()
        return True

    def _maybe_downshift(self, occ: int, ext=None, bd_t: int = 1,
                         wext=(0, 0, 0)) -> None:
        """Shift K / the box back down after sustained calm (occupancy or
        extents well under the current bound) — reclaims the pair-cost
        factor once a splash has settled. Also votes the boundary-skip
        program in after consecutive boundary-free chunks
        (cfg.skip_empty_boundary; switching back ON is not a vote — any
        violating chunk is re-run immediately, see step()), and the
        occupancy-split program in/out from the measured over-K_a cell
        extents (cfg.occupancy_split)."""
        if self._bd_skippable and self.use_bd:
            if bd_t == 0:
                self._bd_votes += 1
                if self._bd_votes >= self.DOWN_VOTES:
                    self.use_bd = False
                    self._bd_votes = 0
                    self._build_step()
            else:
                self._bd_votes = 0
        if not self.auto_capacity or occ <= 0:
            return
        fit_k = self._fit_k(occ, self.K_HEADROOM)
        want_k = fit_k <= self.max_per_cell - 2
        want_box = False
        fit_box = None
        if self.box is not None and ext is not None and min(ext) > 0:
            fit_box = self._fit_box(ext)
            shrink = sum(b - f for b, f in zip(self.box, fit_box))
            want_box = shrink >= 8
        if want_k or want_box:
            self._down_votes += 1
            if self._down_votes >= self.DOWN_VOTES:
                if want_k:
                    self.max_per_cell = fit_k
                    if self.split_on \
                            and self.max_per_cell <= self.cfg.split_k_a:
                        # class B would be empty (or ill-formed): the
                        # plain program at the shrunk K is the right one
                        self.split_on = False
                        self._split_votes = 0
                if want_box:
                    self.box = fit_box
                    if self.split_on:
                        # keep the window inside the shrunk box
                        self.wbox = tuple(
                            min(w, b) for w, b in zip(self.wbox, self.box))
                self._down_votes = 0
                self._build_step()
        else:
            self._down_votes = 0
        self._maybe_switch_split(occ, wext)

    SPLIT_SAFETY = 0.6   # engage only below this fraction of the pair-
    #                      slot break-even (covers fill/read overhead,
    #                      fixed window-pass costs, and retry risk)

    def _split_break_even(self) -> float:
        """Window/box volume fraction at which the split's pair-slot
        rows equal the plain program's (fluid folds; the boundary folds
        it also shrinks push the true break-even higher):

          plain: 13 K^2 B   vs   split: 13 K_a^2 B
                 + W (13 k_b^2  [BB]  + 54 K_a k_b  [B<-A + A<-B])
        """
        k = self.max_per_cell
        ka = self.cfg.split_k_a
        kb = k - ka
        if kb <= 0:
            return 0.0
        return (13.0 * (k * k - ka * ka)
                / (13.0 * kb * kb + 54.0 * ka * kb))

    def _maybe_switch_split(self, occ: int, wext) -> None:
        """Occupancy-split program selection (cfg.occupancy_split):
        engage the two-tier program while cells exceed K_a AND the
        fitted window stays under SPLIT_SAFETY x the pair-slot
        break-even fraction (a window covering most of the box pays the
        split's extra window folds for no K_a^2 saving — pre-impact, the
        resting dam block exceeds K_a everywhere and correctly stays
        plain; the settling pool's broad shallow overflow also stays
        plain). Hysteresis (DOWN_VOTES consecutive chunks) like the
        boundary-skip program; window refits on activation, growth
        happens through the retry contract (_grow_window), shrink
        through the calm-shrink vote below."""
        if not self._split_capable or self.box is None:
            return
        k_a = self.cfg.split_k_a
        has_hi = min(wext) > 0
        frac = (float(np.prod(self._fit_wbox(wext)))
                / float(np.prod(self.box)) if has_hi else 0.0)
        want = (has_hi and occ >= k_a + 2 and self.max_per_cell > k_a
                and frac <= self.SPLIT_SAFETY * self._split_break_even())
        shrink_wbox = None
        if want and self.split_on:
            # sustained calm: refit a much-too-large window downward
            fit = self._fit_wbox(wext)
            if sum(w - f for w, f in zip(self.wbox, fit)) >= 8:
                shrink_wbox = fit
        if want != self.split_on or shrink_wbox is not None:
            self._split_votes += 1
            if self._split_votes >= self.DOWN_VOTES:
                if want and not self.split_on:
                    self.wbox = self._fit_wbox(wext)
                elif shrink_wbox is not None:
                    self.wbox = shrink_wbox
                self.split_on = want
                self._split_votes = 0
                self._build_step()
        else:
            self._split_votes = 0

    # ------------------------------------------------------------------
    @property
    def config_key(self):
        """Current capacity + program configuration — step programs are
        compiled and cached per key (bench.py keys chunk cleanliness on
        this, so every program-selection axis must appear)."""
        return (self.engine, self.max_per_cell, self.box, self.use_bd,
                self.split_on, self.wbox)

    @property
    def fluid_size(self) -> int:
        return self.state.n

    @property
    def boundary_size(self) -> int:
        return self._n_boundary

    @property
    def size(self) -> int:
        return self.fluid_size + self.boundary_size

    # ------------------------------------------------------------------
    def _fetch_baseline_ms(self) -> float:
        """Measured dispatch+host-fetch round trip for a trivial program —
        subtracted from single-step timings so they reflect device time.
        (On the axon-tunneled TPU runtime ``jax.block_until_ready`` does
        not block; the only honest sync is a host fetch, whose round-trip
        latency must not be billed to the solver.)"""
        if self._fetch_ms is None:
            ident = jax.jit(lambda v: v + 1.0)
            x = jnp.zeros((4,), jnp.float32)
            _ = np.asarray(ident(x))  # compile
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                _ = np.asarray(ident(x))
            self._fetch_ms = (time.perf_counter() - t0) * 1e3 / reps
        return self._fetch_ms

    def _backup(self):
        # donation invalidates the inputs; retries/rollbacks need copies
        return (jax.tree_util.tree_map(jnp.copy, self.state),
                jax.tree_util.tree_map(jnp.copy, self.carry))

    @staticmethod
    def _overflows(metrics):
        """-> (k_overflow, box_overflow, max_occupancy, ext, bd_touch,
        win_overflow, win_ext) from ONE host fetch of the packed capacity
        vector. bd_touch defaults to 1 ("boundary present") and the
        window fields to 0 for engines without the detectors. win_ext is
        the over-K_a cell extents (+margin): the split program's adaptive
        window axis, and the plain program's split-activation signal."""
        if "capacity" in metrics:
            v = [int(x) for x in np.asarray(metrics["capacity"])]
            bd_t = v[6] if len(v) > 6 else 1
            ov_w = v[7] if len(v) > 7 else 0
            wext = tuple(v[8:11]) if len(v) > 10 else (0, 0, 0)
            return v[0], v[1], v[2], tuple(v[3:6]), bd_t, ov_w, wext
        ov_k = int(np.asarray(metrics["grid_overflow"]))
        ov_b = int(np.asarray(metrics.get("box_overflow", 0)))
        occ = int(np.asarray(metrics.get("max_occupancy", 0)))
        return ov_k, ov_b, occ, (0, 0, 0), 1, 0, (0, 0, 0)

    def _call_compiled(self, fn, *args):
        """Invoke a compiled step, retrying at perturbed capacity configs
        if XLA's backend compiler crashes on this exact shape.

        Observed in the wild (v5e): the TPU compile helper can hit an
        internal memory-space-assignment CHECK failure for specific
        (K, box) shape combinations and abort — the shape is legal, the
        compiler just dies on it. Since the adaptive capacity machinery
        explores shapes, treat a compile crash like an overflow: bump K to
        the next rung (different shapes) and retry a bounded number of
        times instead of killing the simulation."""
        for attempt in range(3):
            try:
                with self._mesh_ctx():
                    # the mesh context must span the first invocation of a
                    # jitted step: constrain_axis/shard_particles read the
                    # ambient mesh at TRACE time
                    return fn()(self.state, self.carry, self.scene, *args)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                # narrow match: only compile-time backend crashes trigger
                # the K-bump retry — a bare INTERNAL can also be a genuine
                # runtime fault (device OOM, data-dependent abort) that a
                # capacity perturbation must not mask
                compile_crash = ("remote_compile" in msg or (
                    "INTERNAL" in msg and any(
                        t in msg for t in ("compile", "Compile",
                                           "memory_space_assignment",
                                           "memory space assignment"))))
                if (not compile_crash or not self.auto_capacity
                        or attempt == 2):
                    raise
                import warnings
                from .ops import pallas_passes as _pp
                w = self._chunk_w()
                if _pp._auto_nchunk(self.max_per_cell, w) > 1:
                    # chunked regime: a different slab split is a
                    # different program shape at identical cost — try
                    # that before paying for a K bump
                    _pp.CHUNK_BIAS += 1
                    warnings.warn(
                        f"XLA backend compiler crashed on config "
                        f"{self.config_key}; retrying with chunk bias "
                        f"+{_pp.CHUNK_BIAS} ({type(e).__name__}: "
                        f"{msg.splitlines()[0][:120]})")
                elif self.max_per_cell + 2 <= self.K_MAX:
                    warnings.warn(
                        f"XLA backend compiler crashed on config "
                        f"{self.config_key}; retrying at K+2 "
                        f"({type(e).__name__}: {msg.splitlines()[0][:120]})")
                    self.max_per_cell += 2
                else:
                    raise
                self._build_step()

    def _chunk_w(self) -> int:
        """Interior flat-cell-axis width of the active grid (the chunked
        executor's slab axis) for the current config."""
        from .ops.dense import DenseDims
        if self.engine == "xlab" and self.box is not None:
            d = DenseDims(self.box[0], self.box[1], self.box[2],
                          self.max_per_cell)
        else:
            cx, cy, cz = self.cfg.cell_size
            d = DenseDims(cx, cy, cz, self.max_per_cell)
        return d.g - 2 * d.flat_p

    def _warn_dropping(self, n_frames: int, ov_k: int, ov_b: int,
                       occ: int) -> None:
        """Capacity cannot be raised further and a particle-dropping result
        is being committed — violate the no-drop contract LOUDLY (the
        reference's dynamic cellStart ranges never drop,
        src/SPHSystem.cu:114-127). ``dropped_frames`` is the machine-readable
        counter (asserted zero in the soak test)."""
        import warnings
        self.dropped_frames += n_frames
        warnings.warn(
            f"capacity exhausted at config {self.config_key} "
            f"(K_MAX={self.K_MAX}, occupancy {occ}, k_overflow {ov_k}, "
            f"box_overflow {ov_b}): committing {n_frames} frame(s) WITH "
            f"dropped particles — results are no longer drop-free "
            f"(dropped_frames={self.dropped_frames})",
            RuntimeWarning, stacklevel=3)

    def _run_step_once(self, dt, fetch_ms):
        t0 = time.perf_counter()
        state, carry, metrics = self._call_compiled(
            lambda: self._jit_step, jnp.float32(dt))
        # force completion with a scalar host fetch (block_until_ready
        # does not block through the axon relay), then subtract the
        # measured dispatch+fetch round trip; the overflow counters double
        # as the sync values for the auto-capacity check
        ov = self._overflows(metrics)
        ms = max((time.perf_counter() - t0) * 1e3 - fetch_ms, 0.0)
        return state, carry, metrics, ov, ms

    def step(self, dt: Optional[float] = None) -> float:
        """Advance one frame; returns wall milliseconds (device-synced),
        like SPHSystem::step (src/SPHSystem.cu:129-158). With
        ``auto_capacity`` (default), a frame whose grid build would drop
        particles (cell occupancy beyond max_per_cell) is re-run from the
        pre-frame state at the next capacity rung — the no-drop guarantee
        the reference gets from dynamic cellStart ranges
        (src/SPHSystem.cu:114-127)."""
        dt = self.cfg.dt if dt is None else dt
        fetch_ms = self._fetch_baseline_ms()
        need_backup = self.nan_rollback or self.auto_capacity
        backup = self._backup() if need_backup else None
        state, carry, metrics, \
            (ov_k, ov_b, occ, ext, bd_t, ov_w, wext), ms = \
            self._run_step_once(dt, fetch_ms)
        while self.auto_capacity and (ov_k > 0 or ov_b > 0 or ov_w > 0
                                      or (not self.use_bd and bd_t > 0)):
            # restore FIRST: the failed call donated the old state buffers
            # and the rebuild may inspect self.state (the commit below the
            # loop re-assigns the kept result either way)
            self.state, self.carry = backup
            if not self.use_bd and bd_t > 0:
                # the boundary window reached a wall while running the
                # boundary-free program: re-run with boundary folds on
                self.use_bd = True
                self._bd_votes = 0
                self._build_step()
            elif ov_k > 0 or ov_b > 0:
                if not self._bump_capacity("box" if ov_b > 0 else "k",
                                           occ=occ, ext=ext):
                    # capacity exhausted: the kept result DROPS particles
                    # — the no-drop contract is broken, so fail loudly
                    self._warn_dropping(1, ov_k, ov_b, occ)
                    break
            else:
                # split-program window overflow: refit or fall back
                self._grow_window(wext)
            self.retries += 1
            backup = self._backup()
            state, carry, metrics, \
                (ov_k, ov_b, occ, ext, bd_t, ov_w, wext), ms = \
                self._run_step_once(dt, fetch_ms)
        if self.nan_rollback:
            from .utils.metrics import nan_guard
            if not bool(nan_guard(state)):
                self.state, self.carry = backup
                raise FloatingPointError(
                    f"non-finite state after frame {self.frame + 1}; "
                    "state rolled back to the last healthy frame"
                )
        self.state, self.carry = state, carry
        self.metrics = metrics
        self.frame += 1
        self.total_ms += ms
        self._maybe_downshift(occ, ext, bd_t, wext)
        return ms

    def run(self, n_steps: int, dt: Optional[float] = None) -> Dict[str, Any]:
        """Run n steps; returns summary statistics."""
        times = [self.step(dt) for _ in range(n_steps)]
        return {
            "frames": n_steps,
            "ms_per_frame": float(np.mean(times)),
            "ms_median": float(np.median(times)),
            "fps": 1e3 / max(float(np.mean(times)), 1e-9),
            "last_metrics": jax.tree_util.tree_map(
                lambda x: (np.asarray(x).item()
                           if np.asarray(x).size == 1
                           else np.asarray(x).tolist()),
                self.metrics,
            ),
        }

    def run_scan(self, n_steps: int, dt: Optional[float] = None) -> float:
        """Advance n steps inside ONE compiled lax.scan call — removes
        per-step host dispatch, giving true device throughput (the timing
        discipline for benchmarks on the tunneled TPU runtime, where
        block_until_ready does not block)."""
        dt = self.cfg.dt if dt is None else dt

        def compiled(n):
            if n not in self._multi_cache:
                raw = self._raw_step

                def multi(state, carry, scene, dtv):
                    def body(c, _):
                        st, ca, m = raw(c[0], c[1], scene, dtv)
                        return (st, ca), m

                    (st, ca), ms = jax.lax.scan(body, (state, carry), None,
                                                length=n)
                    last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                    # overflow anywhere in the chunk must trigger the
                    # auto-capacity retry, not just on the last frame
                    for key in ("grid_overflow", "box_overflow",
                                "max_occupancy", "box_ext", "bd_touch",
                                "win_overflow", "win_ext"):
                        if key in ms:
                            last[key] = jnp.max(ms[key], axis=0)
                    if "capacity" in ms:
                        parts = [jnp.stack([last["grid_overflow"],
                                            last["box_overflow"],
                                            last["max_occupancy"]]),
                                 last["box_ext"],
                                 last["bd_touch"][None]]
                        if "win_overflow" in last:
                            parts += [last["win_overflow"][None],
                                      last["win_ext"]]
                        last["capacity"] = jnp.concatenate(parts)
                    return st, ca, last

                self._multi_cache[n] = jax.jit(multi, donate_argnums=(0, 1))
            return self._multi_cache[n]

        backup = self._backup() if self.auto_capacity else None
        while True:
            t0 = time.perf_counter()
            st, ca, m = self._call_compiled(
                lambda: compiled(n_steps), jnp.float32(dt))
            ov_k, ov_b, occ, ext, bd_t, ov_w, wext = self._overflows(m)
            ms_total = (time.perf_counter() - t0) * 1e3
            if not (self.auto_capacity
                    and (ov_k > 0 or ov_b > 0 or ov_w > 0
                         or (not self.use_bd and bd_t > 0))):
                break
            # restore FIRST: the failed call donated the old state buffers
            # and the rebuild may inspect self.state (the commit below the
            # loop re-assigns the kept result either way)
            self.state, self.carry = backup
            if not self.use_bd and bd_t > 0:
                # a frame of this chunk reached a wall under the
                # boundary-free program: re-run with boundary folds on
                self.use_bd = True
                self._bd_votes = 0
                self._build_step()
            elif ov_k > 0 or ov_b > 0:
                if not self._bump_capacity("box" if ov_b > 0 else "k",
                                           occ=occ, ext=ext):
                    self._warn_dropping(n_steps, ov_k, ov_b, occ)
                    break
            else:
                # split-program window overflow: refit or fall back
                self._grow_window(wext)
            self.retries += 1
            backup = self._backup()
        self.state, self.carry, self.metrics = st, ca, m
        if self.split_on:
            self.split_chunks += 1
        self.frame += n_steps
        self.total_ms += ms_total
        self._maybe_downshift(occ, ext, bd_t, wext)
        return ms_total / n_steps

    # ------------------------------------------------------------------
    def restart(self, solver: Optional[str] = None) -> None:
        """Rebuild fluid + carry from the scene constants, like keys 1/2/3
        (src/main.cpp:223-239). Preserves the constructor's custom scene
        (fluid/boundary positions) and runtime flags."""
        self.__init__(solver=solver or self.solver_name, cfg=self.cfg,
                      nan_rollback=self.nan_rollback, **self._ctor_args)
