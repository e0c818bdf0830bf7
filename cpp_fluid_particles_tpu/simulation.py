"""Simulation orchestrator — the SPHSystem equivalent.

TPU-native re-design of src/SPHSystem.{h,cu}: owns the scene (boundary grid
+ Akinci masses), the fluid state, the solver carry, and a single jitted
step function per (solver, config). Where the reference launches ~10-60 CUDA
kernels + thrust calls per frame with a host sync (src/SPHSystem.cu:129-158),
here the entire frame — neighbor build, solver iteration loops, integration —
is ONE compiled XLA program.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig, dam_break_config
from .models import common, dfsph, pbd, wcsph
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

    # K escalation ladder for auto_capacity: the per-cell slot bound is a
    # static shape on a fixed-shape machine; when a step reports overflow
    # (a cell transiently holding more fluid particles than K — the
    # reference's dynamic cellStart ranges never drop, src/SPHSystem.cu:
    # 114-127), the step is re-run from the pre-step state at the next K.
    CAPACITY_LADDER = (16, 24, 32, 48, 64, 96, 128)

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
    ):
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
        self.metrics: Dict[str, Any] = {}
        self.frame = 0
        self.total_ms = 0.0

        engine = self.cfg.engine
        if engine == "auto":
            engine = "dense"
        self.engine = engine
        self._donate = donate
        # no-drop guarantee: only the dense engines can swap K cheaply
        self.auto_capacity = auto_capacity and engine != "reference"
        self.max_per_cell = self.cfg.max_per_cell
        self._boundary_pos_arg = boundary_pos
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
        """(Re)build the jitted step for the current ``max_per_cell``."""
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
            exec_engine = "xla" if engine == "dense" else engine
            # the boundary-side scene tensors depend only on kb, not on
            # the fluid K — rebuilds on a K bump reuse them
            if not hasattr(self, "scene"):
                self.scene = dense_step.build_dense_scene(
                    cfg_, b_pos, kb, engine=exec_engine)
            dims = _dense.dims_for(cfg_)
            dims_b = _dense.dims_for(cfg_, kb)
            dense_solver_step = dense_step.DENSE_STEPS[self.solver_name]

            def _step(state, carry, scene, dt):
                return dense_solver_step(state, carry, scene, cfg_, dt,
                                         dims, dims_b, engine=exec_engine)

        donate_args = (0, 1) if self._donate else ()
        self._raw_step = _step
        self._jit_step = jax.jit(_step, donate_argnums=donate_args)
        self._multi_cache: Dict[int, Any] = {}

    def _bump_capacity(self) -> bool:
        """Escalate max_per_cell to the next ladder rung; False if maxed."""
        ladder = [k for k in self.CAPACITY_LADDER if k > self.max_per_cell]
        if not ladder:
            return False
        self.max_per_cell = ladder[0]
        self._build_step()
        return True

    # ------------------------------------------------------------------
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

    def _run_step_once(self, dt, fetch_ms):
        t0 = time.perf_counter()
        state, carry, metrics = self._jit_step(
            self.state, self.carry, self.scene, jnp.float32(dt)
        )
        # force completion with a scalar host fetch (block_until_ready
        # does not block through the axon relay), then subtract the
        # measured dispatch+fetch round trip; the overflow counter doubles
        # as the sync value for the auto-capacity check
        overflow = int(np.asarray(metrics["grid_overflow"]))
        ms = max((time.perf_counter() - t0) * 1e3 - fetch_ms, 0.0)
        return state, carry, metrics, overflow, ms

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
        state, carry, metrics, overflow, ms = self._run_step_once(dt,
                                                                  fetch_ms)
        while self.auto_capacity and overflow > 0:
            if not self._bump_capacity():
                break  # ladder exhausted; keep the (dropping) result
            self.state, self.carry = backup
            backup = self._backup()
            state, carry, metrics, overflow, ms = self._run_step_once(
                dt, fetch_ms)
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
                lambda x: np.asarray(x).item(), self.metrics
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
                    last["grid_overflow"] = jnp.max(ms["grid_overflow"])
                    return st, ca, last

                self._multi_cache[n] = jax.jit(multi, donate_argnums=(0, 1))
            return self._multi_cache[n]

        backup = self._backup() if self.auto_capacity else None
        while True:
            fn = compiled(n_steps)
            t0 = time.perf_counter()
            st, ca, m = fn(self.state, self.carry, self.scene,
                           jnp.float32(dt))
            overflow = int(np.asarray(m["grid_overflow"]))
            ms_total = (time.perf_counter() - t0) * 1e3
            if not (self.auto_capacity and overflow > 0):
                break
            if not self._bump_capacity():
                break
            self.state, self.carry = backup
            backup = self._backup()
        self.state, self.carry, self.metrics = st, ca, m
        self.frame += n_steps
        self.total_ms += ms_total
        return ms_total / n_steps

    # ------------------------------------------------------------------
    def restart(self, solver: Optional[str] = None) -> None:
        """Rebuild fluid + carry from the scene constants, like keys 1/2/3
        (src/main.cpp:223-239)."""
        self.__init__(solver=solver or self.solver_name, cfg=self.cfg,
                      nan_rollback=self.nan_rollback)
