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

    def __init__(
        self,
        solver: str = "pbd",  # reference default (src/main.cpp:73)
        cfg: Optional[SimConfig] = None,
        fluid_pos: Optional[np.ndarray] = None,
        boundary_pos: Optional[np.ndarray] = None,
        warmup: bool = True,
        donate: bool = True,
        nan_rollback: bool = False,
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
        cfg_ = self.cfg

        # NOTE: scene is a jit *argument*, not a closure constant — XLA
        # (notably on CPU) constant-folds gathers over embedded index arrays
        # extremely slowly at compile time.
        if engine == "reference":
            self.scene = common.build_scene(self.cfg, boundary_pos)
            self._n_boundary = int(self.scene.b_pos.shape[0])
            solver_step = self._solver.step

            def _step(state, carry, scene, dt):
                return solver_step(state, carry, scene, cfg_, dt)
        else:
            from .models import dense_step
            from .ops import dense as _dense
            from .state import boundary_positions as _bpos

            b_pos = boundary_pos if boundary_pos is not None \
                else _bpos(self.cfg)
            kb = dense_step.boundary_k(b_pos, self.cfg)
            self._n_boundary = int(np.asarray(b_pos).shape[0])
            exec_engine = "xla" if engine == "dense" else engine
            self.scene = dense_step.build_dense_scene(
                self.cfg, b_pos, kb, engine=exec_engine)
            dims = _dense.dims_for(self.cfg)
            dims_b = _dense.dims_for(self.cfg, kb)
            dense_solver_step = dense_step.DENSE_STEPS[self.solver_name]

            def _step(state, carry, scene, dt):
                return dense_solver_step(state, carry, scene, cfg_, dt,
                                         dims, dims_b, engine=exec_engine)

        donate_args = (0, 1) if donate else ()
        self._raw_step = _step
        self._jit_step = jax.jit(_step, donate_argnums=donate_args)
        self._multi_cache: Dict[int, Any] = {}
        self._fetch_ms: Optional[float] = None

        if warmup:
            # the reference's constructor runs one warm-up step to fill
            # density etc. (src/SPHSystem.cu:76); it also triggers
            # compilation here.
            self.step()
            self.frame = 0
            self.total_ms = 0.0

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

    def step(self, dt: Optional[float] = None) -> float:
        """Advance one frame; returns wall milliseconds (device-synced),
        like SPHSystem::step (src/SPHSystem.cu:129-158)."""
        dt = self.cfg.dt if dt is None else dt
        fetch_ms = self._fetch_baseline_ms()
        if self.nan_rollback:
            # donation would invalidate the rollback copy
            backup = (jax.tree_util.tree_map(jnp.copy, self.state),
                      jax.tree_util.tree_map(jnp.copy, self.carry))
        t0 = time.perf_counter()
        state, carry, metrics = self._jit_step(
            self.state, self.carry, self.scene, jnp.float32(dt)
        )
        # force completion with a 1-element host fetch (block_until_ready
        # does not block through the axon relay), then subtract the
        # measured dispatch+fetch round trip
        _ = np.asarray(state.pos[:1, :1])
        ms = max((time.perf_counter() - t0) * 1e3 - fetch_ms, 0.0)
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
        if n_steps not in self._multi_cache:
            raw = self._raw_step

            def multi(state, carry, scene, dtv):
                def body(c, _):
                    st, ca, m = raw(c[0], c[1], scene, dtv)
                    return (st, ca), m

                (st, ca), ms = jax.lax.scan(body, (state, carry), None,
                                            length=n_steps)
                last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                return st, ca, last

            self._multi_cache[n_steps] = jax.jit(multi,
                                                 donate_argnums=(0, 1))
        t0 = time.perf_counter()
        st, ca, m = self._multi_cache[n_steps](
            self.state, self.carry, self.scene, jnp.float32(dt))
        _ = np.asarray(st.pos)  # force completion (host fetch)
        ms_total = (time.perf_counter() - t0) * 1e3
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
