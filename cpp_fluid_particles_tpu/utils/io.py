"""Checkpoint / resume.

The reference has no save/load at all — keys 1/2/3 rebuild the scene from
constants (src/main.cpp:225-239, SURVEY.md §5). Here the whole simulation
state is one SoA pytree, so checkpointing is a flat npz archive with
deterministic resume.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple

import jax
import numpy as np

from ..config import SimConfig
from ..state import FluidState

_CARRY_KINDS = {"wcsph": 0, "dfsph": 1, "pbd": 2}


def save_checkpoint(path: str, sim) -> None:
    """Persist a Simulation's full dynamic state (scene is rebuilt from cfg
    on load — it is a pure function of the config + boundary layout)."""
    flat_state = {f"state_{k}": np.asarray(v)
                  for k, v in sim.state._asdict().items()}
    carry_leaves = jax.tree_util.tree_leaves(sim.carry)
    flat_carry = {f"carry_{i}": np.asarray(v)
                  for i, v in enumerate(carry_leaves)}
    meta = json.dumps({
        "solver": sim.solver_name,
        "frame": sim.frame,
        "cfg": dataclasses.asdict(sim.cfg),
        "version": 1,
    })
    np.savez_compressed(path, __meta__=np.frombuffer(meta.encode(), np.uint8),
                        **flat_state, **flat_carry)


def load_checkpoint(path: str):
    """Returns a fully reconstructed Simulation."""
    from ..simulation import Simulation, SOLVERS

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        state_kw = {k[len("state_"):]: z[k] for k in z.files
                    if k.startswith("state_")}
        carry_leaves = [z[f"carry_{i}"]
                        for i in range(sum(k.startswith("carry_")
                                           for k in z.files))]

    cfg_d = meta["cfg"]
    for key in ("space_size", "gravity"):
        cfg_d[key] = tuple(cfg_d[key])
    cfg = SimConfig(**cfg_d)
    sim = Simulation(solver=meta["solver"], cfg=cfg,
                     fluid_pos=state_kw["pos"], warmup=False)
    sim.state = FluidState(**{k: jax.numpy.asarray(v)
                              for k, v in state_kw.items()})
    if carry_leaves:
        fresh = jax.tree_util.tree_leaves(sim.carry)
        treedef = jax.tree_util.tree_structure(sim.carry)
        loaded = [jax.numpy.asarray(v) for v in carry_leaves]
        if len(loaded) < len(fresh):
            # forward-compat: a carry that gained leaves since the
            # checkpoint was written (e.g. PBDCarry.dp_warm in round 4)
            # resumes with the new leaves at their init value
            loaded = loaded + [jax.numpy.zeros_like(v)
                               for v in fresh[len(loaded):]]
        sim.carry = jax.tree_util.tree_unflatten(treedef, loaded)
    sim.frame = meta["frame"]
    return sim
