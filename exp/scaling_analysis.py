"""Multi-chip scaling analysis on the virtual 8-device mesh.

Compiles the sharded 1M-configuration DFSPH/WCSPH step over an 8-device
mesh (CPU backend, ``--xla_force_host_platform_device_count``), parses the
compiled HLO for collective ops and their operand shapes, and derives the
compute/communication split that bounds expected v5e-8 efficiency — the
written scaling estimate in SCALING.md. Run:

    python exp/scaling_analysis.py [n_particles]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys


def _child():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import cpp_fluid_particles_tpu as cfp
    from cpp_fluid_particles_tpu import parallel

    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cfg, pos = cfp.scaled_dam_scene(n_target, mode="parity")
    mesh = parallel.make_mesh(8)

    for solver in ("wcsph", "dfsph"):
        sim = cfp.Simulation(solver=solver, cfg=cfg, fluid_pos=pos,
                             warmup=False, mesh=mesh)
        # lower + compile ONE step (no execution — 1M on CPU x8 is slow)
        with sim._mesh_ctx():
            lowered = sim._jit_step.lower(sim.state, sim.carry, sim.scene,
                                          jnp.float32(cfg.dt))
            compiled = lowered.compile()
        txt = compiled.as_text()
        report(solver, txt, sim, cfg)


DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
               "s64": 8, "u8": 1, "bf16": 2}


def _shape_bytes(shape_str):
    """'f32[4,18,21000]{...}' -> payload bytes."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def report(solver, txt, sim, cfg):
    import numpy as np

    ops = {}
    bytes_by_kind = {}
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([\w\[\],{}\s]+?) "
                     r"(collective-permute|all-reduce|all-gather|"
                     r"all-to-all|reduce-scatter)", ls)
        if not m:
            continue
        out_shape, kind = m.groups()
        ops[kind] = ops.get(kind, 0) + 1
        # sum payload of all result shapes (tuples appear as (a, b, ...))
        total = sum(_shape_bytes(s) for s in
                    re.findall(r"\w+\[[\d,]*\]", out_shape))
        bytes_by_kind[kind] = bytes_by_kind.get(kind, 0) + total

    n = sim.state.n
    k = sim.max_per_cell
    cx, cy, cz = cfg.cell_size
    g = (cx + 2) * (cy + 2) * (cz + 2)
    print(f"\n== {solver} @ {n} particles, K={k}, grid {cx}x{cy}x{cz} "
          f"(ghosted flat {g}) ==")
    total_bytes = 0
    for kind in sorted(ops):
        mb = bytes_by_kind[kind] / 1e6
        total_bytes += bytes_by_kind[kind]
        print(f"  {kind:20s} x{ops[kind]:4d}   {mb:10.2f} MB result payload")
    print(f"  TOTAL collective payload per step: {total_bytes/1e6:.1f} MB")

    # per-chip compute lower bound from the pair-math model (bench.py):
    # ~50 flops/pair, sym executor evaluates each fluid block pair once
    occ = n / max(1, (cx * cy * cz) / 4)  # rough: fluid fills ~1/4 domain
    print(f"  (measured 1-chip DFSPH @1M: ~780 ms/step; v5e ICI "
          f"~4x45 GB/s links -> {total_bytes/1e6:.0f} MB / 8 chips "
          f"/ 45 GB/s ~ {total_bytes/8/45e9*1e3:.2f} ms/step comm)")


if __name__ == "__main__":
    if os.environ.get("_CFP_SCALE_CHILD") != "1":
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8")
        env["JAX_PLATFORMS"] = "cpu"
        env["_CFP_SCALE_CHILD"] = "1"
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env).returncode)
    _child()
