"""Probe XLA temp-memory allocation for 1M-box traversals.

If the compiled temp size is ~pair-block-sized (K^2 * W * 4B = ~130 MB+),
the executor is materialising pair blocks in HBM at the 1M scale —
the smoking gun for the 24/79 ms (density / 3-output) traversal costs.
Usage: python exp/mem_probe.py [box=60]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp

F32 = jnp.float32


def main():
    bx_n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    k, kb = 12, 6
    cfg, _ = cfp.scaled_dam_scene(1_000_000, mode="parity")
    cfg = cfg.replace(max_per_cell=k)
    bdims = dn.DenseDims(bx_n, bx_n, bx_n, k)
    bdims_b = dn.DenseDims(bx_n, bx_n, bx_n, kb)
    print(f"box={bx_n}^3 g={bdims.g} w={bdims.g - 2 * bdims.flat_p} "
          f"K={k} pair_block_MB={k * k * bdims.g * 4 / 1e6:.0f}")

    fl = jnp.zeros((5, k, bdims.g), F32)
    bd = jnp.zeros((4, kb, bdims_b.g), F32)

    def probe(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        m = c.memory_analysis()
        print(f"{name}: temp={m.temp_size_in_bytes/1e6:.0f} MB "
              f"args={m.argument_size_in_bytes/1e6:.0f} MB "
              f"out={m.output_size_in_bytes/1e6:.0f} MB", flush=True)

    probe("density     ",
          lambda a, b: pp.density_pass(a[:4], b, None, bdims, bdims_b, cfg,
                                       engine="xla"), fl, bd)
    probe("density nobd",
          lambda a: pp.density_pass(a[:4], None, None, bdims, None, cfg,
                                    engine="xla"), fl)
    probe("stiff_accel ",
          lambda a, b: pp.stiffness_accel_pass(a, b, None, bdims, bdims_b,
                                               cfg, engine="xla"), fl, bd)


if __name__ == "__main__":
    main()
