"""The Pallas column-kernel engine under CI test.

``engine='interpret'`` runs the exact pallas_call kernels (occupancy
skipping, BlockSpec pipelining, candidate tensors from build_i/build_j)
through the Pallas interpreter on CPU, pinning the claimed equivalence with
the XLA executors that the TPU fast path depends on. A tiny 7^3-cell domain
keeps interpreter cost bounded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.models import dense_step as D
from cpp_fluid_particles_tpu.models import dfsph, pbd
from cpp_fluid_particles_tpu.ops import dense as dn
from cpp_fluid_particles_tpu.ops import pallas_passes as pp
from cpp_fluid_particles_tpu.state import boundary_positions, make_fluid_state

TINY_CFG = cfp.dam_break_config(
    mode="parity",
    space_size=(0.28, 0.28, 0.28),
    max_active_cells=512,
    max_per_cell=16,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TINY_CFG
    bpos = boundary_positions(cfg)
    kb = D.boundary_k(bpos, cfg)
    dims = dn.dims_for(cfg)
    dims_b = dn.dims_for(cfg, kb)
    scenes = {
        eng: D.build_dense_scene(cfg, bpos, kb, engine=eng)
        for eng in ("xla", "interpret")
    }

    rng = np.random.default_rng(11)
    s = cfg.spacing
    pos = np.array(
        [(0.08 + s * i, 0.01 + s * j, 0.08 + s * k)
         for i in range(5) for j in range(5) for k in range(5)], np.float32)
    pos += rng.uniform(-0.002, 0.002, pos.shape).astype(np.float32)
    n = pos.shape[0]
    idx = dn.build_dense_index(jnp.asarray(pos), cfg, dims)
    assert int(idx.overflow) == 0

    fields = {
        "mass": np.full((n,), cfg.m0, np.float32),
        "vel": rng.normal(0, 0.3, (n, 3)).astype(np.float32),
        "rho": (1.0 + rng.uniform(0, 0.2, n)).astype(np.float32),
        "p": rng.uniform(0, 2.0, n).astype(np.float32),
        "cg": rng.normal(0, 5.0, (n, 3)).astype(np.float32),
        "stiff": rng.normal(0, 1e-4, n).astype(np.float32),
    }
    f = fields
    dense = dn.fill_dense(
        idx,
        [pos[:, 0], pos[:, 1], pos[:, 2], f["mass"],
         f["vel"][:, 0], f["vel"][:, 1], f["vel"][:, 2],
         f["rho"], f["p"], f["cg"][:, 0], f["cg"][:, 1], f["cg"][:, 2],
         f["stiff"]],
        [dn.POS_PAD] * 3 + [0.0] * 10,
        dims,
    )
    return dict(cfg=cfg, dims=dims, dims_b=dims_b, scenes=scenes, idx=idx,
                dense=dense, pos=pos)


# rows of the stacked dense tensor built in setup()
POS3, MASS, VEL3 = slice(0, 3), slice(3, 4), slice(4, 7)
RHO, P, CG3, STIFF = slice(7, 8), slice(8, 9), slice(9, 12), slice(12, 13)


def _rows(dense, *slices):
    return jnp.concatenate([dense[s] for s in slices], 0)


PASSES = [
    ("density", pp.density_pass, (POS3, MASS), True),
    ("pressure_force", pp.pressure_force_pass, (POS3, MASS, RHO, P), True),
    ("viscosity", pp.viscosity_pass, (POS3, MASS, VEL3), False),
    ("xsph", pp.xsph_pass, (POS3, MASS, VEL3), False),
    ("color_gradient", pp.color_gradient_pass, (POS3, MASS), True),
    ("surface", pp.surface_pass, (POS3, MASS, CG3), False),
    ("density_alpha", pp.density_alpha_pass, (POS3, MASS), True),
    ("divergence", pp.divergence_pass, (POS3, MASS, VEL3), True),
    ("stiffness_accel", pp.stiffness_accel_pass, (POS3, MASS, STIFF), True),
    ("pbd_lambda", pp.pbd_lambda_pass, (POS3, MASS), True),
    ("density_colorgrad", pp.density_colorgrad_pass, (POS3, MASS), True),
    ("density_colorgrad_visc", pp.density_colorgrad_visc_pass,
     (POS3, MASS, VEL3), True),
    ("density_visc", pp.density_visc_pass, (POS3, MASS, VEL3), True),
    ("surface_pressure", pp.surface_pressure_pass,
     (POS3, MASS, RHO, P, CG3), True),
    ("xsph_colorgrad", pp.xsph_colorgrad_pass, (POS3, MASS, VEL3), True),
    ("density_alpha_colorgrad", pp.density_alpha_colorgrad_pass,
     (POS3, MASS), True),
]


@pytest.mark.parametrize("name,fn,rows,has_bd",
                         PASSES, ids=[p[0] for p in PASSES])
def test_pass_interpret_matches_xla(setup, name, fn, rows, has_bd):
    s = setup
    cfg, dims, dims_b = s["cfg"], s["dims"], s["dims_b"]
    fl = _rows(s["dense"], *rows)
    colc = s["idx"].col_count
    outs = {}
    for eng in ("xla", "interpret"):
        sc = s["scenes"][eng]
        bd = sc.bd if eng == "xla" else sc.bd_jcols
        if has_bd:
            outs[eng] = fn(fl, bd, colc, dims, dims_b, cfg, engine=eng)
        else:
            outs[eng] = fn(fl, colc, dims, cfg, engine=eng)
    a = np.asarray(outs["xla"])
    b = np.asarray(outs["interpret"])
    scale = np.abs(a).max() + 1e-12
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5 * scale)


@pytest.mark.parametrize("solver,mod,step_fn", [
    ("wcsph", None, D.wcsph_step),
    ("dfsph", dfsph, D.dfsph_step),
    ("pbd", pbd, D.pbd_step),
])
def test_full_step_interpret_matches_xla(setup, solver, mod, step_fn):
    s = setup
    cfg, dims, dims_b = s["cfg"], s["dims"], s["dims_b"]
    state = make_fluid_state(s["pos"], cfg)
    if mod is None:
        from cpp_fluid_particles_tpu.models import wcsph as mod_
    else:
        mod_ = mod
    carry = mod_.init_carry(state)
    outs = {}
    for eng in ("xla", "interpret"):
        st, ca, m = step_fn(state, carry, s["scenes"][eng], cfg,
                            jnp.float32(cfg.dt), dims, dims_b, engine=eng)
        outs[eng] = (np.asarray(st.pos), np.asarray(st.vel),
                     {k: np.asarray(v) for k, v in m.items()})
    np.testing.assert_allclose(outs["interpret"][0], outs["xla"][0],
                               atol=2e-6)
    np.testing.assert_allclose(outs["interpret"][1], outs["xla"][1],
                               atol=2e-3)
    if solver == "dfsph":
        assert (outs["interpret"][2]["density_iters"]
                == outs["xla"][2]["density_iters"])
