"""Tests for the uniform-grid neighbor structure (ops/grid.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cpp_fluid_particles_tpu as cfp
from cpp_fluid_particles_tpu.ops.grid import (
    POS_PAD,
    build_grid,
    compute_cell_ids,
    gather_from_grid,
    scatter_to_grid,
)
from cpp_fluid_particles_tpu.ops.neighbors import PairSource, neighbor_reduce
from cpp_fluid_particles_tpu.ops import kernels as kn

CFG = cfp.dam_break_config(mode="parity", max_active_cells=1024, max_per_cell=16)


def rand_pos(n, seed=0, lo=0.1, hi=0.9):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, size=(n, 3)).astype(np.float32))


def test_cell_ids_match_reference_formula():
    """Flat id ((x*cy)+y)*cz+z with truncation toward zero and the
    out-of-grid sentinel (src/CUDAFunctions.cuh:64-70)."""
    cx, cy, cz = CFG.cell_size
    pos = jnp.array([
        [0.0, 0.0, 0.0],
        [0.05, 0.05, 0.05],
        [0.9999, 0.9999, 0.9999],
        [1.5, 0.5, 0.5],     # out of grid
        [-0.5, 0.5, 0.5],    # negative -> out of grid after trunc
    ], jnp.float32)
    ids = np.asarray(compute_cell_ids(pos, CFG))
    assert ids[0] == 0
    c = int(0.05 / CFG.cell_length)
    assert ids[1] == (c * cy + c) * cz + c
    top = int(0.9999 / CFG.cell_length)
    assert ids[2] == (top * cy + top) * cz + top
    assert ids[3] == CFG.num_cells
    # -0.5/cell_length truncates to -12 -> out of bounds
    assert ids[4] == CFG.num_cells


def test_scatter_gather_roundtrip():
    pos = rand_pos(300, seed=1)
    field = jnp.arange(300, dtype=jnp.float32)
    tables = build_grid(pos, CFG, 1024, 16)
    grid = scatter_to_grid(tables, field, 1024, 16)
    back = gather_from_grid(tables, grid)
    assert int(tables.overflow) == 0
    np.testing.assert_array_equal(np.asarray(back), np.asarray(field))


def test_scatter_gather_roundtrip_vector():
    pos = rand_pos(200, seed=2)
    tables = build_grid(pos, CFG, 1024, 16)
    grid = scatter_to_grid(tables, pos, 1024, 16, fill=POS_PAD)
    back = gather_from_grid(tables, grid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pos))


def test_pair_engine_density_matches_brute_force():
    """The 27-stencil engine must find exactly the pairs within the support
    radius — compare total density against an all-pairs O(N^2) sum."""
    import reference_impl as ref
    n = 400
    # cluster particles so cells have multiple occupants
    rng = np.random.default_rng(3)
    pos = rng.uniform(0.3, 0.5, size=(n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, size=(n,)).astype(np.float32)
    posj, massj = jnp.asarray(pos), jnp.asarray(mass)

    tables = build_grid(posj, CFG, 1024, 16)
    assert int(tables.overflow) == 0
    pg = scatter_to_grid(tables, posj, 1024, 16, fill=POS_PAD)
    mg = scatter_to_grid(tables, massj, 1024, 16)

    def dens(i, j, rel, r):
        return {"rho": j["mass"] * kn.w_cubic(r, CFG.radius)}

    acc = neighbor_reduce(
        tables, {"pos": pg},
        [PairSource(tables, {"pos": pg, "mass": mg}, dens)],
        {"rho": jnp.zeros((1024, 16), jnp.float32)},
    )
    got = np.asarray(gather_from_grid(tables, jnp.pad(acc["rho"], ((0, 2), (0, 0)))))
    want = ref.w_cubic(
        np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1), CFG.radius
    ) @ mass
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_overflow_detection():
    """More than max_per_cell particles in one cell must be counted."""
    n = 20
    pos = jnp.tile(jnp.array([[0.5, 0.5, 0.5]], jnp.float32), (n, 1))
    pos = pos + jnp.arange(n, dtype=jnp.float32)[:, None] * 1e-5
    tables = build_grid(pos, CFG, 1024, 8)
    assert int(tables.overflow) == n - 8
    assert int(tables.valid.sum()) == 8


def test_out_of_grid_particles_dropped():
    pos = jnp.array([[0.5, 0.5, 0.5], [2.0, 0.5, 0.5]], jnp.float32)
    tables = build_grid(pos, CFG, 1024, 16)
    v = np.asarray(tables.valid)
    assert v[0] and not v[1]
    assert int(tables.overflow) == 0  # OOB is not "overflow"


def test_neighbor_cells_cover_stencil():
    pos = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
    tables = build_grid(pos, CFG, 1024, 16)
    cx, cy, cz = CFG.cell_size
    c = int(0.5 / CFG.cell_length)
    expected = set()
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                expected.add(((c + dx) * cy + (c + dy)) * cz + (c + dz))
    got = set(np.asarray(tables.neighbor_cells[0]).tolist())
    assert got == expected


def test_boundary_cell_stencil_clips_to_sentinel():
    pos = jnp.array([[0.001, 0.001, 0.001]], jnp.float32)  # corner cell 0
    tables = build_grid(pos, CFG, 1024, 16)
    nc = np.asarray(tables.neighbor_cells[0])
    # 27 offsets, only 8 in-grid for the corner cell
    assert (nc == CFG.num_cells).sum() == 27 - 8


def test_box_gather_fill_bitwise_matches_scatter():
    """fill_box mode='gather' (slot->id scatter + shared-index row take)
    must be bitwise-identical to the scatter fill, including fill values
    in empty slots, per-cell-K overflow drops, and out-of-box particles."""
    from cpp_fluid_particles_tpu.ops import box as bx
    from cpp_fluid_particles_tpu.ops import dense as dn

    dims = dn.dims_for(CFG)
    box = dn.DenseDims(6, 6, 6, 3)  # K=3 forces rank overflow drops
    pos = np.array(rand_pos(500, seed=3, lo=0.05, hi=0.95))
    pos[:5] = [1.5, 0.5, 0.5]   # out of domain -> invalid
    pos[5:15] = [0.06, 0.06, 0.06]  # box-corner cell cluster -> rank >= K=3 drops
    pos = jnp.asarray(pos)
    idx = bx.build_box_index(pos, CFG, dims, box)
    fields = [pos[:, 0], pos[:, 1], pos[:, 2],
              jnp.arange(500, dtype=jnp.float32)]
    fills = [POS_PAD, POS_PAD, POS_PAD, -7.0]
    a = np.asarray(bx.fill_box(idx, fields, fills, box, "scatter"))
    b = np.asarray(bx.fill_box(idx, fields, fills, box, "gather"))
    c = np.asarray(bx.fill_box(idx, fields, fills, box, "auto"))
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    assert int(np.asarray(idx.overflow)) > 0  # the drop case is exercised
