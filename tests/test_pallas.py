"""Pallas kernel differential tests (interpret mode on CPU; the same kernel
compiles with Mosaic on TPU — SURVEY.md §4 TPU translation note)."""

import numpy as np
import pytest

import jax.numpy as jnp

import tpufdtd as tf
from tpufdtd.layout import Layout
from tpufdtd.ops import stencil_pallas
from conftest import make_correctness_ic, rel_l2


def _run_pallas(grid, up0, uc0, m, nsteps, bx=None, by=None):
    """Step the kernel directly in the TPU layout; returns reference-layout
    (u_{N-1}, u_N)."""
    lay = Layout.tpu(grid)
    if bx is None:
        bx, by = stencil_pallas.choose_tiling(grid, lay)
    P = jnp.asarray(lay.embed(up0))
    C = jnp.asarray(lay.embed(uc0))
    T = jnp.asarray(lay.embed(uc0))
    mj = jnp.asarray(lay.embed(m))
    for _ in range(nsteps):
        un = stencil_pallas.leapfrog_step_pallas(
            C, P, mj, T, grid=grid, dt=0.001, bx=bx, by=by, interpret=True
        )
        P, C, T = C, un, P
    return lay.extract(np.asarray(P)), lay.extract(np.asarray(C))


def test_pallas_matches_truth(small_grid):
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc_t = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 10, dtype=np.float64)
    _, uc = _run_pallas(small_grid, up0, uc0, m, 10)
    assert rel_l2(uc, uc_t) < 1e-4


def test_pallas_single_step_close_to_jnp(small_grid):
    """One step: pallas and jnp differ only by FMA-contraction-level noise."""
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc_p = _run_pallas(small_grid, up0, uc0, m, 1)
    _, uc_j = tf.simulate(
        up0, uc0, m, small_grid, tf.SimConfig(dt=0.001, nsteps=1, backend="jnp")
    )
    scale = np.abs(uc_j).max()
    assert np.abs(uc_p - np.asarray(uc_j)).max() < 1e-5 * scale


def test_pallas_y_tiled_matches_truth():
    """y-tiled mode (by < ny) against the f64 truth + rim preservation."""
    g = tf.Grid3D(8, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, m = make_correctness_ic(g)
    # 6 steps: two full ring rotations, so u_N lands back in the buffer that
    # started as u_cur (rim = uc0's rim)
    _, uc_t = tf.oracle_run(up0, uc0, m, g, 0.001, 6, dtype=np.float64)
    _, uc = _run_pallas(g, up0, uc0, m, 6, bx=4, by=8)
    assert rel_l2(uc, uc_t) < 1e-4
    h = g.halo
    assert np.array_equal(uc[..., :h], uc0[..., :h])
    assert np.array_equal(uc[..., -h:], uc0[..., -h:])
    assert np.array_equal(uc[:, :h], uc0[:, :h])
    assert np.array_equal(uc[:h], uc0[:h])


def test_pallas_odd_ny_y_full_mode():
    g = tf.Grid3D(12, 13, 10, hx=1.0, hy=1.0, hz=1.0)
    bx, by = stencil_pallas.choose_tiling(g)
    assert by == 13  # y-full mode
    up0, uc0, m = make_correctness_ic(g)
    _, uc_t = tf.oracle_run(up0, uc0, m, g, 0.001, 6, dtype=np.float64)
    _, uc = _run_pallas(g, up0, uc0, m, 6, bx=bx, by=by)
    assert rel_l2(uc, uc_t) < 1e-4


def test_pallas_ring_rims_cycle_exactly(small_grid):
    """Mixed-rim IC (the reference correctness setup): pallas reproduces the
    oracle's per-ring-level rim cycling bit-for-bit on the rims."""
    up0, uc0, m = make_correctness_ic(small_grid)
    ring_t = tf.oracle_run_ring(up0, uc0, m, small_grid, 0.001, 7)
    lay = Layout.tpu(small_grid)
    bx, by = stencil_pallas.choose_tiling(small_grid, lay)
    P, C, T = (
        jnp.asarray(lay.embed(up0)),
        jnp.asarray(lay.embed(uc0)),
        jnp.asarray(lay.embed(uc0)),
    )
    mj = jnp.asarray(lay.embed(m))
    for _ in range(7):
        un = stencil_pallas.leapfrog_step_pallas(
            C, P, mj, T, grid=small_grid, dt=0.001, bx=bx, by=by, interpret=True
        )
        P, C, T = C, un, P
    h = small_grid.halo
    for mine, truth in zip((P, C, T), ring_t):
        mine = lay.extract(np.asarray(mine))
        # rims identical (frozen per buffer)
        np.testing.assert_array_equal(mine[:h], truth[:h])
        np.testing.assert_array_equal(mine[..., :h], truth[..., :h])
        np.testing.assert_array_equal(mine[:, -h:], truth[:, -h:])


def test_pallas_source_injection_into_rim_persists():
    """A source corner one cell outside the interior lands in the rim
    (cuda.cu:155-156); the deposit must persist, not be wiped by the rim
    restore."""
    g = tf.Grid3D(8, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[3.0, 3.0, -0.5]], np.float32)  # z floor = -1 (rim)
    m = np.full(g.padded_shape, 1.0, np.float32)
    src = np.ones((6, 1), np.float32)
    u0 = np.zeros(g.padded_shape, np.float32)
    ring_t = tf.oracle_run_ring(u0, u0, m, g, 0.001, 6, src=src, src_coords=coords)
    ring = tf.simulate_ring(
        u0, u0, m, g, tf.SimConfig(dt=0.001, nsteps=6, backend="pallas"),
        src=src, src_coords=coords,
    )
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth.astype(np.float64)) < 1e-4
    # the rim cell (z = halo-1) actually received deposits
    assert np.abs(ring[1][3 + g.halo, 3 + g.halo, g.halo - 1]) > 0


def test_pallas_through_simulator(small_grid):
    """The 'pallas' backend threads through Simulator/scan end-to-end."""
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc_t = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 10, dtype=np.float64)
    _, uc = tf.simulate(
        up0, uc0, m, small_grid, tf.SimConfig(dt=0.001, nsteps=10, backend="pallas")
    )
    assert rel_l2(uc, uc_t) < 1e-4


def test_choose_tiling_divides():
    for n in (32, 64, 96, 128, 192, 256, 384, 512):
        g = tf.Grid3D(n, n, n)
        lay = Layout.tpu(g)
        bx, by = stencil_pallas.choose_tiling(g, lay)
        assert n % bx == 0 and n % by == 0
        assert (
            stencil_pallas.block_vmem_bytes(bx, by, g, lay)
            <= stencil_pallas.DEFAULT_VMEM_BUDGET
        )


def test_layout_embed_extract_roundtrip(small_grid):
    lay = Layout.tpu(small_grid)
    rng = np.random.default_rng(1)
    a = rng.random(small_grid.padded_shape).astype(np.float32)
    assert np.array_equal(lay.extract(lay.embed(a)), a)
    assert lay.padded_shape[1] == small_grid.ny + 16  # y pads widened to 8
    assert lay.padded_shape[0] == small_grid.nx + 8
