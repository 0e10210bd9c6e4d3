"""Oracle invariants — the checks the reference bakes into its harness
(SURVEY.md §4: zero-field sanity, impulse symmetry, frozen rim)."""

import numpy as np
import pytest

import tpufdtd as tf
from conftest import make_correctness_ic, rel_l2


def test_zero_field_stays_zero(small_grid):
    """No sources + zero IC => field identically zero (main.cpp:481-486)."""
    shape = small_grid.padded_shape
    u0 = np.zeros(shape, np.float32)
    m = np.full(shape, 1.5, np.float32)
    up, uc = tf.oracle_run(u0, u0, m, small_grid, 0.001, 10)
    assert np.all(uc == 0.0) and np.all(up == 0.0)


def test_impulse_symmetry():
    """A centered point impulse with uniform m must stay mirror-symmetric
    about the center plane in every axis (DEBUG.md manual test recipe).
    Odd extents so the impulse sits on an exact lattice center."""
    g = tf.Grid3D(17, 17, 17, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    u_cur = np.zeros(shape, np.float32)
    c = g.halo + g.nx // 2
    u_cur[c, c, c] = 1.0
    u_prev = np.zeros_like(u_cur)
    m = np.full(shape, 1.5, np.float32)
    _, uc = tf.oracle_run(u_prev, u_cur, m, g, 0.001, 8)
    # interior is symmetric under flip about the impulse plane per axis
    h = g.halo
    core = uc[h : h + g.nx, h : h + g.ny, h : h + g.nz]
    for ax in range(3):
        np.testing.assert_array_equal(core, np.flip(core, axis=ax))


def test_frozen_rim(small_grid):
    """Each ring buffer's rim is never written; with all three levels given
    the same IC, every output level keeps that rim exactly."""
    _, uc0, m = make_correctness_ic(small_grid)
    ring = tf.oracle_run_ring(uc0, uc0, m, small_grid, 0.001, 5, u_target=uc0)
    h = small_grid.halo
    for arr in ring:
        assert np.array_equal(arr[:h], uc0[:h])
        assert np.array_equal(arr[-h:], uc0[-h:])
        assert np.array_equal(arr[:, :h], uc0[:, :h])
        assert np.array_equal(arr[..., -h:], uc0[..., -h:])


def test_ring_rims_cycle(small_grid):
    """With the correctness IC (levels 0,1 = val, level 2 = 0) the rims seen
    in the outputs are exactly the per-level initial rims, rotated."""
    up0, uc0, m = make_correctness_ic(small_grid)
    P, C, T = tf.oracle_run_ring(up0, uc0, m, small_grid, 0.001, 3)
    h = small_grid.halo
    # buffers rotate (P,C,T)->(C,un,P); after 3 full rotations each result
    # occupies its original physical buffer: P in P0's (zero rim), C in C0's
    # (val rim), T in T0's (val rim).
    assert np.array_equal(P[:h], up0[:h])
    assert np.array_equal(C[:h], uc0[:h])
    assert np.array_equal(T[:h], uc0[:h])


def test_f32_oracle_close_to_f64_truth(small_grid):
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc32 = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 50)
    _, uc64 = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 50, dtype=np.float64)
    assert rel_l2(uc32, uc64) < 1e-4


@pytest.mark.parametrize("order", [2, 6, 8, 10, 12])
def test_other_orders_run_and_stay_finite(order):
    g = tf.Grid3D(12, 12, 12, hx=1.0, hy=1.0, hz=1.0, order=order)
    up0, uc0, m = make_correctness_ic(g)
    _, uc = tf.oracle_run(up0, uc0, m, g, 0.001, 5)
    assert np.all(np.isfinite(uc))
    assert g.halo == order and g.radius == order // 2


def test_growing_mean_mode(small_grid):
    """With u_prev=0 and u_cur≈100 the DC mode grows ~linearly (u_k ≈ k*u0);
    pins down the reference's leapfrog-from-cold-start semantics."""
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 10)
    h = small_grid.halo
    core = uc[h:-h, h:-h, h:-h]
    assert 900.0 < np.mean(core) < 1300.0
