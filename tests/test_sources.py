"""Source-injection semantics (openacc.cpp:172-204, cuda.cu:112-170)."""

import numpy as np

import jax.numpy as jnp

import tpufdtd as tf
from tpufdtd.sources import build_source_term, inject


def _grid():
    return tf.Grid3D(8, 8, 8, hx=1.0, hy=1.0, hz=1.0)


def test_on_node_source_hits_one_cell():
    """A source exactly on a lattice node has weight 1 at the floor corner."""
    g = _grid()
    m = np.full(g.padded_shape, 2.0, np.float32)
    coords = np.array([[3.0, 4.0, 5.0]], np.float32)
    term = build_source_term(g, coords, m)
    nz = term.scale != 0.0
    assert nz.sum() == 1
    k = np.argmax(nz)
    assert (term.ix[k], term.iy[k], term.iz[k]) == (3 + g.halo, 4 + g.halo, 5 + g.halo)
    # amplitude = 1e-2 * 1 / m[floor]
    np.testing.assert_allclose(term.scale[k], 0.01 / 2.0, rtol=1e-6)


def test_trilinear_weights_sum_to_one_over_m():
    g = _grid()
    m = np.full(g.padded_shape, 1.5, np.float32)
    coords = np.array([[2.25, 3.5, 4.75]], np.float32)
    term = build_source_term(g, coords, m)
    np.testing.assert_allclose(term.scale.sum(), 0.01 / 1.5, rtol=1e-6)
    assert (term.scale > 0).sum() == 8


def test_out_of_bounds_source_dropped():
    g = _grid()
    m = np.full(g.padded_shape, 1.5, np.float32)
    coords = np.array([[50.0, 50.0, 50.0]], np.float32)  # way outside
    term = build_source_term(g, coords, m)
    assert np.all(term.scale == 0.0)


def test_one_cell_slack_beyond_interior():
    """Corners at interior index -1 or n are allowed (cuda.cu:155-156)."""
    g = _grid()
    m = np.full(g.padded_shape, 1.0, np.float32)
    coords = np.array([[-0.5, 3.0, 3.0]], np.float32)  # x floor = -1
    term = build_source_term(g, coords, m)
    nz = term.scale > 0
    # x corners at -1 and 0 are both valid (weight 0.5 each); y/z sit on
    # exact nodes so their +1 corners get zero weight
    assert nz.sum() == 2
    assert set(term.ix[nz]) == {g.halo - 1, g.halo}
    np.testing.assert_allclose(term.scale[nz], 0.01 * 0.5, rtol=1e-6)


def test_inject_matches_oracle_inject():
    g = _grid()
    m = np.full(g.padded_shape, 1.5, np.float32)
    coords = tf.default_source_coords(5, g.nx, g.ny, g.nz, h=1.0)
    term = build_source_term(g, coords, m)
    src_t = np.linspace(0.5, 1.5, 5).astype(np.float32)
    from tpufdtd.oracle import oracle_inject

    u_np = np.zeros(g.padded_shape, np.float32)
    oracle_inject(u_np, term, src_t)
    u_j = inject(jnp.zeros(g.padded_shape, jnp.float32), term, jnp.asarray(src_t))
    np.testing.assert_allclose(np.asarray(u_j), u_np, atol=1e-7)
    assert np.abs(u_np).sum() > 0


def test_duplicate_corner_accumulation():
    """Two sources at the same node accumulate like atomicAdd."""
    g = _grid()
    m = np.full(g.padded_shape, 1.0, np.float32)
    coords = np.array([[3.0, 3.0, 3.0], [3.0, 3.0, 3.0]], np.float32)
    term = build_source_term(g, coords, m)
    u = inject(
        jnp.zeros(g.padded_shape, jnp.float32), term, jnp.array([1.0, 2.0], jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(u)[3 + g.halo, 3 + g.halo, 3 + g.halo], 0.01 * 3.0, rtol=1e-6
    )


def test_ricker_peak_value():
    """Ricker peaks at value 1.0 where t*dt == 1/f0 (main.cpp:292-298)."""
    w = tf.ricker(200, 0.001, f0=10.0)
    assert abs(w[100] - 1.0) < 1e-6  # t=100 -> t*dt = 0.1 = 1/f0
    assert w.dtype == np.float32
