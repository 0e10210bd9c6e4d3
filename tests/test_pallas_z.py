"""v3 z-split Pallas engine (interpret mode on CPU)."""

import numpy as np
import pytest

import tpufdtd as tf
from tpufdtd.layout import ZSplitLayout
from tpufdtd.stepper import ZSplitEngine, make_engine
from conftest import make_correctness_ic, rel_l2


def test_zsplit_selected_for_aligned_grids(small_grid):
    cfg = tf.SimConfig(backend="pallas")
    m = np.full(small_grid.padded_shape, 1.5, np.float32)
    eng = make_engine(small_grid, cfg, m)
    assert isinstance(eng, ZSplitEngine)
    assert eng.m_val == 1.5  # uniform-m fast path auto-detected


def test_zsplit_layout_roundtrip(small_grid):
    lay = ZSplitLayout(small_grid)
    rng = np.random.default_rng(0)
    a = rng.random(small_grid.padded_shape).astype(np.float32)
    core, zrim = lay.split(a)
    assert core.shape[2] == small_grid.nz
    assert np.array_equal(lay.join(core, zrim), a)


def test_zsplit_matches_truth_50_steps(small_grid):
    up0, uc0, m = make_correctness_ic(small_grid)
    _, uc_t = tf.oracle_run(up0, uc0, m, small_grid, 0.001, 50, dtype=np.float64)
    _, uc = tf.simulate(
        up0, uc0, m, small_grid, tf.SimConfig(dt=0.001, nsteps=50, backend="pallas")
    )
    assert rel_l2(uc, uc_t) < 1e-4


def test_zsplit_ring_rims_cycle(small_grid):
    """Mixed-rim IC: all three levels' rims reproduce the oracle exactly."""
    up0, uc0, m = make_correctness_ic(small_grid)
    ring_t = tf.oracle_run_ring(up0, uc0, m, small_grid, 0.001, 7)
    ring = tf.simulate_ring(
        up0, uc0, m, small_grid, tf.SimConfig(dt=0.001, nsteps=7, backend="pallas")
    )
    h = small_grid.halo
    for mine, truth in zip(ring, ring_t):
        np.testing.assert_array_equal(mine[:h], truth[:h])
        np.testing.assert_array_equal(mine[..., :h], truth[..., :h])
        np.testing.assert_array_equal(mine[:, -h:], truth[:, -h:])
        np.testing.assert_array_equal(mine[..., -h:], truth[..., -h:])


def test_zsplit_rim_injection_persists():
    """Source corner in the z rim: deposits go to the zrim side array and
    persist across steps."""
    g = tf.Grid3D(8, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[3.0, 3.0, -0.5]], np.float32)  # z floor = -1
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
    assert np.abs(ring[1][3 + g.halo, 3 + g.halo, g.halo - 1]) > 0


def test_zsplit_nonuniform_m():
    g = tf.Grid3D(8, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, _ = make_correctness_ic(g)
    rng = np.random.default_rng(1)
    m = (1.0 + rng.random(g.padded_shape)).astype(np.float32)
    cfg = tf.SimConfig(dt=0.0005, nsteps=10, backend="pallas")
    eng = make_engine(g, cfg, m)
    assert isinstance(eng, ZSplitEngine) and eng.m_val is None
    _, uc_t = tf.oracle_run(up0, uc0, m, g, 0.0005, 10, dtype=np.float64)
    _, uc = tf.simulate(up0, uc0, m, g, cfg)
    assert rel_l2(uc, uc_t) < 1e-4


def test_zsplit_forced_general_path(small_grid):
    """assume_uniform_m=False forces the m-streaming kernel even when m is
    uniform; results must agree with the fast path."""
    up0, uc0, m = make_correctness_ic(small_grid)
    cfg_f = tf.SimConfig(dt=0.001, nsteps=10, backend="pallas", assume_uniform_m=False)
    cfg_u = tf.SimConfig(dt=0.001, nsteps=10, backend="pallas", assume_uniform_m=True)
    _, uc_f = tf.simulate(up0, uc0, m, small_grid, cfg_f)
    _, uc_u = tf.simulate(up0, uc0, m, small_grid, cfg_u)
    scale = np.abs(uc_u).max()
    assert np.abs(uc_f.astype(np.float64) - uc_u.astype(np.float64)).max() < 1e-5 * scale


def test_odd_ny_falls_back_to_v2():
    g = tf.Grid3D(8, 13, 10, hx=1.0, hy=1.0, hz=1.0)
    cfg = tf.SimConfig(backend="pallas")
    m = np.full(g.padded_shape, 1.5, np.float32)
    eng = make_engine(g, cfg, m)
    from tpufdtd.stepper import PallasV2Engine

    assert isinstance(eng, PallasV2Engine)
    up0, uc0, _ = make_correctness_ic(g)
    _, uc_t = tf.oracle_run(up0, uc0, m, g, 0.001, 6, dtype=np.float64)
    _, uc = tf.simulate(up0, uc0, m, g, tf.SimConfig(dt=0.001, nsteps=6, backend="pallas"))
    assert rel_l2(uc, uc_t) < 1e-4


def test_fast_ring_matches_exact_ring():
    """Identical-rim ICs: 2-buffer in-place ring == 3-buffer exact ring."""
    g = tf.Grid3D(16, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    m = np.full(shape, 1.5, np.float32)
    rng = np.random.default_rng(3)
    uc0 = rng.standard_normal(shape).astype(np.float32)
    up0 = uc0 * np.float32(1.01)
    # make rims identical across levels
    h = g.halo
    for sl in ((slice(0, h),), (slice(None), slice(0, h)),
               (Ellipsis, slice(0, h)), (slice(-h, None),),
               (slice(None), slice(-h, None)), (Ellipsis, slice(-h, None))):
        up0[sl] = uc0[sl]
    src = tf.ricker_table(9, 1, 0.001)
    coords = tf.default_source_coords(1, g.nx, g.ny, g.nz, h=1.0)

    def run_with(cfg):
        sim = tf.Simulator(g, cfg, m, coords)
        st = sim.prepare_state(up0, uc0)
        st = sim.run(st, src)
        return sim, sim.extract_state(st)

    cfg_exact = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas", ring="exact")
    _, (P_e, C_e, _t) = run_with(cfg_exact)

    # unfused fast ring: bit-identical to the exact ring
    cfg_f1 = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas", ring="fast", t_fuse=1)
    sim1, (P_1, C_1) = run_with(cfg_f1)
    np.testing.assert_array_equal(C_1, C_e)
    np.testing.assert_array_equal(P_1, P_e)

    # fused pairs: equal up to fp rounding (different association order +
    # linear-superposition source correction)
    cfg_f2 = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas", ring="fast", t_fuse=2)
    sim2, (P_2, C_2) = run_with(cfg_f2)
    assert sim2.engine.t_fuse == 2
    scale = np.abs(C_e).max()
    assert np.abs(C_2 - C_e).max() < 1e-5 * scale
    assert np.abs(P_2 - P_e).max() < 1e-5 * scale


def test_fast_ring_auto_falls_back_on_mixed_rims(small_grid):
    """The reference correctness IC has mixed rims -> auto uses exact ring."""
    up0, uc0, m = make_correctness_ic(small_grid)
    cfg = tf.SimConfig(dt=0.001, nsteps=5, backend="pallas", ring="auto")
    sim = tf.Simulator(small_grid, cfg, m)
    st = sim.prepare_state(up0, uc0)
    assert not isinstance(st, dict)  # exact 3-level state


def test_fused_multi_span_odd_warmup():
    """Two consecutive run() spans with an odd first span (the warmup/timed
    split of the benchmark): arrangement bookkeeping across spans must hold
    for any span parity combination."""
    g = tf.Grid3D(16, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    m = np.full(shape, 1.5, np.float32)
    u0 = np.zeros(shape, np.float32)
    nsteps = 12
    src = tf.ricker_table(nsteps, 1, 0.001)
    coords = tf.default_source_coords(1, g.nx, g.ny, g.nz, h=1.0)
    ring_t = tf.oracle_run_ring(u0, u0, m, g, 0.001, nsteps, src=src,
                                src_coords=coords, dtype=np.float64)
    for w in (1, 2, 3, 5):
        cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas",
                           ring="fast", t_fuse=2)
        sim = tf.Simulator(g, cfg, m, coords)
        assert sim.engine.t_fuse == 2
        st = sim.prepare_state(u0, u0)
        st = sim.run(st, src[:w], w)
        st = sim.run(st, src[w:], nsteps - w)
        P, C = sim.extract_state(st)
        assert rel_l2(C, ring_t[1]) < 1e-4, w
        assert rel_l2(P, ring_t[0]) < 1e-4, w
