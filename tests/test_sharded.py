"""Sharded (multi-chip) stepper vs single-chip oracle on an 8-device virtual
CPU mesh (SURVEY.md §5: ppermute halo exchange over a 1-D mesh)."""

import numpy as np
import pytest

import jax

# multi-device interpret/compile per test dominates; test_smoke.py keeps a
# fast sharded path in `-m "not slow"`
pytestmark = pytest.mark.slow

import tpufdtd as tf
from tpufdtd.parallel import (
    ShardedSimulator,
    global_from_shards,
    make_mesh,
    shards_from_global,
    simulate_sharded,
)
from conftest import make_correctness_ic, rel_l2


def test_virtual_mesh_available():
    assert jax.device_count() >= 8


def test_shards_roundtrip():
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    rng = np.random.default_rng(0)
    a = rng.random(g.padded_shape).astype(np.float32)
    stacked = shards_from_global(g, 4, a)
    assert np.array_equal(global_from_shards(g, 4, stacked), a)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_matches_oracle(ndev):
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, m = make_correctness_ic(g)
    mesh = make_mesh(ndev)
    cfg = tf.SimConfig(dt=0.001, nsteps=12, backend="jnp")
    ring = simulate_sharded(up0, uc0, m, g, cfg, mesh)
    ring_t = tf.oracle_run_ring(up0, uc0, m, g, 0.001, 12, dtype=np.float64)
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-4


def test_sharded_with_sources_matches_oracle():
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    u0 = np.zeros(shape, np.float32)
    m = np.full(shape, 1.5, np.float32)
    nsteps = 12
    src = tf.ricker_table(nsteps, 3, 0.001)
    coords = tf.default_source_coords(3, g.nx, g.ny, g.nz, h=1.0)
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="jnp")
    ring = simulate_sharded(u0, u0, m, g, cfg, mesh, src=src, src_coords=coords)
    ring_t = tf.oracle_run_ring(
        u0, u0, m, g, 0.001, nsteps, src=src, src_coords=coords, dtype=np.float64
    )
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-4
    assert np.abs(ring[1]).max() > 0


def test_sharded_source_on_shard_boundary():
    """Source straddling a shard cut: corners split across owners."""
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    u0 = np.zeros(shape, np.float32)
    m = np.full(shape, 1.5, np.float32)
    nsteps = 8
    src = np.ones((nsteps, 1), np.float32)
    # with 4 shards of 4 planes each, x=3.5 straddles the cut between
    # shards 0 and 1
    coords = np.array([[3.5, 4.0, 4.0]], np.float32)
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="jnp")
    ring = simulate_sharded(u0, u0, m, g, cfg, mesh, src=src, src_coords=coords)
    ring_t = tf.oracle_run_ring(
        u0, u0, m, g, 0.001, nsteps, src=src, src_coords=coords, dtype=np.float64
    )
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-4


def test_sharded_frozen_global_rim():
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, m = make_correctness_ic(g)
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="jnp")
    ring = simulate_sharded(uc0, uc0, m, g, cfg, mesh)
    h = g.halo
    # after 6 steps (two ring rotations) u_N sits in the u_cur buffer
    uc = ring[1]
    assert np.array_equal(uc[:h], uc0[:h])
    assert np.array_equal(uc[-h:], uc0[-h:])


def test_sharded_long_axis_1024():
    """BASELINE config 5 shape class: a long sharded x axis (1024 planes
    over 8 devices) with thin y/z so it runs on the CPU mesh."""
    g = tf.Grid3D(1024, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    shape = g.padded_shape
    u0 = np.zeros(shape, np.float32)
    m = np.full(shape, 1.5, np.float32)
    src = tf.ricker_table(4, 1, 0.001)
    coords = tf.default_source_coords(1, g.nx, g.ny, g.nz, h=1.0)
    mesh = make_mesh(8)
    cfg = tf.SimConfig(dt=0.001, nsteps=4, backend="jnp")
    ring = simulate_sharded(u0, u0, m, g, cfg, mesh, src=src, src_coords=coords)
    ring_t = tf.oracle_run_ring(u0, u0, m, g, 0.001, 4, src=src,
                                src_coords=coords, dtype=np.float64)
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-4


def test_sharded_pallas_backend_matches_oracle():
    """backend='pallas' swaps the per-shard step for the Pallas leapfrog
    (interpret mode on CPU); halo exchange and ring semantics unchanged."""
    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, m = make_correctness_ic(g)
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=8, backend="pallas")
    ring = simulate_sharded(up0, uc0, m, g, cfg, mesh)
    ring_t = tf.oracle_run_ring(up0, uc0, m, g, 0.001, 8, dtype=np.float64)
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-4


# ---- sharded v5 sweep engine (parallel/sharded_sweep.py) --------------------


def _zero_rim_ic(g, seed=3):
    rng = np.random.default_rng(seed)
    h = g.halo
    out = []
    for _ in range(2):
        a = rng.standard_normal(g.padded_shape).astype(np.float32)
        a[:h] = a[-h:] = 0
        a[:, :h] = a[:, -h:] = 0
        a[..., :h] = a[..., -h:] = 0
        out.append(a)
    return out


def test_sharded_sweep_engages_and_matches_oracle():
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _zero_rim_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas")
    sim = ShardedSimulator(g, cfg, m, mesh)
    assert sim.sweep is not None and sim.sweep.K == 3
    state, m_sh, packed = sim.prepare(up.copy(), uc.copy(), m)
    assert isinstance(state, dict)
    state = sim.run(state, m_sh, packed, None, 9)
    _, C = sim.extract_state(state)
    _, oC = tf.oracle_run(up.copy(), uc.copy(), m, g, 0.001, 9, dtype=np.float64)
    assert rel_l2(C, oC) < 1e-5


def test_sharded_sweep_bitwise_matches_single_chip():
    """The sharded sweep's redundant-margin scheme feeds every plane the
    same f32 inputs as the single-chip sweep, so results are bit-equal."""
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, m = make_correctness_ic(g)
    up0 = uc0.copy()
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas")
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is not None
    st, ms, pk = sim.prepare(up0.copy(), uc0.copy(), m)
    st = sim.run(st, ms, pk, None, 9)
    _, C = sim.extract_state(st)
    s1 = tf.Simulator(g, cfg, m)
    assert s1.engine.sweep_k >= 3  # auto K may exceed the sharded cap of 3;
    # fusing only regroups identical f32 stage arithmetic, so bit-equality
    # holds across depths
    st1 = s1.prepare_state(up0.copy(), uc0.copy())
    st1 = s1.run(st1, None, 9)
    _, C1 = s1.extract_state(st1)
    assert np.array_equal(C, C1)


def test_sharded_sweep_frozen_global_rim_bitexact():
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, m = make_correctness_ic(g)
    up0 = uc0.copy()
    h = g.halo
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas")
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is not None
    st, ms, pk = sim.prepare(up0, uc0, m)
    st = sim.run(st, ms, pk, None, 6)
    _, C = sim.extract_state(st)
    assert np.array_equal(C[:h], uc0[:h])
    assert np.array_equal(C[-h:], uc0[-h:])
    assert np.array_equal(C[:, :h], uc0[:, :h])
    assert np.array_equal(C[..., -h:], uc0[..., -h:])


def test_sharded_sweep_straddling_source_and_remainders():
    """Source whose correction cubes straddle a shard cut, nsteps with both
    a rem=2 block and a rem=1 single step."""
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    u0 = np.zeros(g.padded_shape, np.float32)
    m = np.full(g.padded_shape, 1.5, np.float32)
    coords = np.array([[7.5, 8.0, 8.0], [16.2, 7.7, 9.1]], np.float32)
    for nsteps in (11, 10):  # 3 K=3 blocks + rem 2 / + rem 1
        src = tf.ricker_table(nsteps, 2, 0.001)
        cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
        sim = ShardedSimulator(g, cfg, m, make_mesh(4), src_coords=coords)
        assert sim.sweep is not None
        st, ms, pk = sim.prepare(u0, u0, m)
        st = sim.run(st, ms, pk, src, nsteps)
        P, C = sim.extract_state(st)
        oP, oC = tf.oracle_run(u0, u0, m, g, 0.001, nsteps, src=src,
                               src_coords=coords, dtype=np.float64)
        assert np.abs(C).max() > 0
        assert rel_l2(C, oC) < 1e-5
        assert rel_l2(P, oP) < 1e-5


def test_sharded_sweep_fallback_when_ineligible():
    """nxl < K*R (no room for the deep halo) or non-identical rims fall back
    to the per-step program and still match the oracle."""
    g = tf.Grid3D(8, 8, 8, hx=1.0, hy=1.0, hz=1.0)  # nxl=2 < 2*R*K for any K
    up0, uc0, m = make_correctness_ic(g)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas")
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is None
    # nxl=4 degrades the fusion depth to K=2 rather than falling back
    g1 = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    up1, uc1, m1 = make_correctness_ic(g1)
    sim1 = ShardedSimulator(g1, cfg, m1, make_mesh(4))
    assert sim1.sweep is not None and sim1.sweep.K == 2
    st, ms, pk = sim1.prepare(uc1.copy(), uc1.copy(), m1)
    st = sim1.run(st, ms, pk, None, 6)
    _, C = sim1.extract_state(st)
    _, oC = tf.oracle_run(uc1.copy(), uc1.copy(), m1, g1, 0.001, 6,
                          dtype=np.float64)
    assert rel_l2(C, oC) < 1e-5
    # eligible grid but per-level rims differ -> per-step state at prepare
    g2 = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up2, uc2, m2 = make_correctness_ic(g2)  # up2 rims (zeros) != uc2 rims
    sim2 = ShardedSimulator(g2, cfg, m2, make_mesh(4))
    assert sim2.sweep is not None
    state, _, _ = sim2.prepare(up2, uc2, m2)
    assert not isinstance(state, dict)


def test_sharded_sweep_bf16_matches_single_chip():
    """bf16 storage on the sharded sweep: state is bfloat16 on device, z rim
    stays f32, and results are bit-equal to the single-chip bf16 sweep (the
    redundant-margin scheme feeds identical bf16 inputs to every plane)."""
    import jax.numpy as jnp

    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _zero_rim_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas",
                       storage_dtype="bfloat16")
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is not None and sim.sweep.K == 3
    assert sim.sweep.lay.py == 16
    st, ms, pk = sim.prepare(up.copy(), uc.copy(), m)
    assert isinstance(st, dict)
    U, zrT = st["sweep"]
    assert U.dtype == jnp.bfloat16 and zrT.dtype == jnp.float32
    st = sim.run(st, ms, pk, None, 9)
    _, C = sim.extract_state(st)
    assert C.dtype == np.float32

    import dataclasses
    # pin the single-chip depth to the sharded K: bf16 rounds at fused-block
    # boundaries, so bit-equality needs matching block structure
    s1 = tf.Simulator(g, dataclasses.replace(cfg, t_fuse=3), m)
    assert s1.engine.sweep_k == 3
    st1 = s1.prepare_state(up.copy(), uc.copy())
    st1 = s1.run(st1, None, 9)
    _, C1 = s1.extract_state(st1)
    assert np.array_equal(C, C1)

    _, oC = tf.oracle_run(up.copy(), uc.copy(), m, g, 0.001, 9,
                          dtype=np.float64)
    assert rel_l2(C, oC) < 4e-2  # bf16 storage accuracy class


def test_sharded_bf16_per_step_fallback():
    """bf16 + ineligible sweep (nxl too small): per-step program runs with
    bf16 state and f32 compute, matching the jnp bf16 engine."""
    import jax.numpy as jnp

    g = tf.Grid3D(8, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, m = make_correctness_ic(g)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas",
                       storage_dtype="bfloat16")
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is None
    st, ms, pk = sim.prepare(up0.copy(), uc0.copy(), m)
    assert st[0].dtype == jnp.bfloat16
    st = sim.run(st, ms, pk, None, 6)
    ring = sim.extract_state(st)
    cfg_j = tf.SimConfig(dt=0.001, nsteps=6, backend="jnp",
                         storage_dtype="bfloat16")
    ring_j = tf.simulate_ring(up0.copy(), uc0.copy(), m, g, cfg_j)
    for mine, jref in zip(ring, ring_j):
        assert np.array_equal(mine, np.asarray(jref, np.float32))


def test_sharded_sweep_variable_m_matches_oracle():
    """Heterogeneous medium on the sharded sweep: each shard streams its
    slab of the per-point w scale (margins filled from the real global
    medium by the slab cut), sources included."""
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _zero_rim_ic(g)
    shape = g.padded_shape
    x = np.linspace(0, 1, shape[0])[:, None, None]
    y = np.linspace(0, 1, shape[1])[None, :, None]
    z = np.linspace(0, 1, shape[2])[None, None, :]
    m = (1.6 + 0.4 * np.sin(3 * x) * np.cos(2 * y) * np.sin(4 * z)).astype(
        np.float32
    )
    mesh = make_mesh(4)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas")
    coords = np.array([[20.0, 8.0, 8.0]], np.float32)  # near a shard seam
    src = tf.ricker_table(9, 1, cfg.dt)
    sim = ShardedSimulator(g, cfg, m, mesh, src_coords=coords)
    assert sim.sweep is not None and sim.sweep.m_val is None
    assert sim.sweep.w_sharded is not None
    state, m_sh, packed = sim.prepare(up.copy(), uc.copy(), m)
    state = sim.run(state, m_sh, packed, src, 9)
    _, C = sim.extract_state(state)
    _, oC = tf.oracle_run(up.copy(), uc.copy(), m, g, 0.001, 9,
                          src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(C, oC) < 1e-5, rel_l2(C, oC)


def test_sharded_sweep_variable_m_bitwise_matches_single_chip():
    """Sharded heterogeneous-medium sweep is bit-equal to the single-chip
    variable-m sweep at the same K (same f32 inputs per plane)."""
    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, _ = make_correctness_ic(g)
    up0 = uc0.copy()
    shape = g.padded_shape
    rng = np.random.default_rng(3)
    m = (1.3 + 0.5 * rng.random(shape)).astype(np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas", t_fuse=3)
    sim = ShardedSimulator(g, cfg, m, make_mesh(4))
    assert sim.sweep is not None and sim.sweep.m_val is None
    st, ms, pk = sim.prepare(up0.copy(), uc0.copy(), m)
    st = sim.run(st, ms, pk, None, 9)
    _, C = sim.extract_state(st)
    s1 = tf.Simulator(g, cfg, m)
    assert s1.engine.sweep_k == 3 and s1.engine.m_val is None
    st1 = s1.prepare_state(up0.copy(), uc0.copy())
    st1 = s1.run(st1, None, 9)
    _, C1 = s1.extract_state(st1)
    assert np.array_equal(C, C1)


# ---- 2-D (x, y) mesh -------------------------------------------------------


def test_sharded_sweep_2d_mesh_matches_oracle():
    """4x2 (x, y) mesh: y-split shards exchange K*R rows per block and
    y-edge shards freeze their margin rows in-kernel (frozen_ylo/yhi);
    sources included."""
    g = tf.Grid3D(32, 32, 16, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _zero_rim_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    mesh = make_mesh(shape=(4, 2))
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas")
    coords = np.array([[16.0, 16.0, 8.0]], np.float32)  # near both seams
    src = tf.ricker_table(9, 1, cfg.dt)
    sim = ShardedSimulator(g, cfg, m, mesh, src_coords=coords)
    assert sim.sweep is not None and sim.sweep.ndy == 2
    st, ms, pk = sim.prepare(up.copy(), uc.copy(), m)
    st = sim.run(st, ms, pk, src, 9)
    _, C = sim.extract_state(st)
    _, oC = tf.oracle_run(up.copy(), uc.copy(), m, g, 0.001, 9,
                          src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(C, oC) < 1e-5, rel_l2(C, oC)


def test_sharded_sweep_2d_mesh_bitwise_matches_single_chip():
    """2x4 mesh with a heterogeneous medium is bit-equal to the single-chip
    variable-m sweep at the same K (the margin calculus feeds every plane
    and row the same f32 inputs)."""
    g = tf.Grid3D(32, 32, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, _ = make_correctness_ic(g)
    up0 = uc0.copy()
    rng = np.random.default_rng(1)
    m = (1.3 + 0.5 * rng.random(g.padded_shape)).astype(np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas", t_fuse=3)
    sim = ShardedSimulator(g, cfg, m, make_mesh(shape=(2, 4)))
    assert sim.sweep is not None and sim.sweep.w_sharded is not None
    st, ms, pk = sim.prepare(up0.copy(), uc0.copy(), m)
    st = sim.run(st, ms, pk, None, 9)
    _, C = sim.extract_state(st)
    s1 = tf.Simulator(g, cfg, m)
    st1 = s1.prepare_state(up0.copy(), uc0.copy())
    st1 = s1.run(st1, None, 9)
    _, C1 = s1.extract_state(st1)
    assert np.array_equal(C, C1)


def test_sharded_2d_mesh_requires_sweep():
    """2-D meshes have no per-step fallback: an ineligible configuration
    (order 6 exceeds the sweep's radius-2 design) raises loudly."""
    g = tf.Grid3D(32, 32, 16, hx=1.0, hy=1.0, hz=1.0, order=6)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=4, backend="pallas")
    with pytest.raises(ValueError):
        ShardedSimulator(g, cfg, m, make_mesh(shape=(4, 2)))


# ---- exchange/compute overlap (SURVEY §7 hard parts) -------------------------


def test_sharded_overlap_bitwise():
    """The overlap block (x-interior slab from the pre-exchange array +
    edge slabs after the ppermute, sharded_sweep.kern_overlap) must be
    BITWISE equal to the serial exchange->kern order, sources included."""
    g = tf.Grid3D(96, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, m = make_correctness_ic(g)
    up0 = uc0.copy()
    coords = np.array([[48.3, 8.0, 8.0]], np.float32)
    nsteps = 7  # two K=3 blocks + rem 1
    src = tf.ricker_table(nsteps, 1, 0.001)
    outs = {}
    for ov in ("auto", "off"):
        cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas",
                           overlap=ov)
        sim = ShardedSimulator(g, cfg, m, make_mesh(4), src_coords=coords)
        assert sim.sweep is not None
        if ov == "auto":  # eligibility: nxk - 2E = 32 - 20 >= 8
            assert sim.sweep.lgrid.nx - 2 * (
                2 * sim.sweep.K * sim.sweep.R - sim.sweep.R
            ) >= 8
        st, ms, pk = sim.prepare(up0.copy(), uc0.copy(), m)
        st = sim.run(st, ms, pk, src, nsteps)
        P, C = sim.extract_state(st)
        outs[ov] = (P, C)
    assert np.array_equal(outs["auto"][1], outs["off"][1])
    assert np.array_equal(outs["auto"][0], outs["off"][0])
    _, oC = tf.oracle_run(up0.copy(), uc0.copy(), m, g, 0.001, nsteps,
                          src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(outs["auto"][1], oC) < 1e-5


def test_sharded_overlap_interior_independent_of_exchange(monkeypatch):
    """Structural overlap guarantee: the x-interior slab kernel must not
    consume the x ppermute's result (that independence is what lets XLA
    run the collective under the kernel). Poison every ppermute payload
    with NaNs: the slab's true-region planes must still match the clean
    serial run bit-for-bit, while halo-adjacent planes get poisoned."""
    g = tf.Grid3D(96, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    _, uc0, m = make_correctness_ic(g)
    up0 = uc0.copy()
    h = g.halo

    cfg_off = tf.SimConfig(dt=0.001, nsteps=3, backend="pallas",
                           overlap="off")
    sim0 = ShardedSimulator(g, cfg_off, m, make_mesh(4))
    st, ms, pk = sim0.prepare(up0.copy(), uc0.copy(), m)
    st = sim0.run(st, ms, pk, None, 3)  # one K=3 block
    _, C_clean = sim0.extract_state(st)

    real_ppermute = jax.lax.ppermute

    def poisoned(x, axis_name, perm):
        return real_ppermute(x, axis_name, perm) * np.float32(np.nan)

    cfg_ov = tf.SimConfig(dt=0.001, nsteps=3, backend="pallas",
                          overlap="auto")
    sim1 = ShardedSimulator(g, cfg_ov, m, make_mesh(4))
    K, R, M = sim1.sweep.K, sim1.sweep.R, sim1.sweep.M
    E = 2 * K * R - R
    st, ms, pk = sim1.prepare(up0.copy(), uc0.copy(), m)
    monkeypatch.setattr(jax.lax, "ppermute", poisoned)
    st = sim1.run(st, ms, pk, None, 3)
    monkeypatch.setattr(jax.lax, "ppermute", real_ppermute)
    _, C_pois = sim1.extract_state(st)

    nxl = g.nx // 4
    mid_ok = False
    for i in range(4):
        # shard i's x-interior slab true region, in padded global coords
        lo = h + i * nxl + (E - M)
        hi = h + i * nxl + nxl - (E - M)
        assert np.array_equal(C_pois[lo:hi], C_clean[lo:hi]), i
        mid_ok = True
    assert mid_ok
    # sanity: the poison reached the edge slabs of interior shards
    assert np.isnan(C_pois).any()


def test_sharded_checkpoint_resume_equals_unbroken(tmp_path):
    """Sharded checkpoint/resume (SURVEY §5): gather -> npz -> reshard. A
    run checkpointed mid-stream and resumed on a fresh ShardedSimulator is
    bit-equal to the unbroken run (no sources: f32 per-step math is block-
    structure invariant), and a sourced resume with absolute-step indexing
    stays within fp-association distance of the unbroken run."""
    from tpufdtd.checkpoint import run_sharded_with_checkpoints, resume_sharded

    g = tf.Grid3D(32, 16, 16, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _zero_rim_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=9, backend="pallas")
    mesh = make_mesh(4)

    # unbroken 9-step run
    sim = ShardedSimulator(g, cfg, m, mesh)
    assert sim.sweep is not None
    st, ms, pk = sim.prepare(up.copy(), uc.copy(), m)
    st = sim.run(st, ms, pk, None, 9)
    P0, C0 = sim.extract_state(st)

    # checkpointed at step 5, resumed on a FRESH simulator over the mesh
    path_fmt = str(tmp_path / "ck_{step:06d}.npz")
    sim_a = ShardedSimulator(g, cfg, m, mesh)
    run_sharded_with_checkpoints(
        sim_a, up.copy(), uc.copy(), m, 9,
        checkpoint_every=5, path_fmt=path_fmt,
    )
    P1, C1 = resume_sharded(
        path_fmt.format(step=5), cfg, m, mesh, nsteps_total=9
    )
    assert np.array_equal(C1, C0)
    assert np.array_equal(P1, P0)

    # sourced variant: absolute-step source indexing across the break
    src = tf.ricker_table(9, 1, cfg.dt)
    coords = np.array([[16.0, 8.0, 8.0]], np.float32)
    sim_s = ShardedSimulator(g, cfg, m, mesh, src_coords=coords)
    st, ms, pk = sim_s.prepare(up.copy(), uc.copy(), m)
    st = sim_s.run(st, ms, pk, src, 9)
    _, Cs0 = sim_s.extract_state(st)

    sim_b = ShardedSimulator(g, cfg, m, mesh, src_coords=coords)
    run_sharded_with_checkpoints(
        sim_b, up.copy(), uc.copy(), m, 9, src=src,
        checkpoint_every=5, path_fmt=path_fmt,
    )
    _, Cs1 = resume_sharded(
        path_fmt.format(step=5), cfg, m, mesh, nsteps_total=9,
        src=src, src_coords=coords,
    )
    assert rel_l2(Cs1, Cs0) < 1e-6, rel_l2(Cs1, Cs0)
