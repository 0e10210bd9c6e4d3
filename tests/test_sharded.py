"""Sharded (multi-chip) stepper vs single-chip oracle on an 8-device virtual
CPU mesh (SURVEY.md §5: ppermute halo exchange over a 1-D mesh)."""

import numpy as np
import pytest

import jax

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
