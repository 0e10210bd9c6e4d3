"""Fast-subset smoke coverage for the two compile-heavy subsystems whose
full test modules are marked `slow` (test_sweep.py, test_sharded.py): one
sweep-engine run and one sharded run so `pytest -m "not slow"` still
exercises the flagship kernel and the mesh path end-to-end."""

import numpy as np

import tpufdtd as tf
from tpufdtd.oracle import oracle_run
from tpufdtd.stepper import Simulator
from conftest import make_correctness_ic, rel_l2


def test_sweep_engine_smoke():
    """Minimal sweep-engine (v5 manual-DMA) run vs the f64 oracle: one
    small z_embed grid through the Simulator fast ring."""
    grid = tf.Grid3D(16, 16, 32)
    rng = np.random.default_rng(0)
    h = grid.halo
    u0 = rng.standard_normal(grid.padded_shape).astype(np.float32)
    u0[:h] = 0; u0[-h:] = 0
    u0[:, :h] = 0; u0[:, -h:] = 0
    u0[..., :h] = 0; u0[..., -h:] = 0
    m = np.full(grid.padded_shape, 1.5, np.float32)
    nsteps = 6
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
    sim = Simulator(grid, cfg, m)
    state = sim.prepare_state(u0.copy(), u0.copy())
    assert next(iter(state)).startswith("sweep")  # the v5 engine engaged
    state = sim.run(state, None, nsteps)
    _, got = sim.extract_state(state)
    _, truth = oracle_run(u0.copy(), u0.copy(), m, grid, cfg.dt, nsteps,
                          dtype=np.float64)
    assert rel_l2(got, truth) < 2e-6


def test_sharded_smoke():
    """Minimal 2-device sharded run (jnp backend, 1-D mesh) vs the f64 ring
    oracle."""
    from tpufdtd.parallel import make_mesh, simulate_sharded

    g = tf.Grid3D(16, 8, 8, hx=1.0, hy=1.0, hz=1.0)
    up0, uc0, m = make_correctness_ic(g)
    cfg = tf.SimConfig(dt=0.001, nsteps=8, backend="jnp")
    ring = simulate_sharded(up0, uc0, m, g, cfg, make_mesh(2))
    ring_t = tf.oracle_run_ring(up0, uc0, m, g, 0.001, 8, dtype=np.float64)
    for mine, truth in zip(ring, ring_t):
        assert rel_l2(mine, truth) < 1e-6
