"""v5 manual-DMA plane-sweep engine (interpret mode on CPU).

The sweep kernel (ops/stencil_sweep) is the flagship fast path: in-place
K-step temporal fusion on packed U[2], one HBM pass per plane per fused
call. These tests run it through the Simulator fast ring (ring='auto' with
identical rims) against the f64 oracle, sources included.
"""

import numpy as np
import pytest

import tpufdtd as tf
from tpufdtd.oracle import oracle_run
from tpufdtd.stepper import Simulator
from conftest import rel_l2

# interpret-mode Pallas compiles dominate (~10 s/test); the unmarked smoke
# test below keeps `-m "not slow"` covering this engine
pytestmark = pytest.mark.slow


def _fast_ic(grid, seed=0):
    """Random interior + one shared random rim across both levels (the fast
    in-place regime: all ring levels carry identical frozen rims)."""
    rng = np.random.default_rng(seed)
    h = grid.halo
    shape = grid.padded_shape
    rim = rng.standard_normal(shape).astype(np.float32)

    def mk():
        a = rng.standard_normal(shape).astype(np.float32)
        a[:h] = rim[:h]; a[-h:] = rim[-h:]
        a[:, :h] = rim[:, :h]; a[:, -h:] = rim[:, -h:]
        a[..., :h] = rim[..., :h]; a[..., -h:] = rim[..., -h:]
        return a

    return mk(), mk()


def _run_sweep_vs_oracle(grid, nsteps, coords=None, t_fuse=0, seed=0,
                         expect_k=None):
    # expect_k=None: any fused depth >= 2 (auto K may degrade with sources)
    up, uc = _fast_ic(grid, seed)
    m = np.full(grid.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas",
                       t_fuse=t_fuse)
    src = tf.ricker_table(nsteps, coords.shape[0], cfg.dt) if coords is not None else None
    sim = Simulator(grid, cfg, m, coords)
    if expect_k is None:
        assert sim.engine.sweep_k >= 2, sim.engine.sweep_k
    else:
        assert sim.engine.sweep_k == expect_k, sim.engine.sweep_k
    state = sim.prepare_state(up.copy(), uc.copy())
    assert next(iter(state)).startswith("sweep")
    state = sim.run(state, src, nsteps)
    got_prev, got_cur = sim.extract_state(state)

    o_prev, o_cur = oracle_run(up.copy(), uc.copy(), m, grid, cfg.dt, nsteps,
                               src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(got_cur, o_cur) < 2e-6, rel_l2(got_cur, o_cur)
    assert rel_l2(got_prev, o_prev) < 2e-6
    return got_cur


@pytest.mark.parametrize("nsteps", [3, 6, 7, 8, 10])
def test_sweep_no_sources_step_counts(nsteps):
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    _run_sweep_vs_oracle(g, nsteps)


def test_sweep_k4():
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    _run_sweep_vs_oracle(g, 9, t_fuse=4, expect_k=4)


def test_sweep_with_source():
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    # source well inside the interior: cubes for K=3 need radius*2+2 cells
    coords = np.array([[8.0, 8.0, 16.0]], np.float32)
    _run_sweep_vs_oracle(g, 7, coords=coords)


def test_sweep_with_two_sources_offgrid():
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[7.3, 8.6, 15.2], [8.9, 7.1, 17.8]], np.float32)
    _run_sweep_vs_oracle(g, 6, coords=coords)


def test_sweep_fallback_source_near_boundary():
    """Sources too close to the rim for K=3 cubes: auto mode silently falls
    back (to fused pairs or unfused) and stays correct."""
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[1.0, 8.0, 16.0]], np.float32)
    up, uc = _fast_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas")
    src = tf.ricker_table(6, 1, cfg.dt)
    sim = Simulator(g, cfg, m, coords)
    assert sim.engine.sweep_k == 0
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, src, 6)
    _, got_cur = sim.extract_state(state)
    _, o_cur = oracle_run(up.copy(), uc.copy(), m, g, cfg.dt, 6, src=src,
                          src_coords=coords, dtype=np.float64)
    assert rel_l2(got_cur, o_cur) < 2e-6


def test_sweep_explicit_tfuse3_raises_when_ineligible():
    # non-uniform m is NOT an ineligibility anymore (the w stream handles
    # heterogeneous media) — explicit t_fuse=3 must build and pick the sweep
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    m = np.full(g.padded_shape, 1.5, np.float32)
    m[8, 8, 8] = 2.0
    sim = Simulator(g, tf.SimConfig(backend="pallas", t_fuse=3), m)
    assert sim.engine.sweep_k == 3 and sim.engine.m_val is None
    # order 6 (radius 3) runs the sweep since the PROFILE_R3 rings landed;
    # order 8 (radius 4) exceeds the sweep's x-window design: must raise
    g8 = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0, order=8)
    m8 = np.full(g8.padded_shape, 1.5, np.float32)
    with pytest.raises(ValueError):
        Simulator(g8, tf.SimConfig(backend="pallas", t_fuse=3), m8)


def test_sweep_anisotropic_spacing():
    """hx != hy != hz exercises the exact (non-isotropic) leap form."""
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=0.5, hz=2.0)
    _run_sweep_vs_oracle(g, 6, seed=3)


def test_sweep_frozen_rims_bitexact():
    """All rim cells stay bit-identical to their initial values."""
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _fast_ic(g, seed=5)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas")
    sim = Simulator(g, cfg, m)
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, None, 6)
    got_prev, got_cur = sim.extract_state(state)
    h = g.halo
    for got in (got_prev, got_cur):
        np.testing.assert_array_equal(got[:h], uc[:h])
        np.testing.assert_array_equal(got[-h:], uc[-h:])
        np.testing.assert_array_equal(got[:, :h], uc[:, :h])
        np.testing.assert_array_equal(got[:, -h:], uc[:, -h:])
        np.testing.assert_array_equal(got[..., :h], uc[..., :h])
        np.testing.assert_array_equal(got[..., -h:], uc[..., -h:])


def test_sweep_determinism():
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    a = _run_sweep_vs_oracle(g, 6, seed=7)
    b = _run_sweep_vs_oracle(g, 6, seed=7)
    np.testing.assert_array_equal(a, b)


def test_sweep_zrt_mode_nz128():
    """nz % 128 == 0 uses the side-array zrT rim mode (not z_embed)."""
    g = tf.Grid3D(12, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    got = _run_sweep_vs_oracle(g, 6, seed=11)
    assert got.shape == g.padded_shape


def test_sweep_embed_mode_selected():
    from tpufdtd.ops import stencil_sweep as sw
    assert sw.z_embedded(tf.Grid3D(12, 16, 32))
    assert not sw.z_embedded(tf.Grid3D(12, 16, 128))
    assert sw.core_nz(tf.Grid3D(12, 16, 32)) == 128
    assert sw.core_nz(tf.Grid3D(12, 16, 120)) == 128
    assert sw.core_nz(tf.Grid3D(12, 16, 192)) == 256


def test_sweep_fallback_source_near_z_rim():
    """A source whose trilinear corners touch the z rim cannot use the
    sweep (frozen-rim deposits are per-level); auto mode falls back."""
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[8.0, 8.0, 0.0]], np.float32)
    up, uc = _fast_ic(g)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=6, backend="pallas")
    src = tf.ricker_table(6, 1, cfg.dt)
    sim = Simulator(g, cfg, m, coords)
    assert sim.engine.sweep_k == 0
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, src, 6)
    _, got_cur = sim.extract_state(state)
    _, o_cur = oracle_run(up.copy(), uc.copy(), m, g, cfg.dt, 6, src=src,
                          src_coords=coords, dtype=np.float64)
    assert rel_l2(got_cur, o_cur) < 2e-6


@pytest.mark.parametrize("order", [2, 6, 8, 10, 12])
def test_fast_ring_other_orders(order):
    """Fast-ring routing per stencil order: radius <= 3 uses the sweep
    (radius 3 through the PROFILE_R3 rings since round 3), higher orders
    fall back to the packed engines (the sweep's x window tops out at 7
    neighbor planes) and still match the oracle."""
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0, order=order)
    up, uc = _fast_ic(g, seed=13)
    m = np.full(g.padded_shape, 1.5, np.float32)
    sim = Simulator(g, tf.SimConfig(dt=0.001, nsteps=4, backend="pallas"), m)
    assert (getattr(sim.engine, "sweep_k", 0) > 0) == (g.radius <= 3)
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, None, 4)
    got = sim.extract_state(state)[1]  # u_N (2- or 3-level ring)
    _, o = oracle_run(up.copy(), uc.copy(), m, g, 0.001, 4, dtype=np.float64)
    assert rel_l2(got, o) < 1e-5


# ---- bf16 storage (bf16 HBM / f32 VMEM compute) ---------------------------


def _run_bf16(grid, nsteps, coords=None, seed=0):
    up, uc = _fast_ic(grid, seed)
    m = np.full(grid.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas",
                       storage_dtype="bfloat16")
    src = (tf.ricker_table(nsteps, coords.shape[0], cfg.dt)
           if coords is not None else None)
    sim = Simulator(grid, cfg, m, coords)
    assert sim.engine.sweep_k >= 2, sim.engine.sweep_k
    assert sim.engine.sweep_lay.py == 16
    state = sim.prepare_state(up.copy(), uc.copy())
    key = next(iter(state))
    assert key.startswith("sweep")
    import jax.numpy as jnp
    assert state[key][0].dtype == jnp.bfloat16
    assert state[key][1].dtype == jnp.float32  # z rim stays f32
    state = sim.run(state, src, nsteps)
    got_prev, got_cur = sim.extract_state(state)
    assert got_cur.dtype == np.float32
    o_prev, o_cur = oracle_run(up.copy(), uc.copy(), m, grid, cfg.dt, nsteps,
                               src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(got_cur, o_cur) < 4e-2, rel_l2(got_cur, o_cur)
    return up, uc, got_prev, got_cur


def test_sweep_bf16_vs_oracle():
    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    _run_bf16(g, 7)


def test_sweep_bf16_with_source():
    g = tf.Grid3D(16, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[8.0, 8.0, 16.0]], np.float32)
    _run_bf16(g, 7, coords=coords)


def test_sweep_bf16_zrt_mode_nz128():
    g = tf.Grid3D(12, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    _run_bf16(g, 6, seed=3)


def test_sweep_bf16_rims_frozen():
    """Rims stay bit-frozen at their bf16-rounded initial values."""
    import jax.numpy as jnp

    g = tf.Grid3D(12, 16, 32, hx=1.0, hy=1.0, hz=1.0)
    up, uc, got_prev, got_cur = _run_bf16(g, 6, seed=5)
    h = g.halo
    rim_bf = np.asarray(jnp.asarray(uc, jnp.bfloat16).astype(jnp.float32))
    for got in (got_prev, got_cur):
        np.testing.assert_array_equal(got[:h], rim_bf[:h])
        np.testing.assert_array_equal(got[-h:], rim_bf[-h:])
        np.testing.assert_array_equal(got[:, :h], rim_bf[:, :h])
        np.testing.assert_array_equal(got[:, -h:], rim_bf[:, -h:])
        np.testing.assert_array_equal(got[..., :h], rim_bf[..., :h])
        np.testing.assert_array_equal(got[..., -h:], rim_bf[..., -h:])


def test_sweep_bf16_ny_not_16_falls_back_to_jnp():
    """ny % 16 != 0 cannot meet the bf16 (16, 128) tile: auto mode routes
    to the XLA bf16 engine; explicit t_fuse=3 raises."""
    from tpufdtd.stepper import JnpEngine

    g = tf.Grid3D(12, 8, 32, hx=1.0, hy=1.0, hz=1.0)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=4, backend="pallas",
                       storage_dtype="bfloat16")
    sim = Simulator(g, cfg, m)
    assert isinstance(sim.engine, JnpEngine)
    with pytest.raises(ValueError, match="bfloat16|bf16|ny % 16"):
        Simulator(g, tf.SimConfig(backend="pallas", t_fuse=3,
                                  storage_dtype="bfloat16"), m)


def test_sweep_ring_profiles_bitwise_equal():
    """The std and deep DMA ring geometries are pure pipelining changes:
    identical arithmetic, so outputs must match BITWISE in both rim modes
    (zrT nz=128 and z_embed)."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    for nz in (128, 32):  # rim-ring mode / z_embed mode
        g = tf.Grid3D(14, 16, nz, hx=1.0, hy=1.0, hz=1.0)
        K = 3
        up, uc = _fast_ic(g, seed=5)
        lay = ZSplitLayout(g, py=8, xpad=max(g.halo, K * g.radius),
                           z_embed=sw.z_embedded(g))
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        U0 = jnp.asarray(np.stack([p_core, c_core]))
        zr = jnp.asarray(
            p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim),
            jnp.float32,
        )
        outs = {}
        for prof in ("std", "deep"):
            outs[prof] = np.asarray(
                sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5,
                               k_fuse=K, interpret=True, ring_profile=prof)
            )
        assert np.array_equal(outs["std"], outs["deep"]), f"nz={nz}"


def test_sweep_pair_bitwise():
    """The paired-plane (pb=2) kernel batches two x-planes per vector op /
    DMA with the per-element operation order unchanged, so its output must
    match the per-plane kernel BITWISE — every K, both rim modes, and with
    frozen x margins (the sharded edge-shard configuration)."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    for nz in (128, 32):  # rim-ring mode / z_embed mode
        for K in (1, 2, 3):
            for frozen in ((0, 0), (2, 4)):
                g = tf.Grid3D(16, 16, nz, hx=1.0, hy=1.0, hz=1.0)
                up, uc = _fast_ic(g, seed=7)
                lay = ZSplitLayout(g, py=8, xpad=max(g.halo, max(K, 2) * g.radius),
                                   z_embed=sw.z_embedded(g))
                p_core, p_zrim = lay.split(up)
                c_core, _ = lay.split(uc)
                U0 = jnp.asarray(np.stack([p_core, c_core]))
                zr = jnp.asarray(
                    p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim),
                    jnp.float32,
                )
                outs = {}
                for pair in ("off", "on"):
                    outs[pair] = np.asarray(
                        sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5,
                                       k_fuse=K, interpret=True, pair=pair,
                                       frozen_lo=frozen[0], frozen_hi=frozen[1])
                    )
                assert np.array_equal(outs["off"], outs["on"]), \
                    (nz, K, frozen)


def test_sweep_pair_on_rejects_ineligible():
    """pair='on' with odd nx must raise (chunking needs even nx/px/margins);
    pair='auto' on the same grid silently runs the per-plane kernel."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(15, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _fast_ic(g, seed=3)
    lay = ZSplitLayout(g, py=8, xpad=max(g.halo, 2 * g.radius),
                       z_embed=sw.z_embedded(g))
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    U0 = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(sw.pad_zrim(p_zrim), jnp.float32)
    with pytest.raises(ValueError, match="pair"):
        sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=2,
                       interpret=True, pair="on")
    out = sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=2,
                         interpret=True, pair="auto")
    assert np.isfinite(np.asarray(out)).all()


def test_sweep_pair_bitwise_bf16():
    """Pairing is bitwise-neutral under bf16 storage too (the cur chunks are
    widened to f32 once on arrival in both kernels)."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(16, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    K = 2
    up, uc = _fast_ic(g, seed=11)
    lay = ZSplitLayout(g, py=16, xpad=max(g.halo, K * g.radius),
                       z_embed=sw.z_embedded(g))
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    U0 = jnp.asarray(np.stack([p_core, c_core]), jnp.bfloat16)
    zr = jnp.asarray(sw.pad_zrim(p_zrim), jnp.float32)
    outs = {}
    for pair in ("off", "on"):
        outs[pair] = np.asarray(
            sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5,
                           k_fuse=K, interpret=True, pair=pair)
            .astype(jnp.float32)
        )
    assert np.array_equal(outs["off"], outs["on"])


def test_sweep_flat_bitwise():
    """The flat (2-D chunked) paired kernel computes each 2-plane chunk as
    one (2*nyp, nz) array over all rows with a row mask replacing the
    interior slices and rim-copy stores; per-element op order is unchanged,
    so output must match the per-plane kernel BITWISE — every K, both rim
    modes, frozen x AND y margins, and the heterogeneous-m w stream."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    for nz, K, frozen, fy, varm in (
        (128, 1, (0, 0), (0, 0), False),
        (128, 2, (2, 4), (0, 0), False),
        (128, 4, (0, 0), (2, 3), False),
        (32, 3, (0, 0), (0, 0), False),
        (128, 2, (0, 0), (0, 0), True),
    ):
        g = tf.Grid3D(16, 16, nz, hx=1.0, hy=1.0, hz=1.0)
        up, uc = _fast_ic(g, seed=13)
        lay = ZSplitLayout(g, py=8, xpad=max(g.halo, max(K, 2) * g.radius),
                           z_embed=sw.z_embedded(g))
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        U0 = jnp.asarray(np.stack([p_core, c_core]))
        zr = jnp.asarray(
            p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim), jnp.float32
        )
        w = None
        if varm:
            rngw = np.random.default_rng(17)
            w = jnp.asarray(
                (0.001 ** 2 / (1.5 + 0.1 * rngw.random(U0.shape[1:])))
                .astype(np.float32)
            )
        outs = {}
        for flat in ("off", "on"):
            outs[flat] = np.asarray(
                sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5,
                               k_fuse=K, interpret=True, pair="on",
                               flat=flat, frozen_lo=frozen[0],
                               frozen_hi=frozen[1], frozen_ylo=fy[0],
                               frozen_yhi=fy[1], w=w)
            )
        base = np.asarray(
            sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5,
                           k_fuse=K, interpret=True, pair="off",
                           frozen_lo=frozen[0], frozen_hi=frozen[1],
                           frozen_ylo=fy[0], frozen_yhi=fy[1], w=w)
        )
        assert np.array_equal(outs["on"], base), (nz, K, frozen, fy, varm)
        assert np.array_equal(outs["off"], base), (nz, K, frozen, fy, varm)


def test_sweep_order6():
    """Order-6 (radius-3) runs the sweep engine — 2R+1-plane x window and
    the PROFILE_R3 ring geometry — and matches the f64 oracle in both rim
    modes (ref: main.cpp:26-29 builds orders 2..12; the reference's own
    optimized kernel is order-4-only, cuda_optimized.cu:39)."""
    for nz in (32, 128):
        g = tf.Grid3D(12, 16, nz, hx=1.0, hy=1.0, hz=1.0, order=6)
        _run_sweep_vs_oracle(g, 7)


# ---- heterogeneous medium (per-point w stream) ------------------------------


def _smooth_m(shape, seed=0):
    """Smooth heterogeneous medium in [1.2, 2.0] (slowness^2-like)."""
    x = np.linspace(0, 1, shape[0])[:, None, None]
    y = np.linspace(0, 1, shape[1])[None, :, None]
    z = np.linspace(0, 1, shape[2])[None, None, :]
    return (
        1.6 + 0.4 * np.sin(3 * x + seed) * np.cos(2 * y) * np.sin(4 * z)
    ).astype(np.float32)


def test_sweep_variable_m_vs_oracle():
    """The sweep engine auto-engages for heterogeneous m (per-point w
    stream; the reference's optimized kernel reads m[gid] per point,
    cuda_optimized.cu:251) and matches the f64 oracle. Both rim modes."""
    for nz in (32, 128):
        grid = tf.Grid3D(32, 16, nz)
        up, uc = _fast_ic(grid, seed=3)
        m = _smooth_m(grid.padded_shape)
        nsteps = 7
        cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
        sim = Simulator(grid, cfg, m)
        assert sim.engine.m_val is None
        assert sim.engine.sweep_k >= 2, sim.engine.sweep_k
        assert sim.engine.sweep_w is not None
        state = sim.prepare_state(up.copy(), uc.copy())
        assert next(iter(state)).startswith("sweep")
        state = sim.run(state, None, nsteps)
        _, got = sim.extract_state(state)
        _, truth = oracle_run(up.copy(), uc.copy(), m, grid, cfg.dt, nsteps,
                              dtype=np.float64)
        assert rel_l2(got, truth) < 2e-6, rel_l2(got, truth)


def test_sweep_variable_m_with_source():
    """Fused source-correction cubes are propagated through the LOCAL medium
    (injection_cubes_upto m_core window), so sources sitting in a
    heterogeneous region stay exact."""
    grid = tf.Grid3D(32, 16, 32)
    up, uc = _fast_ic(grid, seed=5)
    m = _smooth_m(grid.padded_shape, seed=2)
    # strong local contrast right at the source
    m[16:22, 8:14, 16:22] *= 1.3
    coords = np.array([[18.0, 10.0, 18.0]], np.float32)
    nsteps = 7
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
    src = tf.ricker_table(nsteps, 1, cfg.dt)
    sim = Simulator(grid, cfg, m, coords)
    assert sim.engine.sweep_k >= 2, sim.engine.sweep_k
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, src, nsteps)
    _, got = sim.extract_state(state)
    _, truth = oracle_run(up.copy(), uc.copy(), m, grid, cfg.dt, nsteps,
                          src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(got, truth) < 2e-6, rel_l2(got, truth)


def test_sweep_variable_m_uniform_is_bitwise_equal():
    """A constant medium passed as a field (assume_uniform_m=False) routes
    through the w stream and must match the scalar m_val path BITWISE: the
    plane multiply replaces the scalar multiply in the same op."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(16, 16, 32)
    K = 3
    up, uc = _fast_ic(g, seed=9)
    lay = ZSplitLayout(g, py=8, xpad=max(g.halo, K * g.radius),
                       z_embed=sw.z_embedded(g))
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    m_core = np.full(lay.core_shape, 1.5, np.float32)
    dt = 0.001
    w = ((dt * dt / (g.hx * g.hx))
         / np.maximum(m_core.astype(np.float64), 1e-300)).astype(np.float32)
    U0 = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(p_zrim, jnp.float32)
    a = np.asarray(sw.sweep_fused(U0, zr, grid=g, dt=dt, m_val=1.5,
                                  k_fuse=K, interpret=True))
    b = np.asarray(sw.sweep_fused(U0, zr, grid=g, dt=dt, m_val=None,
                                  k_fuse=K, interpret=True, w=jnp.asarray(w)))
    assert np.array_equal(a, b)


def test_sweep_variable_m_pair_bitwise():
    """Pairing stays bitwise-neutral with the w stream (the w chunks ride
    the same ring machinery as the z-rim chunks)."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    for nz in (128, 32):
        g = tf.Grid3D(16, 16, nz)
        K = 2
        up, uc = _fast_ic(g, seed=13)
        lay = ZSplitLayout(g, py=8, xpad=max(g.halo, 2 * g.radius),
                           z_embed=sw.z_embedded(g))
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        m_core = _smooth_m(lay.core_shape, seed=1)
        dt = 0.001
        w = jnp.asarray(((dt * dt / (g.hx * g.hx))
                         / m_core.astype(np.float64)).astype(np.float32))
        U0 = jnp.asarray(np.stack([p_core, c_core]))
        zr = jnp.asarray(
            p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim), jnp.float32
        )
        outs = {}
        for pair in ("off", "on"):
            outs[pair] = np.asarray(
                sw.sweep_fused(U0, zr, grid=g, dt=dt, m_val=None, k_fuse=K,
                               interpret=True, pair=pair, w=w)
            )
        assert np.array_equal(outs["off"], outs["on"])


def test_sweep_variable_m_k4_std_profile():
    """Round-2 advisory regression: K=4 on the std per-plane ring profile
    with a heterogeneous medium. The former w-ring sizing (+1 extra slack)
    gave a 16-slot ring indexed at the static k = t % 8, so fetches only
    ever wrote 8 of the 16 slots and stage reads hit never-written slots
    (NaN in interpret mode, silent garbage on TPU). Must be bitwise equal
    to the scalar path for a constant medium passed as a field."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(16, 16, 128)  # zrT rim mode: K=4 allowed
    K = 4
    up, uc = _fast_ic(g, seed=21)
    lay = ZSplitLayout(g, py=8, xpad=max(g.halo, K * g.radius),
                       z_embed=sw.z_embedded(g))
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    m_core = np.full(lay.core_shape, 1.5, np.float32)
    dt = 0.001
    w = jnp.asarray(((dt * dt / (g.hx * g.hx))
                     / m_core.astype(np.float64)).astype(np.float32))
    U0 = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(sw.pad_zrim(p_zrim), jnp.float32)
    a = np.asarray(sw.sweep_fused(U0, zr, grid=g, dt=dt, m_val=1.5, k_fuse=K,
                                  interpret=True, ring_profile="std",
                                  pair="off"))
    assert not np.isnan(a).any()
    b = np.asarray(sw.sweep_fused(U0, zr, grid=g, dt=dt, m_val=None, k_fuse=K,
                                  interpret=True, ring_profile="std",
                                  pair="off", w=w))
    assert not np.isnan(b).any()
    assert np.array_equal(a, b)


def test_sweep_variable_m_w_ring_gate():
    """When the w reuse distance cannot fit a ring dividing the unroll
    factor (z_embed K>=5 on the std per-plane profile), sweep_fused raises
    an actionable error and pick_k_fuse never proposes such a K."""
    import jax.numpy as jnp
    import pytest

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(16, 16, 32)  # z_embed: max_k_fuse cap stays 6
    K = 5
    lay = ZSplitLayout(g, py=8, xpad=max(g.halo, K * g.radius), z_embed=True)
    up, uc = _fast_ic(g, seed=23)
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    w = jnp.asarray(np.full(lay.core_shape, 1e-3, np.float32))
    U0 = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(p_zrim, jnp.float32)
    with pytest.raises(ValueError, match="w ring"):
        sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=None, k_fuse=K,
                       interpret=True, ring_profile="std", pair="off", w=w)
    # the scalar path at the same K is unaffected
    sw.sweep_fused(U0, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=K,
                   interpret=True, ring_profile="std", pair="off")


def test_sweep_variable_m_bf16():
    """bf16 storage composes with the heterogeneous medium (w stays an f32
    stream feeding the f32 VMEM compute)."""
    grid = tf.Grid3D(32, 16, 32)
    up, uc = _fast_ic(grid, seed=17)
    m = _smooth_m(grid.padded_shape, seed=4)
    nsteps = 5
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas",
                       storage_dtype="bfloat16")
    sim = Simulator(grid, cfg, m)
    assert sim.engine.sweep_k >= 2, sim.engine.sweep_k
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, None, nsteps)
    _, got = sim.extract_state(state)
    _, truth = oracle_run(up.copy(), uc.copy(), m, grid, cfg.dt, nsteps,
                          dtype=np.float64)
    # bf16 storage rounds each fused block's output to 8-bit mantissa
    assert rel_l2(got, truth) < 5e-3, rel_l2(got, truth)


# ---- y-banded sweep (>= 896^3 flagship path) --------------------------------


def test_band_split_helpers():
    """band_splits partitions ny into aligned positive chunks;
    band_redundancy is the (K-1)*R margin rounded to the row tile."""
    from tpufdtd.ops import stencil_sweep as sw

    assert sw.band_splits(32, 2, 8) == [16, 16]
    assert sw.band_splits(40, 2, 8) == [24, 16]          # uneven split
    assert sw.band_splits(32, 4, 8) == [8, 8, 8, 8]
    assert sw.band_splits(32, 2, 16) == [16, 16]         # bf16 tile
    with pytest.raises(ValueError):
        sw.band_splits(36, 2, 8)                          # misaligned ny
    with pytest.raises(ValueError):
        sw.band_splits(16, 4, 8)                          # too few units
    assert sw.band_redundancy(2, 2, 8) == 8               # ceil(2/8)*8
    assert sw.band_redundancy(4, 2, 8) == 8               # ceil(6/8)*8
    assert sw.band_redundancy(4, 2, 16) == 16
    assert sw.band_redundancy(6, 3, 8) == 16              # ceil(15/8)*8


def test_pick_k_bands_engages_only_when_needed():
    """bands stays 1 while full planes fit VMEM; >= 896^3 grids split."""
    from tpufdtd.ops import stencil_sweep as sw

    k, b = sw.pick_k_bands(tf.Grid3D(512, 512, 512), 4)
    assert b == 1 and k >= 2, (k, b)
    k, b = sw.pick_k_bands(tf.Grid3D(896, 896, 896), 4)
    assert b > 1 and k >= 2, (k, b)
    k, b = sw.pick_k_bands(tf.Grid3D(1024, 1024, 1024), 4)
    assert b > 1 and k >= 2, (k, b)
    # bf16 halves the ring bytes but 16-row tiles double the band mult
    k, b = sw.pick_k_bands(
        tf.Grid3D(896, 896, 896), 4, bf16=True
    )
    assert k >= 2, (k, b)


def test_sweep_banded():
    """sweep_fused_banded is BITWISE-equal to bands=1: each band's margin
    rows recompute exactly what the unbanded sweep computes there, and the
    pre-block strip snapshots give every band pre-block neighbor values.
    Matrix: bands in {2,4}, K in {2,3,4}, both rim modes (zrT nz=128 and
    z_embed nz=32), uneven splits, frozen x margins, bf16 storage, and the
    heterogeneous-m w stream (ref capability: one kernel covers any grid
    under device memory, main.cpp:337-341)."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    #       nz   K bands ny  bf16  varm  frozen
    for nz, K, bands, ny, bf16, varm, frozen in (
        (128, 2, 2, 32, False, False, (0, 0)),
        (32, 3, 2, 32, False, False, (0, 0)),     # z_embed rim mode
        (128, 4, 4, 32, False, False, (0, 0)),    # minimal 8-row bands
        (128, 2, 2, 40, False, False, (0, 0)),    # uneven split 24/16
        (128, 3, 2, 32, False, True, (2, 4)),     # w stream + frozen x
        (128, 2, 2, 32, True, False, (0, 0)),     # bf16 (16-row tiles)
    ):
        g = tf.Grid3D(16, ny, nz, hx=1.0, hy=1.0, hz=1.0)
        up, uc = _fast_ic(g, seed=23)
        py = 16 if bf16 else 8
        lay = ZSplitLayout(g, py=py, xpad=max(g.halo, K * g.radius),
                           z_embed=sw.z_embedded(g))
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        dt_store = jnp.bfloat16 if bf16 else jnp.float32
        U0 = jnp.asarray(np.stack([p_core, c_core]), dt_store)
        zr = jnp.asarray(
            p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim), jnp.float32
        )
        w = None
        if varm:
            rngw = np.random.default_rng(29)
            w = jnp.asarray(
                (0.001 ** 2 / (1.5 + 0.1 * rngw.random(U0.shape[1:])))
                .astype(np.float32)
            )
        outs = {}
        for nb in (1, bands):
            outs[nb] = np.asarray(
                sw.sweep_fused_banded(
                    U0, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=K,
                    bands=nb, interpret=True, frozen_lo=frozen[0],
                    frozen_hi=frozen[1], w=w,
                ).astype(jnp.float32)
            )
        assert np.array_equal(outs[1], outs[bands]), \
            (nz, K, bands, ny, bf16, varm, frozen)


def test_sweep_banded_simulator_with_sources():
    """End-to-end: the Simulator's sweep ring with sweep_bands=2 forced
    (banding is transparent, so small grids exercise the same stepper path
    >= 896^3 grids take) is bitwise-equal to the bands=1 run, sources
    included — injections and fused correction cubes land on U outside the
    banded kernel (stepper.py _sw_correct)."""
    g = tf.Grid3D(16, 32, 32, hx=1.0, hy=1.0, hz=1.0)
    coords = np.array([[8.0, 16.0, 16.0]], np.float32)
    nsteps = 7
    up, uc = _fast_ic(g, seed=31)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
    src = tf.ricker_table(nsteps, 1, cfg.dt)
    outs = {}
    for bands in (1, 2):
        sim = Simulator(g, cfg, m, coords)
        assert sim.engine.sweep_k >= 2
        sim.engine.sweep_bands = bands
        state = sim.prepare_state(up.copy(), uc.copy())
        assert next(iter(state)).startswith("sweep")
        state = sim.run(state, src, nsteps)
        outs[bands] = np.stack(sim.extract_state(state))
    assert np.array_equal(outs[1], outs[2])
    truth = oracle_run(up.copy(), uc.copy(), m, g, cfg.dt, nsteps,
                       src=src, src_coords=coords, dtype=np.float64)
    assert rel_l2(outs[2][1], truth[1]) < 2e-6


# ---- gate-lattice property test ---------------------------------------------


@pytest.mark.parametrize("nz,Ks", [(128, (2, 4)), (32, (1, 3))])
def test_sweep_gate_lattice_bitwise(nz, Ks):
    """Property sweep over the full (rim-mode, K, ring_profile, pair,
    variable_m) gate lattice: every combination the gates admit must (a)
    satisfy the w-ring/unroll static-slot divisibility rule and (b) produce
    output BITWISE equal to the canonical per-plane std-profile run of the
    same (K, variable_m) — so future ring-geometry edits cannot silently
    reintroduce the round-2 w-ring slot/depth mismatch class of bug
    (the reference hit the analogous design-rule regression,
    STABILITY_FIX_LOG.md:75-114). Combinations the gates REJECT must raise
    a ValueError, never mis-compute."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    rngw = np.random.default_rng(41)
    if True:  # zrT rim-ring mode (nz=128) / z_embed mode (nz=32)
        g = tf.Grid3D(12, 16, nz, hx=1.0, hy=1.0, hz=1.0)
        up, uc = _fast_ic(g, seed=37)
        base = {}
        for K in Ks:
            lay = ZSplitLayout(g, py=8, xpad=max(g.halo, max(K, 2) * g.radius),
                               z_embed=sw.z_embedded(g))
            p_core, p_zrim = lay.split(up)
            c_core, _ = lay.split(uc)
            U0 = jnp.asarray(np.stack([p_core, c_core]))
            zr = jnp.asarray(
                p_zrim if sw.z_embedded(g) else sw.pad_zrim(p_zrim),
                jnp.float32,
            )
            wfield = jnp.asarray(
                (0.001 ** 2 / (1.5 + 0.1 * rngw.random(U0.shape[1:])))
                .astype(np.float32)
            )
            if K > sw.max_k_fuse(g, px=max(g.halo, max(K, 2) * g.radius)):
                continue
            for varm in (False, True):
                w = wfield if varm else None
                key = (K, varm)
                for prof in ("std", "deep"):
                    for pair in ("off", "on"):
                        pb = 2 if pair == "on" else 1
                        rings = sw._ring_profile(g, 8, prof, pb=pb)
                        zl, unroll = rings[6], rings[5]
                        admitted = (
                            not varm
                            or unroll % sw._w_ring_n(
                                K, g.radius, zl, unroll, pb=pb
                            ) == 0
                        )
                        call = lambda: sw.sweep_fused(
                            U0, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=K,
                            interpret=True, ring_profile=prof, pair=pair,
                            w=w,
                        )
                        if not admitted:
                            with pytest.raises(ValueError, match="w ring"):
                                call()
                            continue
                        out = np.asarray(call())
                        if key not in base:
                            base[key] = out
                        assert np.array_equal(out, base[key]), \
                            (nz, K, prof, pair, varm)


# ---- deep fusion (K = 5-6, paired-kernel capability on zrT grids) -----------


def test_sweep_deep_k_bitwise():
    """K in {5, 6} on a zrT-mode grid (per-plane cap is 4; the paired
    kernel's chunk-unit z-rim ring admits 6 — max_k_fuse) is BITWISE-equal
    to chained shallower sweeps of the same total depth, and within the
    oracle tolerance. pair='off' at the same K must raise the
    paired-kernel-required error; pick_k_fuse respects the pair cap."""
    import jax.numpy as jnp

    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    g = tf.Grid3D(16, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    assert not sw.z_embedded(g)
    assert sw.max_k_fuse(g, px=12, pb=1) == 4
    assert sw.max_k_fuse(g, px=12, pb=2) == 6
    assert sw.pick_k_fuse(g, 6) == 6
    assert sw.pick_k_fuse(g, 6, pair="off") == 4
    up, uc = _fast_ic(g, seed=11)

    def run_k(up, uc, K, chain=(None,)):
        px = max(g.halo, 6 * g.radius)
        lay = ZSplitLayout(g, py=8, xpad=px, z_embed=False)
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        U = jnp.asarray(np.stack([p_core, c_core]))
        zr = jnp.asarray(sw.pad_zrim(p_zrim))
        for kk in chain if chain != (None,) else (K,):
            U = sw.sweep_fused(U, zr, grid=g, dt=0.001, m_val=1.5,
                               k_fuse=kk, interpret=True)
        return np.asarray(U)

    got5 = run_k(up, uc, 5)
    want5 = run_k(up, uc, None, chain=(3, 2))
    assert np.array_equal(got5, want5)
    got6 = run_k(up, uc, 6)
    want6 = run_k(up, uc, None, chain=(4, 2))
    assert np.array_equal(got6, want6)
    m = np.full(g.padded_shape, 1.5, np.float32)
    truth = oracle_run(up.copy(), uc.copy(), m, g, 0.001, 6,
                       dtype=np.float64)
    lay = ZSplitLayout(g, py=8, xpad=12, z_embed=False)
    full = lay.join(got6[1], lay.split(up)[1])
    assert rel_l2(full, truth[1]) < 2e-6

    import pytest

    from tpufdtd.layout import ZSplitLayout as _ZS
    lay = _ZS(g, py=8, xpad=12, z_embed=False)
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    U = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(sw.pad_zrim(p_zrim))
    with pytest.raises(ValueError, match="out of range"):
        sw.sweep_fused(U, zr, grid=g, dt=0.001, m_val=1.5, k_fuse=6,
                       interpret=True, pair="off")


def test_stepper_deep_k_via_pair_gate():
    """Simulator honors explicit t_fuse=6 on a zrT grid (paired-kernel
    capability) and matches the f64 oracle; with pair='off' the same depth
    is not runnable and the constructor raises (pick_k_bands threads the
    pair knob, so selection and execution agree)."""
    g = tf.Grid3D(16, 16, 128, hx=1.0, hy=1.0, hz=1.0)
    up, uc = _fast_ic(g, seed=5)
    m = np.full(g.padded_shape, 1.5, np.float32)
    cfg = tf.SimConfig(dt=0.001, nsteps=7, backend="pallas", t_fuse=6)
    sim = Simulator(g, cfg, m, None)
    assert sim.engine.sweep_k == 6
    state = sim.prepare_state(up.copy(), uc.copy())
    state = sim.run(state, None, 7)
    got_prev, got_cur = sim.extract_state(state)
    o_prev, o_cur = oracle_run(up.copy(), uc.copy(), m, g, cfg.dt, 7,
                               dtype=np.float64)
    assert rel_l2(got_cur, o_cur) < 2e-6
    assert rel_l2(got_prev, o_prev) < 2e-6

    cfg_off = tf.SimConfig(dt=0.001, nsteps=7, backend="pallas", t_fuse=6,
                           pair="off")
    with pytest.raises(ValueError, match="not runnable"):
        Simulator(g, cfg_off, m, None)
