"""Hardware check: heterogeneous media (per-point w stream) on the sweep.

1) Correctness: a layered + smoothly varying m at 192^3 vs the f64 oracle
   (the reference reads m[gid] per point per step, openacc.cpp:107,
   cuda_optimized.cu:251; the sweep streams w = dt^2/(h^2 m) planes).
2) Perf: scan-delta per-step time at N^3 (default 512) for uniform vs
   heterogeneous m — validates the "w stream costs 4/K B/pt/step extra DMA,
   zero extra VPU passes" claim (DEVIATIONS.md item 7).

Run on the real TPU chip (no platform override).
Usage: verify_hetero.py [n_perf] [reps] [nsteps_perf]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def layered_m(grid, lo=1.5, hi=3.0, seed=0):
    """3 z-layers + a smooth xy ramp: non-separable, strictly positive."""
    nxp, nyp, nzp = grid.padded_shape
    z = np.linspace(0.0, 1.0, nzp, dtype=np.float32)
    layers = np.where(z < 0.33, lo, np.where(z < 0.66, 0.5 * (lo + hi), hi))
    x = np.linspace(0.0, 1.0, nxp, dtype=np.float32)[:, None, None]
    y = np.linspace(0.0, 1.0, nyp, dtype=np.float32)[None, :, None]
    m = layers[None, None, :] * (1.0 + 0.1 * x + 0.05 * y)
    return np.ascontiguousarray(m, np.float32)


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(
        np.linalg.norm((a - b).ravel())
        / max(np.linalg.norm(b.ravel()), 1e-30)
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices(), flush=True)

    import jax.numpy as jnp

    import tpufdtd as tf
    from tpufdtd.oracle import oracle_run
    from tpufdtd.stepper import Simulator

    # ---- correctness at 192^3 (layered m, sources on) ----------------------
    n = 192
    g = tf.Grid3D(n, n, n, hx=1.0, hy=1.0, hz=1.0)
    m = layered_m(g)
    nsteps = 10
    rng = np.random.default_rng(0)
    h = g.halo
    uc0 = rng.standard_normal(g.padded_shape).astype(np.float32)
    for a in (uc0,):
        a[:h] = 0; a[-h:] = 0
        a[:, :h] = 0; a[:, -h:] = 0
        a[..., :h] = 0; a[..., -h:] = 0
    up0 = np.zeros_like(uc0)
    coords = tf.default_source_coords(1, n, n, n, h=1.0)
    src = tf.ricker_table(nsteps, 1, 0.001)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, backend="pallas")
    sim = Simulator(g, cfg, m, coords)
    print("hetero engine:", type(sim.engine).__name__,
          "sweep_k:", getattr(sim.engine, "sweep_k", None),
          "w stream:", getattr(sim.engine, "sweep_w", None) is not None,
          flush=True)
    state = sim.prepare_state(up0.copy(), uc0.copy())
    t0 = time.perf_counter()
    state = sim.run(state, src, nsteps)
    gp, gc = sim.extract_state(state)
    print(f"device run: {time.perf_counter() - t0:.1f}s", flush=True)
    op, oc = oracle_run(up0.copy(), uc0.copy(), m, g, cfg.dt, nsteps,
                        src=src, src_coords=coords, dtype=np.float64)
    e_cur, e_prev = rel_l2(gc, oc), rel_l2(gp, op)
    print(f"192^3 layered-m vs f64 oracle: rel_l2 cur={e_cur:.3e}"
          f" prev={e_prev:.3e}", flush=True)
    ok = e_cur < 1e-5 and e_prev < 1e-5

    # ---- perf: uniform vs heterogeneous at n_perf^3 -------------------------
    from tpufdtd.layout import ZSplitLayout
    from tpufdtd.ops import stencil_sweep as sw

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    g = tf.Grid3D(n, n, n, hx=1.0, hy=1.0, hz=1.0)
    K = sw.pick_k_fuse(g, 4, variable_m=True)
    px = max(g.halo, K * g.radius)
    ze = sw.z_embedded(g)
    lay = ZSplitLayout(g, py=8, xpad=px, z_embed=ze)
    uc = rng.standard_normal(g.padded_shape).astype(np.float32)
    up = rng.standard_normal(g.padded_shape).astype(np.float32)
    for a in (uc, up):
        a[:h] = 0; a[-h:] = 0
        a[:, :h] = 0; a[:, -h:] = 0
        a[..., :h] = 0; a[..., -h:] = 0
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    U0 = jnp.asarray(np.stack([p_core, c_core]))
    zr = jnp.asarray(p_zrim if ze else sw.pad_zrim(p_zrim), jnp.float32)
    m_full = layered_m(g)
    w_np, _ = lay.split(
        (np.float64(0.001) ** 2 / (np.float64(g.hx) ** 2
                                   * m_full.astype(np.float64)))
        .astype(np.float32)
    )
    w_dev = jnp.asarray(w_np)

    N1, N2 = 2, max(10, (512 // n) ** 3 * 10)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(x[0, 0, 0, 0])

    def chain(n_calls, use_w):
        def run(U, z, w):
            def body(u, _):
                return (
                    sw.sweep_fused(u, z, grid=g, dt=0.001, m_val=1.5,
                                   k_fuse=K, w=w if use_w else None),
                    None,
                )

            U, _ = jax.lax.scan(body, U, None, length=n_calls)
            return U

        return jax.jit(run)

    perturb = jax.jit(lambda u, s: u * s)
    results = {}
    for label, use_w in (("uniform", False), ("hetero", True)):
        f1, f2 = chain(N1, use_w), chain(N2, use_w)
        sync(f1(U0, zr, w_dev)); sync(f2(U0, zr, w_dev))
        deltas = []
        for r in range(reps):
            U = perturb(U0, np.float32(1.0 + r * 1e-6)); sync(U)
            t0 = time.perf_counter(); sync(f1(U, zr, w_dev))
            ta = time.perf_counter() - t0
            U = perturb(U0, np.float32(1.0 + r * 1e-6 + 3e-7)); sync(U)
            t0 = time.perf_counter(); sync(f2(U, zr, w_dev))
            tb = time.perf_counter() - t0
            deltas.append((tb - ta) / (N2 - N1))
        per_step = float(np.median(deltas)) / K
        gcell = n ** 3 / per_step / 1e9
        results[label] = gcell
        print(f"{n}^3 K={K} {label}: per_step={per_step*1e3:.2f}ms"
              f" {gcell:.1f} Gcell/s", flush=True)
    ratio = results["hetero"] / results["uniform"]
    print(f"hetero/uniform throughput ratio: {ratio:.3f}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
