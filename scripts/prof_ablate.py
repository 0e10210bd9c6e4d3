"""Cheap-leap ablation: time the production sweep pipeline at 512^3 with the
stencil arithmetic replaced by ONE vector op (2c - prev), leaving every DMA,
ring store, stage copy and mask in place. The result is the pipeline's
structural floor: if it sits near the 4 B/pt/step DMA model (~0.66 ms/step
at K=4), the full kernel is VPU-bound and optimization must cut vector
passes; if it sits much higher, the rings/DMA themselves serialize.

Usage: python scripts/prof_ablate.py [n] [K] [pair] [flat] [mode]
mode: cheap (default) | real
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

import tpufdtd as tf
from tpufdtd.layout import ZSplitLayout
from tpufdtd.ops import stencil_sweep as sw


def cheap_make_leap(grid, dt, m_val, use_roll=True, z_embed=False, pb=1,
                    variable_m=False, frozen_ylo=0, frozen_yhi=0,
                    flat=False, py=8):
    def leap(planes, prev, zrp, y0, ylen, w=None):
        c = planes[len(planes) // 2]
        two = np.float32(2.0)
        if flat:
            return c * two - prev
        if pb == 1:
            return c[y0 : y0 + ylen] * two - prev
        return c[:, y0 : y0 + ylen] * two - prev

    return leap


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x[0, 0, 0, 0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pair = sys.argv[3] if len(sys.argv) > 3 else "auto"
    flat = sys.argv[4] if len(sys.argv) > 4 else "auto"
    mode = sys.argv[5] if len(sys.argv) > 5 else "cheap"
    if mode == "cheap":
        sw._make_leap = cheap_make_leap

    grid = tf.Grid3D(n, n, n)
    rng = np.random.default_rng(0)
    h = grid.halo
    px = max(h, K * grid.radius)
    ze = sw.z_embedded(grid)
    lay = ZSplitLayout(grid, py=8, xpad=px, z_embed=ze)
    shape = grid.padded_shape
    uc = rng.standard_normal(shape).astype(np.float32)
    up = rng.standard_normal(shape).astype(np.float32)
    for a in (uc, up):
        a[:h] = 0; a[-h:] = 0
        a[:, :h] = 0; a[:, -h:] = 0
        a[..., :h] = 0; a[..., -h:] = 0
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    U0 = np.stack([p_core, c_core])
    zrT = jnp.asarray(p_zrim if ze else sw.pad_zrim(p_zrim))
    N1, N2 = 2, 10

    def chain(U, z, n_calls):
        def body(u, _):
            return (
                sw.sweep_fused(u, z, grid=grid, dt=0.001, m_val=1.5,
                               k_fuse=K, pair=pair, flat=flat),
                None,
            )

        U, _ = jax.lax.scan(body, U, None, length=n_calls)
        return U

    f1 = jax.jit(lambda U, z: chain(U, z, N1))
    f2 = jax.jit(lambda U, z: chain(U, z, N2))
    t0 = time.perf_counter()
    U0_dev = jnp.asarray(U0)
    sync(f1(U0_dev, zrT))
    sync(f2(U0_dev, zrT))
    t_c = time.perf_counter() - t0
    perturb = jax.jit(lambda u, s: u * s)
    deltas = []
    for r in range(5):
        U = perturb(U0_dev, np.float32(1.0 + r * 1e-6))
        sync(U)
        t0 = time.perf_counter()
        sync(f1(U, zrT))
        ta = time.perf_counter() - t0
        U = perturb(U0_dev, np.float32(1.0 + r * 1e-6 + 3e-7))
        sync(U)
        t0 = time.perf_counter()
        sync(f2(U, zrT))
        tb = time.perf_counter() - t0
        deltas.append((tb - ta) / (N2 - N1))
    per_call = float(np.median(deltas))
    per_step = per_call / K
    dma_floor = 16.0 / K * n**3 / 819e9
    print(
        f"mode={mode} n={n} K={K} pair={pair} flat={flat}: compile {t_c:.0f}s"
        f" per_call={per_call*1e3:.2f}ms per_step={per_step*1e3:.3f}ms"
        f" dma_floor={dma_floor*1e3:.3f}ms"
        f" deltas_ms=" + ",".join(f"{d*1e3:.2f}" for d in deltas),
        flush=True,
    )


if __name__ == "__main__":
    main()
