"""Scan-delta perf probe for the production v5 sweep kernel (ops/stencil_sweep).

Times N chained fused calls inside ONE jitted program; the (N2-N1) delta
cancels the tunnel's fixed per-dispatch cost. Persistent compilation cache
enabled (jax.config — the env var alone is ignored under this stack).
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


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x[0, 0, 0, 0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [3])]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    grid = tf.Grid3D(n, n, n)
    rng = np.random.default_rng(0)
    h = grid.halo
    # longer chains for small grids so the scan delta dwarfs dispatch jitter
    N2 = int(sys.argv[4]) if len(sys.argv) > 4 else max(10, (512 // n) ** 3 * 10)
    N1 = 2
    pair = sys.argv[5] if len(sys.argv) > 5 else "auto"
    storage = sys.argv[6] if len(sys.argv) > 6 else "float32"
    bf16 = storage in ("bf16", "bfloat16")
    flat = sys.argv[7] if len(sys.argv) > 7 else "auto"

    for K in ks:
        px = max(h, K * grid.radius)
        ze = sw.z_embedded(grid)
        lay = ZSplitLayout(grid, py=16 if bf16 else 8, xpad=px, z_embed=ze)
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
        if bf16:
            U0 = U0.astype(jnp.bfloat16)
        zrT = jnp.asarray(p_zrim if ze else sw.pad_zrim(p_zrim))

        def chain(U, z, n_calls):
            def body(u, _):
                return (
                    sw.sweep_fused(
                        u, z, grid=grid, dt=0.001, m_val=1.5, k_fuse=K,
                        pair=pair, flat=flat,
                    ),
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
        for r in range(reps):
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
        gcell = n**3 / per_step / 1e9
        model_gbps = 12 * n**3 / per_step / 1e9
        print(
            f"K={K} pair={pair} flat={flat} storage={storage}: "
            f"compile {t_c:.0f}s per_call={per_call*1e3:.2f}ms "
            f"per_step={per_step*1e3:.2f}ms {gcell:.1f} Gcell/s "
            f"model12B={model_gbps:.0f} GB/s "
            f"({model_gbps/819*100:.1f}% of v5e peak)  deltas_ms="
            + ",".join(f"{d*1e3:.2f}" for d in deltas),
            flush=True,
        )


if __name__ == "__main__":
    main()
