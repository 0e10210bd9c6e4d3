"""TPU perf probe for the v5 sweep kernel: slope timing over call counts."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import tpufdtd as tf
from tpufdtd.layout import ZSplitLayout
from tpufdtd.ops import stencil_sweep as sw


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x[0, 0, 0, 0])


def time_calls(U, zrT, grid, K, n_calls):
    t0 = time.perf_counter()
    for _ in range(n_calls):
        U = sw.sweep_fused(U, zrT, grid=grid, dt=0.001, m_val=1.5, k_fuse=K)
    sync(U)
    return time.perf_counter() - t0, U


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [2, 3])]
    grid = tf.Grid3D(n, n, n)
    rng = np.random.default_rng(0)
    h = grid.halo

    for K in ks:
        px = max(h, K * grid.radius)
        lay = ZSplitLayout(grid, py=8, xpad=px)
        shape = grid.padded_shape
        uc = rng.standard_normal(shape).astype(np.float32)
        up = rng.standard_normal(shape).astype(np.float32)
        for a in (uc, up):
            a[:h] = 0; a[-h:] = 0
            a[:, :h] = 0; a[:, -h:] = 0
            a[..., :h] = 0; a[..., -h:] = 0
        p_core, p_zrim = lay.split(up)
        c_core, _ = lay.split(uc)
        U = jnp.asarray(np.stack([p_core, c_core]))
        zrT = jnp.asarray(sw.pad_zrim(p_zrim))

        if K == 1:
            print("K=1 parity unsupported in this probe; skip")
            continue
        # compile + warm
        t_c, U = time_calls(U, zrT, grid, K, 1)
        print(f"K={K}: first call (compile) {t_c:.1f}s", flush=True)
        n1, n2 = 4, 12
        t1, U = time_calls(U, zrT, grid, K, n1)
        t2, U = time_calls(U, zrT, grid, K, n2)
        per_call = (t2 - t1) / (n2 - n1)
        per_step = per_call / K
        gcell = n**3 / per_step / 1e9
        model_gbps = 12 * n**3 / per_step / 1e9
        print(
            f"K={K}: per_call={per_call*1e3:.2f}ms per_step={per_step*1e3:.2f}ms "
            f"{gcell:.1f} Gcell/s model12B={model_gbps:.0f} GB/s "
            f"({model_gbps/819*100:.1f}% of v5e peak)",
            flush=True,
        )
        assert np.isfinite(np.asarray(U[1, px, 8, 0]))


if __name__ == "__main__":
    main()
