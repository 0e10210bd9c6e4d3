"""Profile exp_sweep variants with scan-length deltas (device-true timing).

Wraps N chained sweep calls in ONE jitted program; timing the difference
between N1- and N2-call programs cancels the tunnel's fixed per-dispatch
cost (see RESULTS.md "Small grids" and scripts/prof_*.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import exp_sweep2 as sw
import tpufdtd as tf
from tpufdtd.layout import ZSplitLayout


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x[0, 0, 0, 0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    modes = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["full"])
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    grid = tf.Grid3D(n, n, n)
    rng = np.random.default_rng(0)
    h = grid.halo
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
    U0 = np.stack([p_core, c_core])
    zrT = jnp.asarray(sw.transpose_zrim(p_zrim))

    N1, N2 = 2, 10

    for mode in modes:
        
        base = sw.sweep_fused.__wrapped__

        def chain(U, zrT, n_calls):
            def body(u, _):
                return (
                    base(
                        u, zrT, grid=grid, dt=0.001, m_val=1.5, k_fuse=K
                    ),
                    None,
                )

            U, _ = jax.lax.scan(body, U, None, length=n_calls)
            return U

        f1 = jax.jit(lambda U, z: chain(U, z, N1))
        f2 = jax.jit(lambda U, z: chain(U, z, N2))
        # compile both
        t0 = time.perf_counter()
        print(f"mode={mode}: compiling N1...", flush=True)
        sync(f1(jnp.asarray(U0), zrT))
        print(f"  N1 done {time.perf_counter()-t0:.0f}s; compiling N2...",
              flush=True)
        sync(f2(jnp.asarray(U0), zrT))
        t_c = time.perf_counter() - t0
        print(f"  N2 done {t_c:.0f}s", flush=True)
        U0_dev = jnp.asarray(U0)
        perturb = jax.jit(lambda u, s: u * s)
        deltas = []
        for r in range(reps):
            # on-device perturbation defeats execution caching without any
            # host transfer inside (or overlapping) the timed spans
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
        gcell = K * n**3 / per_call / 1e9
        true_gbps = 4 * n**3 * 4 / per_call / 1e9
        print(
            f"mode={mode:6s} K={K}: compile {t_c:.0f}s per_call="
            f"{per_call*1e3:.2f}ms -> per_step={per_call/K*1e3:.2f}ms "
            f"{gcell:.1f} Gcell/s trueDMA={true_gbps:.0f} GB/s"
            f" ({true_gbps/819*100:.0f}% peak)  deltas_ms="
            + ",".join(f"{d*1e3:.2f}" for d in deltas),
            flush=True,
        )


if __name__ == "__main__":
    main()
