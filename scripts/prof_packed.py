"""Profile packed v4 kernels at 512^3 (dev tool)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tpufdtd as tf
from tpufdtd.ops import stencil_pallas_z as z

N = 512
g = tf.Grid3D(N, N, N)
lay = z.ZSplitLayout(g)
NXP, NYP = lay.core_shape[0], lay.core_shape[1]


def bench_single(bx, by, reps=2):
    def mk(n):
        def f(U, zr):
            def body(u, _):
                u = z.packed_step(u, zr, grid=g, dt=0.001, bx=bx, by=by,
                                  m_val=1.5, cur=1)
                u = z.packed_step(u, zr, grid=g, dt=0.001, bx=bx, by=by,
                                  m_val=1.5, cur=0)
                return u, None
            U, _ = jax.lax.scan(body, U, None, length=n)
            return U, U[0, 10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,))

    def run(n):
        fn = mk(n)
        best = 1e9
        for rep in range(reps):
            U = jax.random.uniform(jax.random.PRNGKey(rep), (2, NXP, NYP, N), jnp.float32)
            zr = jnp.zeros((NXP, NYP, 8), jnp.float32)
            U, v = fn(U, zr); _ = float(v)
            t0 = time.perf_counter()
            U, v = fn(U, zr); _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(2), run(7)
    per = (t2 - t1) / 10
    print(f"packed single bx={bx} by={by}: {per*1e3:.2f} ms/step = "
          f"{N**3/per/1e9:.1f} Gcell/s ({N**3*12/per/1e9/819*100:.0f}% 12B-model)",
          flush=True)


def bench_fused(bx, by, reps=2):
    def mk(n):
        def f(U, zr):
            def body(u, _):
                u = z.packed_fused2(u, zr, grid=g, dt=0.001, bx=bx, by=by,
                                    m_val=1.5, phase=0)
                u = z.packed_fused2(u, zr, grid=g, dt=0.001, bx=bx, by=by,
                                    m_val=1.5, phase=1)
                return u, None
            U, _ = jax.lax.scan(body, U, None, length=n)
            return U, U[0, 10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,))

    def run(n):
        fn = mk(n)
        best = 1e9
        for rep in range(reps):
            U = jax.random.uniform(jax.random.PRNGKey(rep), (4, NXP, NYP, N), jnp.float32)
            zr = jnp.zeros((NXP, NYP, 8), jnp.float32)
            U, v = fn(U, zr); _ = float(v)
            t0 = time.perf_counter()
            U, v = fn(U, zr); _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(2), run(7)
    per = (t2 - t1) / 10 / 2  # 4 steps per iter
    print(f"packed fused2 bx={bx} by={by}: {per*1e3:.2f} ms/step = "
          f"{N**3/per/1e9:.1f} Gcell/s ({N**3*12/per/1e9/819*100:.0f}% 12B-model)",
          flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        kind, bxs, bys = spec.split(":")
        if kind == "s":
            bench_single(int(bxs), int(bys))
        else:
            bench_fused(int(bxs), int(bys))
