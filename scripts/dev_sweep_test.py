"""Dev harness: interpret-mode correctness of the v5 sweep kernel vs oracle."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import tpufdtd as tf
from tpufdtd.layout import ZSplitLayout
from tpufdtd.oracle import oracle_run
from tpufdtd.ops import stencil_sweep as sw


def run_case(nx, ny, nz, K, nsteps, seed=0):
    grid = tf.Grid3D(nx, ny, nz, hx=1.0, hy=1.0, hz=1.0)
    h = grid.halo
    rng = np.random.default_rng(seed)
    shape = grid.padded_shape
    uc = rng.standard_normal(shape).astype(np.float32)
    up = rng.standard_normal(shape).astype(np.float32)
    # fast regime: identical rims across levels
    for a in (uc, up):
        pass
    rim = rng.standard_normal(shape).astype(np.float32)

    def set_rim(a):
        a[:h] = rim[:h]; a[-h:] = rim[-h:]
        a[:, :h] = rim[:, :h]; a[:, -h:] = rim[:, -h:]
        a[..., :h] = rim[..., :h]; a[..., -h:] = rim[..., -h:]

    set_rim(uc); set_rim(up)
    m = np.full(shape, 1.5, np.float32)
    dt = 0.001

    # oracle
    o_prev, o_cur = oracle_run(up.copy(), uc.copy(), m, grid, dt, nsteps,
                               dtype=np.float64)

    # sweep: layout with px/py widened for K
    px = max(grid.halo, K * grid.radius)
    lay = ZSplitLayout(grid, py=8, xpad=px)
    p_core, p_zrim = lay.split(up)
    c_core, _ = lay.split(uc)
    import jax.numpy as jnp

    U = jnp.asarray(np.stack([p_core, c_core]))
    zrT = jnp.asarray(sw.pad_zrim(p_zrim))

    done = 0
    cur = 1
    while done < nsteps:
        k = min(K, nsteps - done)
        if k >= 2:
            assert cur == 1
            U = sw.sweep_fused(U, zrT, grid=grid, dt=dt, m_val=1.5,
                               k_fuse=k, interpret=True)
        else:
            U = sw.sweep_fused(U, zrT, grid=grid, dt=dt, m_val=1.5,
                               k_fuse=1, cur=cur, interpret=True)
            cur = 1 - cur
        done += k

    zr = np.asarray(zrT)[:, :, : 2 * grid.halo]
    got_prev = lay.join(np.asarray(U[1 - cur]), zr)
    got_cur = lay.join(np.asarray(U[cur]), zr)

    def rel(a, b):
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)

    e_cur = rel(got_cur, o_cur)
    e_prev = rel(got_prev, o_prev)
    print(f"nx={nx} ny={ny} nz={nz} K={K} steps={nsteps}: "
          f"rel-max cur={e_cur:.3e} prev={e_prev:.3e}")
    assert e_cur < 5e-6 and e_prev < 5e-6, (e_cur, e_prev)


if __name__ == "__main__":
    run_case(8, 8, 16, K=1, nsteps=1)
    run_case(8, 8, 16, K=1, nsteps=3)
    run_case(8, 8, 16, K=2, nsteps=2)
    run_case(12, 16, 32, K=2, nsteps=6)
    run_case(12, 16, 32, K=3, nsteps=6)
    run_case(12, 16, 32, K=4, nsteps=4)
    run_case(10, 16, 24, K=3, nsteps=7)  # remainder path
    print("ALL OK")
