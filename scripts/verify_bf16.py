"""Hardware check: bf16 sweep engine vs f32 sweep + f64 oracle at 128^3.

Run on the real TPU chip (no platform override). Prints rel-L2s and the
engine routing; exit nonzero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices())

    import tpufdtd as tf
    from tpufdtd.stepper import Simulator

    n = 128
    g = tf.Grid3D(n, n, n, hx=1.0, hy=1.0, hz=1.0)
    volp = int(np.prod(g.padded_shape))
    idx = np.arange(volp, dtype=np.float32).reshape(g.padded_shape)
    uc0 = np.sin(idx * np.float32(0.001)) * np.float32(10.0) + np.float32(100.0)
    up0 = np.zeros_like(uc0)
    m = np.full(g.padded_shape, 1.5, np.float32)
    src = tf.ricker_table(50, 1, 0.001)
    coords = tf.default_source_coords(1, n, n, n, h=1.0)

    cfg_bf = tf.SimConfig(dt=0.001, nsteps=50, backend="pallas",
                          storage_dtype="bfloat16")
    sim = Simulator(g, cfg_bf, m, coords)
    print("bf16 engine:", type(sim.engine).__name__,
          "sweep_k:", getattr(sim.engine, "sweep_k", None))
    assert getattr(sim.engine, "sweep_k", 0) == 3
    _, c_bf = tf.simulate(up0, up0, m, g, cfg_bf, src=src, src_coords=coords)

    cfg_f = tf.SimConfig(dt=0.001, nsteps=50, backend="pallas")
    _, c_f = tf.simulate(up0, up0, m, g, cfg_f, src=src, src_coords=coords)

    def rl2(a, b):
        return float(np.linalg.norm((a - b).ravel())
                     / max(np.linalg.norm(b.ravel()), 1e-30))

    print("bf16 vs f32 rel-L2:", rl2(c_bf, c_f))
    print("finite:", bool(np.isfinite(c_bf).all()),
          "max:", float(np.abs(c_bf).max()))
    assert np.isfinite(c_bf).all()
    assert rl2(c_bf, c_f) < 5e-2

    # second scenario: sin IC (large DC value 100 stresses bf16 absolute
    # resolution: steps change u by ~1e-3 of 100 => bf16 ulp ~0.5)
    _, s_bf = tf.simulate(up0, uc0, m, g, cfg_bf)
    _, s_f = tf.simulate(up0, uc0, m, g, cfg_f)
    print("sin-IC bf16 vs f32 rel-L2:", rl2(s_bf, s_f))
    print("OK")


if __name__ == "__main__":
    main()
