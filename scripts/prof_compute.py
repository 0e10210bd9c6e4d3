"""Pure-compute microbenchmark: the sweep's leap arithmetic on VMEM-resident
planes, no DMA, no ring bookkeeping. Separates the VPU cost of the stencil
math from the sweep kernel's structural overhead (predication, ring slot
views, stage copies).

Runs `iters` leap evaluations over a fixed 5-plane window and accumulates,
inside one grid-less pallas program. Reports ns/plane and effective VPU
ops/s against the ~23 ops/pt model.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpufdtd as tf
from tpufdtd.ops.stencil_sweep import _make_leap


def build(grid, iters, ny, nyp, nz):
    leap = _make_leap(grid, dt=0.001, m_val=1.5, use_roll=True)

    def kern(planes_ref, zrT_ref, out_ref):
        def body(i, prev):
            planes = tuple(planes_ref[j] for j in range(5))
            return leap(planes, prev, zrT_ref[...], 8, ny)

        out_ref[8 : 8 + ny, :] = jax.lax.fori_loop(
            0, iters, body, planes_ref[2][8 : 8 + ny, :], unroll=False
        )
        out_ref[0:8, :] = planes_ref[2][0:8, :]
        out_ref[8 + ny :, :] = planes_ref[2][8 + ny :, :]

    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyp, nz), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x[0, 0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    grid = tf.Grid3D(n, n, n)
    ny, nz = n, n
    nyp = ny + 16
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((5, nyp, nz)).astype(np.float32))
    zrT = jnp.asarray(rng.standard_normal((nyp, 8)).astype(np.float32))

    N1, N2 = 64, 512
    f1 = jax.jit(lambda p, z: build(grid, N1, ny, nyp, nz)(p, z))
    f2 = jax.jit(lambda p, z: build(grid, N2, ny, nyp, nz)(p, z))
    t0 = time.perf_counter()
    sync(f1(planes, zrT)); sync(f2(planes, zrT))
    print(f"compile {time.perf_counter()-t0:.0f}s", flush=True)
    deltas = []
    for r in range(7):
        p = planes * np.float32(1.0 + r * 1e-6)
        sync(p)
        t0 = time.perf_counter(); sync(f1(p, zrT)); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(f2(p, zrT)); tb = time.perf_counter() - t0
        deltas.append((tb - ta) / (N2 - N1))
    per_plane = float(np.median(deltas))
    ops = 23 * ny * nz
    print(
        f"pure leap: {per_plane*1e6:.2f} us/plane  "
        f"({ops/per_plane/1e12:.2f} Tops effective @23 ops/pt model; "
        f"{n} planes -> {per_plane*n*1e3:.2f} ms/stage)",
        flush=True,
    )


if __name__ == "__main__":
    main()
