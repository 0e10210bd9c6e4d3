"""Microbenchmark: paired-plane (chunk) leap vs the per-plane leap.

Hypothesis (RESULTS.md VPU analysis): sub-256^3 planes are small enough
(tens of vregs) that per-vector-op fixed lowering overhead dominates the
leap cost; batching two x-planes per op (shape (2, nyp, nz)) halves the op
count at constant total work. This probe times both forms on VMEM-resident
windows with no DMA/ring structure, reporting us/plane for each.

x-neighbors in the paired form: +-2 plane neighbors are whole chunks;
+-1 neighbors are leading-axis concats of adjacent chunk halves (register
renaming, no lane/sublane movement).
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
from tpufdtd.config import stencil_weights
from tpufdtd.ops.stencil_sweep import _make_leap


def make_chunk_leap(grid, dt, m_val):
    """leap on (2, nyp, nz) chunks, zrT rim mode, isotropic h."""
    R = grid.radius
    h = grid.halo
    nz = grid.nz
    W = stencil_weights(grid.order)
    dt32 = np.float32(dt)
    r2 = np.float32(1.0) / np.float32(grid.hx) ** 2
    m = np.float32(m_val)

    def yshift(cy, d):
        sh = d if d > 0 else cy.shape[1] + d
        return pltpu.roll(cy, sh, 1)

    def leap(cm, cc, cp, prev, zr, y0, ny):
        """cm/cc/cp: (2, nyp, nz) chunks at x-chunk -1/0/+1; prev/out rows
        [y0:y0+ny]; zr: (2, nyp, 2h) rim chunk."""
        y1 = y0 + ny
        c = cc[:, y0:y1, :]
        xs = {
            2: (cm, cp),
            1: (
                jnp.concatenate([cm[1:], cc[:1]], axis=0),
                jnp.concatenate([cc[1:], cp[:1]], axis=0),
            ),
        }
        acc = (np.float32(3.0) * W[0]) * c
        for d in range(R, 0, -1):
            xm, xp = xs[d]
            nb = xm[:, y0:y1, :] + xp[:, y0:y1, :]
            nb = nb + yshift(cc, d)[:, y0:y1, :]
            nb = nb + yshift(cc, -d)[:, y0:y1, :]
            zp = jnp.concatenate([c[:, :, d:], zr[:, y0:y1, h : h + d]], axis=2)
            zm = jnp.concatenate(
                [zr[:, y0:y1, h - d : h], c[:, :, : nz - d]], axis=2
            )
            nb = nb + zp
            nb = nb + zm
            acc = acc + W[d] * nb
        scale = dt32 * dt32 * r2 / m
        return scale * acc + (np.float32(2.0) * c - prev)

    return leap


def build_plane(grid, iters, ny, nyp, nz):
    leap = _make_leap(grid, dt=0.001, m_val=1.5, use_roll=True)

    def kern(planes_ref, zr_ref, out_ref):
        def body(i, prev):
            planes = tuple(planes_ref[j] for j in range(5))
            return leap(planes, prev, zr_ref[0, :, :8], 8, ny)

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


def build_pair(grid, iters, ny, nyp, nz):
    leap = make_chunk_leap(grid, dt=0.001, m_val=1.5)

    def kern(chunks_ref, zr_ref, out_ref):
        def body(i, prev):
            cm, cc, cp = (chunks_ref[j] for j in range(3))
            return leap(cm, cc, cp, prev, zr_ref[...], 8, ny)

        out_ref[:, 8 : 8 + ny, :] = jax.lax.fori_loop(
            0, iters, body, chunks_ref[1][:, 8 : 8 + ny, :], unroll=False
        )
        out_ref[:, 0:8, :] = chunks_ref[1][:, 0:8, :]
        out_ref[:, 8 + ny :, :] = chunks_ref[1][:, 8 + ny :, :]

    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, nyp, nz), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x.reshape(-1)[0])


def run(label, f1, f2, args, n1, n2, per_iter_planes, ny, nz, reps=7):
    t0 = time.perf_counter()
    sync(f1(*args))
    sync(f2(*args))
    compile_s = time.perf_counter() - t0
    deltas = []
    for r in range(reps):
        a0 = args[0] * np.float32(1.0 + r * 1e-6)
        sync(a0)
        t0 = time.perf_counter(); sync(f1(a0, args[1])); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); sync(f2(a0, args[1])); tb = time.perf_counter() - t0
        deltas.append((tb - ta) / (n2 - n1) / per_iter_planes)
    per_plane = float(np.median(deltas))
    ops = 23 * ny * nz
    print(
        f"{label}: {per_plane*1e6:.3f} us/plane  "
        f"({ops/per_plane/1e12:.2f} Tops @23 ops/pt; compile {compile_s:.0f}s)",
        flush=True,
    )
    return per_plane


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    grid = tf.Grid3D(n, n, n)
    ny = nz = n
    nyp = ny + 16
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.standard_normal((5, nyp, nz)).astype(np.float32))
    chunks = jnp.asarray(rng.standard_normal((3, 2, nyp, nz)).astype(np.float32))
    zr2 = jnp.asarray(rng.standard_normal((2, nyp, 128)).astype(np.float32))
    zr1 = jnp.asarray(rng.standard_normal((1, nyp, 128)).astype(np.float32))

    N1, N2 = 64, 512
    p1 = jax.jit(lambda p, z: build_plane(grid, N1, ny, nyp, nz)(p, z))
    p2 = jax.jit(lambda p, z: build_plane(grid, N2, ny, nyp, nz)(p, z))
    a = run("plane leap", p1, p2, (planes, zr1), N1, N2, 1, ny, nz)

    c1 = jax.jit(lambda c, z: build_pair(grid, N1, ny, nyp, nz)(c, z))
    c2 = jax.jit(lambda c, z: build_pair(grid, N2, ny, nyp, nz)(c, z))
    b = run("pair  leap", c1, c2, (chunks, zr2[:, :, :]), N1, N2, 2, ny, nz)
    print(f"pair speedup: {a/b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
