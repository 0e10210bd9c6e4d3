"""Isolate Pallas pipeline throughput: Blocked vs Element specs, semantics,
with/without halo windows (dev tool)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NXP, NYP, NZP = 520, 528, 520


def bench_step(step, tag, reps=2):
    mm = jnp.full((NXP, NYP, NZP), 1.5, jnp.float32)

    def scan_n(n):
        def f(state, m):
            def body(c, _):
                P, C = c
                un = step(C, P, m)
                return (C, un), None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state, state[1][10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,))

    def run(n):
        fn = scan_n(n)
        best = 1e9
        for rep in range(reps):
            a = jax.random.uniform(jax.random.PRNGKey(rep), (NXP, NYP, NZP), jnp.float32)
            st = (a, a * 1.01)
            st, v = fn(st, mm)
            _ = float(v)
            t0 = time.perf_counter()
            st, v = fn(st, mm)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t5, t25 = run(5), run(25)
    per = (t25 - t5) / 20
    vol = NXP * NYP * NZP
    print(
        f"{tag}: per-step {per*1e3:.2f} ms  traffic16B {vol*16/per/1e9:.0f} GB/s"
        f" ({vol*16/per/1e9/819*100:.0f}% peak)",
        flush=True,
    )


def simple_kernel(c_ref, p_ref, m_ref, o_ref):
    o_ref[...] = 2.0 * c_ref[...] - p_ref[...] + m_ref[...]


def copy_kernel(c_ref, o_ref):
    o_ref[...] = c_ref[...] * 1.0001


def win_kernel(w_ref, p_ref, m_ref, o_ref, *, bx, by):
    w = w_ref[...]
    c = w[2 : 2 + bx, 8 : 8 + by, :]
    o_ref[...] = 2.0 * c - p_ref[...] + m_ref[...]


def make(mode, bx, by, sem):
    gx, gy = NXP // bx, NYP // by
    CP = pltpu.CompilerParams(
        dimension_semantics=(sem, sem), vmem_limit_bytes=110 * 1024 * 1024
    )
    if mode == "blocked":
        spec = pl.BlockSpec((bx, by, NZP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        def step(C, P, m):
            return pl.pallas_call(
                simple_kernel, grid=(gx, gy), in_specs=[spec] * 3, out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C, P, m)
        return step
    if mode == "element":
        mo = pl.multiple_of
        spec = pl.BlockSpec(
            (pl.Element(bx), pl.Element(by), pl.Element(NZP)),
            lambda i, j: (i * bx, mo(j * by, 8), 0), memory_space=pltpu.VMEM,
        )
        def step(C, P, m):
            return pl.pallas_call(
                simple_kernel, grid=(gx, gy), in_specs=[spec] * 3, out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C, P, m)
        return step
    if mode == "copy":
        spec = pl.BlockSpec((bx, by, NZP), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        def step(C, P, m):
            return pl.pallas_call(
                copy_kernel, grid=(gx, gy), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C)
        return step
    if mode == "bufN":
        nbuf = 4
        spec = pl.BlockSpec((bx, by, NZP), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(nbuf))
        def step(C, P, m):
            return pl.pallas_call(
                simple_kernel, grid=(gx, gy), in_specs=[spec] * 3, out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C, P, m)
        return step
    if mode == "copybufN":
        spec = pl.BlockSpec((bx, by, NZP), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(4))
        def step(C, P, m):
            return pl.pallas_call(
                copy_kernel, grid=(gx, gy), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C)
        return step
    if mode == "window":
        # element core + halo-extended element window input (clamped at edges
        # via min/max so it never goes OOB; values wrong at rim, don't care)
        mo = pl.multiple_of
        core = pl.BlockSpec(
            (pl.Element(bx), pl.Element(by), pl.Element(NZP)),
            lambda i, j: (i * bx, mo(j * by, 8), 0), memory_space=pltpu.VMEM,
        )
        win = pl.BlockSpec(
            (pl.Element(bx + 4), pl.Element(by + 16), pl.Element(NZP)),
            lambda i, j: (
                jnp.clip(i * bx - 2, 0, NXP - bx - 4),
                mo(jnp.clip(j * by - 8, 0, NYP - by - 16), 8),
                0,
            ),
            memory_space=pltpu.VMEM,
        )
        k = functools.partial(win_kernel, bx=bx, by=by)
        def step(C, P, m):
            return pl.pallas_call(
                k, grid=(gx, gy), in_specs=[win, core, core], out_specs=core,
                out_shape=jax.ShapeDtypeStruct(C.shape, C.dtype), compiler_params=CP,
            )(C, P, m)
        return step
    raise ValueError(mode)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        mode, bx, by, sem = spec.split(":")
        bench_step(make(mode, int(bx), int(by), sem), spec)
