"""Variant profiling for the v3 z-split kernel at 512^3 (dev tool)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
PX, PY, H = 4, 8, 4
NXP, NYP = N + 2 * PX, N + 2 * PY
W0, W1, W2 = np.float32(-2.5), np.float32(1.333333330), np.float32(-8.33333333e-2)
DT2, R1, MV = np.float32(1e-6), np.float32(1e6), np.float32(1.5)


def kern(uc_ref, zr_ref, up_ref, _t, out_ref, *, bx, by, variant):
    if variant == "inplace":
        variant = "base"
    uc = uc_ref[...]
    c = uc[2 : 2 + bx, PY : PY + by, :]
    if variant == "copyonly":
        out_ref[...] = c * 2.0 - up_ref[...]
        return
    zr = zr_ref[...]
    r5 = W0 * c
    tx, ty, tz = r5, r5, r5
    for d in (2, 1):
        w = W2 if d == 2 else W1
        if variant != "nox":
            tx = tx + w * (
                uc[2 - d : 2 - d + bx, PY : PY + by, :]
                + uc[2 + d : 2 + d + bx, PY : PY + by, :]
            )
        if variant != "noy":
            ty = ty + w * (
                uc[2 : 2 + bx, PY - d : PY - d + by, :]
                + uc[2 : 2 + bx, PY + d : PY + d + by, :]
            )
        if variant != "noz":
            zplus = jnp.concatenate([c[:, :, d:], zr[:, :, H : H + d]], axis=2)
            zminus = jnp.concatenate([zr[:, :, H - d : H], c[:, :, : N - d]], axis=2)
            tz = tz + w * (zplus + zminus)
    up = up_ref[...]
    if variant == "nodiv":
        out_ref[...] = DT2 * (tx + ty + tz - (np.float32(-2.0) * R1 * c + R1 * up) * MV) * np.float32(1.0 / 1.5)
    else:
        out_ref[...] = DT2 * (tx + ty + tz - (np.float32(-2.0) * R1 * c + R1 * up) * MV) / MV


def make_step(bx, by, variant="base", sem="arbitrary"):
    gx, gy = N // bx, N // by
    mo = pl.multiple_of
    pm = pl.Buffered(2, use_lookahead=True) if variant == "lookahead" else None
    if variant == "lookahead":
        variant = "base"
    win = pl.BlockSpec(
        (pl.Element(bx + 4), pl.Element(by + 2 * PY), pl.Element(N)),
        lambda i, j: (PX + i * bx - 2, mo(j * by, 8), 0),
        memory_space=pltpu.VMEM, pipeline_mode=pm,
    )
    core = pl.BlockSpec(
        (pl.Element(bx), pl.Element(by), pl.Element(N)),
        lambda i, j: (PX + i * bx, mo(PY + j * by, 8), 0),
        memory_space=pltpu.VMEM, pipeline_mode=pm,
    )
    zrim = pl.BlockSpec(
        (pl.Element(bx), pl.Element(by), pl.Element(2 * H)),
        lambda i, j: (PX + i * bx, mo(PY + j * by, 8), 0),
        memory_space=pltpu.VMEM, pipeline_mode=pm,
    )
    k = functools.partial(kern, bx=bx, by=by, variant=variant)

    if variant.startswith("inplace"):
        # 2-buffer in-place: out aliases the READ u_prev (per-block regions
        # coincide, read happens before the writeback)
        def kern2(uc_ref, zr_ref, up_ref, out_ref, *, inner=k):
            inner(uc_ref, zr_ref, up_ref, None, out_ref)

        def step(C, Z, P, T):
            return pl.pallas_call(
                functools.partial(kern2),
                grid=(gx, gy),
                in_specs=[win, zrim, core],
                out_specs=core,
                out_shape=jax.ShapeDtypeStruct(P.shape, P.dtype),
                input_output_aliases={2: 0},
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=(sem, sem),
                    vmem_limit_bytes=110 * 1024 * 1024,
                ),
            )(C, Z, P)

        return step

    def step(C, Z, P, T):
        return pl.pallas_call(
            k,
            grid=(gx, gy),
            in_specs=[win, zrim, core, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=core,
            out_shape=jax.ShapeDtypeStruct(T.shape, T.dtype),
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem, sem),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(C, Z, P, T)

    return step


def bench(step, tag, reps=2, two_buf=False):
    Z = jnp.zeros((NXP, NYP, 2 * H), jnp.float32)

    def scan_n(n):
        def f(state, z):
            def body(c, _):
                P, C, T = c
                un = step(C, z, P, T)
                return (C, un, P), None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state, state[1][10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,))

    def scan_n_2buf(n):
        def f(state, z):
            def body(c, _):
                P, C = c
                un = step(C, z, P, None)
                return (C, un), None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state, state[1][10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,))

    def run(n):
        fn = scan_n_2buf(n) if two_buf else scan_n(n)
        best = 1e9
        for rep in range(reps):
            a = jax.random.uniform(jax.random.PRNGKey(rep), (NXP, NYP, N), jnp.float32)
            st = (a, a * 1.01) if two_buf else (a, a * 1.01, a * 0.99)
            st, v = fn(st, Z)
            _ = float(v)
            t0 = time.perf_counter()
            st, v = fn(st, Z)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t5, t25 = run(5), run(25)
    per = (t25 - t5) / 20
    print(
        f"{tag}: per-step {per*1e3:.2f} ms = {N**3/per/1e9:.1f} Gcell/s "
        f"(12B {N**3*12/per/1e9:.0f} GB/s, {N**3*12/per/1e9/819*100:.0f}%)",
        flush=True,
    )


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        bx, by = int(parts[0]), int(parts[1])
        variant = parts[2] if len(parts) > 2 else "base"
        sem = parts[3] if len(parts) > 3 else "arbitrary"
        bench(make_step(bx, by, variant, sem), spec,
              two_buf=variant.startswith("inplace"))
