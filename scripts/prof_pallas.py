"""Profiling harness for pallas kernel variants at 512^3 (dev tool)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512
H = 4
PY = 8
NXP, NYP, NZP = N + 2 * H, N + 2 * PY, N + 2 * H
W0, W1, W2 = np.float32(-2.5), np.float32(1.333333330), np.float32(-8.33333333e-2)
DT2 = np.float32(1e-6)
R1 = np.float32(1e6)


def kern(uc_ref, up_ref, m_ref, zrim_ref, _t_ref, out_ref, *, bx, by, variant):
    uc = uc_ref[...]
    def win(dx, dy):
        return uc[2 + dx : 2 + dx + bx, PY + dy : PY + dy + by, :]
    c = win(0, 0)
    r5 = W0 * c
    tx, ty, tz = r5, r5, r5
    for d in (2, 1):
        tx = tx + (W2 if d == 2 else W1) * (win(-d, 0) + win(d, 0))
        ty = ty + (W2 if d == 2 else W1) * (win(0, -d) + win(0, d))
        if variant != "noroll":
            tz = tz + (W2 if d == 2 else W1) * (
                jnp.roll(c, d, axis=2) + jnp.roll(c, -d, axis=2)
            )
        else:
            tz = tz + (W2 if d == 2 else W1) * (c + c)
    up = up_ref[...]
    m = m_ref[...]
    upd = DT2 * (tx + ty + tz - (np.float32(-2.0) * R1 * c + R1 * up) * m) / m
    out_ref[...] = upd
    if variant != "norim":
        zr = zrim_ref[...]
        out_ref[:, :, 0:H] = zr[:, :, 0:H]
        out_ref[:, :, H + N :] = zr[:, :, H:]


def make_step(bx, by, variant="base"):
    gx, gy = N // bx, N // by
    mo = pl.multiple_of
    win_spec = pl.BlockSpec(
        (pl.Element(bx + 4), pl.Element(by + 2 * PY), pl.Element(NZP)),
        lambda i, j: (H + i * bx - 2, mo(j * by, 8), 0),
        memory_space=pltpu.VMEM,
    )
    core = lambda zdim: pl.BlockSpec(
        (pl.Element(bx), pl.Element(by), pl.Element(zdim)),
        lambda i, j: (H + i * bx, mo(PY + j * by, 8), 0),
        memory_space=pltpu.VMEM,
    )
    k = functools.partial(kern, bx=bx, by=by, variant=variant)
    cost = pl.CostEstimate(flops=36 * N**3, bytes_accessed=16 * N**3, transcendentals=0)

    def step(C, P, m, T):
        zrim = jnp.concatenate([T[:, :, :H], T[:, :, NZP - H :]], axis=2)
        return pl.pallas_call(
            k,
            grid=(gx, gy),
            in_specs=[win_spec, core(NZP), core(NZP), core(2 * H),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=core(NZP),
            out_shape=jax.ShapeDtypeStruct(T.shape, T.dtype),
            input_output_aliases={4: 0},
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(C, P, m, zrim, T)

    return step


def bench(step, tag, reps=2):
    mm = jnp.full((NXP, NYP, NZP), 1.5, jnp.float32)

    def scan_n(n):
        def f(state, m):
            def body(c, _):
                P, C, T = c
                un = step(C, P, m, T)
                return (C, un, P), None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state, state[1][10, 10, 10] * 1.0
        return jax.jit(f, donate_argnums=(0,), static_argnums=())

    def run(n):
        fn = scan_n(n)
        best = 1e9
        for rep in range(reps):
            a = jax.random.uniform(jax.random.PRNGKey(rep), (NXP, NYP, NZP), jnp.float32)
            st = (a, a * 1.01, a * 0.99)
            st, v = fn(st, mm)
            _ = float(v)
            t0 = time.perf_counter()
            st, v = fn(st, mm)
            _ = float(v)
            best = min(best, time.perf_counter() - t0)
        return best

    t5, t25 = run(5), run(25)
    per = (t25 - t5) / 20
    print(
        f"{tag}: per-step {per*1e3:.2f} ms = {N**3/per/1e9:.1f} Gcell/s "
        f"({N**3*16/per/1e9:.0f} GB/s, {N**3*16/per/1e9/819*100:.0f}% peak)",
        flush=True,
    )


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        parts = spec.split(":")
        bx, by = int(parts[0]), int(parts[1])
        variant = parts[2] if len(parts) > 2 else "base"
        bench(make_step(bx, by, variant), f"bx={bx} by={by} {variant}")
