"""Measure raw HBM<->VMEM DMA rates with K concurrent copies (dev tool)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX, NY, NZ = 256, 256, 512
PLANES = 8  # planes per DMA


def make_copy(conc: int, direction: str):
    """conc concurrent DMAs of PLANES planes each, marching over the array."""
    nchunks = NX // PLANES

    def kern(in_hbm, out_hbm):
        def body(scratch, sems):
            def start(c, slot):
                return pltpu.make_async_copy(
                    in_hbm.at[pl.ds(c * PLANES, PLANES)],
                    scratch.at[slot],
                    sems.at[slot],
                )

            def start_out(c, slot, osems):
                return pltpu.make_async_copy(
                    scratch.at[slot],
                    out_hbm.at[pl.ds(c * PLANES, PLANES)],
                    osems.at[slot],
                )

            def inner(osems):
                # prologue: conc reads in flight
                for k in range(min(conc, nchunks)):
                    start(k, k).start()
                for c in range(nchunks):
                    slot = c % conc
                    start(c, slot).wait()
                    start_out(c, slot, osems).start()
                    nxt = c + conc
                    if nxt < nchunks:
                        # slot reuse: the write out of this slot must finish
                        # before the next read overwrites it
                        start_out(c, slot, osems).wait()
                        start(nxt, slot).start()
                # epilogue: drain outstanding writes
                for c in range(max(0, nchunks - conc), nchunks):
                    start_out(c, c % conc, osems).wait()

            pl.run_scoped(
                inner,
                pltpu.SemaphoreType.DMA((conc,)),
            )

        pl.run_scoped(
            body,
            pltpu.VMEM((conc, PLANES, NY, NZ), jnp.float32),
            pltpu.SemaphoreType.DMA((conc,)),
        )

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((NX, NY, NZ), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)

    return run


def bench(tag, fn):
    x = jax.random.uniform(jax.random.PRNGKey(0), (NX, NY, NZ), jnp.float32)
    r = fn(x)
    _ = float(r[1, 1, 1])
    reps = 6
    t0 = time.perf_counter()
    for _i in range(reps):
        r = fn(x)
        _ = float(r[1, 1, 1])
    dt = (time.perf_counter() - t0) / reps
    gb = NX * NY * NZ * 4 / 1e9
    mult = 2.0  # read + write
    print(f"{tag}: {dt*1e3:.2f} ms -> {gb*mult/dt:.0f} GB/s aggregate", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        conc = int(spec)
        bench(f"conc={conc} read+write", make_copy(conc, "rw"))
