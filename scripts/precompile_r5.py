"""AOT-precompile one campaign config's timed-span programs into the
persistent compile cache — WITHOUT executing anything on the chip.

The round-5 campaign (scripts/campaign_r5.sh) is compile-dominated: a fresh
512^3+ Mosaic compile takes 20-30 min on the remote compile server while a
cache-hit run takes ~2 min (measured: 1624 s cold vs 86 s warm for the same
config). Compilation happens server-side, so N configs can compile
CONCURRENTLY without touching the chip or contaminating any timing — this
script builds the exact jit programs the perf driver will dispatch
(Simulator._jit_run at nsteps in {warmup, rest, rest*q}) from
ShapeDtypeStructs (no device puts, no big host allocations) and calls
.lower().compile(), which writes the persistent cache entries the later
serial measurement run then hits.

Usage (one config per process; run several in parallel):
  python scripts/precompile_r5.py --grid 512 [--order 4] [--storage float32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import tpufdtd as tf  # noqa: E402
from tpufdtd.stepper import Simulator  # noqa: E402


def m_args_spec(sim: Simulator):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sim.engine.m_args
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, required=True)
    p.add_argument("--order", type=int, default=4)
    p.add_argument("--storage", default="float32")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sources", type=int, default=1)
    args = p.parse_args()

    gs = args.grid
    grid = tf.Grid3D(gs, gs, gs, order=args.order)
    cfg = tf.SimConfig(
        dt=0.001,
        nsteps=args.steps,
        backend="pallas",
        storage_dtype=args.storage,
        t_fuse=0,
        pair="auto",
    )
    m = np.full(grid.padded_shape, 1.5, np.float32)
    coords = tf.default_source_coords(args.sources, gs, gs, gs)
    sim = Simulator(grid, cfg, m, coords)

    st = sim.state_spec()
    ma = m_args_spec(sim)
    w = min(cfg.warmup_steps, args.steps)
    rest = args.steps - w
    # the perf driver's timed-span stretch factor (harness/perf.py)
    q = int(np.clip((512**3 * 45 * 8) // max(1, gs**3 * rest), 1, 64))
    spans = sorted({w, rest, rest * q})
    for n in spans:
        src = jax.ShapeDtypeStruct((n, args.sources), np.float32)
        t0 = time.perf_counter()
        sim._jit_run.lower(st, ma, src, nsteps=n).compile()
        print(
            f"[precompile] grid={gs} order={args.order} storage={args.storage}"
            f" nsteps={n}: {time.perf_counter() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
