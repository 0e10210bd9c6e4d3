"""On-device time loop: the whole N-step simulation is ONE compiled XLA program.

The reference launches one CUDA kernel (+ optional source kernel) per timestep
from the host (cuda_optimized.cu:435-460). The TPU-native design instead rolls
the time loop into `jax.lax.scan` carrying the three ring levels, so 50 steps
compile to a single dispatch with zero host round-trips; XLA aliases the carry
buffers, which reproduces the reference's in-place %3 ring rotation
(cuda.cu:233-235) without copies.

Carry is (P, C, T) = (u_{n-1}, u_n, write-target buffer); each step writes
T's interior and rotates to (C, u_new, P) — the exact dataflow of the
reference's t0/t1/t2 = n%3 ring, including the per-ring-level frozen rims.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Grid3D, SimConfig
from .layout import Layout
from .ops import stencil_jnp
from .sources import SourceTerm, build_source_term, inject

StepFn = Callable[..., jnp.ndarray]


def get_step_fn(grid: Grid3D, dt: float, backend: str, layout: Layout) -> StepFn:
    """Resolve a backend name to step(u_cur, u_prev, m, target) -> u_next."""
    if backend == "jnp":
        return stencil_jnp.make_step(grid, dt, layout)
    if backend == "pallas":
        from .ops import stencil_pallas

        return stencil_pallas.make_step(grid, dt, layout)
    raise ValueError(f"unknown backend {backend!r}; expected 'jnp' or 'pallas'")


def backend_layout(grid: Grid3D, backend: str) -> Layout:
    """The pallas backend runs in the alignment-padded TPU layout; the jnp
    backend keeps the reference layout."""
    return Layout.tpu(grid) if backend == "pallas" else Layout.reference(grid)


def run_scan(
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    m: jnp.ndarray,
    src_table: Optional[jnp.ndarray],
    *,
    step_fn: StepFn,
    term: SourceTerm,
    nsteps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scan nsteps ring steps; returns (u_{N-1}, u_N, u_{N-2})."""

    if term.empty or src_table is None:

        def body(carry, _):
            P, C, T = carry
            un = step_fn(C, P, m, T)
            return (C, un, P), None

        carry, _ = jax.lax.scan(body, state, None, length=nsteps)
    else:

        def body(carry, src_row):
            P, C, T = carry
            un = step_fn(C, P, m, T)
            un = inject(un, term, src_row)
            return (C, un, P), None

        carry, _ = jax.lax.scan(body, state, src_table)
    return carry


class Simulator:
    """Compiled simulation for one (grid, config, source-layout) combination.

    Host-facing arrays (ICs, medium, results) use the reference layout
    [n+2H]^3 (main.cpp:360-363); internally the pallas backend runs in the
    alignment-padded TPU layout and this class embeds/extracts at the edges.
    """

    def __init__(
        self,
        grid: Grid3D,
        cfg: SimConfig,
        m: np.ndarray,
        src_coords: Optional[np.ndarray] = None,
    ):
        self.grid = grid
        self.cfg = cfg
        self.layout = backend_layout(grid, cfg.backend)
        self.term = build_source_term(grid, src_coords, m, layout=self.layout)
        self.step_fn = get_step_fn(grid, cfg.dt, cfg.backend, self.layout)
        self.m = jnp.asarray(self.layout.embed(np.asarray(m, np.float32)))

        # m is an explicit argument (NOT a closure capture: captured device
        # arrays are baked into the HLO as constants, bloating the program).
        def _run(state, m, src_table, nsteps):
            return run_scan(
                state,
                m,
                src_table,
                step_fn=self.step_fn,
                term=self.term,
                nsteps=nsteps,
            )

        # One compiled program per nsteps value (warmup / main), cached by jit.
        self._jit_run = jax.jit(_run, static_argnames=("nsteps",), donate_argnums=(0,))
        self._run = lambda state, src_table, nsteps: self._jit_run(
            state, self.m, src_table, nsteps
        )

    def storage_dtype(self):
        return jnp.bfloat16 if self.cfg.storage_dtype == "bfloat16" else jnp.float32

    def prepare_state(
        self,
        u_prev: np.ndarray,
        u_cur: np.ndarray,
        u_target: Optional[np.ndarray] = None,
    ):
        """Device-resident ring state (P, C, T) in the backend layout; inputs
        are reference-layout host arrays. T defaults to a copy of C, which
        reproduces both reference IC setups (see oracle_run_ring)."""
        dt = self.storage_dtype()
        emb = self.layout.embed
        return (
            jnp.asarray(emb(np.asarray(u_prev)), dtype=dt),
            jnp.asarray(emb(np.asarray(u_cur)), dtype=dt),
            jnp.asarray(
                emb(np.asarray(u_cur if u_target is None else u_target)), dtype=dt
            ),
        )

    def extract_state(self, state) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Back to host reference-layout arrays (u_{N-1}, u_N, u_{N-2})."""
        return tuple(self.layout.extract(np.asarray(x)) for x in state)

    def _src_slice(self, src: Optional[np.ndarray], t0: int, t1: int):
        if src is None or self.term.empty:
            return None
        return jnp.asarray(src[t0:t1], dtype=jnp.float32)

    def run(self, state, src: Optional[np.ndarray] = None, nsteps: Optional[int] = None):
        """Run the simulation on a (P, C, T) ring state; returns new state."""
        n = self.cfg.nsteps if nsteps is None else nsteps
        if n == 0:
            return state
        return self._run(state, self._src_slice(src, 0, n), n)

    def run_timed(self, state, src: Optional[np.ndarray] = None):
        """Warmup + timed split; returns (state, seconds_timed).

        Warmup runs the first `cfg.warmup_steps` physics steps untimed; the
        wall clock brackets only the remaining steps, with block_until_ready
        fencing both sides (the TPU analogue of cudaEvents around the timed
        loop, cuda_optimized.cu:430-464).
        """
        import time

        w = min(self.cfg.warmup_steps, self.cfg.nsteps)
        rest = self.cfg.nsteps - w
        if w:
            state = self._run(state, self._src_slice(src, 0, w), w)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        if rest:
            state = self._run(state, self._src_slice(src, w, self.cfg.nsteps), rest)
        jax.block_until_ready(state)
        elapsed = time.perf_counter() - t0
        return state, elapsed


def simulate_ring(
    u_prev: np.ndarray,
    u_cur: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    cfg: SimConfig,
    src: Optional[np.ndarray] = None,
    src_coords: Optional[np.ndarray] = None,
    u_target: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-shot run; returns host-side ring state (u_{N-1}, u_N, u_{N-2})."""
    sim = Simulator(grid, cfg, m, src_coords)
    state = sim.prepare_state(u_prev, u_cur, u_target)
    state = sim.run(state, src, cfg.nsteps)
    return sim.extract_state(state)


def simulate(
    u_prev: np.ndarray,
    u_cur: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    cfg: SimConfig,
    src: Optional[np.ndarray] = None,
    src_coords: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot convenience wrapper; returns host-side (u_{N-1}, u_N)."""
    P, C, _ = simulate_ring(u_prev, u_cur, m, grid, cfg, src, src_coords)
    return P, C
