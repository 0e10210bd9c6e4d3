"""Pure-NumPy reference stepper — the correctness oracle.

Plays the role the OpenACC kernel plays in the reference (openacc.cpp:61-216):
a slow, transparent implementation every fast backend is differentially tested
against (SURVEY.md §4). All arithmetic is float32 and follows the reference's
exact expression shapes:

  r1 = 1/dt^2, r2..r4 = 1/h^2 per axis                  (openacc.cpp:84-88)
  r5 = w0 * u0[c] shared across the three axis terms    (openacc.cpp:101)
  u2 = dt^2 * ( r2*Tx + r3*Ty + r4*Tz
                - (-2*r1*u0[c] + r1*u1[c]) * m ) / m    (openacc.cpp:102-107)

where Tx = r5 + sum_d w_d * (u0[x-d] + u0[x+d]) with weights summed in
descending distance order, exactly like the generated code.
"""

from __future__ import annotations

import numpy as np

from .config import Grid3D, stencil_weights
from .sources import SourceTerm, build_source_term


def _axis_term(
    u0: np.ndarray, grid: Grid3D, axis: int, r5: np.ndarray, W
) -> np.ndarray:
    """r5 + sum_{d=R..1} w_d * (u0 shifted -d + u0 shifted +d) on the interior."""
    h = grid.halo
    n = (grid.nx, grid.ny, grid.nz)

    def sl(shift_axis: int, d: int) -> tuple:
        out = []
        for ax in range(3):
            d_ax = d if ax == shift_axis else 0
            out.append(slice(h + d_ax, h + d_ax + n[ax]))
        return tuple(out)

    acc = r5
    for d in range(grid.radius, 0, -1):
        acc = acc + W[d] * (u0[sl(axis, -d)] + u0[sl(axis, d)])
    return acc


def oracle_step(
    u_cur: np.ndarray,
    u_prev: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    dt: float,
    dtype=np.float32,
    target: np.ndarray | None = None,
) -> np.ndarray:
    """One leapfrog step; returns the full padded u_next (frozen halo kept).

    dtype=np.float64 gives the ground-truth stepper: identical scheme and
    coefficient values (the f32 literals widened to f64) with f64 rounding.
    The f32 correctness gate is relative-L2 against this truth — the
    criterion the reference documents (README.md:33); its max-abs<1e-4 code
    gate (main.cpp:603) only holds between two backends compiled from the
    same source with identical FMA contraction and is not reproducible
    across independent implementations.
    """
    u0 = np.asarray(u_cur, dtype=dtype)
    u1 = np.asarray(u_prev, dtype=dtype)
    m = np.asarray(m, dtype=dtype)
    dt = dtype(dt)

    hx, hy, hz = dtype(grid.hx), dtype(grid.hy), dtype(grid.hz)
    r1 = dtype(1.0) / (dt * dt)
    r2 = dtype(1.0) / (hx * hx)
    r3 = dtype(1.0) / (hy * hy)
    r4 = dtype(1.0) / (hz * hz)
    W = tuple(dtype(w) for w in stencil_weights(grid.order))

    interior = grid.interior_slices()
    u0c = u0[interior]
    u1c = u1[interior]
    mc = m[interior]

    r5 = W[0] * u0c
    tx = _axis_term(u0, grid, 0, r5, W)
    ty = _axis_term(u0, grid, 1, r5, W)
    tz = _axis_term(u0, grid, 2, r5, W)

    upd = (
        dt
        * dt
        * (r2 * tx + r3 * ty + r4 * tz - (dtype(-2.0) * r1 * u0c + r1 * u1c) * mc)
        / mc
    )
    # The write target is the third ring buffer u[t2] (openacc.cpp:107): only
    # its interior is written, so its OWN rim survives — each ring level keeps
    # the rim it was initialized with, and the effective boundary values seen
    # by the stencil cycle with the %3 ring.
    base = u0 if target is None else np.asarray(target, dtype=dtype)
    u_next = base.copy()
    u_next[interior] = upd
    return u_next


def oracle_inject(u: np.ndarray, term: SourceTerm, src_t: np.ndarray) -> None:
    """In-place scatter-add of one step's source amplitudes (numpy add.at)."""
    if term.empty:
        return
    vals = (np.asarray(src_t, dtype=np.float32)[term.src_idx] * term.scale).astype(
        np.float32
    )
    np.add.at(u, (term.ix, term.iy, term.iz), vals)


def oracle_run(
    u_prev: np.ndarray,
    u_cur: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    dt: float,
    nsteps: int,
    src: np.ndarray | None = None,
    src_coords: np.ndarray | None = None,
    dtype=np.float32,
    u_target: np.ndarray | None = None,
):
    """Run nsteps leapfrog steps; returns (u_{N-1}, u_N).

    src: [nt, nsrc] amplitude table (step k injects row k, openacc.cpp:134);
    src_coords: [nsrc, 3] physical coordinates. dtype=np.float64 runs the
    ground-truth stepper.
    """
    P, C, T = oracle_run_ring(
        u_prev, u_cur, m, grid, dt, nsteps, src, src_coords, dtype, u_target
    )
    return P, C


def oracle_run_ring(
    u_prev: np.ndarray,
    u_cur: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    dt: float,
    nsteps: int,
    src: np.ndarray | None = None,
    src_coords: np.ndarray | None = None,
    dtype=np.float32,
    u_target: np.ndarray | None = None,
):
    """Exact 3-level ring semantics; returns (u_{N-1}, u_N, u_{N-2}).

    u_target is the initial content of the first write buffer (ring level
    (time_m+1)%3); defaults to a copy of u_cur, which reproduces both
    reference setups (perf: all levels zero, main.cpp:389; correctness:
    levels 0 and 1 share the sin IC, main.cpp:529-531).
    """
    term = build_source_term(grid, src_coords, m)
    P = np.array(u_prev, dtype=dtype)
    C = np.array(u_cur, dtype=dtype)
    T = np.array(u_cur if u_target is None else u_target, dtype=dtype)
    for t in range(nsteps):
        un = oracle_step(C, P, m, grid, dt, dtype=dtype, target=T)
        if src is not None and not term.empty:
            oracle_inject(un, term, src[t])
        P, C, T = C, un, P
    return P, C, T


def truth_run_ring(
    u_prev: np.ndarray,
    u_cur: np.ndarray,
    m: np.ndarray,
    grid: Grid3D,
    dt: float,
    nsteps: int,
    src: np.ndarray | None = None,
    src_coords: np.ndarray | None = None,
    u_target: np.ndarray | None = None,
):
    """Fast f64 ground truth: the oracle's scheme compiled with XLA on CPU.

    Identical semantics to oracle_run_ring(dtype=np.float64) — same
    coefficient values, frozen-rim target writes, %3 ring, scatter-add
    injection — with a different fp association order inside the fused
    stencil; the two agree to f64 roundoff (~1e-15 rel), invisible under
    the 1e-4 correctness gate (main.cpp:603) and the test tolerances. This
    makes the reference's full correctness ladder {32..512}^3 x 50
    (main.cpp:679) routine: the NumPy oracle takes minutes at 512^3, this
    takes seconds. Falls back to the NumPy oracle when the CPU backend or
    x64 mode is unavailable.
    """
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import enable_x64

        cpu = jax.devices("cpu")[0]
    except Exception:  # pragma: no cover - CPU backend always present in CI
        return oracle_run_ring(
            u_prev, u_cur, m, grid, dt, nsteps, src, src_coords,
            np.float64, u_target,
        )

    term = build_source_term(grid, src_coords, m)
    have_src = src is not None and not term.empty
    f8 = np.float64
    dt64 = f8(dt)
    hx, hy, hz = f8(grid.hx), f8(grid.hy), f8(grid.hz)
    r1 = f8(1.0) / (dt64 * dt64)
    r2, r3, r4 = f8(1.0) / (hx * hx), f8(1.0) / (hy * hy), f8(1.0) / (hz * hz)
    W = tuple(f8(w) for w in stencil_weights(grid.order))
    h = grid.halo
    n = (grid.nx, grid.ny, grid.nz)
    interior = grid.interior_slices()

    def sl(shift_axis: int, d: int) -> tuple:
        return tuple(
            slice(h + (d if ax == shift_axis else 0),
                  h + (d if ax == shift_axis else 0) + n[ax])
            for ax in range(3)
        )

    with enable_x64(), jax.default_device(cpu):
        m64 = jnp.asarray(m, jnp.float64)
        mc = m64[interior]

        def step(C, P, T, srow):
            u0c = C[interior]
            r5 = W[0] * u0c
            terms = []
            for axis, rax in ((0, r2), (1, r3), (2, r4)):
                acc = r5
                for d in range(grid.radius, 0, -1):
                    acc = acc + W[d] * (C[sl(axis, -d)] + C[sl(axis, d)])
                terms.append(rax * acc)
            upd = (
                dt64 * dt64
                * (terms[0] + terms[1] + terms[2]
                   - (f8(-2.0) * r1 * u0c + r1 * P[interior]) * mc)
                / mc
            )
            un = T.at[interior].set(upd)
            if srow is not None:
                vals = srow[term.src_idx] * jnp.asarray(term.scale, jnp.float64)
                un = un.at[term.ix, term.iy, term.iz].add(vals)
            return un

        def body(carry, srow):
            P, C, T = carry
            un = step(C, P, T, srow)
            return (C, un, P), None

        state = (
            jnp.asarray(u_prev, jnp.float64),
            jnp.asarray(u_cur, jnp.float64),
            jnp.asarray(u_cur if u_target is None else u_target, jnp.float64),
        )
        xs = jnp.asarray(src[:nsteps], jnp.float64) if have_src else None
        run = jax.jit(
            lambda s, x: jax.lax.scan(body, s, x, length=nsteps)[0]
        )
        P, C, T = run(state, xs)
        return (
            np.asarray(P, np.float64),
            np.asarray(C, np.float64),
            np.asarray(T, np.float64),
        )
