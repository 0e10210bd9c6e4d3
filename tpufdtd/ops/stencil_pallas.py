"""Pallas-TPU leapfrog stencil kernel — the hot compute path.

TPU-native redesign of the reference's shared-memory plane-sweep CUDA kernel
(cuda_optimized.cu:63-238). The CUDA design hand-manages a 12-plane smem ring
with cooperative halo loads and __syncthreads discipline; on TPU all of that
becomes the Mosaic pipeline: the grid tiles the interior into VMEM blocks,
`pl.Element` block dims give each block a halo-extended input window of u_cur
(the analogue of the smem ring + halo columns), and the hardware DMA engines
double-buffer the HBM->VMEM block streaming.

Mosaic constraints that shape the design (probed on a real v5e):
  * block offsets on the sublane (y) dim must be provably 8-aligned — hence
    the TPU Layout's y pads of round_up(halo, 8) and `pl.multiple_of` hints;
  * block offsets on the lane (z) dim must be 128-aligned — so z stays
    unblocked (full width) and z neighbors come from lane rolls;
  * the leading (x) dim is unconstrained — arbitrary plane offsets, so x
    carries the exact ±R halo window, like the reference's XCHUNK sweep.

Ring-rim semantics (SURVEY.md §2.6): the update is written into the `target`
ring buffer (u[t2], openacc.cpp:107) and only interior cells may change.
x/y rims are simply never visited (the output aliases the donated target
buffer). The z rim lies inside the full-width z blocks, so the caller passes
`zrim` — the target's own current rim planes, sliced fresh each step (NOT a
static copy: source injection may legally deposit into rim cells one beyond
the interior, cuda.cu:155-156, and those deposits must persist) — and the
kernel stores them back verbatim.

All math is f32 and mirrors openacc.cpp:102-107 term-for-term; bf16 storage
is upcast on read and rounded on the final write.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Grid3D, stencil_weights
from ..layout import Layout

DEFAULT_VMEM_BUDGET = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _divisors_le(n: int, cap: int):
    return [d for d in range(1, min(n, cap) + 1) if n % d == 0]


def _y_tileable(grid: Grid3D, layout: Layout) -> bool:
    return grid.ny % 8 == 0 and layout.pad_lo[1] % 8 == 0 and layout.pad_lo[1] >= grid.radius


def block_vmem_bytes(bx: int, by: int, grid: Grid3D, layout: Layout) -> int:
    """Rough VMEM bytes for one pipeline stage: double-buffered window +
    core blocks plus ~4 live core-sized f32 temporaries."""
    nzp = layout.padded_shape[2]
    lanes = _round_up(nzp, 128)
    ym = layout.pad_lo[1]
    nyp = layout.padded_shape[1]
    y_tiled = by < grid.ny or _y_tileable(grid, layout)
    win_y = _round_up(by + 2 * ym, 8) if y_tiled else nyp
    core_y = _round_up(by, 8) if y_tiled else _round_up(nyp, 8)
    win = (bx + 2 * grid.radius) * win_y * lanes
    core = bx * core_y * lanes
    zrim = bx * core_y * 2 * grid.halo
    return 4 * (2 * win + 3 * 2 * core + 2 * zrim + 4 * core)


def choose_tiling(
    grid: Grid3D,
    layout: Optional[Layout] = None,
    vmem_budget_bytes: int = DEFAULT_VMEM_BUDGET,
) -> Tuple[int, int]:
    """Pick (BX, BY) divisors of (nx, ny) that fit the VMEM budget while
    minimizing u_cur halo re-fetch overhead (1+2R/BX)(1+2*pad_y/BY)."""
    if layout is None:
        layout = Layout.tpu(grid)
    ym = layout.pad_lo[1]
    if _y_tileable(grid, layout):
        by_candidates = [d for d in _divisors_le(grid.ny, 2048) if d % 8 == 0]
    else:
        by_candidates = [grid.ny]
    best = None
    best_score = -1.0
    for by in by_candidates:
        for bx in _divisors_le(grid.nx, 256):
            if block_vmem_bytes(bx, by, grid, layout) > vmem_budget_bytes:
                continue
            eff = (bx * by) / ((bx + 2 * grid.radius) * (by + 2 * ym))
            score = eff + 1e-9 * bx * by
            if score > best_score:
                best_score = score
                best = (bx, by)
    if best is None:
        best = (1, 8 if _y_tileable(grid, layout) else grid.ny)
    return best


def _update_from_window(uc, up, m, grid: Grid3D, dt: float, bx, by, ym, y_tiled):
    """Shared kernel math. uc: halo-extended window (f32); up/m: core blocks.

    Returns the full-z-width update (z-neighbor wrap garbage lands only in
    the z rim, which the caller overwrites)."""
    R = grid.radius
    W = stencil_weights(grid.order)
    dt32 = np.float32(dt)
    hx, hy, hz = np.float32(grid.hx), np.float32(grid.hy), np.float32(grid.hz)
    r2 = np.float32(1.0) / (hx * hx)
    r3 = np.float32(1.0) / (hy * hy)
    r4 = np.float32(1.0) / (hz * hz)
    r1 = np.float32(1.0) / (dt32 * dt32)

    def win(dx, dy):
        if y_tiled:
            return uc[R + dx : R + dx + bx, ym + dy : ym + dy + by, :]
        return uc[R + dx : R + dx + bx, :, :]

    c = win(0, 0)
    r5 = W[0] * c
    tx, ty, tz = r5, r5, r5
    for d in range(R, 0, -1):
        tx = tx + W[d] * (win(-d, 0) + win(d, 0))
        if y_tiled:
            ty = ty + W[d] * (win(0, -d) + win(0, d))
        else:
            ty = ty + W[d] * (jnp.roll(c, d, axis=1) + jnp.roll(c, -d, axis=1))
        tz = tz + W[d] * (jnp.roll(c, d, axis=2) + jnp.roll(c, -d, axis=2))

    return (
        dt32
        * dt32
        * (r2 * tx + r3 * ty + r4 * tz - (np.float32(-2.0) * r1 * c + r1 * up) * m)
        / m
    ), c


def _kernel_y_tiled(
    uc_ref, up_ref, m_ref, zrim_ref, _t_ref, out_ref, *, bx, by, grid, dt, layout
):
    ym = layout.pad_lo[1]
    h = grid.halo
    nz = grid.nz
    uc = uc_ref[...].astype(jnp.float32)
    up = up_ref[...].astype(jnp.float32)
    m = m_ref[...]
    upd, _ = _update_from_window(uc, up, m, grid, dt, bx, by, ym, y_tiled=True)
    out_ref[...] = upd.astype(out_ref.dtype)
    # restore the target's own frozen z rim (injections included)
    zr = zrim_ref[...]
    out_ref[:, :, 0:h] = zr[:, :, 0:h]
    out_ref[:, :, h + nz :] = zr[:, :, h:]


def _kernel_y_full(
    uc_ref, up_ref, m_ref, zrim_ref, yrim_ref, _t_ref, out_ref, *, bx, grid, dt, layout
):
    h = grid.halo
    nz = grid.nz
    py_lo, py_hi = layout.pad_lo[1], layout.pad_hi[1]
    ny = grid.ny
    uc = uc_ref[...].astype(jnp.float32)
    up = up_ref[...].astype(jnp.float32)
    m = m_ref[...]
    upd, _ = _update_from_window(uc, up, m, grid, dt, bx, None, None, y_tiled=False)
    out_ref[...] = upd.astype(out_ref.dtype)
    zr = zrim_ref[...]
    out_ref[:, :, 0:h] = zr[:, :, 0:h]
    out_ref[:, :, h + nz :] = zr[:, :, h:]
    yr = yrim_ref[...]
    out_ref[:, 0:py_lo, :] = yr[:, 0:py_lo, :]
    out_ref[:, py_lo + ny :, :] = yr[:, py_lo:, :]


@functools.partial(
    jax.jit, static_argnames=("grid", "dt", "bx", "by", "interpret", "vmem_limit")
)
def leapfrog_step_pallas(
    u_cur: jnp.ndarray,
    u_prev: jnp.ndarray,
    m: jnp.ndarray,
    target: jnp.ndarray,
    *,
    grid: Grid3D,
    dt: float,
    bx: int,
    by: int,
    interpret: bool = False,
    vmem_limit: int = 128 * 1024 * 1024,
) -> jnp.ndarray:
    """One leapfrog step in the TPU Layout; returns u_next in `target`'s
    donated buffer."""
    layout = Layout.tpu(grid)
    h, R = grid.halo, grid.radius
    nxp, nyp, nzp = layout.padded_shape
    px, py = layout.pad_lo[0], layout.pad_lo[1]
    y_tiled = _y_tileable(grid, layout) and by <= grid.ny

    assert grid.nx % bx == 0, (grid.nx, bx)
    gx = grid.nx // bx

    # target's own current rim planes, stored back verbatim by the kernel
    zrim = jnp.concatenate([target[:, :, :h], target[:, :, nzp - h :]], axis=2)

    mo = pl.multiple_of
    inputs = [u_cur, u_prev, m, zrim]
    if y_tiled:
        assert grid.ny % by == 0 and by % 8 == 0, (grid.ny, by)
        gy = grid.ny // by
        pgrid = (gx, gy)
        win_spec = pl.BlockSpec(
            (pl.Element(bx + 2 * R), pl.Element(by + 2 * py), pl.Element(nzp)),
            lambda i, j: (px + i * bx - R, mo(j * by, 8), 0),
            memory_space=pltpu.VMEM,
        )
        core = lambda zdim: pl.BlockSpec(
            (pl.Element(bx), pl.Element(by), pl.Element(zdim)),
            lambda i, j: (px + i * bx, mo(py + j * by, 8), 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [win_spec, core(nzp), core(nzp), core(2 * h)]
        out_spec = core(nzp)
        kern = functools.partial(
            _kernel_y_tiled, bx=bx, by=by, grid=grid, dt=dt, layout=layout
        )
    else:
        pgrid = (gx,)
        win_spec = pl.BlockSpec(
            (pl.Element(bx + 2 * R), pl.Element(nyp), pl.Element(nzp)),
            lambda i: (px + i * bx - R, 0, 0),
            memory_space=pltpu.VMEM,
        )
        core = lambda zdim: pl.BlockSpec(
            (pl.Element(bx), pl.Element(nyp), pl.Element(zdim)),
            lambda i: (px + i * bx, 0, 0),
            memory_space=pltpu.VMEM,
        )
        yrim = jnp.concatenate([target[:, :py, :], target[:, nyp - py :, :]], axis=1)
        inputs.append(yrim)
        yrim_spec = pl.BlockSpec(
            (pl.Element(bx), pl.Element(2 * py), pl.Element(nzp)),
            lambda i: (px + i * bx, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [win_spec, core(nzp), core(nzp), core(2 * h), yrim_spec]
        out_spec = core(nzp)
        kern = functools.partial(_kernel_y_full, bx=bx, grid=grid, dt=dt, layout=layout)

    # target is only an aliasing donor: never read by the kernel
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(target)
    alias_idx = len(inputs) - 1

    flops_per_pt = 3 * (grid.order + 1) * 2 + 6
    cost = pl.CostEstimate(
        flops=flops_per_pt * grid.interior_cells,
        bytes_accessed=16 * grid.interior_cells,
        transcendentals=0,
    )

    return pl.pallas_call(
        kern,
        grid=pgrid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(target.shape, target.dtype),
        input_output_aliases={alias_idx: 0},
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(pgrid),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(*inputs)


def make_step(
    grid: Grid3D,
    dt: float,
    layout: Optional[Layout] = None,
    vmem_budget_bytes: int = DEFAULT_VMEM_BUDGET,
):
    """Bind static config; returns step(u_cur, u_prev, m, target) -> u_next.

    Operates on TPU-Layout arrays (Layout.tpu(grid))."""
    bx, by = choose_tiling(grid, layout, vmem_budget_bytes)
    interpret = jax.default_backend() != "tpu"

    def step(u_cur, u_prev, m, target=None):
        if target is None:
            target = u_prev
        return leapfrog_step_pallas(
            u_cur, u_prev, m, target, grid=grid, dt=dt, bx=bx, by=by, interpret=interpret
        )

    return step
