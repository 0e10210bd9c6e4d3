"""Pallas-TPU leapfrog kernel v5 — manual-DMA plane sweep with in-place
K-step temporal fusion.

The v4 packed kernels (stencil_pallas_z) let Mosaic's automatic block
pipeline stream overlapping x-halo windows, which re-fetches 2KR x-planes per
bx-plane block and double-buffers whole multi-level windows: ~2.5 HBM passes
per step at 512^3 (fused K=2). This kernel is the TPU-native analogue of the
reference's shared-memory plane sweep (cuda_optimized.cu:146-237): a single
grid-less program sweeps the x axis keeping rings of full (nyp, nz) y-z
planes in VMEM, so every u plane moves between HBM and VMEM exactly once per
fused call:

    K=1:  read cur + read prev + write next   = 3 plane-passes / step
    K=2:  read 2 + write 2 per two steps      = 2   passes / step
    K=3:  read 2 + write 2 per three steps    = 4/3 passes / step

All fetches/writes are explicit `pltpu.make_async_copy` DMAs pipelined
FETCH_LEAD planes ahead of compute (the role the reference's `load_plane` +
__syncthreads ring plays, with DMA semaphores instead of barriers).

In-place on U[2] for every K: the write DMA for plane X of either level is
issued strictly after the pipeline's last read of that plane (reads trail at
most R planes behind stage 1's frontier; writes trail 2R*(K-1) behind), so
u_{n+K-1} and u_{n+K} safely overwrite u_{n-1} and u_n level-for-level. This
also halves the HBM working set vs the v4 U[4] fused scheme.

Temporal-fusion semantics match stencil_pallas_z.packed_fused2 (frozen-rim
regime): intermediate-stage planes outside the global interior are the
frozen cur planes, stage y-rim rows are masked back to cur, z rims come from
the shared (read-only) rim array, and source injection is corrected by the
caller via linear superposition (sources.injection_propagation_cubes).

The z rim stays in the reference row orientation (lane-padded to
zrim[nxp, nyp, ZR_LANES], see `pad_zrim`) in HBM and is DMA'd
plane-by-plane into a small VMEM ring alongside the cur planes, so the
leap slices rim columns directly with no transposes at all. (Round 1
carried the whole rim VMEM-resident transposed as [nxp, 2h, nyp] to dodge
the 16x (8,128)-tile padding of a 2h-lane block; the per-leap (2h, nyp) ->
(nyp, 2h) transposes that design required measured 17% of the whole step
at 512^3 — scripts/prof_leap ablation, round 2. The ring costs ~0.17 ms of
fully-overlapped DMA per fused call and frees the ~10 MB rim block.) The
8-slot ring covers fetch lead 1 plus the stage-K read trail R*(K-1), which
bounds zrT-mode fusion at R*(K-1) <= ZR_RING - 2 (K <= 4 for order 4).

Media: uniform m is a compile-time scalar folded into the leap (the regime
of the reference benchmark, m = 1.5 everywhere, main.cpp:352);
heterogeneous m runs as a per-plane w = dt^2/(h^2 m) DMA stream applied in
the same vector op (see sweep_fused's `w`).

Stencil orders: 4 (radius 2, the flagship, with the paired/flat chunked
modes) and 6 (radius 3: a 2R+1-plane x window on the PROFILE_R3 ring
geometry, per-plane kernel only — the reference's optimized kernel is
order-4-only, cuda_optimized.cu:39). Orders 8-12 use the packed engines.

Constraints: px >= K*R (stage-1 fetch frontier); py = 8 supports any K
(stages compute interior rows only). ny % 8 == 0 (sublane-aligned interior
rows). Any nz (nz % 128 == 0 for full DMA efficiency).

bf16 storage mode (the TPU analogue of the reference's FP16 storage path,
cuda_optimized.cu:261-343, done without shadow copies): U lives in HBM as
bfloat16, halving both the DMA traffic and the resident state; the DMA rings
are bfloat16 and each arriving cur plane is widened ONCE into an f32 shadow
ring, all stencil arithmetic runs in f32 (the fused stages hand f32 planes
to each other through the f32 stage ring — no intermediate rounding), and
only the final out planes are rounded back to bf16 on the store into the
out ring. bf16's (16, 128) VMEM tiling requires py = 16 and ny % 16 == 0
so every sublane DMA offset stays tile-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Grid3D, stencil_weights

import os

# Stage-ring store mode: "fused" assembles each intermediate stage plane as
# ONE full-row array (rim rows concatenated around the computed interior at
# sublane-tile-aligned offsets — pure layout copies) and writes the ring slot
# in a single store; "split" keeps the three-store form (interior + two rim
# bands). The round-4 ablation attributed part of the 0.47 ms/step structure
# gap at 512^3 to the per-stage rim-copy stores, but the round-5 hardware
# probe measured the fused form SLOWER (1.40/1.30 vs 1.274 ms/step at 512^3:
# Mosaic materializes the concat as a fresh full-plane temporary, while the
# split stores hit disjoint slices of the ring slot in place), so "split"
# stays the default; both forms are bitwise-identical in memory effect.
STAGE_STORE_FUSED = os.environ.get("TPUFDTD_STAGE_STORE", "split") != "split"

# z-neighbor build mode (compiled kernels only): "roll" forms each z+-d
# neighbor row as ONE lane rotate — in zrT mode the wrapped lanes of the
# boundary 128-lane tile are then fixed from the rim block with a select
# (narrow ops on one lane tile), in z_embed mode the wrap lands in dead /
# rim lanes that `finish` masks anyway so the roll alone suffices; "concat"
# keeps the unaligned lane-shift concatenates. The round-4 ablation named
# the concat lowering as part of the 0.47 ms/step structure gap at 512^3,
# but the round-5 hardware probe measured the roll form SLOWER (roll+fused
# 1.54 vs fused-only 1.40 vs baseline 1.274 ms/step: a full-row lane rotate
# crosses every 128-lane tile, where the shift-concat only touches the two
# boundary tiles), so "concat" stays the default. Both forms are bitwise-
# identical on every stored lane. Interpret mode always uses the
# concat/slice forms (pltpu.roll has no CPU lowering).
Z_NEIGHBOR_ROLL = os.environ.get("TPUFDTD_ZNB", "concat") != "concat"

CUR_RING = 8  # power of two >= 2R + 1 + FETCH_LEAD
PREV_RING = 4  # power of two >= 1 + FETCH_LEAD
STAGE_RING = 8  # power of two >= 2R + 1 (+ pipeline skew slack)
OUT_RING = 4
ZR_RING = 8  # z-rim planes: fetch lead 1 + stage-K trail R*(K-1) + 1 slack
ZR_LANES = 128  # rim planes carry 2h rim columns in a lane-tile-wide block
FETCH_LEAD = 3

# Ring geometry profiles (cur, prev, out, zr, fetch_lead, unroll, zr_lead).
# Slot-index staticness requires every ring size to divide the unroll factor
# or vice versa; DMA slot-reuse safety requires cur >= R + lead + 3,
# prev > lead and zr >= R*(K-1) + 1 + zr_lead (see _sweep_kernel). The deep
# profile doubles the rings and the fetch leads for SMALL planes, where
# per-iteration compute (~tens of vregs) is too short to hide the fixed DMA
# issue latency — the bubbles, not VPU work, dominate sub-256^3 step time.
# Selected by plane size in _ring_profile; the `ring_profile` argument of
# sweep_fused overrides for experiments.
PROFILE_STD = (CUR_RING, PREV_RING, OUT_RING, ZR_RING, FETCH_LEAD, 8, 1)
PROFILE_DEEP = (16, 16, 8, 16, 8, 16, 3)
DEEP_PLANE_BYTES = 384 * 1024  # deep profile for f32 planes up to ~256^3
# radius-3 (order-6) geometry: the wider x window needs cur >= R + lead + 3
# and a zr ring covering the deeper stage trail R*(K-1) (K <= 4 here)
PROFILE_R3 = (16, 8, 8, 16, 4, 16, 1)

# Paired-plane (pb=2) ring geometry, in CHUNK (2-plane) units. The stage
# ring only needs 3 live chunks (+1 skew); DMA distances halve in chunk
# units, so leads of 2/4 chunks match the std/deep plane leads.
PAIR_STAGE_RING = 4
PAIR_PROFILE_STD = (8, 4, 4, 8, 2, 8, 1)
PAIR_PROFILE_DEEP = (8, 8, 4, 8, 4, 8, 2)


def _ring_profile(grid: Grid3D, py: int = 8, name: str = "auto",
                  pb: int = 1):
    if name not in ("auto", "std", "deep"):
        raise ValueError(
            f"ring_profile must be 'auto', 'std' or 'deep'; got {name!r}"
        )
    if grid.radius == 3:
        # single radius-3 geometry (pairing is radius-2 only, so pb == 1);
        # an explicit std/deep request cannot be honored here
        if name != "auto":
            raise ValueError(
                "radius-3 (order-6) grids have a single ring geometry"
                f" (PROFILE_R3); ring_profile={name!r} is not selectable —"
                " pass 'auto'"
            )
        return PROFILE_R3
    deep_name, std_name = (
        (PAIR_PROFILE_DEEP, PAIR_PROFILE_STD) if pb == 2
        else (PROFILE_DEEP, PROFILE_STD)
    )
    if name == "std":
        return std_name
    if name == "deep":
        return deep_name
    plane = (grid.ny + 2 * py) * core_nz(grid) * 4
    return deep_name if plane <= DEEP_PLANE_BYTES else std_name


def _z_roll_neighbors(c, zr, d: int, h: int, nz: int):
    """zrT-mode (z+d, z-d) neighbor rows of c via lane rotates.

    Interior lanes come from ONE `pltpu.roll` of the full row; the d wrapped
    lanes at each boundary land in the first/last 128-lane tile and are
    replaced there by the true rim columns, pre-rotated into position from
    the 128-lane rim block (every fix op touches a single lane tile). The
    concatenates reassembling the fixed tile are lane-tile aligned — pure
    layout, unlike the unaligned lane-shift concats this replaces. Values
    are bitwise-identical to the concat form on every lane.

    Works on (ylen, nz) planes and (pb, ylen, nz) chunks; zr is the
    matching (..., ZR_LANES) rim block with rim columns at lanes [0, 2h).
    Requires nz % ZR_LANES == 0 (the compiled zrT core guarantee).
    """
    ax = c.ndim - 1
    L = ZR_LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, zr.shape, ax)
    rp = pltpu.roll(c, nz - d, ax)  # lane i <- c[(i + d) % nz]
    pp = pltpu.roll(zr, (L - d - h) % L, ax)  # rim col h+j at lane L-d+j
    tp = jnp.where(lane >= L - d, pp, rp[..., nz - L :])
    zp = tp if nz == L else jnp.concatenate([rp[..., : nz - L], tp], axis=ax)
    rm = pltpu.roll(c, d, ax)  # lane i <- c[(i - d) % nz]
    pm = pltpu.roll(zr, (L - h + d) % L, ax)  # rim col h-d+j at lane j
    tm = jnp.where(lane < d, pm, rm[..., :L])
    zm = tm if nz == L else jnp.concatenate([tm, rm[..., L:]], axis=ax)
    return zp, zm


def pad_zrim(zrim: np.ndarray) -> np.ndarray:
    """[nxp, nyp, 2h] reference rim -> lane-padded [nxp, nyp, ZR_LANES]
    (Mosaic only DMAs lane extents that are tile multiples; the padding
    lanes are dead — same bytes on the wire, HBM tiles pad them anyway)."""
    zrim = np.asarray(zrim)
    out = np.zeros(zrim.shape[:2] + (ZR_LANES,), zrim.dtype)
    out[:, :, : zrim.shape[2]] = zrim
    return out


def max_k_fuse(grid: Grid3D, px: int = 8, py: int = 8, pb: int = 1) -> int:
    """Largest supported fusion depth for pad geometry (px, py): stage-1's
    x fetch frontier needs px >= K*R; py >= 8 suffices for any K (stages
    compute interior rows only; y rim rows are copied, not computed). The
    cap of 6 is a VMEM-pragmatics bound; zrT-mode grids are further capped
    by the z-rim ring reuse distance: the slot a fetch overwrites was last
    read one trail span + 1 iterations earlier. The per-plane kernel
    trails R*(K-1) PLANES, so R*(K-1) <= ZR_RING - 2 (K <= 4 for radius
    2); the paired kernel (pb=2) trails K-1 CHUNKS against its own 8-slot
    chunk ring ((K-1) + 1 + zr_lead <= 8 -> K <= 6), so deep fusion on
    zrT grids is a paired-kernel capability. z_embed grids carry the rim
    in-core and keep 6 in both kernels."""
    R = grid.radius
    if R == 3:
        # R3 profile: zr 16 >= 3(K-1) + 1 + 1 -> K <= 4 (both rim modes
        # share the one radius-3 ring geometry; pairing is radius-2 only)
        cap = 4
    elif z_embedded(grid):
        cap = 6
    elif pb == 2:
        # pair zr ring: 8 chunk slots >= (K-1) + 1 + ZL (ZL <= 2)
        cap = min(6, PAIR_PROFILE_STD[3] - 2)
    else:
        cap = min(6, (ZR_RING - 2) // R + 1)
    return max(1, min(px // R, cap)) if py >= 8 else 1


def supported(grid: Grid3D, interpret: bool = False) -> bool:
    """Any nz is supported: aligned nz uses the side-array zrT rim mode;
    nz % 128 != 0 uses the rim-in-core z_embed mode (Mosaic rejects DMA
    slices of non-tile-multiple lane extents, so the layout pads the core
    lanes — physically free, the (8,128) HBM tiling pads them anyway)."""
    del interpret
    # radius <= 3 (order <= 6): the leap's x-neighbor window is 2R+1 planes
    # and radius 3 has its own ring geometry (PROFILE_R3); orders 8-12 use
    # the packed engines (the reference's optimized kernel is likewise
    # order-4-only, cuda_optimized.cu:39)
    return (
        grid.ny % 8 == 0 and grid.radius <= 3
        and grid.nx >= 2 * grid.radius
    )


def z_embedded(grid: Grid3D) -> bool:
    return grid.nz % 128 != 0


def core_nz(grid: Grid3D) -> int:
    if not z_embedded(grid):
        return grid.nz
    return -(-(grid.nz + 2 * grid.halo) // 128) * 128


VMEM_BUDGET = 120 * 1024 * 1024  # leave headroom under the 128 MB VMEM


def bf16_supported(grid: Grid3D) -> bool:
    """bf16 storage additionally needs ny % 16 == 0 (the bf16 (16, 128) VMEM
    tile: py = 16 and 16-aligned interior row counts keep every sublane DMA
    offset tile-aligned)."""
    return supported(grid) and grid.ny % 16 == 0


def vmem_bytes(grid: Grid3D, K: int, px: int, py: int = 8,
               bf16: bool = False, pb: int = 1,
               variable_m: bool = False, flat: bool = False) -> int:
    """Scratch VMEM this kernel needs at fusion depth K (rings + the
    lane-padded zrT block); used to pick the largest K that fits.

    pb = 2: ring counts are in chunk units (x pb planes per slot), the
    stage ring shrinks to PAIR_STAGE_RING chunks, and the leap's scoped
    temporaries are chunk-sized."""
    ny, nz = grid.ny, core_nz(grid)
    nyp = ny + 2 * py
    nxp = grid.nx + 2 * px
    cur_n, prev_n, out_n, zr_n = _ring_profile(grid, py, pb=pb)[:4]
    esz = 2 if bf16 else 4
    plane = pb * nyp * nz * 4  # f32 compute slot (pb planes)
    plane_s = pb * nyp * nz * esz  # storage-dtype slot (DMA rings)
    # flat mode emits full rows (pad rows included) into the out ring
    out_plane = pb * (nyp if flat else ny) * nz * esz
    if z_embedded(grid):
        zrt = 8 * 128 * 4  # placeholder block only
    else:
        # z-rim ring: (pb, nyp, ZR_LANES) lane-padded rim slots
        zrt = zr_n * pb * nyp * ZR_LANES * 4
    stage_ring_n = PAIR_STAGE_RING if pb == 2 else STAGE_RING
    stage = (K - 1) * stage_ring_n * plane if K > 1 else 8 * 128 * 4
    # bf16: the f32 shadow ring the cur planes are widened into
    cur32 = cur_n * plane if bf16 else 0
    # Mosaic needs ~12-16 slot-sized scoped temporaries for the leap
    # expression on top of the declared scratch (measured: 132.2 MB actual
    # vs 103 MB declared at 768^3 K=3)
    temporaries = 13 * plane
    # variable_m: the per-plane medium-scale ring (f32)
    zl = _ring_profile(grid, py, pb=pb)[6]
    unroll = _ring_profile(grid, py, pb=pb)[5]
    wring = (
        _w_ring_n(K, grid.radius, zl, unroll, pb=pb) * plane
        if variable_m
        else 0
    )
    return (
        cur_n * plane_s
        + cur32
        + prev_n * plane_s
        + stage
        + 2 * out_n * out_plane
        + zrt
        + wring
        + temporaries
    )


def _w_ring_fits(grid: Grid3D, K: int, py: int, pb: int = 1) -> bool:
    """True when the per-plane (pb=1) kernel's w ring divides its unroll
    factor — required for static slot indexing (see _w_ring_n). The paired
    profiles always satisfy this for K <= 6; the std per-plane profile
    breaks at K >= 5 (only reachable on z_embed grids, where max_k_fuse
    keeps the cap at 6)."""
    rings = _ring_profile(grid, py, pb=pb)
    zl, unroll = rings[6], rings[5]
    return unroll % _w_ring_n(K, grid.radius, zl, unroll, pb=pb) == 0


def _k_admissible(grid: Grid3D, k: int, px: int, py: int, bf16: bool,
                  variable_m: bool, pair: str) -> bool:
    """True when sweep_fused(k_fuse=k) runs on this grid through at least
    one kernel: the per-plane path, or the paired (pb=2) path whose
    chunk-unit z-rim ring admits the deeper K = 5-6 on zrT grids (the
    auto pair gate engages it whenever the geometry holds and the chunk
    rings fit VMEM; flat auto resolves OFF — round-4 probes measured the
    non-flat pair fastest at every plane width, see the sweep_fused
    gate)."""
    if (
        k <= max_k_fuse(grid, px, py, pb=1)
        and (not variable_m or _w_ring_fits(grid, k, py, pb=1))
        and vmem_bytes(grid, k, px, py, bf16, pb=1, variable_m=variable_m)
        <= VMEM_BUDGET
    ):
        return True
    if pair == "off":
        return False
    pair_geom = grid.radius == 2 and grid.nx % 2 == 0 and px % 2 == 0
    return (
        pair_geom
        and k <= max_k_fuse(grid, px, py, pb=2)
        and (not variable_m or _w_ring_fits(grid, k, py, pb=2))
        and vmem_bytes(
            grid, k, px, py, bf16, pb=2, flat=False, variable_m=variable_m
        )
        <= VMEM_BUDGET
    )


def pick_k_fuse(grid: Grid3D, want: int, bf16: bool = False,
                variable_m: bool = False, pair: str = "auto") -> int:
    """Largest K <= want whose scratch fits the VMEM budget (0 if none)."""
    R = grid.radius
    py = 16 if bf16 else 8
    for k in range(want, 0, -1):
        px = max(grid.halo, k * R)
        if _k_admissible(grid, k, px, py, bf16, variable_m, pair):
            return k
    return 0


def _make_leap(grid: Grid3D, dt: float, m_val: float, use_roll: bool = True,
               z_embed: bool = False, pb: int = 1, variable_m: bool = False,
               frozen_ylo: int = 0, frozen_yhi: int = 0,
               flat: bool = False, py: int = 8):
    """leap(planes, prev, zrp, y0, ylen, w=None) -> (ylen, width) update.

    frozen_ylo/frozen_yhi: freeze the first/last interior ROWS of every
    computed plane (masked back to the cur values, like z_embed's lane
    mask) — the y-edge-shard margins of the 2-D-mesh sharded sweep, where
    the extended-interior rows overlay the global frozen y rim.

    variable_m: the medium is a per-point field; `w` is this plane's
    precomputed scale (dt^2/(h^2*m) isotropic, dt^2/m anisotropic — see
    sweep_fused) and replaces the scalar factor in the SAME vector op, so
    heterogeneous media cost zero extra VPU passes (the reference reads
    m[gid] per point every step, cuda_optimized.cu:251, openacc.cpp:107;
    here the division is precomputed once on the host in f64). The uniform
    path (variable_m=False) is untouched — bitwise identical to round 2.

    pb = 2 selects the chunked (paired-plane) form: every array carries a
    leading pb axis ((pb, nyp, width) planes, (pb, ylen, width) prev/output)
    and each vector op covers pb x-planes, halving the op count at constant
    total work (the per-op fixed lowering overhead dominates small planes —
    RESULTS.md VPU analysis). The per-element operation order is identical
    to pb = 1, so outputs are bitwise equal.

    planes = (cm2, cm1, c, cp1, cp2) full (nyp, width) x-neighbor planes;
    prev: (ylen, width) previous-time plane rows. Mirrors openacc.cpp:102-107
    term-for-term.

    Two z-rim modes:
    - rim-ring mode (width == nz): zrp is this plane's frozen z rim as a
      (nyp, 2h) ring plane; z neighbors are concats of the interior with
      its column slices (no transposes — the rim arrives row-oriented).
    - z_embed mode (width = round_up(nz + 2h, 128)): the rim lives inside
      the plane at lanes [0:h] / [h+nz:2h+nz] (dead zero lanes beyond), so
      z neighbors are plain lane shifts with zero fill; non-interior lanes
      of the update are masked back to the cur plane (frozen rim; dead
      lanes stay exactly 0). zrp is ignored.
    """
    R = grid.radius
    h = grid.halo
    nz = grid.nz
    W = stencil_weights(grid.order)
    dt32 = np.float32(dt)
    r2 = np.float32(1.0) / np.float32(grid.hx) ** 2
    r3 = np.float32(1.0) / np.float32(grid.hy) ** 2
    r4 = np.float32(1.0) / np.float32(grid.hz) ** 2
    r1 = np.float32(1.0) / (dt32 * dt32)
    m = np.float32(1.0) if m_val is None else np.float32(m_val)

    uniform_h = grid.hx == grid.hy == grid.hz

    # y (sublane) neighbor rows: `pltpu.roll` lowers ~17% faster end-to-end
    # than misaligned sublane slices (measured at 512^3; sublane realignment
    # shuffles dominate the slice form). Values are identical — for d <= py
    # the sliced window never sees the roll's wraparound rows — so the
    # interpret path (no roll lowering on CPU) keeps plain slices.
    if use_roll:
        def yshift(cy, d: int, y0: int, y1: int):
            nyp_l = cy.shape[0]
            sh = d if d > 0 else nyp_l + d
            return pltpu.roll(cy, sh, 0)[y0:y1, :]
    else:
        def yshift(cy, d: int, y0: int, y1: int):
            return cy[y0 - d : y1 - d, :]

    roll_znb = use_roll and Z_NEIGHBOR_ROLL

    def z_neighbors(c, zr, d: int, ylen: int):
        """(z+d, z-d) neighbor rows of c."""
        if z_embed:
            if roll_znb:
                # wrapped lanes land in dead/rim lanes that `finish` masks
                # back to cur, so the bare rotate is value-identical
                W_l = c.shape[-1]
                return pltpu.roll(c, W_l - d, 1), pltpu.roll(c, d, 1)
            zeros = jnp.zeros((ylen, d), c.dtype)
            zp = jnp.concatenate([c[:, d:], zeros], axis=1)
            zm = jnp.concatenate([zeros, c[:, : c.shape[1] - d]], axis=1)
            return zp, zm
        if roll_znb and nz % ZR_LANES == 0:
            return _z_roll_neighbors(c, zr, d, h, nz)
        zp = jnp.concatenate([c[:, d:], zr[:, h : h + d]], axis=1)
        zm = jnp.concatenate([zr[:, h - d : h], c[:, : nz - d]], axis=1)
        return zp, zm

    def finish(upd, c, ylen: int):
        """z_embed: mask non-interior lanes back to the frozen cur values
        (rim lanes stay frozen; dead lanes stay 0). frozen_ylo/yhi mask
        edge rows the same way (2-D-mesh y-edge shards)."""
        if frozen_ylo or frozen_yhi:
            row = jax.lax.broadcasted_iota(jnp.int32, (ylen, c.shape[1]), 0)
            ok = jnp.logical_and(
                row >= frozen_ylo, row < ylen - frozen_yhi
            )
            upd = jnp.where(ok, upd, c)
        if not z_embed:
            return upd
        lane = jax.lax.broadcasted_iota(jnp.int32, (ylen, c.shape[1]), 1)
        interior = jnp.logical_and(lane >= h, lane < h + nz)
        return jnp.where(interior, upd, c)

    def get_zr(zrp, y0: int, y1: int):
        if z_embed:
            return None
        return zrp[y0:y1, :]  # (ylen, 2h) rim-ring plane rows

    def leap_exact(planes, prev, zrp, y0: int, ylen: int, w=None):
        """u_next in the reference's exact algebraic form
        (openacc.cpp:102-107), term-for-term. variable_m applies the
        per-point w = dt^2/m to the combined spatial sum instead (same
        value up to fp association; gated by the oracle tolerance).

        planes is the (2R+1)-plane x window, center at index R."""
        cy = planes[R]
        y1 = y0 + ylen
        c = cy[y0:y1, :]
        zr = get_zr(zrp, y0, y1)
        r5 = W[0] * c
        tx, ty, tz = r5, r5, r5
        xs = {d: (planes[R - d], planes[R + d]) for d in range(1, R + 1)}
        for d in range(R, 0, -1):
            xm, xp = xs[d]
            tx = tx + W[d] * (xm[y0:y1, :] + xp[y0:y1, :])
            ty = ty + W[d] * (yshift(cy, d, y0, y1) + yshift(cy, -d, y0, y1))
            zp, zm = z_neighbors(c, zr, d, ylen)
            tz = tz + W[d] * (zp + zm)
        if variable_m:
            upd = w[y0:y1, :] * (r2 * tx + r3 * ty + r4 * tz) + (
                np.float32(2.0) * c - prev
            )
        else:
            upd = (
                dt32
                * dt32
                * (r2 * tx + r3 * ty + r4 * tz - (np.float32(-2.0) * r1 * c + r1 * prev) * m)
                / m
            )
        return finish(upd, c, ylen)

    def leap_isotropic(planes, prev, zrp, y0: int, ylen: int, w=None):
        """Same update for hx == hy == hz with one fused accumulator: the
        axis sums share the 1/h^2 factor, saving ~1/3 of the VPU ops.
        Differs from leap_exact only in fp association order (gated by the
        rel-L2 tolerance vs the f64 oracle, DEVIATIONS.md item 1).
        variable_m swaps the scalar scale for the w plane — same op count."""
        cy = planes[R]
        y1 = y0 + ylen
        c = cy[y0:y1, :]
        zr = get_zr(zrp, y0, y1)
        acc = (np.float32(3.0) * W[0]) * c
        xs = {d: (planes[R - d], planes[R + d]) for d in range(1, R + 1)}
        for d in range(R, 0, -1):
            xm, xp = xs[d]
            nb = xm[y0:y1, :] + xp[y0:y1, :]
            nb = nb + yshift(cy, d, y0, y1)
            nb = nb + yshift(cy, -d, y0, y1)
            zp, zm = z_neighbors(c, zr, d, ylen)
            nb = nb + zp
            nb = nb + zm
            acc = acc + W[d] * nb
        if variable_m:
            upd = w[y0:y1, :] * acc + (np.float32(2.0) * c - prev)
        else:
            scale = dt32 * dt32 * r2 / m  # r2 == r3 == r4
            upd = scale * acc + (np.float32(2.0) * c - prev)
        return finish(upd, c, ylen)

    if pb == 1:
        return leap_isotropic if uniform_h else leap_exact

    if flat:
        # ---- flat chunked forms: the whole (pb, nyp, width) chunk is
        # computed as ONE 2-D (pb*nyp, width) array over ALL rows (pad rows
        # included), and a single row mask freezes the y-rim band back to
        # the cur values — replacing the interior-row slices and the two
        # per-stage rim-copy stores of the 3-D chunked forms. 2-D vector ops
        # lower with less per-op overhead than 3-D ones on Mosaic (the 3-D
        # overhead is what made pb=2 LOSE at 128-lane planes — sweep_fused's
        # pair gate note), and full-row compute costs only 2*py/nyp extra
        # arithmetic. y shifts are rolls of the flat row axis: interior rows
        # read at distance d <= R < py never cross a plane boundary, and
        # rows that do wrap land in the masked rim band. Per-element op
        # order matches the pb=1 forms, so interior outputs are bitwise
        # equal (pinned by tests/test_sweep.py::test_sweep_flat_bitwise).
        ny_i = grid.ny

        def _fl(x):
            return x.reshape(-1, x.shape[-1])

        if use_roll:
            def yshift_f(c2, d: int):
                n = c2.shape[0]
                return pltpu.roll(c2, d if d > 0 else n + d, 0)
        else:
            def yshift_f(c2, d: int):
                return jnp.roll(c2, d, axis=0)

        roll_znb_f = use_roll and Z_NEIGHBOR_ROLL

        def z_neighbors_f(c, zr, d: int):
            rows = c.shape[0]
            if z_embed:
                if roll_znb_f:
                    W_l = c.shape[-1]
                    return pltpu.roll(c, W_l - d, 1), pltpu.roll(c, d, 1)
                zeros = jnp.zeros((rows, d), c.dtype)
                zp = jnp.concatenate([c[:, d:], zeros], axis=1)
                zm = jnp.concatenate([zeros, c[:, : c.shape[1] - d]], axis=1)
                return zp, zm
            if roll_znb_f and nz % ZR_LANES == 0:
                return _z_roll_neighbors(c, zr, d, h, nz)
            zp = jnp.concatenate([c[:, d:], zr[:, h : h + d]], axis=1)
            zm = jnp.concatenate([zr[:, h - d : h], c[:, : nz - d]], axis=1)
            return zp, zm

        def finish_f(upd, c):
            rows, width = c.shape
            nyp_l = rows // pb
            row = jax.lax.broadcasted_iota(
                jnp.int32, (pb, nyp_l, width), 1
            ).reshape(rows, width)
            ok = jnp.logical_and(
                row >= py + frozen_ylo, row < py + ny_i - frozen_yhi
            )
            upd = jnp.where(ok, upd, c)
            if not z_embed:
                return upd
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
            interior = jnp.logical_and(lane >= h, lane < h + nz)
            return jnp.where(interior, upd, c)

        def leap_flat_exact(planes, prev, zrp, y0: int, ylen: int, w=None):
            # y0/ylen ignored: flat mode always computes all rows
            cm2, cm1, cy, cp1, cp2 = (_fl(p) for p in planes)
            c = cy
            zr = None if z_embed else _fl(zrp)
            pv = _fl(prev)
            r5 = W[0] * c
            tx, ty, tz = r5, r5, r5
            xs = {1: (cm1, cp1), 2: (cm2, cp2)}
            for d in range(R, 0, -1):
                xm, xp = xs[d]
                tx = tx + W[d] * (xm + xp)
                ty = ty + W[d] * (yshift_f(cy, d) + yshift_f(cy, -d))
                zp, zm = z_neighbors_f(c, zr, d)
                tz = tz + W[d] * (zp + zm)
            if variable_m:
                upd = _fl(w) * (r2 * tx + r3 * ty + r4 * tz) + (
                    np.float32(2.0) * c - pv
                )
            else:
                upd = (
                    dt32
                    * dt32
                    * (r2 * tx + r3 * ty + r4 * tz
                       - (np.float32(-2.0) * r1 * c + r1 * pv) * m)
                    / m
                )
            return finish_f(upd, c).reshape(planes[2].shape)

        def leap_flat_isotropic(planes, prev, zrp, y0: int, ylen: int,
                                w=None):
            cm2, cm1, cy, cp1, cp2 = (_fl(p) for p in planes)
            c = cy
            zr = None if z_embed else _fl(zrp)
            pv = _fl(prev)
            acc = (np.float32(3.0) * W[0]) * c
            xs = {1: (cm1, cp1), 2: (cm2, cp2)}
            for d in range(R, 0, -1):
                xm, xp = xs[d]
                nb = xm + xp
                nb = nb + yshift_f(cy, d)
                nb = nb + yshift_f(cy, -d)
                zp, zm = z_neighbors_f(c, zr, d)
                nb = nb + zp
                nb = nb + zm
                acc = acc + W[d] * nb
            if variable_m:
                upd = _fl(w) * acc + (np.float32(2.0) * c - pv)
            else:
                scale = dt32 * dt32 * r2 / m  # r2 == r3 == r4
                upd = scale * acc + (np.float32(2.0) * c - pv)
            return finish_f(upd, c).reshape(planes[2].shape)

        return leap_flat_isotropic if uniform_h else leap_flat_exact

    # ---- pb == 2: chunked (paired-plane) forms -----------------------------
    # Same algebra on (pb, ., .) arrays; y shifts on axis 1, z on axis 2.
    if use_roll:
        def yshift3(cy, d: int, y0: int, y1: int):
            nyp_l = cy.shape[1]
            sh = d if d > 0 else nyp_l + d
            return pltpu.roll(cy, sh, 1)[:, y0:y1, :]
    else:
        def yshift3(cy, d: int, y0: int, y1: int):
            return cy[:, y0 - d : y1 - d, :]

    roll_znb3 = use_roll and Z_NEIGHBOR_ROLL

    def z_neighbors3(c, zr, d: int, ylen: int):
        if z_embed:
            if roll_znb3:
                W_l = c.shape[-1]
                return pltpu.roll(c, W_l - d, 2), pltpu.roll(c, d, 2)
            zeros = jnp.zeros((pb, ylen, d), c.dtype)
            zp = jnp.concatenate([c[:, :, d:], zeros], axis=2)
            zm = jnp.concatenate([zeros, c[:, :, : c.shape[2] - d]], axis=2)
            return zp, zm
        if roll_znb3 and nz % ZR_LANES == 0:
            return _z_roll_neighbors(c, zr, d, h, nz)
        zp = jnp.concatenate([c[:, :, d:], zr[:, :, h : h + d]], axis=2)
        zm = jnp.concatenate([zr[:, :, h - d : h], c[:, :, : nz - d]], axis=2)
        return zp, zm

    def finish3(upd, c, ylen: int):
        if frozen_ylo or frozen_yhi:
            row = jax.lax.broadcasted_iota(
                jnp.int32, (pb, ylen, c.shape[2]), 1
            )
            ok = jnp.logical_and(
                row >= frozen_ylo, row < ylen - frozen_yhi
            )
            upd = jnp.where(ok, upd, c)
        if not z_embed:
            return upd
        lane = jax.lax.broadcasted_iota(jnp.int32, (pb, ylen, c.shape[2]), 2)
        interior = jnp.logical_and(lane >= h, lane < h + nz)
        return jnp.where(interior, upd, c)

    def get_zr3(zrp, y0: int, y1: int):
        if z_embed:
            return None
        return zrp[:, y0:y1, :]

    def leap3_exact(planes, prev, zrp, y0: int, ylen: int, w=None):
        cm2, cm1, cy, cp1, cp2 = planes
        y1 = y0 + ylen
        c = cy[:, y0:y1, :]
        zr = get_zr3(zrp, y0, y1)
        r5 = W[0] * c
        tx, ty, tz = r5, r5, r5
        xs = {1: (cm1, cp1), 2: (cm2, cp2)}
        for d in range(R, 0, -1):
            xm, xp = xs[d]
            tx = tx + W[d] * (xm[:, y0:y1, :] + xp[:, y0:y1, :])
            ty = ty + W[d] * (
                yshift3(cy, d, y0, y1) + yshift3(cy, -d, y0, y1)
            )
            zp, zm = z_neighbors3(c, zr, d, ylen)
            tz = tz + W[d] * (zp + zm)
        if variable_m:
            upd = w[:, y0:y1, :] * (r2 * tx + r3 * ty + r4 * tz) + (
                np.float32(2.0) * c - prev
            )
        else:
            upd = (
                dt32
                * dt32
                * (r2 * tx + r3 * ty + r4 * tz - (np.float32(-2.0) * r1 * c + r1 * prev) * m)
                / m
            )
        return finish3(upd, c, ylen)

    def leap3_isotropic(planes, prev, zrp, y0: int, ylen: int, w=None):
        cm2, cm1, cy, cp1, cp2 = planes
        y1 = y0 + ylen
        c = cy[:, y0:y1, :]
        zr = get_zr3(zrp, y0, y1)
        acc = (np.float32(3.0) * W[0]) * c
        xs = {1: (cm1, cp1), 2: (cm2, cp2)}
        for d in range(R, 0, -1):
            xm, xp = xs[d]
            nb = xm[:, y0:y1, :] + xp[:, y0:y1, :]
            nb = nb + yshift3(cy, d, y0, y1)
            nb = nb + yshift3(cy, -d, y0, y1)
            zp, zm = z_neighbors3(c, zr, d, ylen)
            nb = nb + zp
            nb = nb + zm
            acc = acc + W[d] * nb
        if variable_m:
            upd = w[:, y0:y1, :] * acc + (np.float32(2.0) * c - prev)
        else:
            scale = dt32 * dt32 * r2 / m
            upd = scale * acc + (np.float32(2.0) * c - prev)
        return finish3(upd, c, ylen)

    return leap3_isotropic if uniform_h else leap3_exact


def _w_ring_n(K: int, R: int, zl: int, unroll: int, pb: int = 1) -> int:
    """w-ring depth: plane j's scale is fetched zl ahead of its stage-1
    leap and last read by stage K, (K-1)*R planes ((K-1) chunks for pb=2)
    later, so reuse distance = (K-1)*R + zl + 1 — the same one-iteration
    reuse margin the zr ring relies on (see _sweep_kernel's ring-safety
    comment). Rounded up to a power of two; slot indices are taken at the
    STATIC k = t % unroll, so correctness additionally requires the result
    to divide unroll — checked by the kernels' ring assertions and gated
    in sweep_fused/pick_k_fuse (round-2 advisory: the former +1 extra
    slack pushed K=4 std-profile variable-m to a 16-slot ring indexed
    mod 8, leaving half the slots never written)."""
    d = (K - 1) * (1 if pb == 2 else R)
    need = d + zl + 1
    return 1 << max(0, need - 1).bit_length()


def _sweep_kernel(
    u_hbm,
    zr_hbm,
    w_hbm,
    out_hbm,
    cur_ring,
    cur32_ring,
    prev_ring,
    stage_ring,
    out_ring,
    zr_ring,
    w_ring,
    sem_cur,
    sem_prev,
    sem_out,
    sem_zr,
    sem_w,
    *,
    grid: Grid3D,
    dt: float,
    m_val: float,
    K: int,
    px: int,
    py: int,
    cur: int,
    use_roll: bool = True,
    z_embed: bool = False,
    frozen_lo: int = 0,
    frozen_hi: int = 0,
    frozen_ylo: int = 0,
    frozen_yhi: int = 0,
    bf16: bool = False,
    variable_m: bool = False,
    rings=PROFILE_STD,
):
    """frozen_lo/frozen_hi: interior planes [0, frozen_lo) and
    [nx - frozen_hi, nx) are treated as frozen (copied through every stage,
    never leap-updated). Used by the sharded sweep for edge shards whose
    extended-interior margin overlays the global frozen x rim — the margin
    must stay bit-frozen through all K stages or stage reads near the true
    interior edge would see leap-updated rim values (parallel/sharded.py).

    rings: (cur, prev, out, zr, fetch_lead, unroll, zr_lead) ring geometry;
    the local names below shadow the module-level std constants. DMA
    slot-reuse safety (fetch into a slot strictly after its previous plane's
    last read): cur >= R + fetch_lead + 3, prev > fetch_lead,
    zr >= R*(K-1) + 1 + zr_lead."""
    CUR_RING, PREV_RING, OUT_RING, ZR_RING, FETCH_LEAD, UNROLL, ZL = rings
    R = grid.radius
    assert CUR_RING >= R + FETCH_LEAD + 3 and PREV_RING > FETCH_LEAD
    # the zr ring is only live in rim-ring mode; z_embed carries the rim
    # in-core and never touches it
    assert K == 1 or z_embed or ZR_RING >= R * (K - 1) + 1 + ZL
    for ring in (CUR_RING, PREV_RING, OUT_RING, ZR_RING, STAGE_RING):
        assert ring % UNROLL == 0 or UNROLL % ring == 0, (ring, UNROLL)
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    fl, fh = frozen_lo, frozen_hi
    nyp = ny + 2 * py
    leap = _make_leap(
        grid, dt, m_val, use_roll=use_roll, z_embed=z_embed,
        variable_m=variable_m, frozen_ylo=frozen_ylo, frozen_yhi=frozen_yhi,
    )
    W_N = _w_ring_n(K, R, ZL, UNROLL)
    # w-ring slots are indexed at the static k = t % UNROLL, so the ring
    # must divide the unroll factor or fetches only ever touch a subset of
    # the slots (round-2 advisory bug)
    assert not variable_m or UNROLL % W_N == 0, (W_N, UNROLL)
    n_iter = nx + 2 * R * (K - 1)
    j0 = -(K - 1) * R  # stage-1 plane index at iteration 0 (interior coords)
    cur_lvl = cur if K == 1 else 1
    prev_lvl = 1 - cur_lvl

    # cur planes consumed, in order: px + j0 - R .. px + nx - 1 + (K-1)*R
    # (interior stage-1 planes need +-R neighbors; trailing frozen planes
    # need only themselves, and px + nx - 1 + (K-1)R >= px + nx - 1 + R).
    q_cur0 = px + j0 - R
    assert q_cur0 >= 0, "pad too narrow: need px >= K*R"
    q_cur_last = px + nx - 1 + max((K - 1) * R, R)
    assert q_cur_last <= nx + 2 * px - 1
    n_cur = q_cur_last - q_cur0 + 1
    # prev planes consumed: px + j for interior j in [0, nx)
    q_prev0 = px

    # compute-side cur planes: in bf16 mode each arriving bf16 plane is
    # widened ONCE into the f32 shadow ring; all downstream reads hit f32
    c32 = cur32_ring if bf16 else cur_ring
    ocast = (lambda x: x.astype(jnp.bfloat16)) if bf16 else (lambda x: x)

    def widen_cur(slot: int):
        if bf16:
            cur32_ring[slot] = cur_ring[slot][...].astype(jnp.float32)

    def fetch_cur(q, slot: int):
        return pltpu.make_async_copy(
            u_hbm.at[cur_lvl, q], cur_ring.at[slot], sem_cur.at[slot]
        )

    def fetch_prev(q, slot: int):
        return pltpu.make_async_copy(
            u_hbm.at[prev_lvl, q], prev_ring.at[slot], sem_prev.at[slot]
        )

    # z-rim ring (rim-ring mode only): plane i's (nyp, 2h) frozen rim is
    # fetched one iteration ahead of its stage-1 leap and stays live through
    # the stage-K read R*(K-1) iterations later (slot reuse safety: the slot
    # a fetch overwrites was last read one iteration earlier — see
    # max_k_fuse). Issue/wait stay balanced at frozen-margin planes, whose
    # leaps are skipped, so the slot semaphores never drift.
    use_zr = not z_embed

    def fetch_zr(i, slot: int):
        return pltpu.make_async_copy(
            zr_hbm.at[px + i], zr_ring.at[slot], sem_zr.at[slot]
        )

    def zr_at(d_back: int, k: int):
        """Rim plane for interior index j - d_back, static ring slot."""
        return zr_ring[(j0 + k - d_back) % ZR_RING]

    # w ring (variable_m only): per-plane medium scale, same fetch cadence
    # and reuse pattern as the z-rim ring (one plane per iteration, last
    # read by stage K R*(K-1) iterations later), active in BOTH rim modes.
    def fetch_w(i, slot: int):
        return pltpu.make_async_copy(
            w_hbm.at[px + i], w_ring.at[slot], sem_w.at[slot]
        )

    def w_at(d_back: int, k: int):
        if not variable_m:
            return None
        return w_ring[(j0 + k - d_back) % W_N]

    def write_out(lvl: int, slot: int, X):
        # lvl 0 -> u_{n+K-1} (new prev), lvl 1 -> u_{n+K} (new cur); for
        # K == 1 the single output overwrites the prev level (2-buffer ring).
        dst = prev_lvl if K == 1 else lvl
        return pltpu.make_async_copy(
            out_ring.at[lvl, slot],
            out_hbm.at[dst, X, pl.ds(py, ny), :],
            sem_out.at[lvl, slot],
        )

    # ---- prologue ----------------------------------------------------------
    n_pro_cur = min(2 * R + FETCH_LEAD, n_cur)
    for a in range(n_pro_cur):
        fetch_cur(q_cur0 + a, (q_cur0 + a) % CUR_RING).start()
    for a in range(min(2 * R, n_cur)):
        fetch_cur(q_cur0 + a, (q_cur0 + a) % CUR_RING).wait()
        widen_cur((q_cur0 + a) % CUR_RING)
    n_pro_prev = min(FETCH_LEAD, nx)
    for a in range(n_pro_prev):
        fetch_prev(q_prev0 + a, (q_prev0 + a) % PREV_RING).start()
    # prologue rim planes 0..zr_lead-1; planes zr_lead..nx-1 issue in-sweep
    if use_zr:
        for a in range(min(ZL, nx)):
            fetch_zr(a, a % ZR_RING).start()
    if variable_m:
        for a in range(min(ZL, nx)):
            fetch_w(a, a % W_N).start()

    # The x sweep runs in blocks of UNROLL unrolled iterations so that EVERY
    # ring slot index is a compile-time constant (UNROLL*b contributes 0 mod
    # every ring size): Mosaic then addresses the ring planes as direct
    # views. With traced slot indices each access materializes a full-plane
    # VMEM copy, which measured ~2.5x slower than the automatic pipeline.
    n_blk = -(-n_iter // UNROLL)

    # Steady-state split: for t in [steady_lo, steady_hi) EVERY guard in the
    # loop body is statically true (all stages in the interior, all DMA
    # frontiers in range, all out-slot waits active), so the hot fori_loop
    # body carries no predication at all. The ragged prologue/epilogue run
    # with PYTHON-int t, so their guards resolve at trace time too — the
    # compiled kernel contains zero branches.
    # frozen margins must resolve statically, so their iterations are pushed
    # into the ragged head/tail: the last lo-margin guard fires at
    # t = fl - 1 + 2R(K-1) (stage K at js = fl - 1), the first hi-margin one
    # at t = nx - fh + (K-1)R (stage 1 at js = nx - fh).
    if K == 1:
        steady_lo = max(OUT_RING, fl)
        steady_hi = min(n_cur - n_pro_cur, nx - FETCH_LEAD, nx - fh)
    else:
        steady_lo = max(2 * R * (K - 1) + OUT_RING, fl + 2 * R * (K - 1))
        steady_hi = min(
            n_cur - n_pro_cur,
            nx + (K - 1) * R - FETCH_LEAD,
            nx - fh + (K - 1) * R,
        )
    steady_lo = max(0, steady_lo)
    steady_hi = max(steady_lo, steady_hi)

    def emit(t, k: int, cond):
        """One sweep iteration. t: traced or Python int; k = t % UNROLL
        static; cond(site...) -> Python bool resolving each guard."""
        qc_issue = q_cur0 + n_pro_cur + t
        if cond(None, "qc_issue"):
            fetch_cur(qc_issue, (q_cur0 + n_pro_cur + k) % CUR_RING).start()
        qc_wait = q_cur0 + 2 * R + t
        if cond(None, "qc_wait"):
            fetch_cur(qc_wait, (q_cur0 + 2 * R + k) % CUR_RING).wait()
            widen_cur((q_cur0 + 2 * R + k) % CUR_RING)

        j = j0 + t  # stage-1 interior plane index
        if cond(None, "prev_issue"):
            fetch_prev(
                px + j + FETCH_LEAD, (px + j0 + k + FETCH_LEAD) % PREV_RING
            ).start()
        # the wait must stay balanced with prev_issue even at frozen margin
        # planes (which skip the leap), or ring-slot semaphores drift
        if cond(None, "prev_wait"):
            fetch_prev(px + j, (px + j0 + k) % PREV_RING).wait()
        if use_zr and cond(None, "zr_issue"):
            fetch_zr(j + ZL, (j0 + k + ZL) % ZR_RING).start()
        if use_zr and cond(None, "zr_wait"):
            fetch_zr(j, (j0 + k) % ZR_RING).wait()
        if variable_m and cond(None, "zr_issue"):
            fetch_w(j + ZL, (j0 + k + ZL) % W_N).start()
        if variable_m and cond(None, "zr_wait"):
            fetch_w(j, (j0 + k) % W_N).wait()

        def cur_at(d: int):  # cur plane at X1 + d, static slot
            return c32[(px + j0 + k + d) % CUR_RING]

        X1 = px + j
        s1_slot = (px + j0 + k) % STAGE_RING
        planes1 = tuple(cur_at(d) for d in range(-R, R + 1))
        cy1 = planes1[R]

        if K == 1:
            o_slot = k % OUT_RING
            if cond(None, "in1"):
                pv = prev_ring[(px + j0 + k) % PREV_RING]
                pv_rows = pv[py : py + ny, :]
                if bf16:
                    pv_rows = pv_rows.astype(jnp.float32)
                zr1 = None if z_embed else zr_at(0, k)
                upd = leap(planes1, pv_rows, zr1, py, ny, w_at(0, k))
            else:
                # frozen margin plane: rims are identical across levels, so
                # writing the cur value into the prev level is a no-op value-wise
                upd = cy1[py : py + ny, :]
            if cond(None, "out_wait1"):
                write_out(0, o_slot, X1).wait()
            out_ring[0, o_slot] = ocast(upd)
            # u_next overwrites the prev level (2-buffer leapfrog ring)
            write_out(0, o_slot, X1).start()
            return

        # Fused stages. Every stage computes ONLY the ny interior rows: the
        # band rows a later stage reads beyond the interior are frozen rim
        # rows whose true value is the cur plane's, so they are copied, not
        # computed.
        if cond(None, "in1"):
            pv = prev_ring[(px + j0 + k) % PREV_RING]
            pv_rows = pv[py : py + ny, :]
            if bf16:
                pv_rows = pv_rows.astype(jnp.float32)
            zr1 = None if z_embed else zr_at(0, k)
            upd1 = leap(planes1, pv_rows, zr1, py, ny, w_at(0, k))
            if STAGE_STORE_FUSED:
                stage_ring[0, s1_slot] = jnp.concatenate(
                    [cy1[0:py, :], upd1, cy1[py + ny :, :]], axis=0
                )
            else:
                stage_ring[0, s1_slot, py : py + ny] = upd1
                stage_ring[0, s1_slot, 0:py] = cy1[0:py, :]
                stage_ring[0, s1_slot, py + ny :] = cy1[py + ny :, :]
        elif cond(None, "pad1"):
            stage_ring[0, s1_slot] = cy1[...]

        for st in range(2, K + 1):
            js = j0 + t - R * (st - 1)
            Xs = px + js
            ks = (px + j0 + k - R * (st - 1)) % STAGE_RING
            if not cond(None, "run", st):
                continue
            planes = tuple(
                stage_ring[st - 2, (ks + d) % STAGE_RING]
                for d in range(-R, R + 1)
            )
            cyS = planes[R]
            if st < K:
                if cond(None, "in", st):
                    if st == 2:
                        pvs = c32[(px + j0 + k - R) % CUR_RING]
                    else:
                        pvs = stage_ring[st - 3, ks]
                    zrs = None if z_embed else zr_at(R * (st - 1), k)
                    upd = leap(planes, pvs[py : py + ny, :], zrs, py, ny,
                               w_at(R * (st - 1), k))
                    if STAGE_STORE_FUSED:
                        stage_ring[st - 1, ks] = jnp.concatenate(
                            [cyS[0:py, :], upd, cyS[py + ny :, :]], axis=0
                        )
                    else:
                        stage_ring[st - 1, ks, py : py + ny] = upd
                        stage_ring[st - 1, ks, 0:py] = cyS[0:py, :]
                        stage_ring[st - 1, ks, py + ny :] = cyS[py + ny :, :]
                else:
                    stage_ring[st - 1, ks] = cyS[...]
            else:
                # final stage: emit (u_{n+K-1}, u_{n+K}) for plane Xs
                o_slot = (j0 + k - R * (K - 1)) % OUT_RING
                if cond(None, "out_wait", st):
                    write_out(0, o_slot, px).wait()
                    write_out(1, o_slot, px).wait()
                if cond(None, "in", st):
                    if st == 2:
                        pvs = c32[(px + j0 + k - R) % CUR_RING]
                    else:
                        pvs = stage_ring[st - 3, ks]
                    zrs = None if z_embed else zr_at(R * (st - 1), k)
                    upd = leap(planes, pvs[py : py + ny, :], zrs, py, ny,
                               w_at(R * (st - 1), k))
                else:
                    # frozen margin plane: pass the cur value through
                    upd = cyS[py : py + ny, :]
                out_ring[1, o_slot] = ocast(upd)
                # u_{n+K-1} = stage K-1's plane Xs, interior rows
                out_ring[0, o_slot] = ocast(stage_ring[st - 2, ks][py : py + ny, :])
                write_out(0, o_slot, Xs).start()
                write_out(1, o_slot, Xs).start()

    def static_cond(t: int):
        def cond(_legacy, site, st=None):
            j = j0 + t
            if site == "qc_issue":
                return q_cur0 + n_pro_cur + t <= q_cur_last
            if site == "qc_wait":
                return q_cur0 + 2 * R + t <= q_cur_last
            if site == "prev_issue":
                return n_pro_prev <= j + FETCH_LEAD < nx
            if site == "prev_wait":
                return 0 <= j < nx
            if site == "zr_issue":
                # plane j + zr_lead; planes < zr_lead are prologue-fetched
                return 0 <= j < nx - ZL
            if site == "zr_wait":
                return 0 <= j < nx
            if site == "in1":
                return fl <= j < nx - fh
            if site == "pad1":
                return j < nx + (K - 1) * R
            if site == "out_wait1":
                return t >= OUT_RING
            js = j - R * (st - 1)
            lo = -(K - st) * R
            if site == "run":
                return lo <= js < nx - lo
            if site == "in":
                return fl <= js < nx - fh
            if site == "out_wait":
                return js >= OUT_RING
            raise AssertionError(site)

        return cond

    def steady_cond(_legacy, site, st=None):
        return True  # every steady-range guard holds; "pad1" is unreachable

    # ragged head: static t, guards folded at trace time
    head_blk = min(-(-steady_lo // UNROLL), n_blk)
    tail_blk = max(head_blk, min(steady_hi // UNROLL, n_blk))
    for t in range(0, head_blk * UNROLL):
        if t < n_iter:
            emit(t, t % UNROLL, static_cond(t))

    if tail_blk > head_blk:
        def body(b, carry):
            for k in range(UNROLL):
                emit(UNROLL * b + k, k, steady_cond)
            return carry

        jax.lax.fori_loop(head_blk, tail_blk, body, 0, unroll=False)

    for t in range(tail_blk * UNROLL, n_iter):
        emit(t, t % UNROLL, static_cond(t))

    # ---- drain outstanding writes ------------------------------------------
    # (.wait() only consumes the semaphore slot; the X passed is irrelevant
    # as long as the copy shape — and so the byte count — matches.)
    n_out_lvls = 1 if K == 1 else 2
    for a in range(min(OUT_RING, nx)):
        i = nx - 1 - a
        for lvl in range(n_out_lvls):
            write_out(lvl, i % OUT_RING, px).wait()


def _sweep_kernel_pair(
    u_hbm,
    zr_hbm,
    w_hbm,
    out_hbm,
    cur_ring,
    cur32_ring,
    prev_ring,
    stage_ring,
    out_ring,
    zr_ring,
    w_ring,
    sem_cur,
    sem_prev,
    sem_out,
    sem_zr,
    sem_w,
    *,
    grid: Grid3D,
    dt: float,
    m_val: float,
    K: int,
    px: int,
    py: int,
    cur: int,
    use_roll: bool = True,
    z_embed: bool = False,
    frozen_lo: int = 0,
    frozen_hi: int = 0,
    frozen_ylo: int = 0,
    frozen_yhi: int = 0,
    bf16: bool = False,
    variable_m: bool = False,
    rings=PAIR_PROFILE_STD,
    flat: bool = False,
):
    """Paired-plane (pb=2) variant of _sweep_kernel: every ring slot, DMA
    and vector op covers a CHUNK of 2 consecutive x-planes, halving the op
    and DMA-issue counts at constant total work (the fixed per-op lowering
    overhead dominates small planes — RESULTS.md VPU analysis).

    flat=True computes each chunk as one 2-D (2*nyp, nz) array over ALL
    rows with a single row mask (see _make_leap's flat forms): stage planes
    are stored full-row in one op (no rim-copy stores), the out ring holds
    full rows and the out DMA slices the interior rows at the source.

    Index bookkeeping is the plane kernel's, re-expressed in chunk units;
    with radius R == 2 == pb every stage trails an integer number of chunks
    ((s-1) chunks), so the whole stage pipeline is chunk-aligned. x-chunk
    neighbors at distance +-2 planes are whole adjacent chunks; +-1-plane
    neighbors are leading-axis concats of adjacent chunk halves (register
    renaming only — no lane/sublane data movement). Requires nx, px,
    frozen_lo, frozen_hi all even and radius == 2 (sweep_fused routes).

    Per-element operation order is identical to the plane kernel, so the
    two kernels produce bitwise-equal output (pinned by
    tests/test_sweep.py::test_sweep_pair_bitwise)."""
    CUR_N, PREV_N, OUT_N, ZR_N, LEAD, UNROLL, ZL = rings
    PB = 2
    R = grid.radius
    assert R == PB
    assert CUR_N >= 1 + LEAD + 3 and PREV_N > LEAD
    assert K == 1 or z_embed or ZR_N >= (K - 1) + 1 + ZL
    for ring in (CUR_N, PREV_N, OUT_N, ZR_N, PAIR_STAGE_RING):
        assert ring % UNROLL == 0 or UNROLL % ring == 0, (ring, UNROLL)
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    assert nx % PB == 0 and px % PB == 0
    assert frozen_lo % PB == 0 and frozen_hi % PB == 0
    nxc, pxc = nx // PB, px // PB
    flc, fhc = frozen_lo // PB, frozen_hi // PB
    nyp = ny + 2 * py
    leap = _make_leap(
        grid, dt, m_val, use_roll=use_roll, z_embed=z_embed, pb=PB,
        variable_m=variable_m, frozen_ylo=frozen_ylo, frozen_yhi=frozen_yhi,
        flat=flat, py=py,
    )
    W_N = _w_ring_n(K, R, ZL, UNROLL, pb=PB)
    assert not variable_m or UNROLL % W_N == 0, (W_N, UNROLL)
    n_iter = nxc + 2 * (K - 1)
    j0 = -(K - 1)  # stage-1 chunk index at iteration 0 (interior chunks)
    cur_lvl = cur if K == 1 else 1
    prev_lvl = 1 - cur_lvl

    q_cur0 = pxc + j0 - 1
    assert q_cur0 >= 0, "pad too narrow: need px >= K*R"
    q_cur_last = pxc + nxc - 1 + max(K - 1, 1)
    assert q_cur_last <= (nx + 2 * px) // PB - 1
    n_cur = q_cur_last - q_cur0 + 1
    q_prev0 = pxc

    c32 = cur32_ring if bf16 else cur_ring
    ocast = (lambda x: x.astype(jnp.bfloat16)) if bf16 else (lambda x: x)

    def widen_cur(slot: int):
        if bf16:
            cur32_ring[slot] = cur_ring[slot][...].astype(jnp.float32)

    def fetch_cur(q, slot: int):
        return pltpu.make_async_copy(
            u_hbm.at[cur_lvl, pl.ds(PB * q, PB)],
            cur_ring.at[slot],
            sem_cur.at[slot],
        )

    def fetch_prev(q, slot: int):
        return pltpu.make_async_copy(
            u_hbm.at[prev_lvl, pl.ds(PB * q, PB)],
            prev_ring.at[slot],
            sem_prev.at[slot],
        )

    use_zr = not z_embed

    def fetch_zr(i, slot: int):
        return pltpu.make_async_copy(
            zr_hbm.at[pl.ds(px + PB * i, PB)], zr_ring.at[slot],
            sem_zr.at[slot],
        )

    def zr_at(d_back: int, k: int):
        return zr_ring[(j0 + k - d_back) % ZR_N]

    def fetch_w(i, slot: int):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(px + PB * i, PB)], w_ring.at[slot],
            sem_w.at[slot],
        )

    def w_at(d_back: int, k: int):
        if not variable_m:
            return None
        return w_ring[(j0 + k - d_back) % W_N]

    def write_out(lvl: int, slot: int, Xp):
        dst = prev_lvl if K == 1 else lvl
        # flat mode: the out ring holds full nyp rows; slice the interior
        # band at the DMA source (sublane offset py is tile-aligned)
        src = (
            out_ring.at[lvl, slot, :, pl.ds(py, ny)] if flat
            else out_ring.at[lvl, slot]
        )
        return pltpu.make_async_copy(
            src,
            out_hbm.at[dst, pl.ds(Xp, PB), pl.ds(py, ny), :],
            sem_out.at[lvl, slot],
        )

    def chunk_neighbors(at):
        """5 x-neighbor chunk views from a chunk accessor at(dc)."""
        cm, cc, cp = at(-1), at(0), at(1)
        cm1 = jnp.concatenate([cm[1:PB], cc[0:1]], axis=0)
        cp1 = jnp.concatenate([cc[1:PB], cp[0:1]], axis=0)
        return (cm, cm1, cc, cp1, cp)

    # ---- prologue ----------------------------------------------------------
    n_pro_cur = min(2 + LEAD, n_cur)
    for a in range(n_pro_cur):
        fetch_cur(q_cur0 + a, (q_cur0 + a) % CUR_N).start()
    for a in range(min(2, n_cur)):
        fetch_cur(q_cur0 + a, (q_cur0 + a) % CUR_N).wait()
        widen_cur((q_cur0 + a) % CUR_N)
    n_pro_prev = min(LEAD, nxc)
    for a in range(n_pro_prev):
        fetch_prev(q_prev0 + a, (q_prev0 + a) % PREV_N).start()
    if use_zr:
        for a in range(min(ZL, nxc)):
            fetch_zr(a, a % ZR_N).start()
    if variable_m:
        for a in range(min(ZL, nxc)):
            fetch_w(a, a % W_N).start()

    n_blk = -(-n_iter // UNROLL)

    if K == 1:
        steady_lo = max(OUT_N, flc)
        steady_hi = min(n_cur - n_pro_cur, nxc - LEAD, nxc - fhc)
    else:
        steady_lo = max(2 * (K - 1) + OUT_N, flc + 2 * (K - 1))
        steady_hi = min(
            n_cur - n_pro_cur,
            nxc + (K - 1) - LEAD,
            nxc - fhc + (K - 1),
        )
    steady_lo = max(0, steady_lo)
    steady_hi = max(steady_lo, steady_hi)

    def emit(t, k: int, cond):
        qc_issue = q_cur0 + n_pro_cur + t
        if cond(None, "qc_issue"):
            fetch_cur(qc_issue, (q_cur0 + n_pro_cur + k) % CUR_N).start()
        qc_wait = q_cur0 + 2 + t
        if cond(None, "qc_wait"):
            fetch_cur(qc_wait, (q_cur0 + 2 + k) % CUR_N).wait()
            widen_cur((q_cur0 + 2 + k) % CUR_N)

        j = j0 + t  # stage-1 interior chunk index
        if cond(None, "prev_issue"):
            fetch_prev(
                pxc + j + LEAD, (pxc + j0 + k + LEAD) % PREV_N
            ).start()
        if cond(None, "prev_wait"):
            fetch_prev(pxc + j, (pxc + j0 + k) % PREV_N).wait()
        if use_zr and cond(None, "zr_issue"):
            fetch_zr(j + ZL, (j0 + k + ZL) % ZR_N).start()
        if use_zr and cond(None, "zr_wait"):
            fetch_zr(j, (j0 + k) % ZR_N).wait()
        if variable_m and cond(None, "zr_issue"):
            fetch_w(j + ZL, (j0 + k + ZL) % W_N).start()
        if variable_m and cond(None, "zr_wait"):
            fetch_w(j, (j0 + k) % W_N).wait()

        def cur_at(dc: int):  # cur chunk at chunk offset dc, static slot
            return c32[(pxc + j0 + k + dc) % CUR_N]

        X1 = px + PB * j
        s1_slot = (pxc + j0 + k) % PAIR_STAGE_RING
        planes1 = chunk_neighbors(cur_at)
        cy1 = planes1[2]

        if K == 1:
            o_slot = k % OUT_N
            if cond(None, "in1"):
                pv = prev_ring[(pxc + j0 + k) % PREV_N]
                pv_rows = pv if flat else pv[:, py : py + ny, :]
                if bf16:
                    pv_rows = pv_rows.astype(jnp.float32)
                zr1 = None if z_embed else zr_at(0, k)
                upd = leap(planes1, pv_rows, zr1, py, ny, w_at(0, k))
            else:
                upd = cy1 if flat else cy1[:, py : py + ny, :]
            if cond(None, "out_wait1"):
                write_out(0, o_slot, X1).wait()
            out_ring[0, o_slot] = ocast(upd)
            write_out(0, o_slot, X1).start()
            return

        if cond(None, "in1"):
            pv = prev_ring[(pxc + j0 + k) % PREV_N]
            pv_rows = pv if flat else pv[:, py : py + ny, :]
            if bf16:
                pv_rows = pv_rows.astype(jnp.float32)
            zr1 = None if z_embed else zr_at(0, k)
            upd1 = leap(planes1, pv_rows, zr1, py, ny, w_at(0, k))
            if flat:
                # the leap's row mask already froze the rim band to cy1
                stage_ring[0, s1_slot] = upd1
            elif STAGE_STORE_FUSED:
                stage_ring[0, s1_slot] = jnp.concatenate(
                    [cy1[:, 0:py, :], upd1, cy1[:, py + ny :, :]], axis=1
                )
            else:
                stage_ring[0, s1_slot, :, py : py + ny] = upd1
                stage_ring[0, s1_slot, :, 0:py] = cy1[:, 0:py, :]
                stage_ring[0, s1_slot, :, py + ny :] = cy1[:, py + ny :, :]
        elif cond(None, "pad1"):
            stage_ring[0, s1_slot] = cy1[...]

        for st in range(2, K + 1):
            js = j - (st - 1)
            Xs = px + PB * js
            ks = (pxc + j0 + k - (st - 1)) % PAIR_STAGE_RING
            if not cond(None, "run", st):
                continue

            def st_at(dc: int, _st=st, _ks=ks):
                return stage_ring[_st - 2, (_ks + dc) % PAIR_STAGE_RING]

            planes = chunk_neighbors(st_at)
            cyS = planes[2]
            if st < K:
                if cond(None, "in", st):
                    if st == 2:
                        pvs = c32[(pxc + j0 + k - 1) % CUR_N]
                    else:
                        pvs = stage_ring[st - 3, ks]
                    zrs = None if z_embed else zr_at(st - 1, k)
                    pvr = pvs if flat else pvs[:, py : py + ny, :]
                    upd = leap(planes, pvr, zrs, py, ny, w_at(st - 1, k))
                    if flat:
                        stage_ring[st - 1, ks] = upd
                    elif STAGE_STORE_FUSED:
                        stage_ring[st - 1, ks] = jnp.concatenate(
                            [cyS[:, 0:py, :], upd, cyS[:, py + ny :, :]],
                            axis=1,
                        )
                    else:
                        stage_ring[st - 1, ks, :, py : py + ny] = upd
                        stage_ring[st - 1, ks, :, 0:py] = cyS[:, 0:py, :]
                        stage_ring[st - 1, ks, :, py + ny :] = (
                            cyS[:, py + ny :, :]
                        )
                else:
                    stage_ring[st - 1, ks] = cyS[...]
            else:
                o_slot = (j0 + k - (K - 1)) % OUT_N
                if cond(None, "out_wait", st):
                    write_out(0, o_slot, px).wait()
                    write_out(1, o_slot, px).wait()
                if cond(None, "in", st):
                    if st == 2:
                        pvs = c32[(pxc + j0 + k - 1) % CUR_N]
                    else:
                        pvs = stage_ring[st - 3, ks]
                    zrs = None if z_embed else zr_at(st - 1, k)
                    pvr = pvs if flat else pvs[:, py : py + ny, :]
                    upd = leap(planes, pvr, zrs, py, ny, w_at(st - 1, k))
                else:
                    upd = cyS if flat else cyS[:, py : py + ny, :]
                out_ring[1, o_slot] = ocast(upd)
                out_ring[0, o_slot] = ocast(
                    stage_ring[st - 2, ks]
                    if flat else stage_ring[st - 2, ks][:, py : py + ny, :]
                )
                write_out(0, o_slot, Xs).start()
                write_out(1, o_slot, Xs).start()

    def static_cond(t: int):
        def cond(_legacy, site, st=None):
            j = j0 + t
            if site == "qc_issue":
                return q_cur0 + n_pro_cur + t <= q_cur_last
            if site == "qc_wait":
                return q_cur0 + 2 + t <= q_cur_last
            if site == "prev_issue":
                return n_pro_prev <= j + LEAD < nxc
            if site == "prev_wait":
                return 0 <= j < nxc
            if site == "zr_issue":
                return 0 <= j < nxc - ZL
            if site == "zr_wait":
                return 0 <= j < nxc
            if site == "in1":
                return flc <= j < nxc - fhc
            if site == "pad1":
                return j < nxc + (K - 1)
            if site == "out_wait1":
                return t >= OUT_N
            js = j - (st - 1)
            lo = -(K - st)
            if site == "run":
                return lo <= js < nxc - lo
            if site == "in":
                return flc <= js < nxc - fhc
            if site == "out_wait":
                return js >= OUT_N
            raise AssertionError(site)

        return cond

    def steady_cond(_legacy, site, st=None):
        return True

    head_blk = min(-(-steady_lo // UNROLL), n_blk)
    tail_blk = max(head_blk, min(steady_hi // UNROLL, n_blk))
    for t in range(0, head_blk * UNROLL):
        if t < n_iter:
            emit(t, t % UNROLL, static_cond(t))

    if tail_blk > head_blk:
        def body(b, carry):
            for k in range(UNROLL):
                emit(UNROLL * b + k, k, steady_cond)
            return carry

        jax.lax.fori_loop(head_blk, tail_blk, body, 0, unroll=False)

    for t in range(tail_blk * UNROLL, n_iter):
        emit(t, t % UNROLL, static_cond(t))

    # ---- drain outstanding writes ------------------------------------------
    n_out_lvls = 1 if K == 1 else 2
    for a in range(min(OUT_N, nxc)):
        i = nxc - 1 - a
        for lvl in range(n_out_lvls):
            write_out(lvl, i % OUT_N, px).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "dt", "m_val", "k_fuse", "cur", "interpret", "vmem_limit",
        "frozen_lo", "frozen_hi", "frozen_ylo", "frozen_yhi",
        "ring_profile", "pair", "flat",
    ),
)
def sweep_fused(
    U: jnp.ndarray,
    zrim: jnp.ndarray,
    *,
    grid: Grid3D,
    dt: float,
    m_val: float,
    k_fuse: int = 2,
    cur: int = 1,
    interpret: bool = False,
    vmem_limit: int = 130 * 1024 * 1024,
    frozen_lo: int = 0,
    frozen_hi: int = 0,
    frozen_ylo: int = 0,
    frozen_yhi: int = 0,
    ring_profile: str = "auto",
    pair: str = "auto",
    flat: str = "auto",
    w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """K fused in-place leapfrog steps on packed U[2] = [u_{n-1}, u_n]
    (sweep-layout cores); returns U holding [u_{n+K-1}, u_{n+K}].

    w: heterogeneous-medium mode — a [nxp, nyp, core_nz] f32 array of the
    per-point update scale (dt^2/(hx^2*m) when hx == hy == hz, else
    dt^2/m; precompute in f64 and round — more accurate than the
    reference's runtime f32 division, openacc.cpp:107). When given, m_val
    is ignored and every leap multiplies by this plane's w rows in the
    same vector op that applied the scalar, so variable media cost only
    the extra w DMA stream (4/K B/pt/step — m is read once per K-block).
    Rim cells of w are never read (rims are frozen); in z_embed mode dead
    lanes may hold anything finite (the update is masked back to cur).

    pair: "auto" (default) runs the paired-plane kernel when eligible
    (radius 2, even nx/px/frozen margins, VMEM fits); "off" forces the
    per-plane kernel; "on" requires pairing and raises if ineligible.

    For K >= 2 the level roles are fixed (prev=0, cur=1) on both input and
    output. For K == 1 `cur` names the input cur level and the output lands
    in level 1-cur (roles flip each call, like packed_step).

    zrim: frozen z rim, reference row orientation, lane-padded to
    [nxp, nyp, ZR_LANES] f32 via `pad_zrim` (HBM resident, DMA'd per-plane
    — see module docstring); ignored (placeholder) in z_embed mode.

    frozen_lo/frozen_hi freeze the first/last interior planes (copied, never
    leap-updated) — the edge-shard margins of the sharded sweep.
    frozen_ylo/frozen_yhi freeze the first/last interior ROWS of every
    computed plane (row-masked in the leap) — the y-edge-shard margins of
    the 2-D-mesh sharded sweep.
    """
    K = k_fuse
    nxp, nyp, nz = U.shape[1], U.shape[2], U.shape[3]
    ny = grid.ny
    px, py = (nxp - grid.nx) // 2, (nyp - ny) // 2
    z_embed = nz != grid.nz
    bf16 = U.dtype == jnp.bfloat16
    if not supported(grid):
        raise ValueError(
            f"sweep kernel needs ny % 8 == 0, order <= 4 and nx >= 2*radius;"
            f" got ny={grid.ny}, order={grid.order}, nx={grid.nx}"
        )
    if bf16 and (ny % 16 != 0 or py % 16 != 0):
        raise ValueError(
            f"bf16 storage needs ny % 16 == 0 and a 16-multiple y pad (the"
            f" bf16 (16, 128) VMEM tile); got ny={ny}, py={py} — build the"
            f" state via ZSplitLayout(grid, py=16, ...)"
        )
    if U.dtype not in (jnp.float32, jnp.bfloat16):
        raise ValueError(
            f"sweep kernel supports float32 or bfloat16 storage; got {U.dtype}"
        )
    # K range: depths 5-6 on zrT grids are a paired-kernel capability (its
    # chunk-unit z-rim ring trails K-1 chunks vs the per-plane kernel's
    # R*(K-1) planes — max_k_fuse); validate against the best admissible
    # kernel here, then re-check after the pair gate resolves pb below
    _pair_geom = (
        grid.radius == 2 and grid.nx % 2 == 0 and px % 2 == 0
        and frozen_lo % 2 == 0 and frozen_hi % 2 == 0
    )
    _kmax = max_k_fuse(grid, px, py, pb=2 if _pair_geom and pair != "off" else 1)
    if not 1 <= K <= _kmax:
        raise ValueError(
            f"k_fuse={K} out of range for pad geometry px={px}, py={py}"
            f" (supported: 1..{_kmax}; stage-1's fetch"
            f" frontier needs px >= K*radius)"
        )
    if py < 8 or py % 8 != 0:
        raise ValueError(
            f"y pad must be a positive multiple of 8 (sublane tile); got"
            f" py={py} from U.shape[2]={nyp}, ny={ny}"
        )
    if nz != core_nz(grid):
        raise ValueError(
            f"U's z extent {nz} does not match the sweep core layout"
            f" ({core_nz(grid)} for nz={grid.nz}); build U via"
            f" ZSplitLayout(grid, z_embed={z_embedded(grid)})"
        )
    if not interpret and nz % 128 != 0:
        raise ValueError(
            f"compiled mode needs the core z extent lane-tile aligned"
            f" (nz % 128 == 0); got {nz}"
        )
    if not z_embed and zrim.dtype != jnp.float32:
        raise ValueError(
            f"zrim must be float32 (the z rim feeds f32 compute directly,"
            f" even under bf16 storage); got {zrim.dtype}"
        )
    if not z_embed and tuple(zrim.shape) != (nxp, nyp, ZR_LANES):
        raise ValueError(
            f"zrim must be the lane-padded reference-orientation rim"
            f" [nxp, nyp, ZR_LANES] = {(nxp, nyp, ZR_LANES)};"
            f" got {tuple(zrim.shape)} — pass ZSplitLayout.split's rim"
            f" through stencil_sweep.pad_zrim (the round-1 transposed"
            f" zrimT layout is no longer accepted)"
        )
    if frozen_lo < 0 or frozen_hi < 0 or frozen_lo + frozen_hi > grid.nx:
        raise ValueError(
            f"frozen margins out of range: {frozen_lo}+{frozen_hi} vs"
            f" nx={grid.nx}"
        )
    if frozen_ylo < 0 or frozen_yhi < 0 or frozen_ylo + frozen_yhi > ny:
        raise ValueError(
            f"frozen y margins out of range: {frozen_ylo}+{frozen_yhi} vs"
            f" ny={ny}"
        )
    variable_m = w is not None
    if variable_m:
        if w.dtype != jnp.float32:
            raise ValueError(
                f"w (per-point medium scale) must be float32; got {w.dtype}"
            )
        if tuple(w.shape) != (nxp, nyp, nz):
            raise ValueError(
                f"w must match the sweep core layout {(nxp, nyp, nz)};"
                f" got {tuple(w.shape)} — build it from the medium via"
                f" ZSplitLayout.split and the dt^2/(h^2*m) scale"
            )

    if pair not in ("auto", "on", "off"):
        raise ValueError(f"pair must be 'auto', 'on' or 'off'; got {pair!r}")
    if flat not in ("auto", "on", "off"):
        raise ValueError(f"flat must be 'auto', 'on' or 'off'; got {flat!r}")
    pair_ok = _pair_geom
    if pair == "on" and not pair_ok:
        raise ValueError(
            "pair='on' needs radius 2 and even nx, x pad and frozen"
            f" margins; got radius={grid.radius}, nx={grid.nx}, px={px},"
            f" frozen={frozen_lo}/{frozen_hi}"
        )
    pb = 2 if pair != "off" and pair_ok else 1
    use_flat = flat == "on"
    pair_vmem_over = pb == 2 and vmem_bytes(
        grid, K, px, py, bf16, pb=2, variable_m=variable_m, flat=use_flat
    ) > VMEM_BUDGET
    if pair == "auto" and pb == 2 and pair_vmem_over:
        # Auto pairing demotes on VMEM only. Round-4 scan-delta probes on
        # the v5e (K=4, /tmp/flat_ab.log, small_ab.log) re-measured the
        # round-2 plane-width rule with the current rim-DMA kernel and
        # inverted it: non-flat pairing now wins at EVERY probed width
        # (512^3: 1.36 vs 1.39 ms/step; 128^3: 57.4 vs 51.6 Gcell/s
        # unpaired; 96^3 z-embed: 48.3 vs 38.0), and the flat (2-D
        # chunked) leap built for narrow planes measures strictly slower
        # than the 3-D chunked pair at both 512^3 (1.46 ms/step) and
        # 128^3 (56.5 Gcell/s), so flat='auto' resolves OFF and the
        # plane-width demotion is gone. flat='on' keeps the 2-D leap
        # selectable (bitwise-pinned by test_sweep_flat_bitwise).
        pb = 1
        use_flat = flat == "on"
    if use_flat and pb != 2:
        if flat == "on":
            if pair_vmem_over:
                raise ValueError(
                    "flat='on' needs the paired (pb=2) kernel, but its"
                    " chunk rings exceed the VMEM budget on this grid at"
                    f" k_fuse={K} (pairing was eligible and demoted by the"
                    " VMEM check); lower k_fuse or pass pair='on' to force"
                    " it anyway"
                )
            raise ValueError(
                "flat='on' requires the paired kernel (pair eligible);"
                " flat chunking is a mode of the pb=2 kernel"
            )
        use_flat = False
    if K > max_k_fuse(grid, px, py, pb=pb):
        # the depth was admitted for the paired kernel but pairing resolved
        # off (explicit pair='off', or the auto gate demoted it)
        why = (
            "pair='off' requested"
            if pair == "off"
            else "the auto gate demoted it (chunk rings exceed VMEM)"
        )
        raise ValueError(
            f"k_fuse={K} on a zrT-mode grid needs the paired kernel's"
            f" chunk-unit z-rim ring (per-plane cap:"
            f" {max_k_fuse(grid, px, py, pb=1)}), but pairing resolved off"
            f" here ({why}); lower k_fuse (pick_k_fuse models this)"
        )

    rings = _ring_profile(grid, py, ring_profile, pb=pb)
    cur_n, prev_n, out_n, zr_n = rings[:4]
    if variable_m and rings[5] % _w_ring_n(
        K, grid.radius, rings[6], rings[5], pb=pb
    ) != 0:
        raise ValueError(
            f"k_fuse={K} with a heterogeneous medium needs a w ring that"
            f" divides the unroll factor of the"
            f" {'paired' if pb == 2 else 'per-plane'} ring profile; the w"
            f" reuse distance does not fit one here — lower k_fuse (use"
            f" pick_k_fuse(grid, want, variable_m=True))"
        )
    kern = functools.partial(
        _sweep_kernel_pair if pb == 2 else _sweep_kernel,
        grid=grid, dt=dt, m_val=m_val, K=K, px=px, py=py,
        cur=cur, use_roll=not interpret, z_embed=z_embed,
        frozen_lo=frozen_lo, frozen_hi=frozen_hi,
        frozen_ylo=frozen_ylo, frozen_yhi=frozen_yhi, bf16=bf16,
        variable_m=variable_m, rings=rings,
        **({"flat": use_flat} if pb == 2 else {}),
    )
    sdt = U.dtype
    wn = _w_ring_n(K, grid.radius, rings[6], rings[5], pb=pb)
    if pb == 2:
        w_ring_shape = (wn, 2, nyp, nz) if variable_m else (1, 1, 8, 128)
    else:
        w_ring_shape = (wn, nyp, nz) if variable_m else (1, 8, 128)
    w_arg = w if variable_m else jnp.zeros((1, 8, 128), jnp.float32)
    if pb == 2:
        stage_shape = (
            (K - 1, PAIR_STAGE_RING, 2, nyp, nz) if K > 1 else (1, 1, 1, 8, 128)
        )
        scratch = [
            pltpu.VMEM((cur_n, 2, nyp, nz), sdt),
            pltpu.VMEM(
                (cur_n, 2, nyp, nz) if bf16 else (1, 1, 8, 128), jnp.float32
            ),
            pltpu.VMEM((prev_n, 2, nyp, nz), sdt),
            pltpu.VMEM(stage_shape, jnp.float32),
            # flat mode stores full rows in the out ring (the DMA slices the
            # interior band at the source)
            pltpu.VMEM((2, out_n, 2, nyp if use_flat else ny, nz), sdt),
            pltpu.VMEM(
                (1, 1, 8, 128) if z_embed else (zr_n, 2, nyp, ZR_LANES),
                jnp.float32,
            ),
            pltpu.VMEM(w_ring_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((cur_n,)),
            pltpu.SemaphoreType.DMA((prev_n,)),
            pltpu.SemaphoreType.DMA((2, out_n)),
            pltpu.SemaphoreType.DMA((zr_n,)),
            pltpu.SemaphoreType.DMA((wn if variable_m else 1,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((cur_n, nyp, nz), sdt),
            pltpu.VMEM(
                (cur_n, nyp, nz) if bf16 else (1, 8, 128), jnp.float32
            ),
            pltpu.VMEM((prev_n, nyp, nz), sdt),
            pltpu.VMEM(
                ((K - 1, STAGE_RING, nyp, nz) if K > 1 else (1, 1, 8, 128)),
                jnp.float32,
            ),
            pltpu.VMEM((2, out_n, ny, nz), sdt),
            pltpu.VMEM(
                (1, 8, 128) if z_embed else (zr_n, nyp, ZR_LANES),
                jnp.float32,
            ),
            pltpu.VMEM(w_ring_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((cur_n,)),
            pltpu.SemaphoreType.DMA((prev_n,)),
            pltpu.SemaphoreType.DMA((2, out_n)),
            pltpu.SemaphoreType.DMA((zr_n,)),
            pltpu.SemaphoreType.DMA((wn if variable_m else 1,)),
        ]
    flops_per_pt = K * (3 * (grid.order + 1) * 2 + 6)
    bytes_pt = 8 if bf16 else 16  # 2 reads + 2 writes per call
    if variable_m:
        bytes_pt += 4  # the w stream, read once per K-block call
    cost = pl.CostEstimate(
        flops=flops_per_pt * grid.interior_cells,
        bytes_accessed=bytes_pt * grid.interior_cells,
        transcendentals=0,
    )
    return pl.pallas_call(
        kern,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(U.shape, U.dtype),
        input_output_aliases={0: 0},
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit
        ),
        interpret=interpret,
    )(U, zrim, w_arg)


# ---- y-banded sweep: grids whose plane rings exceed VMEM ---------------------


def _band_mult(bf16: bool) -> int:
    return 16 if bf16 else 8


def band_splits(ny: int, bands: int, mult: int) -> list:
    """Split ny interior rows into `bands` contiguous chunks, each a
    positive multiple of `mult` (sublane/bf16-tile alignment)."""
    if ny % mult != 0:
        raise ValueError(f"banded sweep needs ny % {mult} == 0; got {ny}")
    units = ny // mult
    if units < bands:
        raise ValueError(f"ny={ny} too small for {bands} bands of {mult}")
    base, rem = divmod(units, bands)
    return [(base + (1 if b < rem else 0)) * mult for b in range(bands)]


def band_redundancy(K: int, R: int, mult: int) -> int:
    """Redundancy rows per inner band side, rounded up to the row tile: a
    band's values within R*s rows of its extended edge are garbage after
    stage s (they read the pad rows as if frozen), so M >= (K-1)*R rows
    must be discarded — same margin calculus as the sharded sweep
    (parallel/sharded_sweep.py), applied sequentially on one chip."""
    return -(-((K - 1) * R) // mult) * mult


def pick_k_bands(grid: Grid3D, want: int, bf16: bool = False,
                 variable_m: bool = False, pair: str = "auto"):
    """(K, bands) for the largest fusion depth that fits VMEM: bands = 1
    (the plain sweep) preferred, then 2/4/8 y bands whose smaller planes
    shrink every ring. Returns (0, 1) when nothing fits (caller falls back
    to the packed engines). The reference covers any grid under device
    memory with one kernel (main.cpp:337-341); banding is what keeps the
    flagship sweep available at >= 896^3 where full-plane rings overflow."""
    R = grid.radius
    py = 16 if bf16 else 8
    mult = _band_mult(bf16)
    for bands in (1, 2, 4, 8):
        if bands > 1 and (grid.ny % mult != 0 or grid.ny // mult < bands):
            continue
        for k in range(want, 1, -1):
            px = max(grid.halo, k * R)
            if bands == 1:
                ny_b = grid.ny
            else:
                M = band_redundancy(k, R, mult)
                sizes = band_splits(grid.ny, bands, mult)
                if min(sizes) < M:  # margins must fit inside a neighbor band
                    continue
                ny_b = max(sizes) + 2 * M
            import dataclasses as _dc

            g_b = _dc.replace(grid, ny=ny_b)
            if _k_admissible(g_b, k, px, py, bf16, variable_m, pair):
                return k, bands
    return (
        pick_k_fuse(grid, want, bf16=bf16, variable_m=variable_m, pair=pair),
        1,
    )


def sweep_fused_banded(
    U: jnp.ndarray,
    zrim: jnp.ndarray,
    *,
    grid: Grid3D,
    dt: float,
    m_val: float,
    k_fuse: int = 2,
    bands: int = 1,
    cur: int = 1,
    interpret: bool = False,
    vmem_limit: int = 130 * 1024 * 1024,
    frozen_lo: int = 0,
    frozen_hi: int = 0,
    ring_profile: str = "auto",
    pair: str = "auto",
    flat: str = "auto",
    w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """sweep_fused over `bands` sequential y bands: each band runs the
    ordinary kernel on its rows extended by band_redundancy(K) redundant
    rows per inner side (discarded on write-back), so VMEM holds band-sized
    plane rings instead of full planes — the flagship path for grids whose
    full planes overflow the ring budget (>= 896^3 f32).

    Bands run low-to-high y inside one trace; each band's sub-band pad and
    margin rows are snapshotted BEFORE the block (strips), so every band
    reads pre-block neighbor values exactly as the unbanded sweep would —
    output is bitwise-equal to bands=1 (test_sweep.py::test_sweep_banded).
    Extra HBM traffic: one band-input gather + write-back per block,
    ~2/K extra passes per step. Same contract as sweep_fused (frozen x
    margins, w stream, bf16, K==1 level-role flip)."""
    if bands <= 1:
        return sweep_fused(
            U, zrim, grid=grid, dt=dt, m_val=m_val, k_fuse=k_fuse, cur=cur,
            interpret=interpret, vmem_limit=vmem_limit, frozen_lo=frozen_lo,
            frozen_hi=frozen_hi, ring_profile=ring_profile, pair=pair,
            flat=flat, w=w,
        )
    import dataclasses as _dc

    K = k_fuse
    R = grid.radius
    bf16 = U.dtype == jnp.bfloat16
    nyp = U.shape[2]
    py = (nyp - grid.ny) // 2
    mult = _band_mult(bf16)
    z_embed = U.shape[3] != grid.nz
    M = band_redundancy(K, R, mult)
    sizes = band_splits(grid.ny, bands, mult)
    if min(sizes) < M:
        raise ValueError(
            f"band margins ({M} rows) exceed the smallest band"
            f" ({min(sizes)} rows): lower k_fuse or bands"
            f" (pick_k_bands skips such splits)"
        )
    starts = np.concatenate([[0], np.cumsum(sizes)])

    def yband(arr, lo, hi, axis):
        return jax.lax.slice_in_dim(arr, int(lo), int(hi), axis=axis)

    # pre-block snapshot of each inner band's lower pad + margin rows
    # (the rows band b reads that lower bands will have overwritten)
    strips = [
        yband(U, starts[b] - M, py + starts[b], 2) for b in range(1, bands)
    ]
    out = U
    for b in range(bands):
        m_lo = 0 if b == 0 else M
        m_hi = 0 if b == bands - 1 else M
        b0, b1 = int(starts[b]), int(starts[b + 1])
        g_b = _dc.replace(grid, ny=sizes[b] + m_lo + m_hi)
        s0 = b0 - m_lo  # array row where the band input starts
        s1 = py + b1 + m_hi + py  # one past its last pad row
        if b == 0:
            band_u = yband(out, 0, s1, 2)
        else:
            band_u = jnp.concatenate(
                [strips[b - 1], yband(out, py + b0, s1, 2)], axis=2
            )
        zr_b = zrim if z_embed else yband(zrim, s0, s1, 1)
        w_b = None if w is None else yband(w, s0, s1, 1)
        ub = sweep_fused(
            band_u, zr_b, grid=g_b, dt=dt, m_val=m_val, k_fuse=K, cur=cur,
            interpret=interpret, vmem_limit=vmem_limit, frozen_lo=frozen_lo,
            frozen_hi=frozen_hi, ring_profile=ring_profile, pair=pair,
            flat=flat, w=w_b,
        )
        rows = yband(ub, py + m_lo, py + m_lo + sizes[b], 2)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, rows.astype(out.dtype), py + b0, axis=2
        )
    return out
