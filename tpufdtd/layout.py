"""Internal array layouts.

The reference stores u as [nx+2H, ny+2H, nz+2H] with H = stencil order
(main.cpp:360-363). That layout is kept as the *reference layout* (oracle,
jnp backend, all external APIs). The Pallas TPU kernel additionally needs the
interior y tiles to start on 8-aligned sublane offsets (Mosaic requires
element-space block offsets on the sublane dim to be tile-aligned), so the
*TPU layout* widens the y pad to round_up(halo, 8) per side. The outer extra
pad cells are inert: never read by the radius-R stencil and never written.

embed()/extract() convert between the two layouts; rims are preserved so the
per-ring-level frozen boundary semantics carry over exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from .config import Grid3D


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class Layout:
    grid: Grid3D
    pad_lo: Tuple[int, int, int]
    pad_hi: Tuple[int, int, int]

    @staticmethod
    def reference(grid: Grid3D) -> "Layout":
        h = grid.halo
        return Layout(grid, (h, h, h), (h, h, h))

    @staticmethod
    def tpu(grid: Grid3D) -> "Layout":
        h = grid.halo
        hy = _round_up(h, 8)
        return Layout(grid, (h, hy, h), (h, hy, h))

    @property
    def padded_shape(self) -> Tuple[int, int, int]:
        n = (self.grid.nx, self.grid.ny, self.grid.nz)
        return tuple(n[i] + self.pad_lo[i] + self.pad_hi[i] for i in range(3))

    def interior_slices(self) -> Tuple[slice, slice, slice]:
        n = (self.grid.nx, self.grid.ny, self.grid.nz)
        return tuple(slice(self.pad_lo[i], self.pad_lo[i] + n[i]) for i in range(3))

    def shifted_slices(self, axis: int, d: int) -> Tuple[slice, slice, slice]:
        """Interior-sized slices shifted by d along `axis`."""
        n = (self.grid.nx, self.grid.ny, self.grid.nz)
        out = []
        for ax in range(3):
            d_ax = d if ax == axis else 0
            out.append(slice(self.pad_lo[ax] + d_ax, self.pad_lo[ax] + d_ax + n[ax]))
        return tuple(out)

    @property
    def is_reference(self) -> bool:
        h = self.grid.halo
        return self.pad_lo == (h, h, h) and self.pad_hi == (h, h, h)

    def embed_region(self) -> Tuple[slice, slice, slice]:
        """Where a reference-layout array lands inside this layout: the
        reference rim (halo wide) sits in the *inner* part of this pad."""
        h = self.grid.halo
        n = (self.grid.nx, self.grid.ny, self.grid.nz)
        return tuple(
            slice(self.pad_lo[i] - h, self.pad_lo[i] + n[i] + h) for i in range(3)
        )

    def embed(self, arr_ref: np.ndarray) -> np.ndarray:
        """Reference-layout array -> this layout (outer extra pads zeroed)."""
        if self.is_reference:
            return np.asarray(arr_ref)
        out = np.zeros(self.padded_shape, dtype=np.asarray(arr_ref).dtype)
        out[self.embed_region()] = arr_ref
        return out

    def extract(self, arr_int) -> np.ndarray:
        """This layout -> reference layout."""
        arr_int = np.asarray(arr_int)
        if self.is_reference:
            return arr_int
        return arr_int[self.embed_region()]


@dataclasses.dataclass(frozen=True)
class ZSplitLayout:
    """TPU layout v3: the z rim lives in a separate side array so the core's
    lane dimension is exactly nz (128-aligned for all large benchmark sizes,
    avoiding the hidden (8,128) HBM tiling pad that inflates a 520-lane array
    to 640 physical lanes by 23%).

    Per ring level: core [nx+2*px, ny+2*py, nz] + zrim [same x/y, 2*halo]
    (lanes [0:halo] = low rim, [halo:2*halo] = high rim). x/y rims stay
    inside the core; y pads are widened to 8 for sublane alignment like
    Layout.tpu.
    """

    grid: Grid3D
    py: int = 8
    xpad: int = 0  # 0 -> grid.halo; the sweep kernel widens this to K*radius
    # z_embed: when nz is not a lane-tile multiple, carry the z rim INSIDE
    # the core — lanes [0:h | h:h+nz | h+nz:2h+nz | zeros] padded up to a
    # 128 multiple. The (8,128) HBM tiling would pad those lanes anyway, so
    # this costs no extra physical traffic and keeps every DMA tile-aligned.
    z_embed: bool = False

    @property
    def px(self) -> int:
        return self.xpad if self.xpad else self.grid.halo

    @property
    def nzc(self) -> int:
        """Core lane count: nz exactly, or the rim-embedded padded width."""
        g = self.grid
        if not self.z_embed:
            return g.nz
        return -(-(g.nz + 2 * g.halo) // 128) * 128

    @property
    def core_shape(self) -> Tuple[int, int, int]:
        g = self.grid
        return (g.nx + 2 * self.px, g.ny + 2 * self.py, self.nzc)

    @property
    def zrim_shape(self) -> Tuple[int, int, int]:
        g = self.grid
        if self.z_embed:
            return (1, 8, 128)  # placeholder block (kernel ignores it)
        return (g.nx + 2 * self.px, g.ny + 2 * self.py, 2 * g.halo)

    def split(self, arr_ref: np.ndarray):
        """Reference-layout [nx+2H, ny+2H, nz+2H] -> (core, zrim)."""
        g = self.grid
        h = g.halo
        arr_ref = np.asarray(arr_ref)
        dy = self.py - h
        dx = self.px - h
        core = np.zeros(self.core_shape, arr_ref.dtype)
        zrim = np.zeros(self.zrim_shape, arr_ref.dtype)
        xs = slice(dx, dx + g.nx + 2 * h)
        ys = slice(dy, dy + g.ny + 2 * h)
        if self.z_embed:
            core[xs, ys, : g.nz + 2 * h] = arr_ref
            return core, zrim
        core[xs, ys, :] = arr_ref[:, :, h : h + g.nz]
        zrim[xs, ys, :h] = arr_ref[:, :, :h]
        zrim[xs, ys, h:] = arr_ref[:, :, h + g.nz :]
        return core, zrim

    def join(self, core, zrim) -> np.ndarray:
        g = self.grid
        h = g.halo
        core = np.asarray(core)
        zrim = np.asarray(zrim)
        dy = self.py - h
        dx = self.px - h
        out = np.zeros((g.nx + 2 * h, g.ny + 2 * h, g.nz + 2 * h), core.dtype)
        xs = slice(dx, dx + g.nx + 2 * h)
        ys = slice(dy, dy + g.ny + 2 * h)
        if self.z_embed:
            out[:] = core[xs, ys, : g.nz + 2 * h]
            return out
        out[:, :, h : h + g.nz] = core[xs, ys, :]
        out[:, :, :h] = zrim[xs, ys, :h]
        out[:, :, h + g.nz :] = zrim[xs, ys, h:]
        return out
