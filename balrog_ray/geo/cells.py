"""Hierarchical planar cell grid: the engine's H3/S2-analogue index.

Cell ids are the partition / shuffle / join keys for halo exchange and the
spatial join.  The container has no h3/s2 bindings, so the engine uses a
deterministic planar grid.  This module is the FLAT single-resolution
half (point -> cell in O(1), k-ring neighbourhoods, bbox covers, Hilbert
sort keys — the shuffle keys every stage uses); the multi-resolution half
(packed ``(res, cx, cy)`` int64 ids, parent/child moves, S2-style
``compact`` and the adaptive ``RegionCoverer``) lives in
:mod:`balrog_ray.geo.quad`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class CellGrid:
    """A world window partitioned into square cells of ``cell_size``."""
    x0: float           # west edge
    y0: float           # NORTH edge (y decreases southward, raster-style)
    cell_size: float
    nx: int
    ny: int

    def cell_of(self, x, y):
        """Vectorized point -> cell id; -1 outside the window."""
        cx = np.floor((np.asarray(x) - self.x0) / self.cell_size).astype(np.int64)
        cy = np.floor((self.y0 - np.asarray(y)) / self.cell_size).astype(np.int64)
        ok = (cx >= 0) & (cx < self.nx) & (cy >= 0) & (cy < self.ny)
        return np.where(ok, cy * self.nx + cx, -1)

    def cell_of_clamped(self, x, y):
        """Point -> nearest in-window cell id (out-of-window points snap to
        the border cell).  The partitioned join keys probes with this so a
        site just outside the window still meets boundary polygons, whose
        padded covers extend through the border cells."""
        cx = np.clip(np.floor((np.asarray(x) - self.x0) / self.cell_size),
                     0, self.nx - 1).astype(np.int64)
        cy = np.clip(np.floor((self.y0 - np.asarray(y)) / self.cell_size),
                     0, self.ny - 1).astype(np.int64)
        return cy * self.nx + cx

    def cell_id(self, cx: int, cy: int) -> int:
        return cy * self.nx + cx

    def cell_xy(self, cell_id):
        cell_id = np.asarray(cell_id)
        return cell_id % self.nx, cell_id // self.nx

    def cell_bbox(self, cell_id):
        cx, cy = self.cell_xy(cell_id)
        xmin = self.x0 + cx * self.cell_size
        ymax = self.y0 - cy * self.cell_size
        return np.stack([xmin, ymax - self.cell_size,
                         xmin + self.cell_size, ymax], axis=-1)

    def k_ring(self, cell_id: int, k: int = 1) -> np.ndarray:
        """The (2k+1)^2 neighbourhood of a cell, clipped to the grid --
        used to co-locate kNN probes with candidate polygons within reach."""
        cx, cy = int(cell_id % self.nx), int(cell_id // self.nx)
        xs = np.arange(max(0, cx - k), min(self.nx, cx + k + 1))
        ys = np.arange(max(0, cy - k), min(self.ny, cy + k + 1))
        gx, gy = np.meshgrid(xs, ys)
        return (gy * self.nx + gx).reshape(-1)

    def cells_for_bbox(self, xmin, ymin, xmax, ymax,
                       pad: float = 0.0) -> np.ndarray:
        """All cell ids whose square intersects the (padded) bbox."""
        xmin, ymin, xmax, ymax = (xmin - pad, ymin - pad,
                                  xmax + pad, ymax + pad)
        c0 = max(0, int(np.floor((xmin - self.x0) / self.cell_size)))
        c1 = min(self.nx - 1, int(np.floor((xmax - self.x0) / self.cell_size)))
        r0 = max(0, int(np.floor((self.y0 - ymax) / self.cell_size)))
        r1 = min(self.ny - 1, int(np.floor((self.y0 - ymin) / self.cell_size)))
        if c1 < c0 or r1 < r0:
            return np.empty(0, dtype=np.int64)
        gx, gy = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
        return (gy * self.nx + gx).reshape(-1).astype(np.int64)

    def hilbert_id(self, cell_id):
        """Hilbert-curve index of a cell (vectorized) -- the spatial sort
        key for output layout.  Sorting partitions by this key clusters
        spatially-adjacent cells into the same files/row-groups, the
        ``CLUSTER ON gist-index`` analogue of the reference
        (``03_explode_multipolygons_and_classify.sql:79-80``): a later bbox
        range read touches O(perimeter) files instead of O(area)."""
        cx, cy = self.cell_xy(np.asarray(cell_id, dtype=np.int64))
        order = max(int(np.ceil(np.log2(max(self.nx, self.ny, 2)))), 1)
        x = cx.astype(np.int64).copy()
        y = cy.astype(np.int64).copy()
        rx = np.zeros_like(x)
        ry = np.zeros_like(y)
        d = np.zeros_like(x)
        s = np.int64(1 << (order - 1))
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant
            swap = ry == 0
            flip = swap & (rx == 1)
            x_f, y_f = x.copy(), y.copy()
            x = np.where(flip, s - 1 - x_f, x_f)
            y = np.where(flip, s - 1 - y_f, y_f)
            x2, y2 = x.copy(), y.copy()
            x = np.where(swap, y2, x2)
            y = np.where(swap, x2, y2)
            s >>= 1
        return d

    def neighbours(self, cell_id: int) -> dict[str, int]:
        """The 8 compass neighbours (missing ones omitted) -- the halo
        exchange's shuffle targets."""
        cx, cy = int(cell_id % self.nx), int(cell_id // self.nx)
        out = {}
        for name, (dy, dx) in {"n": (-1, 0), "s": (1, 0), "w": (0, -1),
                               "e": (0, 1), "nw": (-1, -1), "ne": (-1, 1),
                               "sw": (1, -1), "se": (1, 1)}.items():
            tx, ty = cx + dx, cy + dy
            if 0 <= tx < self.nx and 0 <= ty < self.ny:
                out[name] = ty * self.nx + tx
        return out
