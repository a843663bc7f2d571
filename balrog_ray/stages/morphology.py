"""Morphological Expand / Shrink over categorical tile layers -- the
ArcGIS Generalization-toolset ops (Expand, Shrink) of the toolbox family
the reference's Gen-1 BAL pipeline ships in (reference `bal.py` is an
ArcGIS 10.2 toolbox; Expand/Shrink are its ecosystem's standard
post-reclass cleanup alongside the Sieve stage this repo already has).

Both are one bounded **Euclidean allocation**: values flow from a
source mask into a target mask, reaching every target cell whose
distance to a source cell is <= ``n_cells`` pixels::

    expand: sources = cells IN ``zones``,  targets = valid cells not in
            ``zones``  (zones grow outward)
    shrink: sources = valid cells NOT in ``zones``, targets = cells in
            ``zones``  (zones erode inward)

A captured target takes the value of its NEAREST source cell; ties are
broken (smaller squared distance, then smaller value) so the result is
deterministic and a brute-force per-pixel oracle reproduces it exactly.
The reach is a Euclidean disk (dy^2 + dx^2 <= n^2), not a Chebyshev
square.  Nodata cells are inert: never a source, never overwritten.

Distributed shape: rides :func:`..stages.focal.windowed_stage` -- the
shared halo-window pipeline (<=9 keyed strip emits per tile, ONE
``groupby(cell_id)`` shuffle, halo = ``n_cells``), so tiled output is
bit-identical to a whole-raster run; per-cell compute is a vectorized
shift-reduce over the <= pi*n^2 disk offsets grouped by distance (no
pixel loops).
"""

from __future__ import annotations

import numpy as np

from .focal import windowed_stage

_INF = np.float64(np.inf)


def _disk_offsets(n: int) -> list[tuple[int, list[tuple[int, int]]]]:
    """Disk offsets grouped by squared distance, ascending; (0,0)
    excluded."""
    groups: dict[int, list[tuple[int, int]]] = {}
    for dy in range(-n, n + 1):
        for dx in range(-n, n + 1):
            d2 = dy * dy + dx * dx
            if 0 < d2 <= n * n:
                groups.setdefault(d2, []).append((dy, dx))
    return sorted(groups.items())


def _shifted(vals: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """vals shifted so out[r, c] = vals[r + dy, c + dx]; cells whose
    source falls outside the array are +inf (no candidate)."""
    H, W = vals.shape
    out = np.full((H, W), _INF)
    r0, r1 = max(0, -dy), min(H, H - dy)
    c0, c1 = max(0, -dx), min(W, W - dx)
    if r0 < r1 and c0 < c1:
        out[r0:r1, c0:c1] = vals[r0 + dy:r1 + dy, c0 + dx:c1 + dx]
    return out


def _allocate(arr: np.ndarray, n_cells: int, src: np.ndarray,
              tgt: np.ndarray) -> np.ndarray:
    """Bounded Euclidean allocation: each ``tgt`` cell within
    ``n_cells`` of a ``src`` cell takes its nearest source's value
    (ties: min squared distance, then min value).  Other cells keep
    ``arr``."""
    out = arr.astype(np.float32).copy()
    unset = tgt.copy()
    svals = np.where(src, arr.astype(np.float64), _INF)
    for _d2, offs in _disk_offsets(n_cells):
        if not unset.any():
            break
        best = np.full(arr.shape, _INF)
        for dy, dx in offs:
            np.minimum(best, _shifted(svals, dy, dx), out=best)
        hit = unset & np.isfinite(best)
        out[hit] = best[hit].astype(np.float32)
        unset &= ~hit
    return out


def expand_kernel(arr: np.ndarray, n_cells: int, zones,
                  nodata: float) -> np.ndarray:
    """Grow the ``zones`` classes outward by ``n_cells`` pixels."""
    zs = np.asarray(sorted(float(z) for z in zones), np.float32)
    valid = arr != np.float32(nodata)
    in_zone = valid & np.isin(arr, zs)
    return _allocate(arr, n_cells, in_zone, valid & ~in_zone)


def shrink_kernel(arr: np.ndarray, n_cells: int, zones,
                  nodata: float) -> np.ndarray:
    """Erode the ``zones`` classes inward by ``n_cells`` pixels: zone
    cells within reach of a non-zone valid cell take its value."""
    zs = np.asarray(sorted(float(z) for z in zones), np.float32)
    valid = arr != np.float32(nodata)
    in_zone = valid & np.isin(arr, zs)
    return _allocate(arr, n_cells, valid & ~in_zone, in_zone)


def expand(ds, spec, *, layer: str = "veg", n_cells: int = 1,
           zones=(1.0,), fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset (layer
    ``expand_<layer>``) with ``zones`` grown by ``n_cells``."""
    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        return expand_kernel(window, n_cells, zones, nodata)

    return windowed_stage(ds, spec, layer=layer, radius=n_cells,
                          out_layer=f"expand_{layer}", window_fn=fn,
                          fmt=fmt)


def shrink(ds, spec, *, layer: str = "veg", n_cells: int = 1,
           zones=(1.0,), fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset (layer
    ``shrink_<layer>``) with ``zones`` eroded by ``n_cells``."""
    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        return shrink_kernel(window, n_cells, zones, nodata)

    return windowed_stage(ds, spec, layer=layer, radius=n_cells,
                          out_layer=f"shrink_{layer}", window_fn=fn,
                          fmt=fmt)
