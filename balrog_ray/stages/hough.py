"""Distributed Hough line transform over a tiled binary/thresholded
raster -- the classic line-detection op (OpenCV ``HoughLines`` /
skimage ``transform.hough_line`` role), the natural consumer of
:mod:`.canny`'s edge tiles.  The reference toolbox has no detection op;
this is a beyond-reference image stage whose distributed shape is the
textbook partial-aggregate: votes are additive, so each tile
accumulates its own sparse (theta, rho) partial histogram and ONE
``groupby(theta_i, rho_i).sum`` fold produces the exact global
accumulator -- no halo, no pixel shuffle, no driver-side pixels.

Deterministic semantics: pixel (row, col) votes with global coordinates
``x = col, y = row`` (pixel indices, tiling-independent); ``n_theta``
evenly-spaced angles ``theta_t = t * pi / n_theta``; ``rho = x cos +
y sin`` binned as ``floor((rho + rho_max) / rho_res)`` with ``rho_max =
hypot(world_w, world_h)`` -- identical float ops tiled or whole, so
votes are integer-exact either way.  Peaks are the global top-k bins by
``(votes desc, theta_i asc, rho_i asc)`` -- a total order, no library
tie ambiguity.

Scale shape: the per-tile partial is bounded by ``min(edge_px *
n_theta, n_theta * n_rho)`` sparse rows (tiny next to the tile
payload); the fold shuffles only those partials; top-k is a sort+limit
over the folded accumulator, which is bin-bounded, not pixel-bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec


def hough_accumulate(arr: np.ndarray, row0: int, col0: int, *,
                     n_theta: int, rho_res: float, rho_max: float,
                     match: float = 1.0):
    """One tile -> sparse vote rows (theta_i, rho_i, votes).  ``arr``
    pixels equal to ``match`` vote; coordinates are global via
    ``row0/col0``."""
    ys, xs = np.nonzero(arr == np.float32(match))
    if len(ys) == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    x = (xs + col0).astype(np.float64)
    y = (ys + row0).astype(np.float64)
    t = np.arange(n_theta, dtype=np.float64) * (np.pi / n_theta)
    rho = x[:, None] * np.cos(t)[None, :] + y[:, None] * np.sin(t)[None, :]
    ri = np.floor((rho + rho_max) / rho_res).astype(np.int64)
    n_rho = int(np.floor(2.0 * rho_max / rho_res)) + 1
    ti = np.broadcast_to(np.arange(n_theta, dtype=np.int64),
                         ri.shape)
    key = ti.ravel() * n_rho + ri.ravel()
    uniq, counts = np.unique(key, return_counts=True)
    return uniq // n_rho, uniq % n_rho, counts.astype(np.int64)


def hough_lines(tiles_ds, spec: GridSpec, *, layer: str,
                n_theta: int = 180, rho_res: float = 1.0,
                k_top: int = 10, match: float = 1.0):
    """Image-table Dataset -> top-k Hough peak rows ``(theta_i, rho_i,
    votes)`` over all tiles of ``layer``.  One partial-histogram fold +
    one bin-bounded sort."""
    from ray.data.aggregate import Sum

    rho_max = float(np.hypot(spec.tiles_x * spec.tile_px,
                             spec.tiles_y * spec.tile_px))

    def partial(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile

        tis, ris, vs = [], [], []
        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ti, ri, v = hough_accumulate(
                arr, cap.ty * spec.tile_px, cap.tx * spec.tile_px,
                n_theta=n_theta, rho_res=rho_res, rho_max=rho_max,
                match=match)
            tis.append(ti)
            ris.append(ri)
            vs.append(v)
        if not tis:
            return pa.table({"theta_i": pa.array([], pa.int64()),
                             "rho_i": pa.array([], pa.int64()),
                             "votes": pa.array([], pa.int64())})
        return pa.table({
            "theta_i": pa.array(np.concatenate(tis), pa.int64()),
            "rho_i": pa.array(np.concatenate(ris), pa.int64()),
            "votes": pa.array(np.concatenate(vs), pa.int64())})

    acc = (tiles_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["theta_i", "rho_i"])
           .aggregate(Sum("votes", alias_name="votes")))
    return (acc.sort(["votes", "theta_i", "rho_i"],
                     descending=[True, False, False])
            .limit(k_top))


def hough_oracle(world: np.ndarray, *, n_theta: int, rho_res: float,
                 rho_max: float, match: float = 1.0) -> dict:
    """Whole-array accumulator (dict (theta_i, rho_i) -> votes) -- the
    single-process oracle for tests."""
    ti, ri, v = hough_accumulate(world, 0, 0, n_theta=n_theta,
                                 rho_res=rho_res, rho_max=rho_max,
                                 match=match)
    return {(int(a), int(b)): int(c) for a, b, c in zip(ti, ri, v)}
