"""Temporal raster-stack operators: per-pixel composites across epochs and
two-epoch change detection -- the cloud-free-composite / change-map roles a
satellite tile archive needs (the reference's single-epoch mosaics,
``data_prep/images/ga_5m/01_mosaic_and_transform_images_in_one_go.py``,
generalized to a time axis; GDAL has no native analogue, this is the
``gdal_calc`` / Earth-Engine ``imageCollection.reduce`` shape).

Input is the standard tile table plus an ``epoch`` int64 column: every
``(layer, cell, epoch)`` holds one encoded tile.  Both operators are ONE
``groupby(layer, cell)`` exchange -- encoded payloads ship once, straight
to the task that decodes them, exactly the BAL pipeline's keying -- and the
per-group work is a vectorized stack reduction.

Scale notes: a group holds every epoch of one cell, so per-task memory is
``n_epochs x tile_px^2 x 4`` bytes (64 epochs of 256 px tiles = 16 MB);
for archives too deep to stack, ``stat="mean"/"count"/"min"/"max"`` admit
a sequential fold over an epoch-sorted group at O(1) memory -- median does
not (it is not decomposable), which is why the stack bound is documented
rather than hidden.  Composite output is 1/n_epochs of the input volume;
nothing materializes the archive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from .halo import GridSpec

#: per-pixel nodata-aware reductions over the (epoch, row, col) stack.
#: each receives the float32 stack and the valid mask, returns float32.
_STATS = ("median", "mean", "min", "max", "count", "first", "last")


def _reduce_stack(stack: np.ndarray, valid: np.ndarray, stat: str,
                  nodata: float) -> np.ndarray:
    """Nodata-aware per-pixel reduction; pixels valid in no epoch -> nodata.
    float32 in/out so tiled results are bit-identical to a whole-raster
    run of the same reduction."""
    nd = np.float32(nodata)
    n = valid.sum(axis=0)
    if stat == "count":
        return n.astype(np.float32)
    if stat == "median":
        import warnings

        masked = np.where(valid, stack, np.nan)
        with warnings.catch_warnings():
            # all-epoch-nodata pixels are expected; n==0 maps them to nd
            warnings.simplefilter("ignore", RuntimeWarning)
            out = np.nanmedian(masked, axis=0)
        return np.where(n > 0, out.astype(np.float32), nd)
    if stat == "mean":
        s = np.where(valid, stack, 0.0).sum(axis=0, dtype=np.float64)
        return np.where(n > 0,
                        (s / np.maximum(n, 1)).astype(np.float32), nd)
    if stat == "min":
        return np.where(n > 0,
                        np.where(valid, stack, np.inf).min(axis=0), nd) \
            .astype(np.float32)
    if stat == "max":
        return np.where(n > 0,
                        np.where(valid, stack, -np.inf).max(axis=0), nd) \
            .astype(np.float32)
    if stat in ("first", "last"):
        # mosaic semantics (gdal_merge / gdalbuildvrt role): per pixel,
        # the first (or last) valid value in epoch/priority order --
        # epochs double as source priority when compositing overlapping
        # acquisitions.  argmax finds the first True; reversing the axis
        # gives last.
        v = valid if stat == "first" else valid[::-1]
        s = stack if stat == "first" else stack[::-1]
        idx = v.argmax(axis=0)
        out = np.take_along_axis(s, idx[None], axis=0)[0]
        return np.where(n > 0, out, nd).astype(np.float32)
    raise ValueError(f"unknown stat {stat!r}, want one of {_STATS}")


def _cell_key(batch: pa.Table, tiles_x: int) -> pa.Table:
    caps = [Caption.from_json(c)
            for c in batch.column("caption").to_pylist()]
    layer = pa.array([c.layer for c in caps], pa.string())
    cell = pa.array([c.ty * tiles_x + c.tx for c in caps], pa.int64())
    return (batch.append_column("layer", layer)
                 .append_column("cell", cell))


def temporal_composite(tiles_ds, spec: GridSpec, *, stat: str = "median",
                       fmt: str = "npz"):
    """Per-pixel ``stat`` across every epoch of each cell -> one composite
    tile per (layer, cell).  Requires an ``epoch`` column; epochs missing
    a cell's tile simply contribute nothing (the stack is whatever rows
    exist).  Returns a tile Dataset in ``TILES_SCHEMA``."""
    if stat not in _STATS:
        raise ValueError(f"unknown stat {stat!r}, want one of {_STATS}")

    def composite(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        # deterministic stack order whatever the shuffle delivered
        order = np.argsort(np.asarray(g["epoch"]), kind="stable")
        cap0 = Caption.from_json(g["caption"][order[0]])
        nodata = cap0.nodata
        stack = np.stack([
            decode_tile(g["bytes"][i], g["fmt"][i],
                        Caption.from_json(g["caption"][i]))
            for i in order]).astype(np.float32)
        out = _reduce_stack(stack, stack != np.float32(nodata), stat,
                            nodata)
        cap = Caption(layer=cap0.layer, x0=cap0.x0, y0=cap0.y0,
                      pixel_size=cap0.pixel_size, crs=cap0.crs,
                      nodata=nodata, edge=cap0.edge, tx=cap0.tx,
                      ty=cap0.ty)
        payload, cap = encode_tile(out, fmt, cap)
        return pa.table({
            "image_id": [f"{cap0.layer}/{stat}/{cap0.tx}/{cap0.ty}"],
            "bytes": [payload],
            "w": [np.int32(out.shape[1])], "h": [np.int32(out.shape[0])],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(out))],
        }, schema=TILES_SCHEMA)

    return (tiles_ds
            .map_batches(lambda b: _cell_key(b, spec.tiles_x),
                         batch_format="pyarrow")
            .groupby(["layer", "cell"])
            .map_groups(composite, batch_format="pyarrow"))


def trend_slope(stack: np.ndarray, valid: np.ndarray,
                epochs: np.ndarray, nodata: float) -> np.ndarray:
    """Per-pixel OLS slope of value vs epoch over the valid epochs --
    the NDVI-trend / land-change-rate role.  Closed form
    ``cov(e, z) / var(e)`` with per-pixel masked sums; pixels valid in
    < 2 distinct epochs -> nodata.  All partial sums are float64 reduced
    along axis 0 in epoch-sorted order, so a tiled run is bit-identical
    to a whole-raster run."""
    nd = np.float32(nodata)
    e = epochs.astype(np.float64)[:, None, None]
    v = valid.astype(np.float64)
    z = np.where(valid, stack.astype(np.float64), 0.0)
    n = v.sum(axis=0)
    se = (e * v).sum(axis=0)
    sz = z.sum(axis=0)
    see = (e * e * v).sum(axis=0)
    sez = (e * z).sum(axis=0)
    denom = n * see - se * se
    ok = (n >= 2) & (denom > 0)
    slope = np.where(ok, (n * sez - se * sz) / np.where(ok, denom, 1.0),
                     np.float64(nd))
    return slope.astype(np.float32)


def temporal_trend(tiles_ds, spec: GridSpec, *, fmt: str = "npz"):
    """Per-pixel linear trend (slope per epoch unit) across the stack ->
    one slope tile per (layer, cell).  Same single ``groupby(layer,
    cell)`` exchange as :func:`temporal_composite`."""

    def per_cell(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        order = np.argsort(np.asarray(g["epoch"]), kind="stable")
        cap0 = Caption.from_json(g["caption"][order[0]])
        nodata = cap0.nodata
        stack = np.stack([
            decode_tile(g["bytes"][i], g["fmt"][i],
                        Caption.from_json(g["caption"][i]))
            for i in order]).astype(np.float32)
        epochs = np.asarray(g["epoch"])[order]
        out = trend_slope(stack, stack != np.float32(nodata), epochs,
                          nodata)
        cap = Caption(layer=cap0.layer, x0=cap0.x0, y0=cap0.y0,
                      pixel_size=cap0.pixel_size, crs=cap0.crs,
                      nodata=nodata, edge=cap0.edge, tx=cap0.tx,
                      ty=cap0.ty)
        payload, cap = encode_tile(out, fmt, cap)
        return pa.table({
            "image_id": [f"{cap0.layer}/trend/{cap0.tx}/{cap0.ty}"],
            "bytes": [payload],
            "w": [np.int32(out.shape[1])], "h": [np.int32(out.shape[0])],
            "fmt": [fmt], "caption": [cap.to_json()],
            "phash": [np.int64(phash64(out))],
        }, schema=TILES_SCHEMA)

    return (tiles_ds
            .map_batches(lambda b: _cell_key(b, spec.tiles_x),
                         batch_format="pyarrow")
            .groupby(["layer", "cell"])
            .map_groups(per_cell, batch_format="pyarrow"))


def change_detection(tiles_ds, spec: GridSpec, *, epoch_a: int,
                     epoch_b: int, threshold: float):
    """Two-epoch change map statistics: per cell, count the pixels valid
    in BOTH epochs whose absolute delta exceeds ``threshold``.  Returns a
    Dataset of ``(layer, tx, ty, n_changed, n_valid, max_abs_delta)`` --
    integer counts plus the float32 max so compares are exact.  Same
    single ``groupby(layer, cell)`` exchange; groups carry exactly the
    two epochs (pre-filtered at the read, column-pruned)."""

    def per_cell(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        empty = pa.table({"layer": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "n_changed": pa.array([], pa.int64()),
                          "n_valid": pa.array([], pa.int64()),
                          "max_abs_delta": pa.array([], pa.float64())})
        by_epoch = {e: i for i, e in enumerate(g["epoch"])}
        if epoch_a not in by_epoch or epoch_b not in by_epoch:
            return empty            # cell absent from one epoch: no rows
        tiles = {}
        for e in (epoch_a, epoch_b):
            i = by_epoch[e]
            cap = Caption.from_json(g["caption"][i])
            tiles[e] = (decode_tile(g["bytes"][i], g["fmt"][i], cap)
                        .astype(np.float32), cap)
        a, cap = tiles[epoch_a]
        b, _ = tiles[epoch_b]
        nd = np.float32(cap.nodata)
        both = (a != nd) & (b != nd)
        delta = np.abs(b.astype(np.float64) - a.astype(np.float64))
        changed = both & (delta > threshold)
        return pa.table({
            "layer": pa.array([cap.layer], pa.string()),
            "tx": pa.array([cap.tx], pa.int64()),
            "ty": pa.array([cap.ty], pa.int64()),
            "n_changed": pa.array([int(changed.sum())], pa.int64()),
            "n_valid": pa.array([int(both.sum())], pa.int64()),
            "max_abs_delta": pa.array(
                [float(delta[both].max()) if both.any() else 0.0],
                pa.float64())})

    return (tiles_ds
            .filter(expr=f"epoch == {epoch_a} or epoch == {epoch_b}")
            .map_batches(lambda b: _cell_key(b, spec.tiles_x),
                         batch_format="pyarrow")
            .groupby(["layer", "cell"])
            .map_groups(per_cell, batch_format="pyarrow"))
