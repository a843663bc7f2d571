"""Per-pixel SSIM change maps between two raster epochs -- the
structural-similarity change-detection op (``skimage.metrics.
structural_similarity`` with uniform windows / the SSIM term of
change-detection stacks) over the engine's temporal tile table.  The
reference toolbox stops at single-epoch mosaics (``data_prep/images/
ga_5m/01_mosaic_and_transform_images_in_one_go.py``); this is the
beyond-reference two-layer windowed op that turns its tile archive into
a change product, complementing :func:`..stages.temporal.
change_detection`'s scalar per-pixel delta with a neighborhood-aware
similarity score.

Definition (deterministic, uniform ``(2r+1)^2`` window, Wang et al.
2004 constants): per pixel, over the window pixels valid in BOTH
epochs,

    SSIM = (2*ua*ub + C1)(2*cov + C2) / ((ua^2+ub^2+C1)(sa^2+sb^2+C2))

with population moments, ``C1 = (0.01*L)^2``, ``C2 = (0.03*L)^2`` for
data range ``L``.  Windows clip at true raster edges (focal-stats
convention, so every pixel scores); a center pixel is nodata when it is
invalid in either epoch or its window holds zero valid pairs.  All
window sums are float64 integral images, output float32 -- the tiled
run is bit-identical to a whole-raster kernel run (the halo-plan parity
contract shared with focal/terrain/GLCM).

Scale shape: ONE ``groupby(cell_id)`` halo shuffle carries BOTH epochs'
strips (each tile row is relabeled ``<layer>@a`` / ``<layer>@b`` and
fanned through the standard strip emitter -- encoded payloads ship
exactly once); per-cell compute assembles the two windows and runs five
integral-image box sums; output is one SSIM tile per cell -- the epoch
archive itself is filtered to the two epochs at the read and never
stacked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import FocalGridSpec, _winsum
from .halo import GridSpec, assemble_window, make_strip_emitter_batch

K1, K2 = 0.01, 0.03


def ssim_kernel(a: np.ndarray, b: np.ndarray, nodata: float, *,
                radius: int = 3, data_range: float) -> np.ndarray:
    """Whole-array per-pixel SSIM plane (float32); same result tiled or
    not.  ``data_range`` is the caller's fixed luminance range contract
    (a data-dependent range would break tiled parity)."""
    if data_range <= 0:
        raise ValueError(f"data_range must be > 0, got {data_range}")
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    if a32.shape != b32.shape:
        raise ValueError(f"epoch shapes differ: {a32.shape} vs {b32.shape}")
    nd = np.float32(nodata)
    both = (a32 != nd) & (b32 != nd)
    av = np.where(both, a32.astype(np.float64), 0.0)
    bv = np.where(both, b32.astype(np.float64), 0.0)

    n = _winsum(both.astype(np.float64), radius)
    sa = _winsum(av, radius)
    sb = _winsum(bv, radius)
    saa = _winsum(av * av, radius)
    sbb = _winsum(bv * bv, radius)
    sab = _winsum(av * bv, radius)

    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    with np.errstate(invalid="ignore", divide="ignore"):
        ua = sa / n
        ub = sb / n
        va = saa / n - ua * ua
        vb = sbb / n - ub * ub
        cov = sab / n - ua * ub
        num = (2.0 * ua * ub + c1) * (2.0 * cov + c2)
        den = (ua * ua + ub * ub + c1) * (va + vb + c2)
        out = (num / den).astype(np.float32)
    out[~both | (n == 0)] = nd
    return out


def dual_epoch_stage(tiles_ds, spec: GridSpec, *, epoch_a: int,
                     epoch_b: int, layer: str, radius: int,
                     out_layers: tuple, window_fn, fmt: str = "npz"):
    """The shared dual-plane halo pipeline (SSIM, optical flow, stereo):
    filter the temporal tile table to the two epochs, relabel each
    epoch's strips, ONE ``groupby(cell_id)`` shuffle carrying both
    planes, assemble the two windows and run ``window_fn(win_a, win_b,
    nodata) -> tuple[ndarray, ...]`` (one array per entry of
    ``out_layers``); each core crop re-encodes as an image-table row.
    Completeness-gated per cell exactly like :func:`..stages.focal.
    windowed_stage` -- a cell computes only when every in-grid
    neighbour delivered BOTH epochs' strips."""
    if radius < 1:
        raise ValueError("radius must be >= 1")
    if radius >= spec.tile_px:
        raise ValueError(f"radius {radius} >= tile_px {spec.tile_px}")
    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=radius)
    T = fspec.tile_px
    tag = {epoch_a: f"{layer}@a", epoch_b: f"{layer}@b"}

    def relabel(batch: pa.Table) -> pa.Table:
        """Keep the two epochs of ``layer``; rewrite each caption's layer
        to the epoch tag so the shared emitter/assembler keys the two
        planes independently."""
        import json

        keep, caps = [], []
        for i in range(batch.num_rows):
            c = json.loads(batch.column("caption")[i].as_py())
            e = int(batch.column("epoch")[i].as_py())
            if c["layer"] == layer and e in tag:
                c["layer"] = tag[e]
                keep.append(i)
                caps.append(json.dumps(c, sort_keys=True))
        out = batch.take(pa.array(keep, pa.int64()))
        out = out.drop_columns(["caption", "epoch"])
        return out.append_column("caption", pa.array(caps, pa.string()))

    emit = make_strip_emitter_batch(fspec)

    def compute(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % fspec.tiles_x, cell // fspec.tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        empty = pa.table({c: [] for c in TILES_SCHEMA.names},
                         schema=TILES_SCHEMA)
        if (g["layer"].count(tag[epoch_a]) != neigh
                or g["layer"].count(tag[epoch_b]) != neigh):
            return empty
        wa = assemble_window(g, fspec, tag[epoch_a], tx, ty)
        wb = assemble_window(g, fspec, tag[epoch_b], tx, ty)
        if wa is None or wb is None:
            return empty
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        outs = window_fn(wa, wb, float(ref.nodata))
        if len(outs) != len(out_layers):
            raise ValueError(f"window_fn returned {len(outs)} planes "
                             f"for {len(out_layers)} out_layers")
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        cols = {c: [] for c in TILES_SCHEMA.names}
        for oname, plane in zip(out_layers, outs):
            core = np.ascontiguousarray(
                np.asarray(plane, np.float32)[rs:rs + T, cs:cs + T])
            ocap = Caption(layer=oname, x0=ref.x0, y0=ref.y0,
                           pixel_size=ref.pixel_size, crs=ref.crs,
                           nodata=ref.nodata, edge=dict(ref.edge),
                           tx=ref.tx, ty=ref.ty)
            payload, ocap = encode_tile(core, fmt, ocap)
            h, w = core.shape
            cols["image_id"].append(f"{oname}/{tx}/{ty}")
            cols["bytes"].append(payload)
            cols["w"].append(np.int32(w))
            cols["h"].append(np.int32(h))
            cols["fmt"].append(fmt)
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(core)))
        return pa.table(cols, schema=TILES_SCHEMA)

    return (tiles_ds
            .filter(expr=f"epoch == {epoch_a} or epoch == {epoch_b}")
            .map_batches(relabel, batch_format="pyarrow")
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))


def ssim_change(tiles_ds, spec: GridSpec, *, epoch_a: int, epoch_b: int,
                layer: str = "dem", radius: int = 3,
                data_range: float = 100.0, fmt: str = "npz"):
    """Temporal tile table (TILES_SCHEMA + ``epoch``) -> image-table
    Dataset of per-tile SSIM maps (layer ``ssim``) between the two
    epochs, via the shared dual-plane halo pipeline."""
    return dual_epoch_stage(
        tiles_ds, spec, epoch_a=epoch_a, epoch_b=epoch_b, layer=layer,
        radius=radius, out_layers=("ssim",),
        window_fn=lambda wa, wb, nd: (
            ssim_kernel(wa, wb, nd, radius=radius,
                        data_range=data_range),),
        fmt=fmt)


def ssim_tile_stats(ssim_ds):
    """SSIM tile table -> per-tile exact summary rows ``(tx, ty,
    n_valid, mean_ssim_u, min_ssim_u)`` with fixed-point micro scores
    (round-half-even int64) so compares are exact.  Tiny output: one row
    per tile."""

    def stats(batch: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        txs, tys, nv, mean_u, min_u = [], [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            n = int(valid.sum())
            txs.append(cap.tx)
            tys.append(cap.ty)
            nv.append(n)
            if n:
                vals = arr[valid].astype(np.float64)
                mean_u.append(int(np.rint(vals.mean() * 1_000_000)))
                min_u.append(int(np.rint(vals.min() * 1_000_000)))
            else:
                mean_u.append(0)
                min_u.append(0)
        return pa.table({
            "tx": pa.array(txs, pa.int64()),
            "ty": pa.array(tys, pa.int64()),
            "n_valid": pa.array(nv, pa.int64()),
            "mean_ssim_u": pa.array(mean_u, pa.int64()),
            "min_ssim_u": pa.array(min_u, pa.int64())})

    return (ssim_ds.map_batches(stats, batch_format="pyarrow")
            .sort(["ty", "tx"]))
