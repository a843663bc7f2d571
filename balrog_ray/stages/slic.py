"""SLIC superpixel segmentation over the tiled raster table -- the
image-segmentation workhorse (skimage ``segmentation.slic`` / Achanta
et al. 2012 role), filling the segmentation family next to the engine's
detection (NCC/Harris/Canny) and labeling (polygonize/region_group)
kits.

Algorithm (deterministic, SLIC-zero-enforcement variant -- connectivity
enforcement is :func:`..stages.sieve.region_group`'s job downstream):

* K seed centers on an ``S``-px grid at ``(S//2 + i*S, S//2 + j*S)``,
  id = row-major grid index (stable forever; nodata seeds drop);
* repeat ``n_iter`` times: assign every valid pixel to the nearest
  center among those within ``2S`` Chebyshev distance (``D^2 =
  (dval/m)^2 + (dy^2 + dx^2)/S^2``, float64; ties -> smallest center
  id; pixels with no candidate stay unlabeled), then recompute each
  center as the mean (y, x, value) of its pixels (empty centers keep
  their position);
* the value moment is carried as ``round(value * 1e6)`` int64 so the
  distributed fold is ORDER-INDEPENDENT integer addition -- the tiled
  run is bit-identical to a single-process run (same trick as the
  engine's exact Gram/PCA folds), with the mean taken in float64 at
  fold end.

Scale shape: per iteration, ONE ``map_batches`` pass over the tiles
(each tile scores its pixels against only the centers overlapping its
bbox +/- 2S -- a local, bounded candidate set) emitting per-center
integer partial sums, then ONE tiny ``groupby(center).sum`` fold whose
output is K rows.  The centers table (K = world_px / S^2) is broadcast
via ``ray.put``; at scales where K itself outgrows a broadcast, shard
centers by the same cell grid and join per-cell -- the per-tile math is
unchanged.  Tiles are materialized once and re-scanned per iteration;
pixels never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec

_VSCALE = 1_000_000


def _seed_grid(spec: GridSpec, S: int):
    """Seed positions (rows, cols, ids) on the S-grid, row-major."""
    wr = spec.tiles_y * spec.tile_px
    wc = spec.tiles_x * spec.tile_px
    rs = np.arange(S // 2, wr, S, dtype=np.int64)
    cs = np.arange(S // 2, wc, S, dtype=np.int64)
    rr, cc = np.meshgrid(rs, cs, indexing="ij")
    ids = np.arange(rr.size, dtype=np.int64)
    return rr.ravel(), cc.ravel(), ids


def _assign_block(vals: np.ndarray, valid: np.ndarray, row0: int,
                  col0: int, centers: dict, S: int, m: float):
    """Assign one tile's pixels; returns int64 labels (-1 unlabeled).
    ``centers`` maps id -> (cy, cx, cval) floats."""
    H, W = vals.shape
    labels = np.full((H, W), -1, np.int64)
    if not centers:
        return labels
    cids = np.asarray(sorted(centers), np.int64)
    cy = np.asarray([centers[i][0] for i in cids])
    cx = np.asarray([centers[i][1] for i in cids])
    cv = np.asarray([centers[i][2] for i in cids])
    # candidate centers: within 2S of the tile bbox
    keep = ((cy >= row0 - 2 * S) & (cy < row0 + H + 2 * S)
            & (cx >= col0 - 2 * S) & (cx < col0 + W + 2 * S))
    if not keep.any():
        return labels
    cids, cy, cx, cv = cids[keep], cy[keep], cx[keep], cv[keep]
    gy = (np.arange(H, dtype=np.float64) + row0)[:, None]
    gx = (np.arange(W, dtype=np.float64) + col0)[None, :]
    best = np.full((H, W), np.inf)
    arg = np.full((H, W), -1, np.int64)
    v64 = vals.astype(np.float64)
    for j in range(len(cids)):
        # pixel must be within the center's own 2S box
        inbox = ((np.abs(gy - cy[j]) <= 2 * S)
                 & (np.abs(gx - cx[j]) <= 2 * S))
        if not inbox.any():
            continue
        d2 = (((v64 - cv[j]) / m) ** 2
              + ((gy - cy[j]) ** 2 + (gx - cx[j]) ** 2) / (S * S))
        upd = inbox & valid & (d2 < best)
        best[upd] = d2[upd]
        arg[upd] = cids[j]
    labels = arg
    return labels


def slic_oracle(world: np.ndarray, nodata: float, spec: GridSpec, *,
                S: int, m: float, n_iter: int):
    """Single-process reference: returns (labels, centers dict) with
    IDENTICAL math to the distributed stage (integer value moments)."""
    w32 = np.asarray(world, np.float32)
    valid = w32 != np.float32(nodata)
    rr, cc, ids = _seed_grid(spec, S)
    centers = {}
    for r, c, i in zip(rr, cc, ids):
        if valid[r, c]:
            centers[int(i)] = (float(r), float(c), float(w32[r, c]))
    labels = np.full(w32.shape, -1, np.int64)
    for _ in range(n_iter):
        labels = _assign_block(w32, valid, 0, 0, centers, S, m)
        sums: dict = {}
        lab = labels[labels >= 0]
        ys, xs = np.nonzero(labels >= 0)
        vv = np.rint(w32[ys, xs].astype(np.float64)
                     * _VSCALE).astype(np.int64)
        for cid in np.unique(lab):
            sel = lab == cid
            sums[int(cid)] = (int(sel.sum()), int(ys[sel].sum()),
                              int(xs[sel].sum()), int(vv[sel].sum()))
        for cid, (n, sy, sx, sv) in sums.items():
            centers[cid] = (sy / n, sx / n, sv / n / _VSCALE)
    labels = _assign_block(w32, valid, 0, 0, centers, S, m)
    return labels, centers


def slic_segment(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                 S: int = 16, m: float = 10.0, n_iter: int = 4,
                 fmt: str = "npz"):
    """Image-table Dataset -> (label tiles Dataset of layer ``slic``,
    centers pa.Table).  Bit-identical to :func:`slic_oracle`."""
    import json

    import ray
    from ray.data.aggregate import Sum

    def tile_px(b: pa.Table, fn):
        from ..tiles.codec import Caption, decode_tile

        out = []
        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            out.append(fn(arr, cap))
        return out

    src = tiles_ds.materialize()
    T = spec.tile_px

    # seeds: each tile reports the seed pixels it owns (value at seed)
    rr, cc, ids = _seed_grid(spec, S)

    def seed_rows(b: pa.Table) -> pa.Table:
        rows = {"cid": [], "cy": [], "cx": [], "cv": []}

        def one(arr, cap):
            r0, c0 = cap.ty * T, cap.tx * T
            sel = ((rr >= r0) & (rr < r0 + T)
                   & (cc >= c0) & (cc < c0 + T))
            for r, c, i in zip(rr[sel], cc[sel], ids[sel]):
                v = arr[r - r0, c - c0]
                if v != np.float32(cap.nodata):
                    rows["cid"].append(int(i))
                    rows["cy"].append(float(r))
                    rows["cx"].append(float(c))
                    rows["cv"].append(float(v))

        tile_px(b, one)
        return pa.table({"cid": pa.array(rows["cid"], pa.int64()),
                         "cy": pa.array(rows["cy"], pa.float64()),
                         "cx": pa.array(rows["cx"], pa.float64()),
                         "cv": pa.array(rows["cv"], pa.float64())})

    seeds = (src.map_batches(seed_rows, batch_format="pyarrow")
             .take_all())
    centers = {r["cid"]: (r["cy"], r["cx"], r["cv"]) for r in seeds}

    for _ in range(n_iter):
        ref = ray.put(centers)

        def partials(b: pa.Table) -> pa.Table:
            ctr = ray.get(ref)
            cols = {"cid": [], "n": [], "sy": [], "sx": [], "sv": []}

            def one(arr, cap):
                valid = arr != np.float32(cap.nodata)
                lab = _assign_block(arr, valid, cap.ty * T, cap.tx * T,
                                    ctr, S, m)
                sel = lab >= 0
                if not sel.any():
                    return
                ys, xs = np.nonzero(sel)
                l1 = lab[sel]
                vv = np.rint(arr[sel].astype(np.float64)
                             * _VSCALE).astype(np.int64)
                for cid in np.unique(l1):
                    s = l1 == cid
                    cols["cid"].append(int(cid))
                    cols["n"].append(int(s.sum()))
                    cols["sy"].append(int((ys[s] + cap.ty * T).sum()))
                    cols["sx"].append(int((xs[s] + cap.tx * T).sum()))
                    cols["sv"].append(int(vv[s].sum()))

            tile_px(b, one)
            return pa.table({k: pa.array(v, pa.int64())
                             for k, v in cols.items()})

        folded = (src.map_batches(partials, batch_format="pyarrow")
                  .groupby("cid")
                  .aggregate(Sum("n", alias_name="n"),
                             Sum("sy", alias_name="sy"),
                             Sum("sx", alias_name="sx"),
                             Sum("sv", alias_name="sv"))
                  .take_all())
        for r in folded:
            n = int(r["n"])
            centers[int(r["cid"])] = (int(r["sy"]) / n,
                                      int(r["sx"]) / n,
                                      int(r["sv"]) / n / _VSCALE)

    ref = ray.put(centers)

    def label_tiles(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        ctr = ray.get(ref)
        cols = {c: [] for c in TILES_SCHEMA.names}

        def one(arr, cap):
            valid = arr != np.float32(cap.nodata)
            lab = _assign_block(arr, valid, cap.ty * T, cap.tx * T,
                                ctr, S, m)
            plane = np.where(lab >= 0, lab.astype(np.float32),
                             np.float32(-1.0))
            from ..tiles.codec import Caption as _C
            ocap = _C(layer="slic", x0=cap.x0, y0=cap.y0,
                      pixel_size=cap.pixel_size, crs=cap.crs,
                      nodata=-1.0, edge=dict(cap.edge),
                      tx=cap.tx, ty=cap.ty)
            payload, ocap = encode_tile(plane, fmt, ocap)
            h, w = plane.shape
            cols["image_id"].append(f"slic/{cap.tx}/{cap.ty}")
            cols["bytes"].append(payload)
            cols["w"].append(np.int32(w))
            cols["h"].append(np.int32(h))
            cols["fmt"].append(fmt)
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(plane)))

        tile_px(b, one)
        from ..tiles.synth import TILES_SCHEMA as _S
        return pa.table(cols, schema=_S)

    labels_ds = src.map_batches(label_tiles, batch_format="pyarrow")
    ctab = pa.table({
        "cid": pa.array(sorted(centers), pa.int64()),
        "cy": pa.array([centers[i][0] for i in sorted(centers)],
                       pa.float64()),
        "cx": pa.array([centers[i][1] for i in sorted(centers)],
                       pa.float64()),
        "cval": pa.array([centers[i][2] for i in sorted(centers)],
                         pa.float64())})
    return labels_ds, ctab
