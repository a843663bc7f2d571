"""Sparse feature extraction and matching across raster epochs --
Harris corners + BRIEF binary descriptors + Hamming matching with a
ratio test and a translation consensus vote (the ORB-style
detect/describe/match pipeline of OpenCV ``ORB_create`` +
``BFMatcher(NORM_HAMMING)`` role).  Feature-based registration
complements :mod:`.register`'s dense phase correlation: it survives
large shifts and per-tile content changes because features, not pixels,
are matched.

Deterministic semantics:

* corners: :func:`..stages.harris.harris_kernel` (its documented
  position-independent rules) on a window whose halo also covers the
  descriptor patch, so every core corner has a full patch; per tile the
  top ``k_per_tile`` corners by ``(response desc, y, x)`` total order;
* descriptor: ``n_bits`` fixed sample pairs drawn once from a seeded
  generator (the published-BRIEF test layout stands in for the paper's
  frozen pattern); bit = ``patch[a] < patch[b]``, packed MSB-first into
  ``n_bits/64`` int64 words; corners whose patch touches nodata or the
  raster edge are dropped (position-independent);
* matching: exact Hamming via XOR + byte-LUT popcount, vectorized; a
  match survives Lowe's ratio test ``10 * best < 8 * second_best``
  (integer form) and a mutual-best check is NOT applied (documented);
  ties on distance break by smallest (yb, xb);
* consensus: integer ``(dy, dx) = (yb - ya, xb - xa)`` votes, global
  ``groupby.count`` fold, winner by (votes desc, dy, dx).

Scale shape: feature tables are corner-bounded (``k_per_tile`` x tiles,
orders below pixels); extraction is ONE halo exchange; matching
broadcasts the SMALLER epoch's table (``ray.put`` once, read per task)
against the larger side streamed in blocks -- at scales where both
sides outgrow a broadcast, band the descriptors by their first 16 bits
and shuffle-join the bands (the engine's standard LSH-bucket shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import FocalGridSpec
from .halo import GridSpec, assemble_window, make_strip_emitter_batch
from .harris import harris_kernel

_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                     axis=1).sum(axis=1).astype(np.int64)


def brief_pattern(n_bits: int = 256, radius: int = 8, seed: int = 7):
    """The frozen sample-pair layout: (n_bits, 4) int offsets in
    [-radius, radius]."""
    rng = np.random.default_rng(seed)
    return rng.integers(-radius, radius + 1, (n_bits, 4)).astype(np.int64)


FEAT_SCHEMA = pa.schema([
    ("y", pa.int64()), ("x", pa.int64()), ("resp_u", pa.int64()),
    ("d0", pa.int64()), ("d1", pa.int64()),
    ("d2", pa.int64()), ("d3", pa.int64())])


def _describe(window: np.ndarray, valid: np.ndarray, ys, xs,
              pattern: np.ndarray):
    """BRIEF bits for corners at window coords (ys, xs); returns
    (keep mask, packed (n, 4) int64)."""
    H, W = window.shape
    r = int(np.abs(pattern).max())
    n = len(ys)
    keep = ((ys >= r) & (ys < H - r) & (xs >= r) & (xs < W - r))
    packed = np.zeros((n, 4), np.int64)
    if not keep.any():
        return keep, packed
    idx = np.flatnonzero(keep)
    ay = ys[idx][:, None] + pattern[None, :, 0]
    ax = xs[idx][:, None] + pattern[None, :, 1]
    by = ys[idx][:, None] + pattern[None, :, 2]
    bx = xs[idx][:, None] + pattern[None, :, 3]
    pv = valid[ay, ax] & valid[by, bx]
    patch_ok = pv.all(axis=1)
    bits = window[ay, ax] < window[by, bx]
    nb = pattern.shape[0]
    words = np.zeros((len(idx), 4), np.int64)
    for w in range(nb // 64):
        chunk = bits[:, w * 64:(w + 1) * 64]
        vals = np.zeros(len(idx), np.uint64)
        for b in range(64):
            vals = (vals << np.uint64(1)) | chunk[:, b].astype(np.uint64)
        words[:, w] = vals.view(np.int64)
    keep2 = keep.copy()
    keep2[idx] = patch_ok
    packed[idx] = words
    return keep2, packed


def extract_features(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                     k_per_tile: int = 32, k: float = 0.05,
                     radius: int = 2, nms_radius: int = 2,
                     thr: float = 0.0, pattern: np.ndarray | None = None):
    """Image-table Dataset -> feature rows (FEAT_SCHEMA, global pixel
    coords) via one halo exchange sized for corner + descriptor."""
    import json

    pat = brief_pattern() if pattern is None else pattern
    desc_r = int(np.abs(pat).max())
    halo = 1 + radius + nms_radius + desc_r
    if halo >= spec.tile_px:
        raise ValueError(f"halo {halo} >= tile_px {spec.tile_px}")
    fspec = FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                          spec.pixel_size, spec.y_north, radius=halo)
    T = fspec.tile_px

    def keep_layer(b: pa.Table) -> pa.Table:
        caps = b.column("caption").to_pylist()
        sel = [i for i, c in enumerate(caps)
               if json.loads(c)["layer"] == layer]
        return b.take(pa.array(sel, pa.int64()))

    emit = make_strip_emitter_batch(fspec)

    def compute(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % fspec.tiles_x, cell // fspec.tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        empty = pa.table({c: [] for c in FEAT_SCHEMA.names},
                         schema=FEAT_SCHEMA)
        if g["layer"].count(layer) != neigh:
            return empty
        window = assemble_window(g, fspec, layer, tx, ty)
        if window is None:
            return empty
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        nd = np.float32(ref.nodata)
        resp = harris_kernel(window, float(ref.nodata), k=k,
                             radius=radius, nms_radius=nms_radius,
                             thr=thr)
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        core = resp[rs:rs + T, cs:cs + T]
        cy, cx = np.nonzero(core != nd)
        if len(cy) == 0:
            return empty
        rv = core[cy, cx].astype(np.float64)
        order = np.lexsort((cx, cy, -rv))[:k_per_tile]
        cy, cx, rv = cy[order], cx[order], rv[order]
        wy, wx = cy + rs, cx + cs
        valid = window != nd
        keep, packed = _describe(window, valid, wy, wx, pat)
        if not keep.any():
            return empty
        sel = np.flatnonzero(keep)
        return pa.table({
            "y": pa.array(cy[sel] + ty * T, pa.int64()),
            "x": pa.array(cx[sel] + tx * T, pa.int64()),
            "resp_u": pa.array(np.rint(rv[sel] * 1000).astype(np.int64)),
            "d0": pa.array(packed[sel, 0], pa.int64()),
            "d1": pa.array(packed[sel, 1], pa.int64()),
            "d2": pa.array(packed[sel, 2], pa.int64()),
            "d3": pa.array(packed[sel, 3], pa.int64())},
            schema=FEAT_SCHEMA)

    return (tiles_ds.map_batches(keep_layer, batch_format="pyarrow")
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))


def _hamming(da: np.ndarray, db: np.ndarray) -> np.ndarray:
    """(na, 4) x (nb, 4) int64 words -> (na, nb) Hamming distances."""
    xa = da.view(np.uint64)
    xb = db.view(np.uint64)
    out = np.zeros((len(da), len(db)), np.int64)
    for w in range(da.shape[1]):
        x = np.bitwise_xor(xa[:, w][:, None], xb[None, :, w])
        by = x.view(np.uint8).reshape(len(da), len(db), 8)
        out += _POP[by].sum(axis=2)
    return out


def match_features(feat_a, feat_b, *, max_dist: int = 64,
                   max_broadcast_features: int = 2_000_000):
    """Two feature Datasets -> match rows ``(ya, xa, yb, xb, dist)``:
    the smaller side (B) broadcast via ``ray.put`` once, A streamed;
    ratio test 10*best < 8*second, distance cap, ties to smallest
    (yb, xb).

    The broadcast is LOUDLY GATED at ``max_broadcast_features`` rows
    (~80 MB of descriptors): corner counts are detector-thresholded and
    image-pair-bounded in every current use, but an unbounded ``feat_b``
    would pin the driver -- past the gate, pre-bucket both sides by
    coarse image/cell key and match per bucket (the partitioned
    spatial-join pattern, stages/spatial_join.py) instead of raising
    the cap."""
    import ray

    n_b = feat_b.count()
    if n_b > max_broadcast_features:
        raise RuntimeError(
            f"match_features: feat_b has {n_b} rows, past the "
            f"{max_broadcast_features}-row broadcast gate; bucket both "
            "sides by cell key and match per bucket (see docstring) "
            "rather than broadcasting an unbounded descriptor table")
    b_rows = feat_b.take_all()
    if not b_rows:
        return pa.table({c: pa.array([], pa.int64())
                         for c in ("ya", "xa", "yb", "xb", "dist")})
    db = np.asarray([[r["d0"], r["d1"], r["d2"], r["d3"]]
                     for r in b_rows], np.int64)
    byx = np.asarray([[r["y"], r["x"]] for r in b_rows], np.int64)
    srt = np.lexsort((byx[:, 1], byx[:, 0]))
    db, byx = db[srt], byx[srt]
    b_ref = ray.put((db, byx))

    def match_block(b: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("ya", "xa", "yb", "xb", "dist")})
        if b.num_rows == 0:
            return empty
        db_, byx_ = ray.get(b_ref)
        da = np.stack([b.column(c).to_numpy()
                       for c in ("d0", "d1", "d2", "d3")], axis=1)
        d = _hamming(da, db_)
        best_j = d.argmin(axis=1)        # first (smallest yb,xb) on ties
        best = d[np.arange(len(da)), best_j]
        d2 = d.copy()
        d2[np.arange(len(da)), best_j] = np.iinfo(np.int64).max
        second = d2.min(axis=1) if d.shape[1] > 1 else \
            np.full(len(da), np.iinfo(np.int64).max)
        ok = (best <= max_dist) & (10 * best < 8 * second)
        if not ok.any():
            return empty
        sel = np.flatnonzero(ok)
        return pa.table({
            "ya": pa.array(b.column("y").to_numpy()[sel]),
            "xa": pa.array(b.column("x").to_numpy()[sel]),
            "yb": pa.array(byx_[best_j[sel], 0]),
            "xb": pa.array(byx_[best_j[sel], 1]),
            "dist": pa.array(best[sel])})

    return feat_a.map_batches(match_block, batch_format="pyarrow")


def translation_consensus(matches_ds):
    """Match rows -> the winning integer ``(dy, dx, n_votes)`` row."""
    from ray.data.aggregate import Count

    def deltas(b: pa.Table) -> pa.Table:
        return pa.table({
            "dy": pa.array(b.column("yb").to_numpy()
                           - b.column("ya").to_numpy()),
            "dx": pa.array(b.column("xb").to_numpy()
                           - b.column("xa").to_numpy())})

    agg = (matches_ds.map_batches(deltas, batch_format="pyarrow")
           .groupby(["dy", "dx"])
           .aggregate(Count(alias_name="n_votes")))
    return (agg.sort(["n_votes", "dy", "dx"],
                     descending=[True, False, False])
            .limit(1))
