"""Distributed Canny edge detection over the tiled raster table -- the
classic edge extractor (OpenCV ``Canny`` / skimage ``feature.canny``
role, without the Gaussian pre-blur, which is :func:`..stages.filters`'
job as a composable upstream stage).  The reference toolbox has no edge
op; this is a beyond-reference image stage that exercises BOTH engine
exchange patterns at once: the local half (Sobel gradient, non-maximum
suppression, double threshold) rides the one-shuffle halo-window plan,
and the global half (hysteresis) is a cross-tile connected-components
problem solved with the same border-exchange + tree-reduce kit as
polygonize/region_group -- no iterative rounds, no pixel re-shuffles
beyond the two keyed passes.

Deterministic semantics (documented where library behavior varies):

* gradient: Sobel 3x3, defined only at pixels whose full 3x3
  neighborhood is inside the raster AND valid (position-independent, so
  tiled == whole-raster); magnitude ``hypot(gx, gy)``, float64;
* NMS: direction quantized to 4 sectors by ``arctan2``; a pixel
  survives when its magnitude is ``>=`` both sector neighbors
  (undefined / out-of-raster neighbor magnitudes count 0) and ``> 0``;
* double threshold: ``mag >= high`` -> strong (2), ``low <= mag <
  high`` -> weak (1), else 0;
* hysteresis: weak pixels survive iff their 8-connected component of
  candidate pixels (weak or strong) contains a strong pixel -- global
  across ALL tile boundaries, including the corner-diagonal case.

Scale shape: stage A is ``windowed_stage`` (radius 2 -- NMS needs the
neighbors' gradients); stage B labels each class tile's candidate mask
once (vectorized hooking + pointer jumping), ships only O(tile_px)
border lines + 4 corner pixels per tile through ONE groupby, contracts
the fragment merge edges with the shared tree-reduce components kit
(fragment graph ~= #edge-segments, orders below pixels), and rewrites
tiles in a second keyed pass where each encoded class tile travels
exactly once.  Nothing pixel-sized ever reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import windowed_stage
from .halo import GridSpec
from .polygonize import _LABEL_BITS

ND = np.float32(-1.0)     # class-plane nodata (classes are 0/1/2)


def canny_class_kernel(arr: np.ndarray, nodata: float, *, low: float,
                       high: float) -> np.ndarray:
    """Whole-array pre-hysteresis Canny classes: float32 plane of
    ``ND`` (input nodata), 0 (no edge), 1 (weak), 2 (strong).  Same
    result tiled (radius-2 halo) or whole-raster."""
    if not (0.0 < low <= high):
        raise ValueError(f"need 0 < low <= high, got {low}, {high}")
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    nd_in = np.float32(nodata)
    valid = a32 != nd_in
    a = np.where(valid, a32.astype(np.float64), 0.0)

    # gradient defined where the full 3x3 is inside AND valid
    gdef = np.zeros((H, W), bool)
    if H >= 3 and W >= 3:
        ok = valid
        inner = (ok[:-2, :-2] & ok[:-2, 1:-1] & ok[:-2, 2:]
                 & ok[1:-1, :-2] & ok[1:-1, 1:-1] & ok[1:-1, 2:]
                 & ok[2:, :-2] & ok[2:, 1:-1] & ok[2:, 2:])
        gdef[1:-1, 1:-1] = inner
    gx = np.zeros((H, W), np.float64)
    gy = np.zeros((H, W), np.float64)
    if H >= 3 and W >= 3:
        gx[1:-1, 1:-1] = ((a[:-2, 2:] + 2.0 * a[1:-1, 2:] + a[2:, 2:])
                          - (a[:-2, :-2] + 2.0 * a[1:-1, :-2]
                             + a[2:, :-2]))
        gy[1:-1, 1:-1] = ((a[2:, :-2] + 2.0 * a[2:, 1:-1] + a[2:, 2:])
                          - (a[:-2, :-2] + 2.0 * a[:-2, 1:-1]
                             + a[:-2, 2:]))
    gx[~gdef] = 0.0
    gy[~gdef] = 0.0
    mag = np.hypot(gx, gy)
    mag[~gdef] = 0.0

    # sector quantization: angle mod 180 deg into 4 bins
    ang = np.degrees(np.arctan2(gy, gx))
    ang = np.mod(ang, 180.0)
    sector = np.zeros((H, W), np.int8)
    sector[(ang >= 22.5) & (ang < 67.5)] = 1
    sector[(ang >= 67.5) & (ang < 112.5)] = 2
    sector[(ang >= 112.5) & (ang < 157.5)] = 3

    pad = np.zeros((H + 2, W + 2), np.float64)
    pad[1:-1, 1:-1] = mag

    def nb(dy: int, dx: int) -> np.ndarray:
        return pad[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    # sector 0: E/W; 1: NE/SW; 2: N/S; 3: NW/SE
    offs = {0: ((0, 1), (0, -1)), 1: ((-1, 1), (1, -1)),
            2: ((-1, 0), (1, 0)), 3: ((-1, -1), (1, 1))}
    keep = np.zeros((H, W), bool)
    for s, ((dy1, dx1), (dy2, dx2)) in offs.items():
        m = sector == s
        keep |= m & (mag >= nb(dy1, dx1)) & (mag >= nb(dy2, dx2))
    keep &= gdef & (mag > 0.0)

    cls = np.zeros((H, W), np.float32)
    cls[keep & (mag >= low)] = 1.0
    cls[keep & (mag >= high)] = 2.0
    cls[~valid] = ND
    return cls


def _label_mask8(mask: np.ndarray):
    """8-connectivity labeling of a boolean mask: (labels int32 with -1
    off-mask, n_labels).  Same vectorized hooking + pointer-jumping
    scheme as polygonize's 4-conn labeler, with the two diagonal edge
    sets added."""
    H, W = mask.shape
    idx = np.arange(H * W, dtype=np.int64).reshape(H, W)
    eas, ebs = [], []
    for a, b in ((mask[:, :-1] & mask[:, 1:],
                  (idx[:, :-1], idx[:, 1:])),
                 (mask[:-1, :] & mask[1:, :],
                  (idx[:-1, :], idx[1:, :])),
                 (mask[:-1, :-1] & mask[1:, 1:],
                  (idx[:-1, :-1], idx[1:, 1:])),
                 (mask[:-1, 1:] & mask[1:, :-1],
                  (idx[:-1, 1:], idx[1:, :-1]))):
        if a.any():
            eas.append(b[0][a])
            ebs.append(b[1][a])
    parent = np.arange(H * W, dtype=np.int64)
    if eas:
        ea = np.concatenate(eas)
        eb = np.concatenate(ebs)
        while True:
            pa_, pb_ = parent[ea], parent[eb]
            lo = np.minimum(pa_, pb_)
            hi = np.maximum(pa_, pb_)
            m = lo != hi
            if not m.any():
                break
            np.minimum.at(parent, hi[m], lo[m])
            while True:
                nxt = parent[parent]
                if np.array_equal(nxt, parent):
                    break
                parent = nxt
    labels = np.full(H * W, -1, dtype=np.int32)
    flat = mask.ravel()
    roots = parent[np.flatnonzero(flat)]
    if len(roots):
        uniq, compact = np.unique(roots, return_inverse=True)
        labels[flat] = compact.astype(np.int32)
        n = len(uniq)
    else:
        n = 0
    return labels.reshape(H, W), n


_CANNY_SCHEMA = pa.schema([
    ("kind", pa.int8()),         # 0 fragment, 1 border line, 2 corner px
    ("gid", pa.int64()), ("strong", pa.bool_()),
    ("edge_id", pa.int64()), ("side", pa.int8()),
    ("gids", pa.binary()),
    ("corner_id", pa.int64()), ("which", pa.int8())])


def _hysteresis_rows(cls: np.ndarray, spec: GridSpec, tx: int, ty: int):
    """One class tile -> fragment/border/corner contribution rows (as a
    dict-of-lists following _CANNY_SCHEMA)."""
    T = spec.tile_px
    cell = spec.cell_id(tx, ty)
    base = np.int64(cell) << _LABEL_BITS
    cand = cls >= 1.0
    labels, n_lab = _label_mask8(cand)
    out = {n: [] for n in _CANNY_SCHEMA.names}

    def row(**kw):
        for n in _CANNY_SCHEMA.names:
            out[n].append(kw.get(n))

    if n_lab:
        lab = labels[cand].astype(np.int64)
        strong = np.zeros(n_lab, bool)
        np.logical_or.at(strong, lab, cls[cand] == 2.0)
        for j in range(n_lab):
            row(kind=0, gid=int(base + j), strong=bool(strong[j]))
    gid2d = np.where(labels >= 0, base + labels.astype(np.int64),
                     np.int64(-1))
    for gline, eid, ok, side in (
            (gid2d[:, -1], np.int64(cell) * 2, tx + 1 < spec.tiles_x, 0),
            (gid2d[:, 0], np.int64(spec.cell_id(tx - 1, ty)) * 2,
             tx > 0, 1),
            (gid2d[-1, :], np.int64(cell) * 2 + 1,
             ty + 1 < spec.tiles_y, 0),
            (gid2d[0, :], np.int64(spec.cell_id(tx, ty - 1)) * 2 + 1,
             ty > 0, 1)):
        if not ok:
            continue
        row(kind=1, edge_id=int(eid), side=side,
            gids=np.ascontiguousarray(gline).tobytes())
    # corner pixels for the diagonal-across-both-boundaries adjacency:
    # which 0 NW, 1 NE, 2 SW, 3 SE; interior corner point (cx, cy) id
    cxw = spec.tiles_x + 1
    for which, (py, px), (cx, cy), ok in (
            (0, (0, 0), (tx, ty), tx > 0 and ty > 0),
            (1, (0, T - 1), (tx + 1, ty),
             tx < spec.tiles_x - 1 and ty > 0),
            (2, (T - 1, 0), (tx, ty + 1),
             tx > 0 and ty < spec.tiles_y - 1),
            (3, (T - 1, T - 1), (tx + 1, ty + 1),
             tx < spec.tiles_x - 1 and ty < spec.tiles_y - 1)):
        if ok and gid2d[py, px] >= 0:
            row(kind=2, corner_id=int(cy * cxw + cx), which=which,
                gid=int(gid2d[py, px]))
    return out


def canny_edges(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                low: float, high: float, fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of binary edge tiles
    (layer ``canny``: 1 edge, 0 no edge, nodata where the input is
    nodata), exact global hysteresis included."""
    cls_ds = windowed_stage(
        tiles_ds, spec, layer=layer, radius=2, out_layer="canny_cls",
        window_fn=lambda w, nd: canny_class_kernel(w, nd, low=low,
                                                   high=high),
        fmt=fmt).materialize()

    def frag_stage(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        out = {n: [] for n in _CANNY_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            cls = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            rows = _hysteresis_rows(cls, spec, cap.tx, cap.ty)
            for n in _CANNY_SCHEMA.names:
                out[n].extend(rows[n])
        return pa.table(out, schema=_CANNY_SCHEMA)

    combined = (cls_ds.map_batches(frag_stage, batch_format="pyarrow")
                .materialize())
    keep = _canny_keep_table(combined, spec)

    # rewrite pass: class tiles + kept weak-fragment gids meet once,
    # keyed by cell -- each encoded class tile travels exactly once.
    rw_schema = pa.schema([
        ("cell", pa.int64()), ("rk", pa.int8()),
        ("bytes", pa.binary()), ("fmt", pa.string()),
        ("caption", pa.string()), ("gid", pa.int64())])

    def tile_rows(b: pa.Table) -> pa.Table:
        import json

        cells = [spec.cell_id(json.loads(c)["tx"], json.loads(c)["ty"])
                 for c in b.column("caption").to_pylist()]
        n = b.num_rows
        return pa.table({
            "cell": pa.array(cells, pa.int64()),
            "rk": pa.array(np.zeros(n, np.int8)),
            "bytes": b.column("bytes"), "fmt": b.column("fmt"),
            "caption": b.column("caption"),
            "gid": pa.array(np.full(n, -1, np.int64))}, schema=rw_schema)

    def keep_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "cell": b.column("cell"),
            "rk": pa.array(np.ones(n, np.int8)),
            "bytes": pa.array([None] * n, pa.binary()),
            "fmt": pa.array([None] * n, pa.string()),
            "caption": pa.array([None] * n, pa.string()),
            "gid": b.column("gid")}, schema=rw_schema)

    def rewrite(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        tile_i = [i for i, rk in enumerate(g["rk"]) if rk == 0]
        if not tile_i:                     # kept rows of an absent tile
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        i = tile_i[0]
        cap = Caption.from_json(g["caption"][i])
        cls = decode_tile(g["bytes"][i], g["fmt"][i], cap)
        base = np.int64(spec.cell_id(cap.tx, cap.ty)) << _LABEL_BITS
        labels, _ = _label_mask8(cls >= 1.0)
        kept = {int(gid) - int(base) for j, gid in enumerate(g["gid"])
                if g["rk"][j] == 1}
        keep2d = np.isin(labels, np.fromiter(kept, np.int64,
                                             len(kept))) \
            if kept else np.zeros(labels.shape, bool)
        edge = (cls == 2.0) | ((cls == 1.0) & keep2d)
        out = np.where(cls == ND, ND, edge.astype(np.float32))
        ocap = Caption(layer="canny", x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=float(ND), edge=dict(cap.edge),
                       tx=cap.tx, ty=cap.ty)
        payload, ocap = encode_tile(out, fmt, ocap)
        h, w = out.shape
        return pa.table({
            "image_id": pa.array([f"canny/{cap.tx}/{cap.ty}"],
                                 pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([w], pa.int32()),
            "h": pa.array([h], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(out)], pa.int64())},
            schema=TILES_SCHEMA)

    return (cls_ds.map_batches(tile_rows, batch_format="pyarrow")
            .union(keep.map_batches(keep_rows, batch_format="pyarrow"))
            .groupby("cell")
            .map_groups(rewrite, batch_format="pyarrow"))


def canny_kernel(arr: np.ndarray, nodata: float, *, low: float,
                 high: float) -> np.ndarray:
    """Whole-array Canny INCLUDING hysteresis -- the single-process
    oracle form: class kernel + 8-conn components of the candidate
    mask, weak pixels kept iff their component holds a strong pixel."""
    cls = canny_class_kernel(arr, nodata, low=low, high=high)
    labels, n = _label_mask8(cls >= 1.0)
    out = np.where(cls == ND, ND, np.float32(0.0)).astype(np.float32)
    if n:
        strong = np.zeros(n, bool)
        m = labels >= 0
        np.logical_or.at(strong, labels[m].astype(np.int64),
                         cls[m] == 2.0)
        out[m & strong[np.where(m, labels, 0)]] = 1.0
    return out


def _canny_keep_table(combined, spec: GridSpec):
    """Fragment/border/corner rows -> (cell, gid) rows of the fragments
    whose global component holds a strong pixel (weak fragments only;
    strong pixels survive unconditionally in the rewrite)."""
    from ray.data.aggregate import Max

    from ..functions.components import connected_components

    def line_edges(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if group.num_rows != 2:
            return empty
        side = group.column("side").to_pylist()
        a, b_ = (0, 1) if side[0] == 0 else (1, 0)
        ga = np.frombuffer(group.column("gids")[a].as_py(), np.int64)
        gb = np.frombuffer(group.column("gids")[b_].as_py(), np.int64)
        pairs = []
        n = len(ga)
        for off in (-1, 0, 1):            # 8-conn across the boundary
            lo, hi = max(0, -off), min(n, n - off)
            x, y = ga[lo:hi], gb[lo + off:hi + off]
            m = (x >= 0) & (y >= 0)
            if m.any():
                pairs.append(np.stack([x[m], y[m]], axis=1))
        if not pairs:
            return empty
        u = np.unique(np.concatenate(pairs), axis=0)
        return pa.table({"id_a": pa.array(u[:, 0], pa.int64()),
                         "id_b": pa.array(u[:, 1], pa.int64())})

    def corner_edges(group: pa.Table) -> pa.Table:
        by = {int(group.column("which")[i].as_py()):
              int(group.column("gid")[i].as_py())
              for i in range(group.num_rows)}
        ids_a, ids_b = [], []
        for a, b_ in ((3, 0), (2, 1)):     # SE<->NW, SW<->NE diagonals
            if a in by and b_ in by:
                ids_a.append(by[a])
                ids_b.append(by[b_])
        return pa.table({"id_a": pa.array(ids_a, pa.int64()),
                         "id_b": pa.array(ids_b, pa.int64())})

    frags = combined.filter(expr="kind == 0")
    lines = (combined.filter(expr="kind == 1")
             .select_columns(["edge_id", "side", "gids"])
             .groupby("edge_id")
             .map_groups(line_edges, batch_format="pyarrow"))
    corners = (combined.filter(expr="kind == 2")
               .select_columns(["corner_id", "which", "gid"])
               .groupby("corner_id")
               .map_groups(corner_edges, batch_format="pyarrow"))
    edges = lines.union(corners)
    comp = connected_components(edges)          # (doc_id=gid, component_id)

    # (gid, strong) + (gid, comp) -> per-component any(strong) -> kept
    # gids; everything here is fragment-graph-sized, never pixel-sized.
    def tag_strong(b: pa.Table) -> pa.Table:
        return pa.table({"gid": b.column("gid"),
                         "comp": pa.array(np.full(b.num_rows, -1,
                                                  np.int64)),
                         "strong": b.column("strong")})

    def tag_comp(b: pa.Table) -> pa.Table:
        return pa.table({"gid": b.column("doc_id"),
                         "comp": b.column("component_id"),
                         "strong": pa.array(np.zeros(b.num_rows, bool))})

    def fold_gid(group: pa.Table) -> pa.Table:
        comps = [c for c in group.column("comp").to_pylist() if c >= 0]
        strong = any(group.column("strong").to_pylist())
        gid = int(group.column("gid")[0].as_py())
        # no cross-tile edge touched this fragment: it is its own
        # (within-one-tile) component
        comp = comps[0] if comps else gid
        return pa.table({"comp": pa.array([comp], pa.int64()),
                         "gid": pa.array([gid], pa.int64()),
                         "strong": pa.array([int(strong)], pa.int8())})

    per_frag = (frags.select_columns(["gid", "strong"])
                .map_batches(tag_strong, batch_format="pyarrow")
                .union(comp.map_batches(tag_comp, batch_format="pyarrow"))
                .groupby("gid")
                .map_groups(fold_gid, batch_format="pyarrow")
                .materialize())
    comp_keep = (per_frag.groupby("comp")
                 .aggregate(Max("strong", alias_name="keep")))

    def tag_frag(b: pa.Table) -> pa.Table:
        return pa.table({"comp": b.column("comp"), "gid": b.column("gid"),
                         "keep": pa.array(np.full(b.num_rows, -1,
                                                  np.int8))})

    def tag_keep(b: pa.Table) -> pa.Table:
        return pa.table({"comp": b.column("comp"),
                         "gid": pa.array(np.full(b.num_rows, -1,
                                                 np.int64)),
                         "keep": b.column("keep").cast(pa.int8())})

    def fold_comp(group: pa.Table) -> pa.Table:
        keep = max(group.column("keep").to_pylist()) > 0
        gids = [g for g in group.column("gid").to_pylist() if g >= 0]
        if not keep or not gids:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "gid": pa.array([], pa.int64())})
        g = np.asarray(gids, np.int64)
        return pa.table({"cell": pa.array(g >> _LABEL_BITS),
                         "gid": pa.array(g)})

    return (per_frag.drop_columns(["strong"])
            .map_batches(tag_frag, batch_format="pyarrow")
            .union(comp_keep.map_batches(tag_keep,
                                         batch_format="pyarrow"))
            .groupby("comp")
            .map_groups(fold_comp, batch_format="pyarrow"))
