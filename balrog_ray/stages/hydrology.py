"""Distributed hydrology over the tile table: D8 flow direction and
GLOBAL flow accumulation (the gdaldem/ArcGIS FlowDirection +
FlowAccumulation pair -- the natural next derivative after the
reference's slope/aspect chain, ``utilities/sa_tools.py:205-293``, and
the canonical example of a raster op whose result at one pixel depends
on unboundedly-distant input).

Semantics (pinned by the whole-raster kernels below, which double as the
test oracle):

* **D8 direction**: steepest positive descent ``(z - z_n) / dist`` over
  the 8 neighbours (``dist`` = 1 cardinal, sqrt(2) diagonal, in pixel
  units); ties break on the fixed scan order E, SE, S, SW, W, NW, N, NE;
  no positive descent (pits / flats) -> 0; nodata -> nodata.  Off-raster
  neighbours are never candidates, so edge cells either drain inward or
  pond (no flow leaves the raster) -- self-consistent with accumulation.
* **Accumulation**: number of upstream cells whose D8 path passes
  through the cell (the cell itself excluded -- ESRI convention).
  Exact integer counts; D8 descent is strict, so the flow graph is a
  forest and counts are well-defined.

Scale shape of :func:`flow_accumulation` -- accumulation is a global
computation, but pixel payloads cross the wire exactly twice:

1. ONE radius-1 halo shuffle (the shared strip emitter) computes per
   tile: D8 dirs, LOCAL accumulation from in-tile sources only (Kahn
   frontier DP over the in-tile flow forest, O(px) total), a ring-route
   table (for each valid outer-ring pixel: the exit pixel its path
   leaves the tile through, or "sinks inside"), and the initial
   boundary-outflow rows ``(to_cell, to_px, amount)``.
2. a driver-orchestrated propagation loop over the CONTRACTED border
   graph: entry rows join the ring-route table (both tiny -- ring
   pixels are ~4/T of the raster, amounts are one int per crossing) and
   forward downstream until no entries remain.  Pixel payloads are
   never touched; per-iteration volume is the active drainage front.
   Iteration count = drainage diameter in tiles (how many tile
   boundaries the longest flow path crosses), with a loud guard raise
   at ``max_hops``.
3. ONE final ``groupby(cell_id)`` joins the summed entry amounts back
   to the tile state and paints each entry's in-tile path (bounded
   walks from ring pixels), emitting ``flow_acc`` image rows.

Output tiles are float32 (exact for counts < 2**24; a world where one
outlet drains more than 16.7M cells needs an int64 column sink instead
-- the internal math is int64 throughout).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .focal import windowed_stage
from .front import cells_of, front_blocks, split_cells
from .halo import GridSpec, assemble_window, make_strip_emitter_batch

# scan order E, SE, S, SW, W, NW, N, NE; row axis points south (down)
_DY = np.array([0, 1, 1, 1, 0, -1, -1, -1], dtype=np.int64)
_DX = np.array([1, 1, 0, -1, -1, -1, 0, 1], dtype=np.int64)
_DIST = np.where((_DY != 0) & (_DX != 0), np.sqrt(2.0), 1.0)
D8_CODES = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.int64)  # ESRI


def d8_kernel(arr: np.ndarray, nodata: float) -> np.ndarray:
    """Whole-array D8: int8 direction INDEX per pixel (0-7 into the scan
    order above), -1 = pit/flat, -2 = nodata.  Vectorized: 8 shifted
    comparisons, no per-pixel loop."""
    a = np.asarray(arr, dtype=np.float32)
    H, W = a.shape
    valid = a != np.float32(nodata)
    best = np.zeros((H, W), dtype=np.float64)      # drop must be > 0
    out = np.full((H, W), -1, dtype=np.int8)
    for k in range(8):
        dy, dx = int(_DY[k]), int(_DX[k])
        drop = np.full((H, W), -np.inf)
        src = (slice(max(0, -dy), H - max(0, dy)),
               slice(max(0, -dx), W - max(0, dx)))
        dst = (slice(max(0, dy), H + min(0, dy) or None),
               slice(max(0, dx), W + min(0, dx) or None))
        nb_ok = valid[dst]
        d = (a[src].astype(np.float64) - a[dst].astype(np.float64)) / _DIST[k]
        drop[src] = np.where(nb_ok, d, -np.inf)
        better = valid & (drop > best)
        out[better] = k
        best = np.where(better, drop, best)
    out[~valid] = -2
    return out


def _targets(dirs: np.ndarray) -> np.ndarray:
    """Flat target index per pixel from a dir-index array (-1 where the
    pixel does not flow: pit or nodata)."""
    H, W = dirs.shape
    r, c = np.divmod(np.arange(H * W, dtype=np.int64), W)
    d = dirs.ravel()
    flows = d >= 0
    tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
    tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
    tgt = np.where(flows, tr * W + tc, -1)
    return tgt


def accumulate_kernel(dirs: np.ndarray) -> np.ndarray:
    """Whole-array flow accumulation from a dir-index array: int64
    upstream-cell counts.  Kahn frontier DP over the flow forest --
    every pixel is processed exactly once (O(px) total), no
    step-the-water iteration."""
    H, W = dirs.shape
    tgt = _targets(dirs)
    n = H * W
    acc = np.zeros(n, dtype=np.int64)
    has_tgt = tgt >= 0
    indeg = np.bincount(tgt[has_tgt], minlength=n)
    done = ~has_tgt                       # pits/nodata never push
    frontier = np.flatnonzero(has_tgt & (indeg == 0))
    while frontier.size:
        done[frontier] = True
        t = tgt[frontier]
        np.add.at(acc, t, acc[frontier] + 1)
        np.subtract.at(indeg, t, 1)
        nxt = np.unique(t)
        frontier = nxt[(indeg[nxt] == 0) & (tgt[nxt] >= 0)]
    if not done.all():
        # impossible for strict-descent D8; a hand-built dirs array with a
        # cycle would silently under-count, so refuse instead
        raise ValueError("flow graph contains a cycle")
    acc[dirs.ravel() == -2] = -1
    return acc.reshape(H, W)


def flow_direction(ds, spec: GridSpec, *, layer: str = "dem",
                   fmt: str = "npz"):
    """Image-table Dataset -> image-table Dataset of D8 direction tiles
    (layer ``d8``, ESRI codes 1/2/4/.../128 as float32, 0 = pit/flat,
    nodata passthrough).  One radius-1 halo shuffle; exact parity with
    :func:`d8_kernel` on the whole raster."""

    def fn(window: np.ndarray, nodata: float) -> np.ndarray:
        d = d8_kernel(window, nodata)
        out = np.zeros(d.shape, dtype=np.float32)
        flows = d >= 0
        out[flows] = D8_CODES[d[flows]].astype(np.float32)
        out[d == -2] = np.float32(nodata)
        return out

    return windowed_stage(ds, spec, layer=layer, radius=1,
                          out_layer="d8", window_fn=fn, fmt=fmt)


_HYDRO_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 tile state, 1 entry row, 2 ring route
    ("cell_id", pa.int64()),
    ("px", pa.int64()),         # entry / route pixel (tile-flat index)
    ("amount", pa.int64()),     # kind 1
    ("to_cell", pa.int64()),    # kind 2: -1 = path sinks inside the tile
    ("to_px", pa.int64()),
    ("dirs", pa.binary()),      # kind 0: zlib int8 T*T
    ("acc", pa.binary()),       # kind 0: zlib int64 T*T local accumulation
    ("caption", pa.string()),   # kind 0
])


def _route_ring(dirs: np.ndarray, tile_r0: int, tile_c0: int,
                spec: GridSpec):
    """For every valid outer-ring pixel of a tile, follow the in-tile D8
    path until it leaves the tile or sinks.  Returns (px, to_cell, to_px)
    int arrays; to_cell = -1 where the path ends inside the tile, in
    which case to_px is the tile-flat index of the PIT it ended at (so
    watershed resolution can name the basin).  Vectorized frontier walk
    -- all ring pixels step together."""
    T = dirs.shape[0]
    rr, cc = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    ring = (rr == 0) | (rr == T - 1) | (cc == 0) | (cc == T - 1)
    start = np.flatnonzero(ring.ravel() & (dirs.ravel() != -2))
    pos_r, pos_c = np.divmod(start, T)
    to_cell = np.full(start.size, -1, dtype=np.int64)
    to_px = np.full(start.size, -1, dtype=np.int32)
    active = np.ones(start.size, dtype=bool)
    for _ in range(T * T + 1):
        if not active.any():
            break
        d = dirs[pos_r[active], pos_c[active]]
        moves = d >= 0
        idx = np.flatnonzero(active)
        active[idx[~moves]] = False            # pit: sinks inside
        mi = idx[moves]
        nr = pos_r[mi] + _DY[d[moves]]
        nc = pos_c[mi] + _DX[d[moves]]
        outside = (nr < 0) | (nr >= T) | (nc < 0) | (nc >= T)
        oi = mi[outside]
        gr = nr[outside] + tile_r0
        gc = nc[outside] + tile_c0
        to_cell[oi] = ((gr // T) * spec.tiles_x + gc // T)
        to_px[oi] = ((gr % T) * T + gc % T).astype(np.int32)
        active[oi] = False
        ii = mi[~outside]
        pos_r[ii] = nr[~outside]
        pos_c[ii] = nc[~outside]
    sinks = to_cell < 0
    to_px[sinks] = (pos_r[sinks] * T + pos_c[sinks]).astype(np.int32)
    return start.astype(np.int32), to_cell, to_px


def flow_accumulation(ds, spec: GridSpec, *, layer: str = "dem",
                      fmt: str = "npz", max_hops: int = 256):
    """Image-table Dataset -> image-table Dataset of global flow
    accumulation tiles (layer ``flow_acc``): exact upstream-cell counts
    matching ``accumulate_kernel(d8_kernel(whole_raster))``.

    ``max_hops`` guards the propagation loop: it must exceed the number
    of tile boundaries the longest drainage path crosses (paths can
    re-enter a tile, so the true bound is path length, not grid size).
    Exceeding it raises rather than silently truncating flow."""
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x = spec.tiles_x
    fspec = _radius1_spec(spec)
    emit = make_strip_emitter_batch(fspec)

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    def tile_state(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < fspec.tiles_x
                    and 0 <= ty + dy < fspec.tiles_y)
        out = {n: [] for n in _HYDRO_SCHEMA.names}

        def row(**kw):
            for n in _HYDRO_SCHEMA.names:
                out[n].append(kw.get(n))

        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table(out, schema=_HYDRO_SCHEMA)
        from ..tiles.codec import Caption

        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        dirs_w = d8_kernel(window, float(ref.nodata))
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        dirs = np.ascontiguousarray(dirs_w[rs:rs + T, cs:cs + T])

        # local accumulation + initial outflow: Kahn DP over in-tile
        # edges only; boundary-crossing flow becomes entry rows
        r, c = np.divmod(np.arange(T * T, dtype=np.int64), T)
        d = dirs.ravel()
        flows = d >= 0
        tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
        tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
        inside = flows & (tr >= 0) & (tr < T) & (tc >= 0) & (tc < T)
        tgt_in = np.where(inside, tr * T + tc, -1)
        acc = np.zeros(T * T, dtype=np.int64)
        indeg = np.bincount(tgt_in[inside], minlength=T * T)
        frontier = np.flatnonzero((indeg == 0) & flows)
        exits_cell, exits_px, exits_amt = [], [], []
        while frontier.size:
            f_in = frontier[inside[frontier]]
            if f_in.size:
                t = tgt_in[f_in]
                np.add.at(acc, t, acc[f_in] + 1)
                np.subtract.at(indeg, t, 1)
                nxt = np.unique(t)
                nf = nxt[(indeg[nxt] == 0) & flows[nxt]]
            else:
                nf = np.empty(0, dtype=np.int64)
            f_out = frontier[~inside[frontier]]
            if f_out.size:           # crosses the tile boundary
                gr = tr[f_out] + ty * T
                gc = tc[f_out] + tx * T
                for gcell, gpx, amt in zip(
                        (gr // T) * tiles_x + gc // T,
                        (gr % T) * T + gc % T, acc[f_out] + 1):
                    exits_cell.append(int(gcell))
                    exits_px.append(int(gpx))
                    exits_amt.append(int(amt))
            frontier = nf

        px_r, route_cell, route_px = _route_ring(dirs, ty * T, tx * T, spec)
        row(kind=0, cell_id=cell,
            dirs=zlib.compress(dirs.tobytes(), 1),
            acc=zlib.compress(acc.tobytes(), 1),
            caption=ref.to_json())
        for p, tcell, tpx in zip(px_r, route_cell, route_px):
            row(kind=2, cell_id=cell, px=int(p), to_cell=int(tcell),
                to_px=int(tpx))
        for gcell, gpx, amt in zip(exits_cell, exits_px, exits_amt):
            row(kind=1, cell_id=gcell, px=gpx, amount=amt)
        return pa.table(out, schema=_HYDRO_SCHEMA)

    combined = (ds.map_batches(keep_layer, batch_format="pyarrow")
                .map_batches(emit, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(tile_state, batch_format="pyarrow")
                .materialize())

    state = combined.filter(expr="kind == 0")
    # route rows ride the propagation union as amount == 0 (real entry
    # amounts are always >= 1); a small-side Dataset.join would be the
    # obvious shape here, but Ray's hash join chokes on the empty
    # partitions a few-row left side produces, so the lookup uses the
    # same union + groupby idiom as the rest of the engine
    _PROP = pa.schema([
        ("cell_id", pa.int64()), ("px", pa.int64()),
        ("amount", pa.int64()), ("to_cell", pa.int64()),
        ("to_px", pa.int64())])

    def as_prop(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_route = pc.equal(b.column("kind"), 2)
        return pa.table({
            "cell_id": b.column("cell_id"),
            "px": b.column("px"),
            "amount": pc.if_else(is_route, pa.scalar(0, pa.int64()),
                                 b.column("amount")),
            "to_cell": pc.fill_null(b.column("to_cell"), -1),
            "to_px": pc.fill_null(b.column("to_px"), -1)},
            schema=_PROP)

    nblocks_f = front_blocks(tiles_x * spec.tiles_y)
    routes = (combined.filter(expr="kind == 2")
              .map_batches(as_prop, batch_format="pyarrow")
              .repartition(nblocks_f)
              .materialize())
    cur = (combined.filter(expr="kind == 1")
           .map_batches(as_prop, batch_format="pyarrow")
           .repartition(nblocks_f)
           .materialize())

    def hop(group: pa.Table) -> pa.Table:
        """One CELL's routes + the entries that landed on its ring this
        wave: sum entry amounts per ring pixel (vectorized), forward each
        along the pixel's route; sinks absorb.  Grouped by cell -- not
        (cell, px) -- so a wave is ~#tiles Python calls, not ~#ring-px."""
        amt = group.column("amount").to_numpy(zero_copy_only=False)
        px = group.column("px").to_numpy(zero_copy_only=False)
        is_route = amt == 0
        eidx = np.flatnonzero(~is_route)
        if eidx.size == 0:                   # routes only, no entries
            return pa.table({c: [] for c in _PROP.names}, schema=_PROP)
        ridx = np.flatnonzero(is_route)
        rpx = px[ridx]
        order = np.argsort(rpx)
        rpx_s, ridx_s = rpx[order], ridx[order]
        # sum entries per landing pixel
        epx, inv = np.unique(px[eidx], return_inverse=True)
        esum = np.zeros(len(epx), np.int64)
        np.add.at(esum, inv, amt[eidx])
        pos = np.searchsorted(rpx_s, epx)
        if ridx.size == 0 or bool((pos >= len(rpx_s)).any()) or not bool(
                (rpx_s[np.minimum(pos, len(rpx_s) - 1)] == epx).all()):
            raise RuntimeError(
                "flow entry landed on a pixel with no ring route -- "
                "tile state is inconsistent")
        r = ridx_s[pos]
        to_cell = group.column("to_cell").to_numpy(
            zero_copy_only=False)[r]
        to_px = group.column("to_px").to_numpy(zero_copy_only=False)[r]
        fwd = to_cell >= 0                   # sinks absorb the rest
        n = int(fwd.sum())
        return pa.table({
            "cell_id": pa.array(to_cell[fwd], pa.int64()),
            "px": pa.array(to_px[fwd], pa.int64()),
            "amount": pa.array(esum[fwd], pa.int64()),
            "to_cell": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "to_px": pa.array(np.full(n, -1, np.int64), pa.int64())},
            schema=_PROP)

    waves = [cur]
    for _ in range(max_hops):
        if cur.count() == 0:
            break
        cur = (cur.union(routes)
               .groupby("cell_id")
               .map_groups(hop, batch_format="pyarrow")
               .materialize())
        waves.append(cur)
    else:
        if cur.count() != 0:
            raise RuntimeError(
                f"flow_accumulation did not converge in {max_hops} hops; "
                f"the longest drainage path crosses more tile boundaries "
                f"-- raise max_hops")

    def tag(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "kind": pa.array([1] * n, pa.int8()),
            "cell_id": b.column("cell_id").cast(pa.int64()),
            "px": b.column("px").cast(pa.int64()),
            "amount": b.column("amount").cast(pa.int64()),
            "to_cell": pa.nulls(n, pa.int64()),
            "to_px": pa.nulls(n, pa.int64()),
            "dirs": pa.nulls(n, pa.binary()),
            "acc": pa.nulls(n, pa.binary()),
            "caption": pa.nulls(n, pa.string())},
            schema=_HYDRO_SCHEMA)

    entries_all = state
    for w in waves:
        entries_all = entries_all.union(
            w.map_batches(tag, batch_format="pyarrow"))
    # re-block before the paint shuffle: the per-wave unions accumulate
    # one block set per hop, and the groupby would otherwise schedule a
    # task per tiny block (see the watershed halving loop)
    entries_all = entries_all.repartition(
        front_blocks(tiles_x * spec.tiles_y))

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        if srow is None:            # entries for a tile that never computed
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        dirs = np.frombuffer(zlib.decompress(g["dirs"][srow]),
                             np.int8).reshape(T, T)
        acc = np.frombuffer(zlib.decompress(g["acc"][srow]),
                            np.int64).reshape(T, T).copy().ravel()
        epx = np.array([g["px"][i] for i in range(len(g["kind"]))
                        if g["kind"][i] == 1], dtype=np.int64)
        eamt = np.array([g["amount"][i] for i in range(len(g["kind"]))
                         if g["kind"][i] == 1], dtype=np.int64)
        if epx.size:
            # paint each entry's in-tile path (amount rides the walk)
            pos_r, pos_c = np.divmod(epx, T)
            amt = eamt
            active = np.ones(epx.size, dtype=bool)
            for _ in range(T * T + 1):
                if not active.any():
                    break
                ar, ac_, aa = pos_r[active], pos_c[active], amt[active]
                np.add.at(acc, ar * T + ac_, aa)
                d = dirs[ar, ac_]
                idx = np.flatnonzero(active)
                moves = d >= 0
                active[idx[~moves]] = False
                mi = idx[moves]
                nr = pos_r[mi] + _DY[d[moves]]
                nc = pos_c[mi] + _DX[d[moves]]
                outside = (nr < 0) | (nr >= T) | (nc < 0) | (nc >= T)
                active[mi[outside]] = False
                ii = mi[~outside]
                pos_r[ii], pos_c[ii] = nr[~outside], nc[~outside]
        cap = Caption.from_json(g["caption"][srow])
        nd = np.float32(cap.nodata)
        out = acc.reshape(T, T).astype(np.float32)
        out[dirs == -2] = nd
        tx, ty = cap.tx, cap.ty
        ocap = Caption(layer="flow_acc", x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(out, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"flow_acc/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(out)], pa.int64())},
            schema=TILES_SCHEMA)

    return (entries_all.groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))


def _radius1_spec(spec: GridSpec):
    from .focal import FocalGridSpec

    return FocalGridSpec(spec.tiles_x, spec.tiles_y, spec.tile_px,
                         spec.pixel_size, spec.y_north, radius=1)


_WS_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 state, 1 resolver, 2 route, 3 resolved
    ("cell_id", pa.int64()),    # resolver/route: CURSOR cell; resolved/
    ("px", pa.int64()),         # state: owning tile
    ("origin", pa.int64()),     # resolver/resolved: tile awaiting the map
    ("to_cell", pa.int64()),
    ("to_px", pa.int64()),
    ("basin", pa.int64()),      # resolved: global pit flat index
    ("dirs", pa.binary()),
    ("term", pa.binary()),      # state: int32 in-tile terminal per pixel
    ("caption", pa.string()),
])


def watershed(ds, spec: GridSpec, *, layer: str = "dem",
              fmt: str = "npz", max_hops: int = 256):
    """Basin labeling: every valid pixel is labeled with the GLOBAL flat
    index (``row * world_width + col``) of the pit its D8 path
    terminates at -- the Watershed/Basin tool, the natural companion of
    :func:`flow_accumulation` and the same contracted-border-graph
    shape:

    1. ONE radius-1 halo shuffle computes per tile: D8 dirs, every
       pixel's IN-TILE terminal by pointer doubling (log(T^2) gather
       rounds, no per-pixel walk), the ring-route table (entry pixel ->
       exit target or pit identity) and one RESOLVER row per distinct
       exit target;
    2. resolvers walk the route table (union + groupby hops, rounds =
       drainage diameter in tiles) until each reaches a pit; a resolved
       row ``(origin tile, exit target, basin)`` is emitted for the
       tile that asked;
    3. ONE final ``groupby(cell_id)`` joins the resolved maps back and
       paints: pit terminals take their own global id, exit terminals
       take the resolved basin of their target entry pixel.

    Output tiles are float32 (exact for pit ids < 2**24 -- true for the
    test worlds; a full-scale run should sink ``(cell, px, basin)``
    int64 rows instead, which step 3 already produces internally)."""
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    world_w = tiles_x * T
    fspec = _radius1_spec(spec)
    emit = make_strip_emitter_batch(fspec)

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    def global_pit_id(cell: np.ndarray, px: np.ndarray) -> np.ndarray:
        gr = (cell // tiles_x) * T + px // T
        gc = (cell % tiles_x) * T + px % T
        return gr * world_w + gc

    def tile_state(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < tiles_x and 0 <= ty + dy < tiles_y)
        out = {n: [] for n in _WS_SCHEMA.names}

        def row(**kw):
            for n in _WS_SCHEMA.names:
                out[n].append(kw.get(n))

        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table(out, schema=_WS_SCHEMA)
        from ..tiles.codec import Caption

        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        dirs_w = d8_kernel(window, float(ref.nodata))
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        dirs = np.ascontiguousarray(
            dirs_w[ty * T - r0:ty * T - r0 + T,
                   tx * T - c0:tx * T - c0 + T])

        r, c = np.divmod(np.arange(T * T, dtype=np.int64), T)
        d = dirs.ravel()
        flows = d >= 0
        tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
        tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
        inside = flows & (tr >= 0) & (tr < T) & (tc >= 0) & (tc < T)
        ptr = np.where(inside, tr * T + tc, np.arange(T * T))
        while True:                      # pointer doubling: log(T^2)
            nxt = ptr[ptr]
            if np.array_equal(nxt, ptr):
                break
            ptr = nxt
        term = ptr.astype(np.int32)

        # distinct exit targets among terminals of valid pixels
        vterm = np.unique(term[d != -2])
        exits = vterm[~inside[vterm] & flows[vterm]]
        if exits.size:
            gr = tr[exits] + ty * T
            gc = tc[exits] + tx * T
            tgt_cell = (gr // T) * tiles_x + gc // T
            tgt_px = (gr % T) * T + gc % T
            uniq = np.unique(np.stack([tgt_cell, tgt_px], 1), axis=0)
            for tcell, tpx in uniq:
                # to_cell/to_px pin the ORIGINAL query target; the
                # cursor (cell_id/px) moves hop by hop but the resolved
                # row must key back to what this tile asked about
                row(kind=1, cell_id=int(tcell), px=int(tpx),
                    origin=cell, to_cell=int(tcell), to_px=int(tpx))
        px_r, route_cell, route_px = _route_ring(dirs, ty * T, tx * T,
                                                 spec)
        for p, tcell, tpx in zip(px_r, route_cell, route_px):
            row(kind=2, cell_id=cell, px=int(p), to_cell=int(tcell),
                to_px=int(tpx))
        row(kind=0, cell_id=cell,
            dirs=zlib.compress(dirs.tobytes(), 1),
            term=zlib.compress(term.tobytes(), 1),
            caption=ref.to_json())
        return pa.table(out, schema=_WS_SCHEMA)

    combined = (ds.map_batches(keep_layer, batch_format="pyarrow")
                .map_batches(emit, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(tile_state, batch_format="pyarrow")
                .materialize())

    nblocks = front_blocks(tiles_x * tiles_y)
    state = combined.filter(expr="kind == 0")
    resolvers = (combined.filter(expr="kind == 1")
                 .repartition(nblocks).materialize())

    # The route table is a FUNCTIONAL GRAPH on ring pixels: every ring
    # entry maps to either a pit (resolved) or the entry pixel of the
    # next tile.  Contract it by PATH HALVING -- each round every
    # unresolved route re-points at its target's target -- so the loop
    # runs ceil(log2(drainage diameter in tiles)) rounds, not diameter
    # rounds (the walk-one-tile-per-round variant measured 20+ rounds on
    # a 16x16 world; this converges in ~5).
    def normalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pit = pc.less(pc.fill_null(b.column("to_cell"), -1),
                      pa.scalar(0, pa.int64()))
        cell = b.column("cell_id").to_numpy(zero_copy_only=False)
        tpx = pc.fill_null(b.column("to_px"), 0).to_numpy(
            zero_copy_only=False)
        basins = global_pit_id(cell, tpx)
        return pa.table({
            "kind": b.column("kind"),
            "cell_id": b.column("cell_id"),
            "px": b.column("px"),
            "origin": pa.nulls(b.num_rows, pa.int64()),
            "to_cell": b.column("to_cell"),
            "to_px": b.column("to_px"),
            "basin": pc.if_else(pit, pa.array(basins, pa.int64()),
                                pa.scalar(-1, pa.int64())),
            "dirs": pa.nulls(b.num_rows, pa.binary()),
            "term": pa.nulls(b.num_rows, pa.binary()),
            "caption": pa.nulls(b.num_rows, pa.string())},
            schema=_WS_SCHEMA)

    routes = (combined.filter(expr="kind == 2")
              .map_batches(normalize, batch_format="pyarrow")
              .repartition(nblocks)
              .materialize())

    def _route_lookup(g):
        """Vectorized px -> route-row lookup table for one cell group."""
        kind = np.asarray(g["kind"], np.int8)
        ridx = np.flatnonzero(kind == 2)
        pxs = np.asarray([g["px"][i] for i in ridx], np.int64)
        order = np.argsort(pxs)
        return kind, ridx[order], pxs[order]

    def _emit_routes(key_cell, key_px, to_cell, to_px, basin) -> pa.Table:
        n = len(key_cell)
        return pa.table({
            "kind": pa.array(np.full(n, 2, np.int8), pa.int8()),
            "cell_id": pa.array(key_cell, pa.int64()),
            "px": pa.array(key_px, pa.int64()),
            "origin": pa.nulls(n, pa.int64()),
            "to_cell": pa.array(to_cell, pa.int64()),
            "to_px": pa.array(to_px, pa.int64()),
            "basin": pa.array(basin, pa.int64()),
            "dirs": pa.nulls(n, pa.binary()),
            "term": pa.nulls(n, pa.binary()),
            "caption": pa.nulls(n, pa.string())},
            schema=_WS_SCHEMA)

    def halve(group: pa.Table) -> pa.Table:
        """Group = ONE cell's routes + the kind-4 queries targeting it;
        every query's route jumps to its target's target (or adopts its
        pit).  Grouped by cell -- not (cell, px) -- so the px lookup is
        a vectorized searchsorted, not 4T single-row Python groups."""
        g = group.to_pydict()
        kind, ridx, pxs = _route_lookup(g)
        qidx = np.flatnonzero(kind == 4)
        if qidx.size == 0:
            return _emit_routes([], [], [], [], [])
        if ridx.size == 0:
            raise RuntimeError(
                "watershed route points at a tile with no routes")
        qpx = np.asarray([g["px"][i] for i in qidx], np.int64)
        pos = np.searchsorted(pxs, qpx)
        if bool((pos >= len(pxs)).any()) or not bool(
                (pxs[np.minimum(pos, len(pxs) - 1)] == qpx).all()):
            raise RuntimeError(
                "watershed route points at a pixel with no route")
        r = ridx[pos]
        return _emit_routes(
            [g["to_cell"][i] for i in qidx],      # query origin key
            [g["to_px"][i] for i in qidx],
            [g["to_cell"][i] for i in r],          # target's target
            [g["to_px"][i] for i in r],
            [g["basin"][i] for i in r])

    def queries_of(b: pa.Table) -> pa.Table:
        """Unresolved routes ask their target; origin rides to_cell/to_px
        (free columns in a kind-4 row)."""
        import pyarrow.compute as pc

        un = b.filter(pc.less(b.column("basin"), pa.scalar(0, pa.int64())))
        return pa.table({
            "kind": pa.array([4] * un.num_rows, pa.int8()),
            "cell_id": un.column("to_cell"),
            "px": un.column("to_px"),
            "origin": pa.nulls(un.num_rows, pa.int64()),
            "to_cell": un.column("cell_id"),
            "to_px": un.column("px"),
            "basin": pa.nulls(un.num_rows, pa.int64()),
            "dirs": pa.nulls(un.num_rows, pa.binary()),
            "term": pa.nulls(un.num_rows, pa.binary()),
            "caption": pa.nulls(un.num_rows, pa.string())},
            schema=_WS_SCHEMA)

    # every union + groupby round multiplies the block count; without
    # re-blocking, round k's shuffle schedules O(k * reduce_partitions)
    # tiny tasks and task overhead swamps the log-round win
    for _ in range(max_hops):
        if routes.filter(expr="basin < 0").count() == 0:
            break
        queries = routes.map_batches(queries_of, batch_format="pyarrow")
        updated = (routes.union(queries)
                   .groupby("cell_id")
                   .map_groups(halve, batch_format="pyarrow"))
        routes = (routes.filter(expr="basin >= 0")
                  .union(updated)
                  .repartition(nblocks)
                  .materialize())
    else:
        if routes.filter(expr="basin < 0").count() != 0:
            raise RuntimeError(
                f"watershed did not converge in {max_hops} halving "
                f"rounds; raise max_hops")

    def resolve(group: pa.Table) -> pa.Table:
        """One final join per cell: resolvers read the fully-contracted
        route of their entry pixel, report the basin to their origin."""
        g = group.to_pydict()
        kind, ridx, pxs = _route_lookup(g)
        qidx = np.flatnonzero(kind == 1)
        out = {n: [] for n in _WS_SCHEMA.names}

        def row(**kw):
            for n in _WS_SCHEMA.names:
                out[n].append(kw.get(n))

        if qidx.size == 0:
            return pa.table(out, schema=_WS_SCHEMA)
        qpx = np.asarray([g["px"][i] for i in qidx], np.int64)
        pos = np.searchsorted(pxs, qpx)
        if ridx.size == 0 or bool((pos >= len(pxs)).any()) or not bool(
                (pxs[np.minimum(pos, len(pxs) - 1)] == qpx).all()):
            raise RuntimeError(
                "watershed resolver found no contracted route")
        for i, ri in zip(qidx, ridx[pos]):
            if g["basin"][ri] < 0:
                raise RuntimeError(
                    "watershed resolver found an unresolved route")
            row(kind=3, cell_id=g["origin"][i], origin=g["origin"][i],
                to_cell=g["to_cell"][i], to_px=g["to_px"][i],
                basin=g["basin"][ri])
        return pa.table(out, schema=_WS_SCHEMA)

    resolved = (resolvers.union(routes)
                .groupby("cell_id")
                .map_groups(resolve, batch_format="pyarrow")
                .materialize())
    paint_in = state.union(resolved)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        if srow is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        dirs = np.frombuffer(zlib.decompress(g["dirs"][srow]),
                             np.int8).reshape(T, T)
        term = np.frombuffer(zlib.decompress(g["term"][srow]),
                             np.int32).astype(np.int64)
        cap = Caption.from_json(g["caption"][srow])
        cell = int(g["cell_id"][srow])
        tx, ty = cell % tiles_x, cell // tiles_x
        emap = {(g["to_cell"][i], g["to_px"][i]): g["basin"][i]
                for i in range(len(g["kind"])) if g["kind"][i] == 3}
        d = dirs.ravel()
        basin = np.full(T * T, -1, np.int64)
        valid = d != -2
        t_d = d[term]
        # pit terminals: own global id
        pit = valid & (t_d == -1)
        basin[pit] = global_pit_id(np.full(pit.sum(), cell), term[pit])
        # exit terminals: resolved basin of the target entry pixel
        ex = valid & (t_d >= 0)
        if ex.any():
            tt = term[ex]
            rr, cc = np.divmod(tt, T)
            gr = rr + _DY[d[tt]] + ty * T
            gc = cc + _DX[d[tt]] + tx * T
            tgt_cell = (gr // T) * tiles_x + gc // T
            tgt_px = (gr % T) * T + gc % T
            vals = np.empty(len(tt), np.int64)
            for j, (tc_, tp_) in enumerate(zip(tgt_cell, tgt_px)):
                try:
                    vals[j] = emap[(int(tc_), int(tp_))]
                except KeyError:
                    raise RuntimeError(
                        "watershed: unresolved exit target -- tile "
                        "state is inconsistent") from None
            basin[ex] = vals
        out = basin.reshape(T, T).astype(np.float32)
        out[dirs == -2] = np.float32(cap.nodata)
        ocap = Caption(layer="watershed", x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(out, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"watershed/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(out)], pa.int64())},
            schema=TILES_SCHEMA)

    return (paint_in.groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))


def strahler_kernel(dirs: np.ndarray, *, ext_px: np.ndarray | None = None,
                    ext_max: np.ndarray | None = None,
                    ext_cnt: np.ndarray | None = None) -> np.ndarray:
    """Whole-array Strahler stream order over a dir-index array: int32
    order per valid pixel (-1 at nodata).  A pixel with no upstream
    cells is order 1; otherwise order = max child order, +1 when two or
    more children attain that max (the classic Strahler rule, ArcGIS
    StreamOrder).  Kahn wave DP -- each pixel is finalized exactly once.

    ``ext_*`` injects EXTERNAL children at flat pixel indices (max
    external child order and how many externals attain it) -- the hook
    the distributed stage uses to splice neighbour tiles in."""
    H, W = dirs.shape
    n = H * W
    d = dirs.ravel()
    valid = d != -2
    # bounds-checked targets: unlike the whole-raster case, a TILE's
    # border pixels may flow off-array (the distributed stage handles
    # those via offers); off-array flow pushes to nothing here
    r, c = np.divmod(np.arange(n, dtype=np.int64), W)
    flows = d >= 0
    tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
    tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
    inside = flows & (tr >= 0) & (tr < H) & (tc >= 0) & (tc < W)
    tgt = np.where(inside, tr * W + tc, -1)
    has_tgt = tgt >= 0
    indeg = np.bincount(tgt[has_tgt], minlength=n)
    best = np.zeros(n, dtype=np.int32)
    cnt = np.zeros(n, dtype=np.int32)
    if ext_px is not None and len(ext_px):
        best[ext_px] = ext_max
        cnt[ext_px] = ext_cnt
    order = np.full(n, -1, dtype=np.int32)
    done = np.zeros(n, dtype=bool)
    frontier = np.flatnonzero(valid & (indeg == 0))
    while frontier.size:
        f = frontier
        o = np.where(best[f] == 0, 1,
                     best[f] + (cnt[f] >= 2).astype(np.int32))
        order[f] = o
        done[f] = True
        has = tgt[f] >= 0
        ft, fo = tgt[f][has], o[has]
        prev_best = best[ft].copy()
        np.maximum.at(best, ft, fo)
        new_best = best[ft]
        # children that attain the (possibly raised) max: count resets
        # where the max rose, accumulates where it was merely matched
        raised = new_best > prev_best
        at_max = fo == new_best
        uniq_raised = np.unique(ft[raised])
        cnt[uniq_raised] = 0
        np.add.at(cnt, ft[at_max], 1)
        np.subtract.at(indeg, ft, 1)
        uniq = np.unique(ft)
        frontier = uniq[(indeg[uniq] == 0) & valid[uniq] & ~done[uniq]]
    if not bool(done[valid].all()):
        raise ValueError("flow graph contains a cycle")
    return order.reshape(H, W)


_SO_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 static, 1 ext state, 2 offer
    ("cell_id", pa.int64()),
    ("px", pa.int64()),         # offer: entry pixel (tile-flat)
    ("src", pa.int64()),        # offer: source pixel (GLOBAL flat)
    ("order", pa.int64()),      # offer: source pixel's Strahler order
    ("ext", pa.binary()),       # kind 1: zlib int64 (3, k) px/src/order
    ("sent", pa.binary()),      # kind 1: zlib int32 T*T last-sent orders
    ("dirs", pa.binary()),      # kind 0: zlib int8 T*T
    ("caption", pa.string()),   # kind 0
])


def stream_order(ds, spec: GridSpec, *, layer: str = "dem",
                 fmt: str = "npz", max_rounds: int = 1024):
    """Strahler stream order over the tile table (ArcGIS StreamOrder):
    exact parity with ``strahler_kernel(d8_kernel(whole_raster))``.

    Same contracted-border iteration as :func:`flow_accumulation`, with
    the ACTIVE-FRONT filter of :mod:`..stages.cost`: per round, only
    tiles whose external-child table grew are regrouped.  Strahler is
    not additive, so instead of forwarding amounts the loop forwards
    ``(entry px, source pixel, order)`` triples; orders only increase
    and are bounded by log2(area), so the loop terminates in (drainage
    diameter x max order) rounds worst-case, far fewer in practice.

    Per tile the in-tile DP is :func:`strahler_kernel` with the
    accumulated external children spliced in at their entry pixels; a
    tile re-offers an exit pixel only when its order actually changed
    (``sent`` remembers the last emission), which is what damps the
    iteration."""
    import ray
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    fspec = _radius1_spec(spec)
    emit = make_strip_emitter_batch(fspec)

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    def _pack_ext(px, src, orderv) -> bytes:
        arr = np.stack([np.asarray(px, np.int64),
                        np.asarray(src, np.int64),
                        np.asarray(orderv, np.int64)])
        return zlib.compress(np.ascontiguousarray(arr).tobytes(), 1)

    def _unpack_ext(blob: bytes):
        a = np.frombuffer(zlib.decompress(blob), np.int64)
        return a.reshape(3, -1)

    def _ext_seed(ext):
        """(px, src, order) triples -> per-pixel (flat px list, max
        order, count at max) for strahler_kernel injection."""
        if ext.shape[1] == 0:
            return None, None, None
        px, orderv = ext[0], ext[2]
        o = np.lexsort((np.negative(orderv), px))
        px_s, ord_s = px[o], orderv[o]
        starts = np.flatnonzero(np.r_[True, px_s[1:] != px_s[:-1]])
        upx = px_s[starts]
        umax = ord_s[starts]
        ucnt = np.zeros(len(starts), np.int64)
        ends = np.r_[starts[1:], len(px_s)]
        for j in range(len(starts)):            # groups are tiny (<=8)
            seg = ord_s[starts[j]:ends[j]]
            ucnt[j] = int((seg == umax[j]).sum())
        return upx, umax.astype(np.int32), ucnt.astype(np.int32)

    def _orders_and_exits(dirs, ext):
        upx, umax, ucnt = _ext_seed(ext)
        order = strahler_kernel(dirs, ext_px=upx, ext_max=umax,
                                ext_cnt=ucnt)
        # exit pixels: valid, flow leaves the tile
        r, c = np.divmod(np.arange(T * T, dtype=np.int64), T)
        d = dirs.ravel()
        flows = d >= 0
        tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
        tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
        outside = flows & ~((tr >= 0) & (tr < T) & (tc >= 0) & (tc < T))
        return order, np.flatnonzero(outside), tr, tc

    def _offer_rows(row, cell, tx, ty, order, exits, tr, tc, sent):
        """Offer exits whose order changed vs the last emission; returns
        the updated sent-array."""
        ov = order.ravel()
        changed = exits[ov[exits] != sent.ravel()[exits]]
        for u in changed:
            gr, gc = ty * T + tr[u], tx * T + tc[u]
            if not (0 <= gr < tiles_y * T and 0 <= gc < tiles_x * T):
                continue                        # ponds at the world edge
            srow, scol = ty * T + u // T, tx * T + u % T
            row(kind=2,
                cell_id=spec.cell_id(int(gc // T), int(gr // T)),
                px=int((gr % T) * T + gc % T),
                src=int(srow * (tiles_x * T) + scol),
                order=int(ov[u]))
        new_sent = sent.copy()
        new_sent.ravel()[changed] = ov[changed]
        return new_sent

    def init(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < tiles_x and 0 <= ty + dy < tiles_y)
        out = {n: [] for n in _SO_SCHEMA.names}

        def row(**kw):
            for n in _SO_SCHEMA.names:
                out[n].append(kw.get(n))

        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table(out, schema=_SO_SCHEMA)
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        dirs_w = d8_kernel(window, float(ref.nodata))
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        dirs = np.ascontiguousarray(
            dirs_w[ty * T - r0:ty * T - r0 + T,
                   tx * T - c0:tx * T - c0 + T])
        ext = np.empty((3, 0), np.int64)
        order, exits, tr, tc = _orders_and_exits(dirs, ext)
        sent = np.zeros((T, T), np.int32)
        sent = _offer_rows(row, cell, tx, ty, order, exits, tr, tc, sent)
        row(kind=0, cell_id=cell,
            dirs=zlib.compress(dirs.tobytes(), 1), caption=ref.to_json())
        row(kind=1, cell_id=cell, ext=_pack_ext([], [], []),
            sent=zlib.compress(sent.tobytes(), 1))
        return pa.table(out, schema=_SO_SCHEMA)

    def _decode(g):
        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1), None)
        if srow is None or rrow is None:
            return None
        dirs = np.frombuffer(zlib.decompress(g["dirs"][srow]),
                             np.int8).reshape(T, T)
        ext = _unpack_ext(g["ext"][rrow])
        sent = np.frombuffer(zlib.decompress(g["sent"][rrow]),
                             np.int32).reshape(T, T)
        return dirs, ext, sent, g["caption"][srow]

    def step(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out = {n: [] for n in _SO_SCHEMA.names}

        def row(**kw):
            for n in _SO_SCHEMA.names:
                out[n].append(kw.get(n))

        state = _decode(g)
        if state is None:
            return pa.table(out, schema=_SO_SCHEMA)
        dirs, ext, sent, _cap = state
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        # merge offers into the ext table: max per (px, src)
        emap = {(int(ext[0, j]), int(ext[1, j])): int(ext[2, j])
                for j in range(ext.shape[1])}
        grew = False
        for i, k in enumerate(g["kind"]):
            if k != 2:
                continue
            key = (int(g["px"][i]), int(g["src"][i]))
            o = int(g["order"][i])
            if o > emap.get(key, 0):
                emap[key] = o
                grew = True
        if not grew:
            row(kind=1, cell_id=cell, ext=g["ext"][
                next(i for i, k in enumerate(g["kind"]) if k == 1)],
                sent=g["sent"][
                next(i for i, k in enumerate(g["kind"]) if k == 1)])
            return pa.table(out, schema=_SO_SCHEMA)
        keys = sorted(emap)
        ext2 = np.array([[p for p, s in keys], [s for p, s in keys],
                         [emap[k2] for k2 in keys]], np.int64).reshape(3, -1)
        order, exits, tr, tc = _orders_and_exits(dirs, ext2)
        sent2 = _offer_rows(row, cell, tx, ty, order, exits, tr, tc, sent)
        row(kind=1, cell_id=cell,
            ext=_pack_ext(ext2[0], ext2[1], ext2[2]),
            sent=zlib.compress(sent2.tobytes(), 1))
        return pa.table(out, schema=_SO_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        state = _decode(g)
        if state is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        dirs, ext, _sent, cap_raw = state
        order, _, _, _ = _orders_and_exits(dirs, ext)
        cap = Caption.from_json(cap_raw)
        outarr = order.astype(np.float32)
        outarr[dirs == -2] = np.float32(cap.nodata)
        tx, ty = cap.tx, cap.ty
        ocap = Caption(layer="strahler", x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(outarr, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"strahler/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(outarr)], pa.int64())},
            schema=TILES_SCHEMA)

    combined = (ds.map_batches(keep_layer, batch_format="pyarrow")
                .map_batches(emit, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(init, batch_format="pyarrow")
                .materialize())
    nblocks = front_blocks(tiles_x * tiles_y)
    statics = (combined.filter(expr="kind == 0")
               .repartition(nblocks).materialize())
    state = (combined.filter(expr="kind == 1")
             .repartition(nblocks).materialize())
    offers = (combined.filter(expr="kind == 2")
              .repartition(nblocks).materialize())

    _cells_of, _split_cells = cells_of, split_cells

    for _ in range(max_rounds):
        active = _cells_of(offers)
        if active.size == 0:
            break
        ids_ref = ray.put(active)
        # ONE materialization per round (see cost_distance): inactive
        # state passes through, next round's state/offers are lazy
        # filters over the re-blocked union
        step_in = (_split_cells(statics, ids_ref, True)
                   .union(_split_cells(state, ids_ref, True))
                   .union(offers))
        nxt = (_split_cells(state, ids_ref, False)
               .union(step_in.groupby("cell_id")
                      .map_groups(step, batch_format="pyarrow"))
               .repartition(nblocks)
               .materialize())
        state = nxt.filter(expr="kind == 1")
        offers = nxt.filter(expr="kind == 2")
    else:
        if _cells_of(offers).size != 0:
            raise RuntimeError(
                f"stream_order did not converge in {max_rounds} rounds; "
                f"raise max_rounds")

    return (statics.union(state)
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))


def flow_length_pairs(dirs: np.ndarray):
    """Per-pixel DOWNSTREAM flow length to the pit as an EXACT integer
    pair ``(a, b)`` = (#cardinal steps, #diagonal steps); length in map
    units is ``a*ps + b*sqrt(2)*ps``.  Integer pairs are associative, so
    any segmentation of the path sums to the same pair -- that is what
    keeps the distributed stage bit-identical to this oracle.  Pointer
    doubling, log(path) rounds.  Returns (a, b, term) int64/int32 flats;
    nodata pixels get (0, 0, self)."""
    H, W = dirs.shape
    n = H * W
    d = dirs.ravel()
    r, c = np.divmod(np.arange(n, dtype=np.int64), W)
    flows = d >= 0
    tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
    tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
    inside = flows & (tr >= 0) & (tr < H) & (tc >= 0) & (tc < W)
    ptr = np.where(inside, tr * W + tc, np.arange(n))
    diag = (_DY[np.clip(d, 0, 7)] != 0) & (_DX[np.clip(d, 0, 7)] != 0)
    a = np.where(inside & ~diag, 1, 0).astype(np.int64)
    b = np.where(inside & diag, 1, 0).astype(np.int64)
    while True:
        nxt = ptr[ptr]
        if np.array_equal(nxt, ptr):
            break
        a = a + a[ptr]
        b = b + b[ptr]
        ptr = nxt
    # one more gather pass: the loop above stops when ptr is stable, but
    # the final a/b must include the (zero) contribution at the terminal
    return a, b, ptr.astype(np.int32)


def flow_length_kernel(dirs: np.ndarray, pixel_size: float) -> np.ndarray:
    """Whole-array downstream flow length in map units (the ArcGIS
    FlowLength DOWNSTREAM convention; the test oracle)."""
    H, W = dirs.shape
    a, b, _ = flow_length_pairs(dirs)
    ps = float(pixel_size)
    out = (a.astype(np.float64) * ps
           + b.astype(np.float64) * (np.sqrt(2.0) * ps))
    out = out.astype(np.float32).reshape(H, W)
    out[dirs == -2] = -1.0
    return out


def flow_length(ds, spec: GridSpec, *, layer: str = "dem",
                fmt: str = "npz", max_hops: int = 256):
    """Downstream flow length over the tile table: exact parity with
    ``flow_length_kernel(d8_kernel(whole_raster))``.

    Same path-halved contracted-border shape as :func:`watershed`, but
    the route table carries EXACT integer step-count pairs (cardinal,
    diagonal) instead of basin ids -- pairs are associative, so halving
    (which re-associates path segments) cannot perturb the float result,
    which is computed once at paint time as ``a*ps + b*sqrt(2)*ps``."""
    import ray
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    fspec = _radius1_spec(spec)
    emit = make_strip_emitter_batch(fspec)

    def keep_layer(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep = [i for i, c in enumerate(caps)
                if json.loads(c)["layer"] == layer]
        return b.take(pa.array(keep, pa.int64()))

    def tile_state(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption

        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < tiles_x and 0 <= ty + dy < tiles_y)
        out = {n: [] for n in _WS_SCHEMA.names}

        def row(**kw):
            for n in _WS_SCHEMA.names:
                out[n].append(kw.get(n))

        window = (assemble_window(g, fspec, layer, tx, ty)
                  if g["layer"].count(layer) == neigh else None)
        if window is None:
            return pa.table(out, schema=_WS_SCHEMA)
        ref = next(Caption.from_json(g["caption"][i])
                   for i in range(len(g["is_core"])) if g["is_core"][i])
        dirs_w = d8_kernel(window, float(ref.nodata))
        r0, _, c0, _ = fspec.assembled_window(tx, ty)
        dirs = np.ascontiguousarray(
            dirs_w[ty * T - r0:ty * T - r0 + T,
                   tx * T - c0:tx * T - c0 + T])
        a, b, term = flow_length_pairs(dirs)
        d = dirs.ravel()
        # exit info per terminal: where the terminal's flow crosses to
        r, c = np.divmod(np.arange(T * T, dtype=np.int64), T)
        flows = d >= 0
        tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
        tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
        inside = flows & (tr >= 0) & (tr < T) & (tc >= 0) & (tc < T)
        vterm = np.unique(term[d != -2])
        exits = vterm[~inside[vterm] & flows[vterm]]
        # routes: for every valid RING pixel p -- path pair to the exit
        # edge (incl. the crossing step) + target entry, or pit marker
        rr, cc = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
        ring = ((rr == 0) | (rr == T - 1) | (cc == 0)
                | (cc == T - 1)).ravel()
        for p in np.flatnonzero(ring & (d != -2)):
            t = int(term[p])
            pa_, pb = int(a[p]), int(b[p])
            if d[t] >= 0 and not inside[t]:        # exits the tile
                gr = int(tr[t]) + ty * T
                gc = int(tc[t]) + tx * T
                diag = (_DY[d[t]] != 0) and (_DX[d[t]] != 0)
                row(kind=2, cell_id=cell, px=int(p),
                    to_cell=int(spec.cell_id(gc // T, gr // T)),
                    to_px=int((gr % T) * T + gc % T),
                    origin=pa_ + (0 if diag else 1),      # pair a
                    basin=pb + (1 if diag else 0))        # pair b
            else:                                   # pit inside
                row(kind=2, cell_id=cell, px=int(p), to_cell=-1,
                    to_px=t, origin=pa_, basin=pb)
        if exits.size:
            gr = tr[exits] + ty * T
            gc = tc[exits] + tx * T
            tgt_cell = (gr // T) * tiles_x + gc // T
            tgt_px = (gr % T) * T + gc % T
            uniq = np.unique(np.stack([tgt_cell, tgt_px], 1), axis=0)
            for tcell, tpx in uniq:
                row(kind=1, cell_id=int(tcell), px=int(tpx),
                    origin=cell, to_cell=int(tcell), to_px=int(tpx))
        row(kind=0, cell_id=cell,
            dirs=zlib.compress(dirs.tobytes(), 1),
            term=zlib.compress(np.concatenate(
                [a, b, term.astype(np.int64)]).tobytes(), 1),
            caption=ref.to_json())
        return pa.table(out, schema=_WS_SCHEMA)

    combined = (ds.map_batches(keep_layer, batch_format="pyarrow")
                .map_batches(emit, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(tile_state, batch_format="pyarrow")
                .materialize())
    nblocks = front_blocks(tiles_x * tiles_y)
    state = combined.filter(expr="kind == 0")
    resolvers = (combined.filter(expr="kind == 1")
                 .repartition(nblocks).materialize())
    # route rows: origin/basin columns carry the (a, b) pair; to_cell=-1
    # marks "reaches a pit in this very tile" (fully resolved)
    routes = (combined.filter(expr="kind == 2")
              .repartition(nblocks).materialize())

    def _lookup(g):
        kind = np.asarray(g["kind"], np.int8)
        ridx = np.flatnonzero(kind == 2)
        pxs = np.asarray([g["px"][i] for i in ridx], np.int64)
        order = np.argsort(pxs)
        return kind, ridx[order], pxs[order]

    def _emit(rows):
        out = {n: [] for n in _WS_SCHEMA.names}
        for kw in rows:
            for n in _WS_SCHEMA.names:
                out[n].append(kw.get(n))
        return pa.table(out, schema=_WS_SCHEMA)

    def halve(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        kind, ridx, pxs = _lookup(g)
        qidx = np.flatnonzero(kind == 4)
        if qidx.size == 0:
            return _emit([])
        qpx = np.asarray([g["px"][i] for i in qidx], np.int64)
        pos = np.searchsorted(pxs, qpx)
        if ridx.size == 0 or bool((pos >= len(pxs)).any()) or not bool(
                (pxs[np.minimum(pos, len(pxs) - 1)] == qpx).all()):
            raise RuntimeError("flow_length route with no target route")
        rows = []
        for i, ri in zip(qidx, ridx[pos]):
            rows.append(dict(
                kind=2, cell_id=g["to_cell"][i], px=g["to_px"][i],
                to_cell=g["to_cell"][ri], to_px=g["to_px"][ri],
                origin=g["origin"][i] + g["origin"][ri],   # pair adds
                basin=g["basin"][i] + g["basin"][ri]))
        return _emit(rows)

    def queries_of(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        un = b.filter(pc.greater_equal(b.column("to_cell"),
                                       pa.scalar(0, pa.int64())))
        n = un.num_rows
        return pa.table({
            "kind": pa.array([4] * n, pa.int8()),
            "cell_id": un.column("to_cell"),
            "px": un.column("to_px"),
            "origin": un.column("origin"),     # pair rides the query
            "to_cell": un.column("cell_id"),   # origin key
            "to_px": un.column("px"),
            "basin": un.column("basin"),
            "dirs": pa.nulls(n, pa.binary()),
            "term": pa.nulls(n, pa.binary()),
            "caption": pa.nulls(n, pa.string())},
            schema=_WS_SCHEMA)

    for _ in range(max_hops):
        if routes.filter(expr="to_cell >= 0").count() == 0:
            break
        queries = routes.map_batches(queries_of, batch_format="pyarrow")
        updated = (routes.union(queries)
                   .groupby("cell_id")
                   .map_groups(halve, batch_format="pyarrow"))
        routes = (routes.filter(expr="to_cell < 0")
                  .union(updated)
                  .repartition(nblocks)
                  .materialize())
    else:
        if routes.filter(expr="to_cell >= 0").count() != 0:
            raise RuntimeError(
                f"flow_length did not converge in {max_hops} halving "
                f"rounds; raise max_hops")

    def resolve(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        kind, ridx, pxs = _lookup(g)
        qidx = np.flatnonzero(kind == 1)
        if qidx.size == 0:
            return _emit([])
        qpx = np.asarray([g["px"][i] for i in qidx], np.int64)
        pos = np.searchsorted(pxs, qpx)
        if ridx.size == 0 or bool((pos >= len(pxs)).any()) or not bool(
                (pxs[np.minimum(pos, len(pxs) - 1)] == qpx).all()):
            raise RuntimeError("flow_length resolver found no route")
        rows = []
        for i, ri in zip(qidx, ridx[pos]):
            if g["to_cell"][ri] >= 0:
                raise RuntimeError("flow_length: unresolved route")
            # resolved row: cell_id/origin = asking tile, to_* = the
            # entry it asked about, px = pair a, basin = pair b
            rows.append(dict(
                kind=3, cell_id=g["origin"][i], origin=g["origin"][i],
                to_cell=g["to_cell"][i], to_px=g["to_px"][i],
                px=g["origin"][ri], basin=g["basin"][ri]))
        return _emit(rows)

    resolved = (resolvers.union(routes)
                .groupby("cell_id")
                .map_groups(resolve, batch_format="pyarrow")
                .materialize())

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        if srow is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        dirs = np.frombuffer(zlib.decompress(g["dirs"][srow]),
                             np.int8).reshape(T, T)
        blob = np.frombuffer(zlib.decompress(g["term"][srow]), np.int64)
        a, b, term = (blob[:T * T], blob[T * T:2 * T * T],
                      blob[2 * T * T:])
        cap = Caption.from_json(g["caption"][srow])
        cell = int(g["cell_id"][srow])
        tx, ty = cell % tiles_x, cell // tiles_x
        # (entry cell, entry px) -> resolved pair
        emap = {(g["to_cell"][i], g["to_px"][i]):
                (g["px"][i], g["basin"][i])
                for i in range(len(g["kind"])) if g["kind"][i] == 3}
        d = dirs.ravel()
        r, c = np.divmod(np.arange(T * T, dtype=np.int64), T)
        flows = d >= 0
        tr = r + np.where(flows, _DY[np.clip(d, 0, 7)], 0)
        tc = c + np.where(flows, _DX[np.clip(d, 0, 7)], 0)
        inside = flows & (tr >= 0) & (tr < T) & (tc >= 0) & (tc < T)
        aa = a.copy()
        bb = b.copy()
        valid = d != -2
        ex = valid & (d[term] >= 0) & ~inside[term]
        if ex.any():
            tt = term[ex]
            gr = tr[tt] + ty * T
            gc = tc[tt] + tx * T
            diag = ((_DY[d[tt]] != 0) & (_DX[d[tt]] != 0))
            tgt_cell = (gr // T) * tiles_x + gc // T
            tgt_px = (gr % T) * T + gc % T
            add_a = np.empty(len(tt), np.int64)
            add_b = np.empty(len(tt), np.int64)
            for j, (tc_, tp_) in enumerate(zip(tgt_cell, tgt_px)):
                try:
                    pa2, pb2 = emap[(int(tc_), int(tp_))]
                except KeyError:
                    raise RuntimeError(
                        "flow_length: unresolved exit target") from None
                add_a[j] = pa2
                add_b[j] = pb2
            aa[ex] += add_a + np.where(diag, 0, 1)
            bb[ex] += add_b + np.where(diag, 1, 0)
        ps = float(cap.pixel_size)
        outf = (aa.astype(np.float64) * ps
                + bb.astype(np.float64) * (np.sqrt(2.0) * ps))
        outarr = outf.astype(np.float32).reshape(T, T)
        outarr[dirs == -2] = np.float32(cap.nodata)
        ocap = Caption(layer="flow_len", x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(outarr, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"flow_len/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(outarr)], pa.int64())},
            schema=TILES_SCHEMA)

    return (state.union(resolved)
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))
