"""Distributed depression filling (priority-flood): raise every DEM
cell to its spill elevation so water always drains -- the standard DEM
conditioning step before D8 flow (Barnes, Lehman & Mulla 2014,
"Priority-flood: an optimal depression-filling algorithm" -- published
method; the tiled active-front layout below is original and mirrors
this repo's :mod:`cost` stage).

Semantics (pinned by :func:`fill_relax_kernel`, the whole-raster test
oracle):

* ``fill(v) = min over 8-connected paths v -> drain of
  max(z along the path)`` -- the minimax path metric; drains are the
  true raster edge and every nodata cell (off-map water disappears);
* equivalently the unique fixpoint of
  ``fill(v) = max(z(v), min over neighbours u of fill(u))`` with
  ``fill(drain) = z(drain)``;
* flat fill (no epsilon gradient): cells inside a depression end
  EXACTLY at the spill elevation, nodata passes through.

Bit-exactness is free here: ``max`` and ``min`` over float64 are exact
and order-independent, so the tiled run equals the whole-raster kernel
with no fold-order contract needed (cf. cost.py's half-edge fold).

Scale shape -- the contracted-border active-front iteration of
:func:`~balrog_ray.stages.cost._cost_state`: one groupby floods each
tile from its own drains (local minimax Dijkstra), then rounds of
border-offer exchange touch only tiles still improving; fills strictly
decrease over the finite set of {max of a z-subset} values, so the
loop terminates in O(depression diameter in tiles) rounds.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .cost import _DX8, _DY8, _ring_index
from .front import cells_of, front_blocks, make_keyed, split_cells
from .halo import GridSpec

_FILL_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 static, 1 fill state, 2 offer
    ("cell_id", pa.int64()),
    ("px", pa.int64()),         # offer: target pixel (tile-flat)
    ("f", pa.float64()),        # offer: sender's fill (-inf = nodata)
    ("fill", pa.binary()),      # kind 1: zlib float64 T*T fills
    ("dem", pa.binary()),       # kind 0: zlib float32 T*T
    ("caption", pa.string()),   # kind 0
])


def _z64(dem: np.ndarray, nodata: float) -> np.ndarray:
    """float64 elevations with nodata mapped to -inf (a drain that
    never improves: ``max(f, -inf) = f`` and its own fill stays
    -inf)."""
    valid = dem != np.float32(nodata)
    return np.where(valid, dem.astype(np.float64), -np.inf)


def fill_relax_kernel(dem: np.ndarray, nodata: float,
                      edges=(True, True, True, True)) -> np.ndarray:
    """Whole-array exact depression fill (float64): synchronous minimax
    relaxation run to fixpoint -- the independent test oracle.
    ``edges`` flags (n, s, w, e) mark TRUE raster edges (drains)."""
    z = _z64(np.asarray(dem, np.float32), nodata)
    H, W = z.shape
    fill = np.full((H, W), np.inf)
    fill[~np.isfinite(z)] = -np.inf           # nodata drains
    n, s, w, e = edges
    for flag, sl in ((n, (0, slice(None))), (s, (H - 1, slice(None))),
                     (w, (slice(None), 0)), (e, (slice(None), W - 1))):
        if flag:
            fill[sl] = np.minimum(fill[sl], z[sl])
    while True:
        changed = False
        for k in range(8):
            dy, dx = int(_DY8[k]), int(_DX8[k])
            src = (slice(max(0, -dy), H - max(0, dy)),
                   slice(max(0, -dx), W - max(0, dx)))
            dst = (slice(max(0, dy), H + min(0, dy) or None),
                   slice(max(0, dx), W + min(0, dx) or None))
            cand = np.maximum(fill[src], z[dst])
            better = cand < fill[dst]
            if better.any():
                fill[dst][...] = np.where(better, cand, fill[dst])
                changed = True
        if not changed:
            return fill


def _flood_from(z: np.ndarray, fill: np.ndarray, seeds,
                H: int, W: int) -> None:
    """In-place incremental minimax Dijkstra (priority-flood) outward
    from ``seeds`` (flat indices whose fill was just lowered)."""
    import heapq

    heap = [(float(fill[i]), int(i)) for i in seeds
            if fill[i] < np.inf]
    heapq.heapify(heap)
    push, pop = heapq.heappush, heapq.heappop
    dy = [int(x) for x in _DY8]
    dx = [int(x) for x in _DX8]
    while heap:
        f, u = pop(heap)
        if f > fill[u]:
            continue
        r, col = divmod(u, W)
        for k in range(8):
            r2, c2 = r + dy[k], col + dx[k]
            if not (0 <= r2 < H and 0 <= c2 < W):
                continue
            v = r2 * W + c2
            nf = max(f, z[v])
            if nf < fill[v]:
                fill[v] = nf
                push(heap, (nf, v))


def fill_sinks(ds, spec: GridSpec, *, layer: str = "dem",
               out_layer: str = "filled", fmt: str = "npz",
               max_rounds: int = 256):
    """Image-table Dataset -> image-table Dataset of depression-filled
    elevation tiles (layer ``out_layer``), exact whole-raster parity
    (tests/test_fill_sinks.py)."""
    import ray
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    ring_idx = _ring_index(T)
    ring_r, ring_c = np.divmod(ring_idx, T)

    keyed = make_keyed(spec, (layer,))

    def _out():
        out = {n: [] for n in _FILL_SCHEMA.names}

        def row(**r):
            for n in _FILL_SCHEMA.names:
                out[n].append(r.get(n))
        return out, row

    def _offers(row, tx, ty, fill_flat, improved_ring):
        """Offer rows for improved ring pixels (incl. the -inf nodata
        drains on the first pass) toward out-of-tile neighbours."""
        f_ring = fill_flat[ring_idx]
        ok = improved_ring & (f_ring < np.inf)
        for j in np.flatnonzero(ok):
            r, c = int(ring_r[j]), int(ring_c[j])
            for k in range(8):
                nr, nc = r + int(_DY8[k]), c + int(_DX8[k])
                if 0 <= nr < T and 0 <= nc < T:
                    continue
                gr, gc = ty * T + nr, tx * T + nc
                if not (0 <= gr < tiles_y * T and 0 <= gc < tiles_x * T):
                    continue
                row(kind=2,
                    cell_id=spec.cell_id(gc // T, gr // T),
                    px=int((gr % T) * T + gc % T),
                    f=float(f_ring[j]))

    def init(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        out, row = _out()
        idx = next((i for i in range(len(g["layer"]))
                    if g["layer"][i] == layer), None)
        if idx is None:
            return pa.table(out, schema=_FILL_SCHEMA)
        cap = Caption.from_json(g["caption"][idx])
        dem = decode_tile(g["bytes"][idx], g["fmt"][idx], cap)
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        z = _z64(dem, float(cap.nodata))
        fill = np.full((T, T), np.inf)
        nod = ~np.isfinite(z)
        fill[nod] = -np.inf
        e = cap.edge
        for flag, sl in ((e.get("n"), (0, slice(None))),
                         (e.get("s"), (T - 1, slice(None))),
                         (e.get("w"), (slice(None), 0)),
                         (e.get("e"), (slice(None), T - 1))):
            if flag:
                fill[sl] = np.minimum(fill[sl], z[sl])
        zf, ff = z.ravel(), fill.ravel()
        _flood_from(zf, ff, np.flatnonzero(ff < np.inf), T, T)
        row(kind=0, cell_id=cell,
            dem=zlib.compress(dem.astype(np.float32).tobytes(), 1),
            caption=g["caption"][idx])
        row(kind=1, cell_id=cell,
            fill=zlib.compress(ff.tobytes(), 1))
        _offers(row, tx, ty, ff, np.ones(ring_idx.size, dtype=bool))
        return pa.table(out, schema=_FILL_SCHEMA)

    def _decode_state(g):
        from ..tiles.codec import Caption

        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1), None)
        if srow is None or rrow is None:
            return None
        dem = np.frombuffer(zlib.decompress(g["dem"][srow]),
                            np.float32).reshape(T, T)
        fill = np.frombuffer(zlib.decompress(g["fill"][rrow]),
                             np.float64).copy()
        cap = Caption.from_json(g["caption"][srow])
        return dem, fill, cap, rrow

    def step(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out, row = _out()
        state = _decode_state(g)
        if state is None:
            return pa.table(out, schema=_FILL_SCHEMA)
        dem, fill, cap, rrow = state
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        zf = _z64(dem, float(cap.nodata)).ravel()
        prev_ring = fill[ring_idx].copy()
        seeds = []
        for i, k in enumerate(g["kind"]):
            if k != 2:
                continue
            px = int(g["px"][i])
            nf = max(g["f"][i], zf[px])
            if nf < fill[px]:
                fill[px] = nf
                seeds.append(px)
        if not seeds:
            row(kind=1, cell_id=cell, fill=g["fill"][rrow])
            return pa.table(out, schema=_FILL_SCHEMA)
        _flood_from(zf, fill, np.unique(np.array(seeds)), T, T)
        row(kind=1, cell_id=cell,
            fill=zlib.compress(fill.tobytes(), 1))
        _offers(row, tx, ty, fill, fill[ring_idx] < prev_ring)
        return pa.table(out, schema=_FILL_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        state = _decode_state(g)
        if state is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        dem, fill, cap, _rrow = state
        fill = fill.reshape(T, T)
        nd = np.float32(cap.nodata)
        outarr = fill.astype(np.float32)
        outarr[~np.isfinite(fill)] = nd       # nodata (and any +inf)
        outarr[dem == nd] = nd
        tx, ty = cap.tx, cap.ty
        ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(outarr, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{tx}/{ty}"], pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(outarr)], pa.int64())},
            schema=TILES_SCHEMA)

    combined = (ds.map_batches(keyed, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(init, batch_format="pyarrow")
                .materialize())
    nblocks = front_blocks(tiles_x * tiles_y)
    statics = (combined.filter(expr="kind == 0")
               .repartition(nblocks).materialize())
    ringst = (combined.filter(expr="kind == 1")
              .repartition(nblocks).materialize())
    offers = (combined.filter(expr="kind == 2")
              .repartition(nblocks).materialize())

    for _round in range(max_rounds):
        active = cells_of(offers)
        if active.size == 0:
            break
        ids_ref = ray.put(active)
        step_out = (split_cells(statics, ids_ref, True)
                    .union(split_cells(ringst, ids_ref, True))
                    .union(offers)
                    .groupby("cell_id")
                    .map_groups(step, batch_format="pyarrow")
                    .materialize())
        ringst = (split_cells(ringst, ids_ref, False)
                  .union(step_out.filter(expr="kind == 1"))
                  .repartition(nblocks)
                  .materialize())
        offers = (step_out.filter(expr="kind == 2")
                  .repartition(nblocks).materialize())
    else:
        if cells_of(offers).size != 0:
            raise RuntimeError(
                f"fill_sinks did not converge in {max_rounds} rounds; "
                f"a depression spans more tile crossings -- raise "
                f"max_rounds")

    return (statics.union(ringst)
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))
