"""Distributed cost distance: weighted geodesic distance over a cost
surface (the ArcGIS CostDistance / GRASS ``r.cost`` tool -- the weighted
generalization of the engine's Euclidean :mod:`proximity` stage, and the
reference chain's natural "how far is every pixel from vegetation,
through terrain" question; cf. ``utilities/sa_tools.py`` distance ops).

Semantics (pinned by :func:`cost_relax_kernel`, which doubles as the
whole-raster test oracle):

* moving from pixel ``u`` to 8-neighbour ``v`` costs
  ``(cost[u] + cost[v]) / 2 * L`` where ``L`` is the step length in map
  units (``pixel_size`` cardinal, ``sqrt(2) * pixel_size`` diagonal);
* source pixels (where the source layer equals ``src_value``) have
  distance 0; nodata cost pixels are impassable and stay nodata;
  unreachable pixels are nodata;
* all arithmetic is float64 with a FIXED fold order
  ``(d[u] + cost[u]*halfL) + cost[v]*halfL`` so the tiled run is
  bit-identical to the whole-raster kernel (the distributed border
  crossing evaluates the same two adds in the same order).

Scale shape -- the same contracted-border iteration as
:func:`~balrog_ray.stages.hydrology.flow_accumulation`, but with an
ACTIVE-FRONT filter so late rounds touch only the tiles still improving:

1. ONE ``groupby(cell_id)`` pairs each cell's cost+source tiles, relaxes
   distances from in-tile sources (vectorized Bellman-Ford sweeps, exact
   at fixpoint) and emits per tile: a static row (zlib cost + source
   mask), a ring-state row (float64 border distances) and offer rows
   ``(neighbour cell, entry px, d + cost[u]*halfL, halfL)`` for finite
   border pixels.
2. each round, offers are grouped with the STATIC and RING rows of only
   the cells they target (driver holds the active cell-id list -- one
   int per tile, bounded by grid size, broadcast via ``ray.put``); the
   tile re-relaxes seeded from its ring state + accepted offers and
   emits new offers only for border pixels that strictly improved.
   Distances strictly decrease over a finite set of path lengths, so
   the loop terminates; rounds = cost-path diameter in tiles, per-round
   shuffle volume = the active front, not the world.
3. ONE final ``groupby(cell_id)`` repeats the in-tile relaxation from
   the settled ring state and paints float32 distance tiles.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .front import cells_of, front_blocks, make_keyed, split_cells
from .halo import GridSpec

# scan order E, SE, S, SW, W, NW, N, NE (shared with hydrology)
_DY8 = np.array([0, 1, 1, 1, 0, -1, -1, -1], dtype=np.int64)
_DX8 = np.array([1, 1, 0, -1, -1, -1, 0, 1], dtype=np.int64)
_DIST8 = np.where((_DY8 != 0) & (_DX8 != 0), np.sqrt(2.0), 1.0)


def _half_steps(pixel_size: float) -> np.ndarray:
    """Per-direction half step length in map units.  Single shared
    definition so kernel, offers and offer application all add the SAME
    float64 -- the bit-identity contract of the module docstring."""
    return 0.5 * _DIST8 * float(pixel_size)


def cost_relax_kernel(cost: np.ndarray, seed: np.ndarray, nodata: float,
                      *, pixel_size: float = 1.0) -> np.ndarray:
    """Whole-array exact cost distance: float64 distances from ``seed``
    (float64, np.inf = unseeded) over ``cost`` (nodata = impassable).
    Vectorized synchronous relaxation (8 shifted minimums per sweep) run
    to fixpoint -- exact shortest-path distances, no approximation."""
    cost = np.asarray(cost, dtype=np.float32)
    valid = cost != np.float32(nodata)
    if bool((cost[valid] <= 0).any()):
        raise ValueError(
            "cost surface must be strictly positive (nodata = "
            "impassable); non-positive costs create negative/zero-cost "
            "cycles and the relaxation would not terminate -- remap the "
            "layer first (e.g. raster_calc 1 + max(x, 0))")
    c = np.where(valid, cost.astype(np.float64), np.inf)
    dist = np.where(valid, np.asarray(seed, dtype=np.float64), np.inf)
    H, W = cost.shape
    half = _half_steps(pixel_size)
    # out-cost per source pixel, per direction: d[u] + c[u]*halfL
    while True:
        changed = False
        for k in range(8):
            dy, dx = int(_DY8[k]), int(_DX8[k])
            src = (slice(max(0, -dy), H - max(0, dy)),
                   slice(max(0, -dx), W - max(0, dx)))
            dst = (slice(max(0, dy), H + min(0, dy) or None),
                   slice(max(0, dx), W + min(0, dx) or None))
            cand = (dist[src] + c[src] * half[k]) + c[dst] * half[k]
            better = cand < dist[dst]
            if better.any():
                dist[dst][...] = np.where(better, cand, dist[dst])
                changed = True
        if not changed:
            return dist


def dijkstra_relax(cost: np.ndarray, seed: np.ndarray, nodata: float,
                   *, pixel_size: float = 1.0) -> np.ndarray:
    """Same result as :func:`cost_relax_kernel`, BIT-identical: every
    algorithm that takes exact mins over the same per-path folded values
    agrees, because each path's float64 value is a property of the path
    alone (the fixed fold ``(d + c_u*halfL) + c_v*halfL`` per step) and
    ``min`` is order-independent.  Dijkstra visits each pixel once, so a
    tile relaxes in O(px log px) instead of O(px * path-length) Jacobi
    sweeps -- the stage uses this; the vectorized kernel stays as the
    independent test oracle."""
    cost = np.asarray(cost, dtype=np.float32)
    valid = cost != np.float32(nodata)
    if bool((cost[valid] <= 0).any()):
        raise ValueError("cost surface must be strictly positive")
    H, W = cost.shape
    c = np.where(valid, cost.astype(np.float64), np.inf).ravel()
    dist = np.where(valid, np.asarray(seed, np.float64), np.inf).ravel()
    seeds = np.flatnonzero(np.isfinite(dist))
    _dijkstra_from(c, dist, seeds, H, W, _half_steps(pixel_size))
    return dist.reshape(H, W)


def _dijkstra_from(c: np.ndarray, dist: np.ndarray, seeds, H: int,
                   W: int, half: np.ndarray) -> None:
    """In-place INCREMENTAL Dijkstra: relax outward from ``seeds`` (flat
    indices whose dist was just lowered), treating the existing ``dist``
    as settled upper bounds -- explored area is proportional to the
    region that actually improves, which is what makes the per-round
    step of :func:`cost_distance` cheap once fronts narrow."""
    import heapq

    heap = [(float(dist[i]), int(i)) for i in seeds
            if np.isfinite(dist[i])]
    heapq.heapify(heap)
    push = heapq.heappush
    pop = heapq.heappop
    dy = [int(x) for x in _DY8]
    dx = [int(x) for x in _DX8]
    hl = [float(h) for h in half]
    while heap:
        d, u = pop(heap)
        if d > dist[u]:
            continue
        r, col = divmod(u, W)
        cu = c[u]
        for k in range(8):
            r2 = r + dy[k]
            c2 = col + dx[k]
            if not (0 <= r2 < H and 0 <= c2 < W):
                continue
            v = r2 * W + c2
            nd = (d + cu * hl[k]) + c[v] * hl[k]
            if nd < dist[v]:
                dist[v] = nd
                push(heap, (nd, v))


_COST_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 static, 1 dist state, 2 offer
    ("cell_id", pa.int64()),
    ("px", pa.int64()),         # offer: target pixel (tile-flat)
    ("d_plus", pa.float64()),   # offer: d[u] + cost[u]*halfL
    ("half_l", pa.float64()),   # offer: halfL (receiver adds cost[v]*halfL)
    ("dist", pa.binary()),      # kind 1: zlib float64 T*T distances
    ("cost", pa.binary()),      # kind 0: zlib float32 T*T
    ("caption", pa.string()),   # kind 0
])


def _ring_index(T: int) -> np.ndarray:
    rr, cc = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    ring = (rr == 0) | (rr == T - 1) | (cc == 0) | (cc == T - 1)
    return np.flatnonzero(ring.ravel())


def _cost_state(ds, spec: GridSpec, *, cost_layer: str,
                src_layer: str, src_value: float, max_rounds: int,
                out_layer: str = "cost_dist", fmt: str = "npz"):
    """The shared engine of :func:`cost_distance` and :func:`cost_path`:
    runs the active-front border iteration to convergence and returns
    ``(statics, states)`` -- per-cell cost blobs and settled float64
    distance-grid blobs (_COST_SCHEMA rows)."""
    import ray
    import ray.data

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    ring_idx = _ring_index(T)
    ring_r, ring_c = np.divmod(ring_idx, T)
    half = _half_steps(spec.pixel_size)

    keyed = make_keyed(spec, (cost_layer, src_layer))

    def _out(**kw):
        out = {n: [] for n in _COST_SCHEMA.names}

        def row(**r):
            for n in _COST_SCHEMA.names:
                out[n].append(r.get(n))
        return out, row

    def _offers(row, cell, tx, ty, dist, c64, improved_ring):
        """Emit offer rows for improved, finite ring pixels toward every
        in-world neighbour pixel outside this tile."""
        d_ring = dist.ravel()[ring_idx]
        c_ring = c64.ravel()[ring_idx]
        ok = improved_ring & np.isfinite(d_ring)
        for j in np.flatnonzero(ok):
            r, c = int(ring_r[j]), int(ring_c[j])
            for k in range(8):
                nr, nc = r + int(_DY8[k]), c + int(_DX8[k])
                if 0 <= nr < T and 0 <= nc < T:
                    continue                      # in-tile move
                gr, gc = ty * T + nr, tx * T + nc
                if not (0 <= gr < tiles_y * T and 0 <= gc < tiles_x * T):
                    continue                      # off-world
                row(kind=2,
                    cell_id=spec.cell_id(gc // T, gr // T),
                    px=int((gr % T) * T + gc % T),
                    d_plus=float(d_ring[j] + c_ring[j] * half[k]),
                    half_l=float(half[k]))

    def init(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        out, row = _out()
        arrs = {}
        cap_raw = None
        for i in range(len(g["layer"])):
            cap = Caption.from_json(g["caption"][i])
            arrs[g["layer"][i]] = (decode_tile(g["bytes"][i],
                                               g["fmt"][i], cap), cap)
            if g["layer"][i] == cost_layer:
                cap_raw = g["caption"][i]
        if cost_layer not in arrs or src_layer not in arrs:
            return pa.table(out, schema=_COST_SCHEMA)
        cost, cap = arrs[cost_layer]
        srcarr, _ = arrs[src_layer]
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        valid = cost != np.float32(cap.nodata)
        srcmask = (srcarr == np.float32(src_value)) & valid
        seed = np.where(srcmask, 0.0, np.inf)
        dist = dijkstra_relax(cost, seed, float(cap.nodata),
                              pixel_size=spec.pixel_size)
        c64 = np.where(valid, cost.astype(np.float64), np.inf)
        row(kind=0, cell_id=cell,
            cost=zlib.compress(cost.astype(np.float32).tobytes(), 1),
            caption=cap_raw)
        row(kind=1, cell_id=cell,
            dist=zlib.compress(dist.tobytes(), 1))
        _offers(row, cell, tx, ty, dist, c64,
                np.ones(ring_idx.size, dtype=bool))
        return pa.table(out, schema=_COST_SCHEMA)

    def _decode_state(g):
        from ..tiles.codec import Caption

        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1), None)
        if srow is None or rrow is None:
            return None
        cost = np.frombuffer(zlib.decompress(g["cost"][srow]),
                             np.float32).reshape(T, T)
        dist = np.frombuffer(zlib.decompress(g["dist"][rrow]),
                             np.float64).copy()
        cap = Caption.from_json(g["caption"][srow])
        return cost, dist, cap, rrow

    def step(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out, row = _out()
        state = _decode_state(g)
        if state is None:           # offers into a cell with no tiles
            return pa.table(out, schema=_COST_SCHEMA)
        cost, dist, cap, rrow = state
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        valid = cost != np.float32(cap.nodata)
        c64 = np.where(valid, cost.astype(np.float64), np.inf)
        c_flat = c64.ravel()
        # apply offers: receiver adds its own half-edge term, then mins.
        # prev ring is captured BEFORE application: a ring pixel improved
        # by an offer must re-offer onward (it can border 2-3 OTHER
        # tiles) even when the in-tile relaxation adds nothing on top
        prev_ring = dist[ring_idx].copy()
        seeds = []
        for i, k in enumerate(g["kind"]):
            if k != 2:
                continue
            px = int(g["px"][i])
            d = g["d_plus"][i] + c_flat[px] * g["half_l"][i]
            if d < dist[px]:
                dist[px] = d
                seeds.append(px)
        if not seeds:               # all offers stale: state unchanged
            row(kind=1, cell_id=cell, dist=g["dist"][rrow])
            return pa.table(out, schema=_COST_SCHEMA)
        # incremental: relax ONLY outward from the improved pixels --
        # the settled remainder of the tile is never revisited
        _dijkstra_from(c_flat, dist, np.unique(np.array(seeds)),
                       T, T, half)
        row(kind=1, cell_id=cell,
            dist=zlib.compress(dist.tobytes(), 1))
        _offers(row, cell, tx, ty, dist.reshape(T, T), c64,
                dist[ring_idx] < prev_ring)
        return pa.table(out, schema=_COST_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        state = _decode_state(g)
        if state is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        cost, dist, cap, _rrow = state
        dist = dist.reshape(T, T)
        nd = np.float32(cap.nodata)
        outarr = dist.astype(np.float32)
        outarr[~np.isfinite(dist)] = nd
        outarr[cost == nd] = nd
        from ..tiles.codec import Caption

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
    # re-block every loop input once: the init groupby emits ~200 blocks
    # and each per-round filter/union would otherwise schedule a task per
    # tiny block, dominating wall time at small active fronts
    nblocks = front_blocks(tiles_x * tiles_y)
    statics = (combined.filter(expr="kind == 0")
               .repartition(nblocks).materialize())
    ringst = (combined.filter(expr="kind == 1")
              .repartition(nblocks).materialize())
    # offers is consumed twice per round (active-cell scan + the union),
    # so keep it materialized
    offers = (combined.filter(expr="kind == 2")
              .repartition(nblocks).materialize())

    _cells_of, _split_cells = cells_of, split_cells

    import logging
    import time as _time

    log = logging.getLogger(__name__)
    for _round in range(max_rounds):
        _t0 = _time.time()
        active = _cells_of(offers)
        if active.size == 0:
            break
        log.info("cost_distance round %d: %d active cells (%.1fs scan)",
                 _round, active.size, _time.time() - _t0)
        ids_ref = ray.put(active)
        # the dist-grid state rows are big blobs: materialize each round
        # product once and never re-scan blob blocks lazily (the fused
        # single-materialization variant measured 1.5x SLOWER here,
        # unlike stream_order whose state rows are small)
        step_out = (_split_cells(statics, ids_ref, True)
                    .union(_split_cells(ringst, ids_ref, True))
                    .union(offers)
                    .groupby("cell_id")
                    .map_groups(step, batch_format="pyarrow")
                    .materialize())
        ringst = (_split_cells(ringst, ids_ref, False)
                  .union(step_out.filter(expr="kind == 1"))
                  .repartition(nblocks)
                  .materialize())
        offers = (step_out.filter(expr="kind == 2")
                  .repartition(nblocks).materialize())
    else:
        if _cells_of(offers).size != 0:
            raise RuntimeError(
                f"cost_distance did not converge in {max_rounds} "
                f"rounds; raise max_rounds")

    return statics, ringst, paint


def cost_distance(ds, spec: GridSpec, *, cost_layer: str = "dem",
                  src_layer: str = "veg", src_value: float,
                  out_layer: str = "cost_dist", fmt: str = "npz",
                  max_rounds: int = 1024):
    """Image-table Dataset (cost + source layers on one grid) -> image
    table of ``out_layer`` float32 cost-distance tiles.  Bit-identical
    to ``cost_relax_kernel`` on the mosaicked whole raster."""
    statics, states, paint = _cost_state(
        ds, spec, cost_layer=cost_layer, src_layer=src_layer,
        src_value=src_value, max_rounds=max_rounds,
        out_layer=out_layer, fmt=fmt)
    return (statics.union(states)
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))


def cost_path(ds, spec: GridSpec, dests, *, cost_layer: str = "dem",
              src_layer: str = "veg", src_value: float,
              max_rounds: int = 1024, max_walk_rounds: int = 4096):
    """Least-cost PATH backtrace (the ArcGIS CostPath companion of
    :func:`cost_distance`): for each destination pixel, walk the exact
    gradient of the settled float64 distance field back to a source.
    Returns a Dataset of ``(dest_id, step, row, col, dist)`` rows --
    step 0 is the destination, the last step is a source (dist 0).

    ``dests`` is an iterable of ``(dest_id, row, col)`` GLOBAL pixel
    coordinates (a small per-site list, shipped in the task closures).

    Exactness: the predecessor of pixel ``v`` is the first direction (in
    the fixed E..NE scan order) whose fold ``(d[u] + c[u]*halfL) +
    c[v]*halfL`` EQUALS ``d[v]`` -- float equality is sound because the
    settled field stores exactly these folds (see the bit-identity
    contract above).  Cross-tile candidates are evaluated locally via a
    ONE-shot halo exchange of the final border dist+cost values, so the
    tie-break order is identical to the whole-raster oracle.

    Scale shape: the distance solve is :func:`_cost_state`; the halo
    exchange is one keyed shuffle of edge strips; the walk loop touches
    ONLY the cells a cursor is currently in (rounds = tiles crossed by
    the longest path).  Unreachable destinations (inf distance) emit no
    rows."""
    import ray
    import ray.data

    statics, states, _paint = _cost_state(
        ds, spec, cost_layer=cost_layer, src_layer=src_layer,
        src_value=src_value, max_rounds=max_rounds)
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    world_w = tiles_x * T
    half = _half_steps(spec.pixel_size)
    HT = T + 2                          # halo-frame width

    def _strip_sel(dy: int, dx: int):
        rs = slice(T - 1, T) if dy == 1 else (slice(0, 1) if dy == -1
                                              else slice(0, T))
        cs = slice(T - 1, T) if dx == 1 else (slice(0, 1) if dx == -1
                                              else slice(0, T))
        return rs, cs

    def emit_strips(group: pa.Table) -> pa.Table:
        """kind-4 rows: this cell's border dist+cost values adjacent to
        each in-world neighbour (placed into the neighbour's halo)."""
        g = group.to_pydict()
        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1), None)
        out = {n: [] for n in _COST_SCHEMA.names}

        def row(**kw):
            for n in _COST_SCHEMA.names:
                out[n].append(kw.get(n))

        if srow is None or rrow is None:
            return pa.table(out, schema=_COST_SCHEMA)
        from ..tiles.codec import Caption

        cost = np.frombuffer(zlib.decompress(g["cost"][srow]),
                             np.float32).reshape(T, T)
        dist = np.frombuffer(zlib.decompress(g["dist"][rrow]),
                             np.float64).reshape(T, T)
        cap = Caption.from_json(g["caption"][srow])
        valid = cost != np.float32(cap.nodata)
        c64 = np.where(valid, cost.astype(np.float64), np.inf)
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        for k in range(8):
            dy, dx = int(_DY8[k]), int(_DX8[k])
            ntx, nty = tx + dx, ty + dy
            if not (0 <= ntx < tiles_x and 0 <= nty < tiles_y):
                continue
            rs, cs = _strip_sel(dy, dx)
            payload = np.concatenate([dist[rs, cs].ravel(),
                                      c64[rs, cs].ravel()])
            row(kind=4, cell_id=spec.cell_id(ntx, nty), px=k,
                dist=zlib.compress(payload.tobytes(), 1))
        return pa.table(out, schema=_COST_SCHEMA)

    strips = (statics.union(states)
              .groupby("cell_id")
              .map_groups(emit_strips, batch_format="pyarrow")
              .repartition(front_blocks(tiles_x * tiles_y))
              .materialize())

    dest_rows = [(int(i), int(r), int(c)) for i, r, c in dests]
    for _, r, c in dest_rows:
        if not (0 <= r < tiles_y * T and 0 <= c < world_w):
            raise ValueError(f"destination ({r}, {c}) outside the world")

    def init_cursors() -> pa.Table:
        out = {n: [] for n in _COST_SCHEMA.names}

        def row(**kw):
            for n in _COST_SCHEMA.names:
                out[n].append(kw.get(n))

        for i, r, c in dest_rows:
            row(kind=5, cell_id=spec.cell_id(c // T, r // T),
                px=int((r % T) * T + c % T),
                d_plus=float(i), half_l=0.0)   # d_plus=dest, half_l=step
        return pa.table(out, schema=_COST_SCHEMA)

    def _halo_place(hd, hc, k, payload):
        """Place a neighbour's strip (sent in ITS k-direction toward us)
        into our halo frame: the sender lies at direction k+4 from us."""
        dy, dx = -int(_DY8[k]), -int(_DX8[k])   # sender relative to us
        n = payload.size // 2
        dvals, cvals = payload[:n], payload[n:]
        rs = slice(0, 1) if dy == -1 else (slice(HT - 1, HT) if dy == 1
                                           else slice(1, T + 1))
        cs = slice(0, 1) if dx == -1 else (slice(HT - 1, HT) if dx == 1
                                           else slice(1, T + 1))
        shape = (rs.stop - rs.start, cs.stop - cs.start)
        hd[rs, cs] = dvals.reshape(shape)
        hc[rs, cs] = cvals.reshape(shape)

    def walk(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption

        g = group.to_pydict()
        out = {n: [] for n in _COST_SCHEMA.names}

        def row(**kw):
            for n in _COST_SCHEMA.names:
                out[n].append(kw.get(n))

        srow = next((i for i, k in enumerate(g["kind"]) if k == 0), None)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1), None)
        if srow is None or rrow is None:
            return pa.table(out, schema=_COST_SCHEMA)
        cost = np.frombuffer(zlib.decompress(g["cost"][srow]),
                             np.float32).reshape(T, T)
        dist = np.frombuffer(zlib.decompress(g["dist"][rrow]),
                             np.float64).reshape(T, T)
        cap = Caption.from_json(g["caption"][srow])
        valid = cost != np.float32(cap.nodata)
        c64 = np.where(valid, cost.astype(np.float64), np.inf)
        hd = np.full((HT, HT), np.inf)
        hc = np.full((HT, HT), np.inf)
        hd[1:T + 1, 1:T + 1] = dist
        hc[1:T + 1, 1:T + 1] = c64
        for i, k in enumerate(g["kind"]):
            if k == 4:
                _halo_place(hd, hc, int(g["px"][i]), np.frombuffer(
                    zlib.decompress(g["dist"][i]), np.float64))
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        for i, k in enumerate(g["kind"]):
            if k != 5:
                continue
            dest = int(g["d_plus"][i])
            step = int(g["half_l"][i])
            r, c = divmod(int(g["px"][i]), T)
            hr, hcc = r + 1, c + 1              # halo-frame coords
            for _guard in range(T * T + 2):
                dv = hd[hr, hcc]
                if not np.isfinite(dv):
                    break                        # unreachable: no rows
                grow = ty * T + hr - 1
                gcol = tx * T + hcc - 1
                row(kind=6, cell_id=dest,
                    px=int(grow * world_w + gcol),
                    d_plus=float(dv), half_l=float(step))
                if dv == 0.0:
                    break                        # reached a source
                nk = -1
                for k2 in range(8):
                    ur = hr + int(_DY8[k2])
                    uc = hcc + int(_DX8[k2])
                    f = ((hd[ur, uc] + hc[ur, uc] * half[k2])
                         + hc[hr, hcc] * half[k2])
                    if f == dv:
                        nk = k2
                        break
                if nk < 0:
                    raise RuntimeError(
                        "cost_path: no predecessor achieves the settled "
                        "distance -- state is inconsistent")
                hr += int(_DY8[nk])
                hcc += int(_DX8[nk])
                step += 1
                if not (1 <= hr <= T and 1 <= hcc <= T):
                    grow = ty * T + hr - 1      # crossed into a neighbour
                    gcol = tx * T + hcc - 1
                    row(kind=5,
                        cell_id=spec.cell_id(gcol // T, grow // T),
                        px=int((grow % T) * T + gcol % T),
                        d_plus=float(dest), half_l=float(step))
                    break
            else:
                raise RuntimeError(
                    "cost_path: in-tile walk exceeded T*T steps -- "
                    "state is inconsistent")
        return pa.table(out, schema=_COST_SCHEMA)

    walk_static = (statics.union(states).union(strips)
                   .repartition(front_blocks(tiles_x * tiles_y))
                   .materialize())
    cursors = ray.data.from_arrow(init_cursors())
    paths = []
    for _ in range(max_walk_rounds):
        active = cells_of(cursors)
        if active.size == 0:
            break
        ids_ref = ray.put(active)
        stepped = (split_cells(walk_static, ids_ref, True)
                   .union(cursors)
                   .groupby("cell_id")
                   .map_groups(walk, batch_format="pyarrow")
                   .materialize())
        paths.append(stepped.filter(expr="kind == 6").materialize())
        cursors = stepped.filter(expr="kind == 5").materialize()
    else:
        raise RuntimeError(
            f"cost_path did not finish in {max_walk_rounds} rounds; "
            f"raise max_walk_rounds")

    def publish(b: pa.Table) -> pa.Table:
        pos = b.column("px").to_numpy(zero_copy_only=False)
        return pa.table({
            "dest_id": b.column("cell_id"),
            "step": pa.array(b.column("half_l").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64()),
            "row": pa.array(pos // world_w, pa.int64()),
            "col": pa.array(pos % world_w, pa.int64()),
            "dist": b.column("d_plus")})

    out = None
    for p in paths:
        out = p if out is None else out.union(p)
    if out is None:
        import ray.data

        return ray.data.from_arrow(pa.table(
            {"dest_id": pa.array([], pa.int64()),
             "step": pa.array([], pa.int64()),
             "row": pa.array([], pa.int64()),
             "col": pa.array([], pa.int64()),
             "dist": pa.array([], pa.float64())}))
    return out.map_batches(publish, batch_format="pyarrow")
