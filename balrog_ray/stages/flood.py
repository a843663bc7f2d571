"""Marker-controlled watershed segmentation -- the IMAGE watershed
(Meyer flooding / ``skimage.segmentation.watershed`` /
``cv2.watershed`` role): every valid pixel joins the marker whose
flooding path is cheapest under the MIN-MAX semiring (the path
minimizing the maximum level crossed -- watershed by topographic
distance).  Complements the hydrology watershed (flow-direction
basins, stages/hydrology.py) -- markers here are arbitrary integer
seeds (typically h-minima of a gradient surface), not pour points.

ORDER-FREE SEMANTICS -- the two-phase formulation.  A single-state
"carry (value, label) pairs through Dijkstra" scheme is NOT
schedule-independent: the lex extension ``(v, l) -> (max(v, lv), l)``
is non-monotone on plateaus (a worse-value/smaller-label path can win
after maxing), so tiled and whole runs could disagree.  Instead:

* phase 1 -- ``v*(x)`` = min over all marker paths of max(level)
  (endpoints included).  Pure min-max: extension ``max(d, lv)`` is
  monotone, min is order-free, float64 max is exact => any schedule
  (Jacobi sweeps, per-tile Dijkstra, tiled rounds) reaches the same
  bits.
* phase 2 -- ``label(x)`` = min marker label over OPTIMAL paths
  (those achieving v*(x)).  Optimal paths decompose into ADMISSIBLE
  edges ``u -> x: max(v*(u), level(x)) == v*(x)``, so the label is a
  pure min-semiring propagation over a FIXED subgraph -- monotone,
  order-free, integer-exact.  The min-label tie-break makes plateau
  and equidistant assignments deterministic.

Markers: integer labels > 0 in a marker layer (0 = unseeded); nodata
in the LEVEL layer is impassable; unreachable pixels stay unlabeled.
8-connectivity, same as the cost stage.

Distributed shape: BOTH phases run the cost-distance active-front plan
(stages/cost.py): per-tile relaxation in ``init``, border OFFERS to
neighbouring tiles, per-round ``groupby(cell)`` over ACTIVE cells only,
offers re-emitted only for ring pixels that improved.  Phase-1 state is
the float64 value grid; phase-2 state is the int32 label grid with the
settled value grid riding along as a static.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .front import cells_of, front_blocks, make_keyed, split_cells
from .halo import GridSpec

_DY8 = np.array([-1, -1, -1, 0, 0, 1, 1, 1], np.int64)
_DX8 = np.array([-1, 0, 1, -1, 1, -1, 0, 1], np.int64)
_NOLAB = np.int32(1 << 30)          # "unlabeled" sorts worst

_FLOOD_SCHEMA = pa.schema([
    ("kind", pa.int8()),        # 0 static, 1 state, 2 offer
    ("cell_id", pa.int64()),
    ("px", pa.int64()),         # offer: target pixel (tile-flat)
    ("d", pa.float64()),        # offer: sender v* (both phases)
    ("lab", pa.int32()),        # offer: sender label (phase 2)
    ("val", pa.binary()),       # kind 1: zlib float64 T*T values
    ("labs", pa.binary()),      # kind 1 (phase 2): zlib int32 labels
    ("level", pa.binary()),     # kind 0: zlib float32 T*T
    ("vstar", pa.binary()),     # kind 0 (phase 2): zlib float64 T*T
    ("caption", pa.string()),   # kind 0
])


def _shifted_pairs(H, W, k):
    dy, dx = int(_DY8[k]), int(_DX8[k])
    src = (slice(max(0, -dy), H - max(0, dy)),
           slice(max(0, -dx), W - max(0, dx)))
    dst = (slice(max(0, dy), H + min(0, dy) or None),
           slice(max(0, dx), W + min(0, dx) or None))
    return src, dst


def minimax_jacobi(level: np.ndarray, markers: np.ndarray,
                   nodata: float) -> np.ndarray:
    """Independent phase-1 oracle: synchronous min-max sweeps to
    fixpoint.  Returns float64 v*; unreachable/nodata = +inf."""
    lv = np.asarray(level, np.float32)
    valid = lv != np.float32(nodata)
    l64 = np.where(valid, lv.astype(np.float64), np.inf)
    seeded = valid & (np.asarray(markers) > 0)
    val = np.where(seeded, l64, np.inf)
    H, W = lv.shape
    while True:
        changed = False
        for k in range(8):
            src, dst = _shifted_pairs(H, W, k)
            cand = np.maximum(val[src], l64[dst])
            ok = cand < val[dst]
            if ok.any():
                val[dst][...] = np.where(ok, cand, val[dst])
                changed = True
        if not changed:
            return val


def minimax_dijkstra(level: np.ndarray, markers: np.ndarray,
                     nodata: float) -> np.ndarray:
    """Same fixpoint via a heap -- the per-tile phase-1 worker."""
    lv = np.asarray(level, np.float32)
    valid = lv != np.float32(nodata)
    l64 = np.where(valid, lv.astype(np.float64), np.inf).ravel()
    seeded = valid.ravel() & (np.asarray(markers).ravel() > 0)
    val = np.where(seeded, l64, np.inf)
    H, W = lv.shape
    _minimax_from(l64, val, np.flatnonzero(seeded), H, W)
    return val.reshape(H, W)


def _minimax_from(l64, val, seeds, H, W) -> None:
    """In-place incremental min-max Dijkstra from ``seeds``."""
    import heapq

    heap = [(float(val[i]), int(i)) for i in seeds
            if np.isfinite(val[i])]
    heapq.heapify(heap)
    push, pop = heapq.heappush, heapq.heappop
    dy = [int(x) for x in _DY8]
    dx = [int(x) for x in _DX8]
    while heap:
        d, u = pop(heap)
        if d > val[u]:
            continue
        r, col = divmod(u, W)
        for k in range(8):
            r2, c2 = r + dy[k], col + dx[k]
            if not (0 <= r2 < H and 0 <= c2 < W):
                continue
            v = r2 * W + c2
            nv = max(d, float(l64[v]))
            if nv < val[v]:
                val[v] = nv
                push(heap, (nv, v))


def label_sweep(l64: np.ndarray, vstar: np.ndarray, lab: np.ndarray
                ) -> bool:
    """Phase-2 in-tile relaxation: vectorized min-label sweeps over the
    admissible subgraph to fixpoint.  Mutates ``lab``; returns whether
    anything changed."""
    H, W = vstar.shape
    any_change = False
    while True:
        changed = False
        for k in range(8):
            src, dst = _shifted_pairs(H, W, k)
            adm = (np.maximum(vstar[src], l64[dst]) == vstar[dst])
            cand = lab[src]
            ok = (adm & (cand > 0) & np.isfinite(vstar[dst])
                  & ((lab[dst] == 0) | (cand < lab[dst])))
            if ok.any():
                lab[dst][...] = np.where(ok, cand, lab[dst])
                changed = any_change = True
        if not changed:
            return any_change


def watershed_whole(level: np.ndarray, markers: np.ndarray,
                    nodata: float) -> tuple:
    """Whole-array oracle: phase-1 minimax values + phase-2 min-label
    propagation.  Returns (v* float64, labels int32); unlabeled = 0."""
    lv = np.asarray(level, np.float32)
    valid = lv != np.float32(nodata)
    l64 = np.where(valid, lv.astype(np.float64), np.inf)
    vstar = minimax_dijkstra(level, markers, nodata)
    lab = np.where(valid & (np.asarray(markers) > 0),
                   np.asarray(markers).astype(np.int32),
                   0).astype(np.int32)
    label_sweep(l64, vstar, lab)
    return vstar, lab


def _ring_index(T: int) -> np.ndarray:
    m = np.zeros((T, T), bool)
    m[0, :] = m[-1, :] = True
    m[:, 0] = m[:, -1] = True
    return np.flatnonzero(m.ravel())


def watershed_flood(ds, spec: GridSpec, *, level_layer: str = "dem",
                    marker_layer: str = "markers",
                    out_layer: str = "flood_lab",
                    max_rounds: int = 10000, fmt: str = "npz"):
    """Image-table Dataset (level + integer marker layers) -> label
    tiles (layer ``out_layer``; unlabeled/nodata pixels hold nodata).
    Two active-front border iterations (values, then labels)."""
    import ray

    if spec.tile_px < 2:
        raise ValueError("tile_px must be >= 2")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    ring_idx = _ring_index(T)
    ring_r, ring_c = np.divmod(ring_idx, T)

    keyed = make_keyed(spec, (level_layer, marker_layer))

    def _out():
        out = {n: [] for n in _FLOOD_SCHEMA.names}

        def row(**r):
            for n in _FLOOD_SCHEMA.names:
                out[n].append(r.get(n))
        return out, row

    def _neigh_px(j):
        """Cross-tile 8-neighbour targets of ring pixel j: yields
        (neigh_cell_id, neigh_flat_px)."""
        r, c = int(ring_r[j]), int(ring_c[j])
        for k in range(8):
            nr, nc = r + int(_DY8[k]), c + int(_DX8[k])
            if 0 <= nr < T and 0 <= nc < T:
                continue
            yield nr, nc

    def _emit_cross(row, tx, ty, j, **fields):
        r, c = int(ring_r[j]), int(ring_c[j])
        for k in range(8):
            nr, nc = r + int(_DY8[k]), c + int(_DX8[k])
            if 0 <= nr < T and 0 <= nc < T:
                continue
            gr, gc = ty * T + nr, tx * T + nc
            if not (0 <= gr < tiles_y * T and 0 <= gc < tiles_x * T):
                continue
            row(kind=2, cell_id=spec.cell_id(gc // T, gr // T),
                px=int((gr % T) * T + gc % T), **fields)

    # ---------------- phase 1: minimax values ---------------- #

    def v_offers(row, tx, ty, val, improved_ring):
        v_ring = val.ravel()[ring_idx]
        ok = improved_ring & np.isfinite(v_ring)
        for j in np.flatnonzero(ok):
            _emit_cross(row, tx, ty, j, d=float(v_ring[j]))

    def v_init(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        g = group.to_pydict()
        out, row = _out()
        arrs, cap_raw = {}, None
        for i in range(len(g["layer"])):
            cap = Caption.from_json(g["caption"][i])
            arrs[g["layer"][i]] = (decode_tile(g["bytes"][i],
                                               g["fmt"][i], cap), cap)
            if g["layer"][i] == level_layer:
                cap_raw = g["caption"][i]
        if level_layer not in arrs or marker_layer not in arrs:
            return pa.table(out, schema=_FLOOD_SCHEMA)
        level, cap = arrs[level_layer]
        mk = arrs[marker_layer][0].astype(np.int32)
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        val = minimax_dijkstra(level, mk, float(cap.nodata))
        row(kind=0, cell_id=cell,
            level=zlib.compress(level.astype(np.float32).tobytes(), 1),
            labs=zlib.compress(
                np.where(
                    (level != np.float32(cap.nodata)) & (mk > 0),
                    mk, 0).astype(np.int32).tobytes(), 1),
            caption=cap_raw)
        row(kind=1, cell_id=cell, val=zlib.compress(val.tobytes(), 1))
        v_offers(row, tx, ty, val, np.ones(ring_idx.size, bool))
        return pa.table(out, schema=_FLOOD_SCHEMA)

    def _static(g):
        from ..tiles.codec import Caption

        srow = next((i for i, k in enumerate(g["kind"]) if k == 0),
                    None)
        if srow is None:
            return None
        level = np.frombuffer(zlib.decompress(g["level"][srow]),
                              np.float32).reshape(T, T)
        mk = np.frombuffer(zlib.decompress(g["labs"][srow]),
                           np.int32).reshape(T, T)
        cap = Caption.from_json(g["caption"][srow])
        return level, mk, cap, srow

    def v_step(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out, row = _out()
        st = _static(g)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1),
                    None)
        if st is None or rrow is None:
            return pa.table(out, schema=_FLOOD_SCHEMA)
        level, _mk, cap, _ = st
        val = np.frombuffer(zlib.decompress(g["val"][rrow]),
                            np.float64).copy()
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        nd = np.float32(cap.nodata)
        l64 = np.where(level != nd, level.astype(np.float64),
                       np.inf).ravel()
        prev_ring = val[ring_idx].copy()
        seeds = []
        for i, k in enumerate(g["kind"]):
            if k != 2:
                continue
            px = int(g["px"][i])
            nv = max(float(g["d"][i]), float(l64[px]))
            if np.isfinite(nv) and nv < val[px]:
                val[px] = nv
                seeds.append(px)
        if not seeds:
            row(kind=1, cell_id=cell, val=g["val"][rrow])
            return pa.table(out, schema=_FLOOD_SCHEMA)
        _minimax_from(l64, val, np.unique(np.array(seeds)), T, T)
        row(kind=1, cell_id=cell, val=zlib.compress(val.tobytes(), 1))
        v_offers(row, tx, ty, val, val[ring_idx] < prev_ring)
        return pa.table(out, schema=_FLOOD_SCHEMA)

    # ---------------- phase 2: min-label propagation ---------------- #

    def l_offers(row, tx, ty, val, lab, improved_ring):
        v_ring = val.ravel()[ring_idx]
        l_ring = lab.ravel()[ring_idx]
        ok = improved_ring & (l_ring > 0)
        for j in np.flatnonzero(ok):
            _emit_cross(row, tx, ty, j, d=float(v_ring[j]),
                        lab=int(l_ring[j]))

    def l_init(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out, row = _out()
        st = _static(g)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1),
                    None)
        if st is None or rrow is None:
            return pa.table(out, schema=_FLOOD_SCHEMA)
        level, mk, cap, srow = st
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        nd = np.float32(cap.nodata)
        l64 = np.where(level != nd, level.astype(np.float64), np.inf)
        vstar = np.frombuffer(zlib.decompress(g["val"][rrow]),
                              np.float64).reshape(T, T)
        lab = mk.copy()
        label_sweep(l64, vstar, lab)
        row(kind=0, cell_id=cell, level=g["level"][srow],
            labs=g["labs"][srow],
            vstar=zlib.compress(vstar.tobytes(), 1),
            caption=g["caption"][srow])
        row(kind=1, cell_id=cell,
            labs=zlib.compress(lab.tobytes(), 1))
        l_offers(row, tx, ty, vstar, lab,
                 np.ones(ring_idx.size, bool))
        return pa.table(out, schema=_FLOOD_SCHEMA)

    def l_step(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        out, row = _out()
        st = _static(g)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1),
                    None)
        if st is None or rrow is None:
            return pa.table(out, schema=_FLOOD_SCHEMA)
        level, _mk, cap, srow = st
        cell = int(g["cell_id"][0])
        tx, ty = cell % tiles_x, cell // tiles_x
        nd = np.float32(cap.nodata)
        l64 = np.where(level != nd, level.astype(np.float64), np.inf)
        vstar = np.frombuffer(zlib.decompress(g["vstar"][srow]),
                              np.float64).reshape(T, T)
        lab = np.frombuffer(zlib.decompress(g["labs"][rrow]),
                            np.int32).copy().reshape(T, T)
        prev_ring = lab.ravel()[ring_idx].copy()
        vflat = vstar.ravel()
        lflat = lab.ravel()
        l64f = l64.ravel()
        applied = False
        for i, k in enumerate(g["kind"]):
            if k != 2:
                continue
            px = int(g["px"][i])
            # admissible cross-tile edge u -> px
            if max(float(g["d"][i]), float(l64f[px])) != \
                    float(vflat[px]):
                continue
            nl = int(g["lab"][i])
            cur = int(lflat[px])
            if cur == 0 or nl < cur:
                lflat[px] = nl
                applied = True
        if not applied:
            row(kind=1, cell_id=cell, labs=g["labs"][rrow])
            return pa.table(out, schema=_FLOOD_SCHEMA)
        label_sweep(l64, vstar, lab)
        row(kind=1, cell_id=cell,
            labs=zlib.compress(lab.tobytes(), 1))
        ring_now = lab.ravel()[ring_idx]
        improved = (ring_now != prev_ring)
        l_offers(row, tx, ty, vstar, lab, improved)
        return pa.table(out, schema=_FLOOD_SCHEMA)

    def paint(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, encode_tile, phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        st = _static(g)
        rrow = next((i for i, k in enumerate(g["kind"]) if k == 1),
                    None)
        if st is None or rrow is None:
            return pa.table({c: [] for c in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA)
        level, _mk, cap, _ = st
        lab = np.frombuffer(zlib.decompress(g["labs"][rrow]),
                            np.int32).reshape(T, T)
        tx, ty = cap.tx, cap.ty
        nd = np.float32(cap.nodata)
        outarr = lab.astype(np.float32)
        outarr[lab == 0] = nd
        outarr[level == nd] = nd
        ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(outarr, fmt, ocap)
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{tx}/{ty}"],
                                 pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([T], pa.int32()),
            "h": pa.array([T], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([phash64(outarr)], pa.int64())},
            schema=TILES_SCHEMA)

    def _front_loop(statics, states, offers, step_fn, tag):
        nblocks = front_blocks(tiles_x * tiles_y)
        converged = False
        for _round in range(max_rounds):
            active = cells_of(offers)
            if active.size == 0:
                converged = True
                break
            ids_ref = ray.put(active)
            step_out = (split_cells(statics, ids_ref, True)
                        .union(split_cells(states, ids_ref, True))
                        .union(offers)
                        .groupby("cell_id")
                        .map_groups(step_fn, batch_format="pyarrow")
                        .materialize())
            states = (split_cells(states, ids_ref, False)
                      .union(step_out.filter(expr="kind == 1"))
                      .repartition(nblocks)
                      .materialize())
            offers = (step_out.filter(expr="kind == 2")
                      .repartition(nblocks).materialize())
        if not converged and cells_of(offers).size != 0:
            raise RuntimeError(f"watershed_flood {tag} did not "
                               f"converge in {max_rounds} rounds")
        return states

    nblocks = front_blocks(tiles_x * tiles_y)
    combined = (ds.map_batches(keyed, batch_format="pyarrow")
                .groupby("cell_id")
                .map_groups(v_init, batch_format="pyarrow")
                .materialize())
    statics = (combined.filter(expr="kind == 0")
               .repartition(nblocks).materialize())
    vstates = (combined.filter(expr="kind == 1")
               .repartition(nblocks).materialize())
    voffers = (combined.filter(expr="kind == 2")
               .repartition(nblocks).materialize())
    vstates = _front_loop(statics, vstates, voffers, v_step, "values")

    seeded = (statics.union(vstates)
              .groupby("cell_id")
              .map_groups(l_init, batch_format="pyarrow")
              .materialize())
    lstatics = (seeded.filter(expr="kind == 0")
                .repartition(nblocks).materialize())
    lstates = (seeded.filter(expr="kind == 1")
               .repartition(nblocks).materialize())
    loffers = (seeded.filter(expr="kind == 2")
               .repartition(nblocks).materialize())
    lstates = _front_loop(lstatics, lstates, loffers, l_step, "labels")

    return (lstatics.union(lstates)
            .groupby("cell_id")
            .map_groups(paint, batch_format="pyarrow"))
