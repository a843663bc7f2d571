"""Seam carving -- the wavefront-DP member of the raster family
(Avidan & Shamir 2007; content-aware retargeting): the cumulative
minimum-energy map ``M[r, c] = E[r, c] + min(M[r-1, c-1], M[r-1, c],
M[r-1, c+1])`` over an energy layer, plus extraction of the optimal
vertical seam.

This operator's dependence structure is new to the engine: not a
bounded halo (focal/convo), not an active front (hydrology/cost), but
a WAVEFRONT -- row r depends on all of row r-1, so the raster is
processed as ``tiles_y`` sequential band rounds; within a round every
tile of the band computes in parallel.

Exactness of the banded run (the trapezoid argument): a core cell at
band row r depends on the incoming boundary row within r columns and
on energies within r-1 columns; with tile width == band height T,
both cones stay inside [core - T, core + T].  Each band tile therefore
assembles a 3T-wide frame -- its own energy plus both horizontal
neighbours' energy tiles and the three boundary-row segments -- and
runs the DP over the whole frame.  Frame-edge cells beyond the
dependence trapezoid may be polluted by the +inf frame boundary, but
the trapezoid is closed under the (r-1, c +- 1) dependence, so the
core crop is exact; the DP runs in float32 end-to-end (one cast, then
float32 min/add per row), making the banded map BIT-IDENTICAL to the
whole-raster oracle.

Nodata cells carry +inf internally (a seam can never pass through
them; unreachable cells stay +inf) and re-encode as nodata in the
output M tiles.  Per round the exchange ships the band's energy tiles
(x3 fan-out) plus one M row per tile; rounds scale with tiles_y.

Seam extraction walks the M map bottom-up -- inherently sequential in
the raster height -- with deterministic tie-breaks (smallest column).
For retargeting pipelines that carve k seams, the map recomputes per
seam over the carved raster; this module pins the single-seam
primitive and its exactness.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from .halo import GridSpec

_INF = np.float32(np.inf)

_BAND_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("kind", pa.string()),
    ("src_tx", pa.int32()),
    ("payload", pa.binary()), ("fmt", pa.string()),
    ("caption", pa.string()),
])


def dp_frame(e_frame: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Seam DP over every row of ``e_frame`` (float32, +inf =
    impassable / out-of-raster) from incoming row ``prev`` (same
    width).  Columns beyond the frame are +inf.  Returns the full M
    frame; only the dependence trapezoid of the centre is exact --
    callers crop the centre."""
    h, w = e_frame.shape
    assert prev.shape[0] == w
    out = np.empty((h, w), np.float32)
    cur = prev
    for r in range(h):
        left = np.concatenate(([_INF], cur[:-1]))
        right = np.concatenate((cur[1:], [_INF]))
        out[r] = e_frame[r] + np.minimum(np.minimum(left, cur), right)
        cur = out[r]
    return out


def seam_energy_whole(energy: np.ndarray, nodata: float) -> np.ndarray:
    """Whole-raster oracle: the same float32 row recurrence, seeded by
    a zero incoming row (so M[0] == E[0])."""
    e = np.asarray(energy, np.float32)
    nd = np.float32(nodata)
    e = np.where(e == nd, _INF, e)
    return dp_frame(e, np.zeros(e.shape[1], np.float32))


def backtrack_whole(M: np.ndarray) -> tuple:
    """Optimal vertical seam from a finished M map (float32, +inf for
    unreachable): (columns top->bottom, total cost); ties break to the
    smallest column at every step."""
    H, W = M.shape
    cols = np.empty(H, np.int64)
    c = int(np.flatnonzero(M[-1] == M[-1].min())[0])
    cols[-1] = c
    for r in range(H - 2, -1, -1):
        lo, hi = max(0, c - 1), min(W, c + 2)
        seg = M[r, lo:hi]
        c = lo + int(np.flatnonzero(seg == seg.min())[0])
        cols[r] = c
    return cols, float(M[-1].min())


def seam_energy_map(tiles_ds, spec: GridSpec, *, layer: str = "dem",
                    out_layer: str = "seam_m", fmt: str = "npz"):
    """Image-table Dataset (energy layer; nodata = impassable) ->
    cumulative minimum-energy M tiles (layer ``out_layer``; unreachable
    or nodata cells hold nodata).  ``tiles_y`` band rounds, each one
    keyed exchange."""
    from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
    from ..tiles.synth import TILES_SCHEMA

    TX, TY, T = spec.tiles_x, spec.tiles_y, spec.tile_px

    def fan_energy(ty):
        """Band ``ty`` energy tiles, keyed to self + both horizontal
        neighbours."""
        def fn(b: pa.Table) -> pa.Table:
            cols = {n: [] for n in _BAND_SCHEMA.names}
            for i in range(b.num_rows):
                cap_json = b.column("caption")[i].as_py()
                d = json.loads(cap_json)
                if d["layer"] != layer or d["ty"] != ty:
                    continue
                for dx in (-1, 0, 1):
                    nx = d["tx"] + dx
                    if not 0 <= nx < TX:
                        continue
                    cols["cell_id"].append(ty * TX + nx)
                    cols["kind"].append("energy")
                    cols["src_tx"].append(d["tx"])
                    cols["payload"].append(
                        b.column("bytes")[i].as_py())
                    cols["fmt"].append(b.column("fmt")[i].as_py())
                    cols["caption"].append(cap_json)
            return pa.table(
                {n: pa.array(cols[n], _BAND_SCHEMA.field(n).type)
                 for n in _BAND_SCHEMA.names}, schema=_BAND_SCHEMA)
        return fn

    def fan_boundary(ty_next):
        """Previous band's M tiles -> last-row segments keyed to the
        three below-neighbours."""
        def fn(b: pa.Table) -> pa.Table:
            cols = {n: [] for n in _BAND_SCHEMA.names}
            for i in range(b.num_rows):
                cap = Caption.from_json(b.column("caption")[i].as_py())
                arr = decode_tile(b.column("bytes")[i].as_py(),
                                  b.column("fmt")[i].as_py(), cap)
                nd = np.float32(cap.nodata)
                row = np.where(arr[-1] == nd, _INF,
                               arr[-1]).astype(np.float32)
                for dx in (-1, 0, 1):
                    nx = cap.tx + dx
                    if not 0 <= nx < TX:
                        continue
                    cols["cell_id"].append(ty_next * TX + nx)
                    cols["kind"].append("bound")
                    cols["src_tx"].append(cap.tx)
                    cols["payload"].append(row.tobytes())
                    cols["fmt"].append("f32row")
                    cols["caption"].append("")
            return pa.table(
                {n: pa.array(cols[n], _BAND_SCHEMA.field(n).type)
                 for n in _BAND_SCHEMA.names}, schema=_BAND_SCHEMA)
        return fn

    def compute(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        empty = pa.table({c: [] for c in TILES_SCHEMA.names},
                         schema=TILES_SCHEMA)
        own = [i for i, k in enumerate(g["kind"]) if k == "energy"
               and json.loads(g["caption"][i])["tx"]
               == int(g["cell_id"][0]) % TX]
        if not own:
            return empty
        cap = Caption.from_json(g["caption"][own[0]])
        tx, ty = cap.tx, cap.ty
        need = {tx + dx for dx in (-1, 0, 1) if 0 <= tx + dx < TX}
        e_by_tx, b_by_tx = {}, {}
        for i, k in enumerate(g["kind"]):
            if k == "energy":
                c2 = Caption.from_json(g["caption"][i])
                arr = decode_tile(g["payload"][i], g["fmt"][i], c2)
                nd2 = np.float32(c2.nodata)
                e_by_tx[c2.tx] = np.where(arr == nd2, _INF,
                                          arr).astype(np.float32)
            else:
                b_by_tx[int(g["src_tx"][i])] = np.frombuffer(
                    g["payload"][i], np.float32)
        if set(e_by_tx) != need:                 # completeness gate
            return empty
        if ty > 0 and set(b_by_tx) != need:
            return empty
        h, w = e_by_tx[tx].shape
        frame_w = w + 2 * T
        e_frame = np.full((h, frame_w), _INF, np.float32)
        prev = (np.full(frame_w, _INF, np.float32) if ty > 0
                else np.zeros(frame_w, np.float32))
        if ty == 0:
            # out-of-raster frame columns must be +inf in prev too --
            # their energy is +inf so M stays +inf either way
            pass
        for sx in need:
            off = (sx - tx) * T + T
            seg_e = e_by_tx[sx]
            e_frame[:, off:off + seg_e.shape[1]] = seg_e
            if ty > 0:
                seg_b = b_by_tx[sx]
                prev[off:off + len(seg_b)] = seg_b
        M = dp_frame(e_frame, prev)[:, T:T + w]
        core = M.copy()
        core[~np.isfinite(core)] = np.float32(cap.nodata)
        ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(np.ascontiguousarray(core), fmt,
                                    ocap)
        hh, ww = core.shape
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{tx}/{ty}"],
                                 pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([np.int32(ww)], pa.int32()),
            "h": pa.array([np.int32(hh)], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([np.int64(phash64(core))], pa.int64()),
        }, schema=TILES_SCHEMA)

    bands = []
    prev_band = None
    for ty in range(TY):
        parts = tiles_ds.map_batches(fan_energy(ty),
                                     batch_format="pyarrow")
        if prev_band is not None:
            parts = parts.union(prev_band.map_batches(
                fan_boundary(ty), batch_format="pyarrow"))
        band_m = (parts.groupby("cell_id")
                  .map_groups(compute, batch_format="pyarrow")
                  .materialize())
        bands.append(band_m)
        prev_band = band_m
    out = bands[0]
    for b in bands[1:]:
        out = out.union(b)
    return out


def extract_seam(m_ds, spec: GridSpec, *, layer: str = "seam_m"):
    """Optimal vertical seam from the M tiles: (columns top->bottom,
    total cost) with smallest-column tie-breaks -- identical to
    :func:`backtrack_whole` on the mosaicked map.  The walk is
    sequential in raster height by nature (a 1-px path); rows are
    fetched band by band."""
    import ray

    from ..tiles.codec import Caption, decode_tile

    TX, TY, T = spec.tiles_x, spec.tiles_y, spec.tile_px
    tiles = {}
    for t in ray.get(m_ds.materialize().to_arrow_refs()):
        for i in range(t.num_rows):
            cap = Caption.from_json(t.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            arr = decode_tile(t.column("bytes")[i].as_py(),
                              t.column("fmt")[i].as_py(), cap)
            tiles[(cap.tx, cap.ty)] = np.where(
                arr == np.float32(cap.nodata), _INF,
                arr).astype(np.float32)
    if len(tiles) != TX * TY:
        raise ValueError("incomplete M map")
    W, H = TX * T, TY * T

    def m_row(r):
        ty, rr = divmod(r, T)
        return np.concatenate([tiles[(tx, ty)][rr]
                               for tx in range(TX)])

    bottom = m_row(H - 1)
    cost = float(bottom.min())
    c = int(np.flatnonzero(bottom == bottom.min())[0])
    cols = np.empty(H, np.int64)
    cols[-1] = c
    for r in range(H - 2, -1, -1):
        row = m_row(r)
        lo, hi = max(0, c - 1), min(W, c + 2)
        seg = row[lo:hi]
        c = lo + int(np.flatnonzero(seg == seg.min())[0])
        cols[r] = c
    return cols, cost
