"""Halo exchange over the tile grid: flat_map edge strips -> groupby(cell).

The reference avoids halos by holding whole rasters in memory
(``calculate_bal.py:49-52``); at tile scale the directional scan needs up to
``filter_width`` pixels (4 at 25 m) of every neighbour, and the slope
gradient one more.  Each tile row is flat-mapped into at most 9
contributions -- its full payload to itself plus thin edge strips to each
compass neighbour -- keyed by the *receiving* cell id.  A single
``groupby(cell_id)`` shuffle then co-locates everything a tile needs; the
per-group assembler rebuilds a (tile + halo) window with global-pixel
placement, so downstream kernels see exactly the window a whole-raster run
would.

Shuffle volume is input * (1 + ~4*W/T): strips are thin relative to tiles
(8% at T=256, W=5), so the halo exchange costs about one extra pass over
the data -- the same order as any keyed repartition.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np

from ..tiles.codec import Caption, decode_tile

NODATA = -99.0


@dataclass(frozen=True)
class GridSpec:
    """Tile-grid geometry shared by every stage."""
    tiles_x: int
    tiles_y: int
    tile_px: int
    pixel_size: float
    y_north: float

    @classmethod
    def from_synth(cls, cfg) -> "GridSpec":
        return cls(cfg.tiles_x, cfg.tiles_y, cfg.tile_px, cfg.pixel_size,
                   cfg.y_north)

    @property
    def filter_width(self) -> int:
        """convo's 100 m reach in pixels (calculate_bal.py:169)."""
        return int(np.ceil(100.0 / self.pixel_size))

    @property
    def halo(self) -> int:
        """filter_width for the scan + 1 px for the slope gradient.

        Parity caveat: ``edge_fill_nodata`` forward-fills nodata regions
        from arbitrarily far away in the whole-raster reference, but a
        tiled window can only fill from within tile+halo.  Exact parity
        therefore requires interior nodata gaps narrower than the halo
        (the synthetic worlds satisfy this by construction); inputs with
        wide interior voids (lakes/ocean masks) need a larger halo --
        subclass/override this property, paying proportionally more
        shuffle volume."""
        return self.filter_width + 1

    def cell_id(self, tx: int, ty: int) -> int:
        return ty * self.tiles_x + tx

    def assembled_window(self, tx: int, ty: int):
        """Global pixel bounds [r0, r1), [c0, c1) of tile+halo, clipped to
        the raster so array edges coincide with true raster edges."""
        T, W = self.tile_px, self.halo
        r0 = max(0, ty * T - W)
        r1 = min(self.tiles_y * T, ty * T + T + W)
        c0 = max(0, tx * T - W)
        c1 = min(self.tiles_x * T, tx * T + T + W)
        return r0, r1, c0, c1


def _raw_bytes(arr: np.ndarray) -> bytes:
    """Strip payloads are internal to the shuffle: float32 put through a
    byte-plane shuffle (HDF5-style) + per-plane horizontal byte delta,
    then deflate-1.  On smooth DEM strips this is ~4.5x smaller AND
    faster to compress than deflating the raw float32 bytes (17.2 KB ->
    3.8 KB on a bench strip) -- the strips, not the pass-through tile
    payloads, dominate the halo shuffle's byte volume, which in turn
    dominates the sort stage's CPU.  Shape rides in the row's h/w
    columns, skipping any container header."""
    a = np.ascontiguousarray(arr, dtype=np.float32)
    planes = a.view(np.uint8).reshape(-1, 4).T.copy()
    planes[:, 1:] -= planes[:, :-1].copy()     # uint8 wraparound delta
    return zlib.compress(planes.tobytes(), 1)


def _raw_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Inverse of :func:`_raw_bytes`."""
    d = np.frombuffer(zlib.decompress(payload),
                      dtype=np.uint8).reshape(4, h * w)
    planes = np.cumsum(d, axis=1, dtype=np.uint8)   # wraps mod 256
    return np.ascontiguousarray(planes.T).view(np.float32).reshape(h, w)


def make_strip_emitter(spec: GridSpec):
    """Row -> contribution rows for the tile itself + its 8 neighbours.

    Self contributions pass the original encoded payload through untouched
    (no re-encode); neighbour strips are sliced and npy-packed.  Emitted
    rows carry global pixel placement so assembly is pure addition.
    """

    T = spec.tile_px

    def emit(row: dict) -> list[dict]:
        cap = Caption.from_json(row["caption"])
        tx, ty = cap.tx, cap.ty
        src_r0, src_c0 = ty * T, tx * T
        out = [{
            "cell_id": np.int64(spec.cell_id(tx, ty)),
            "layer": cap.layer,
            "row0": np.int32(src_r0), "col0": np.int32(src_c0),
            "h": row["h"], "w": row["w"],
            "payload": row["bytes"], "fmt": row["fmt"],
            "caption": row["caption"],
            "is_core": True,
        }]
        data = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx_, ny_ = tx + dx, ty + dy
                if not (0 <= nx_ < spec.tiles_x and 0 <= ny_ < spec.tiles_y):
                    continue
                r0, r1, c0, c1 = spec.assembled_window(nx_, ny_)
                ir0, ir1 = max(r0, src_r0), min(r1, src_r0 + T)
                ic0, ic1 = max(c0, src_c0), min(c1, src_c0 + T)
                if ir0 >= ir1 or ic0 >= ic1:
                    continue
                if data is None:
                    data = decode_tile(row["bytes"], row["fmt"], cap)
                strip = data[ir0 - src_r0:ir1 - src_r0,
                             ic0 - src_c0:ic1 - src_c0]
                out.append({
                    "cell_id": np.int64(spec.cell_id(nx_, ny_)),
                    "layer": cap.layer,
                    "row0": np.int32(ir0), "col0": np.int32(ic0),
                    "h": np.int32(ir1 - ir0), "w": np.int32(ic1 - ic0),
                    "payload": _raw_bytes(strip), "fmt": "rawz",
                    "caption": row["caption"],
                    "is_core": False,
                })
        return out

    return emit


def make_strip_emitter_batch(spec: GridSpec):
    """Batched strip emitter: one ``map_batches`` call per block, columnar
    output (pyarrow Table), no per-row plumbing -- the hot-path form of
    :func:`make_strip_emitter` (kept for row-level composition/tests)."""
    import pyarrow as pa

    emit = make_strip_emitter(spec)
    schema = pa.schema([
        ("cell_id", pa.int64()), ("layer", pa.string()),
        ("row0", pa.int32()), ("col0", pa.int32()),
        ("h", pa.int32()), ("w", pa.int32()),
        ("payload", pa.binary()), ("fmt", pa.string()),
        ("caption", pa.string()), ("is_core", pa.bool_()),
    ])

    def fn(batch: pa.Table) -> pa.Table:
        cols = {n: [] for n in schema.names}
        for row in batch.to_pylist():
            for out in emit(row):
                for n in schema.names:
                    cols[n].append(out[n])
        return pa.table(
            {n: pa.array(cols[n], schema.field(n).type)
             for n in schema.names}, schema=schema)

    return fn


def assemble_window(group: dict[str, list], spec: GridSpec, layer: str,
                    tx: int, ty: int) -> np.ndarray | None:
    """Rebuild the (tile + halo) pixel window for one layer from the
    contribution rows of a group.  Returns None when the layer's core tile
    is missing (partial datasets)."""
    r0, r1, c0, c1 = spec.assembled_window(tx, ty)
    # float32 end-to-end: tile payloads decode to float32 and every
    # downstream kernel runs in float32 -- a float64 canvas would double
    # the per-cell memory traffic, the binding resource at full core counts
    canvas = np.full((r1 - r0, c1 - c0), NODATA, dtype=np.float32)
    seen_core = False
    for i in range(len(group["layer"])):
        if group["layer"][i] != layer:
            continue
        if group["fmt"][i] == "rawz":
            arr = _raw_decode(group["payload"][i],
                              int(group["h"][i]), int(group["w"][i]))
        else:
            cap = Caption.from_json(group["caption"][i])
            arr = decode_tile(group["payload"][i], group["fmt"][i], cap)
        rr = int(group["row0"][i]) - r0
        cc = int(group["col0"][i]) - c0
        canvas[rr:rr + arr.shape[0], cc:cc + arr.shape[1]] = arr
        seen_core |= bool(group["is_core"][i])
    return canvas if seen_core else None
