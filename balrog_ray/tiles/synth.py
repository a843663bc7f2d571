"""Deterministic synthetic world: DEM + vegetation tiles, polygons, sites.

No external data: the DEM is an analytic surface (slopes spanning classes
1-6), vegetation is a deterministic set of class-1..7 polygons rasterized
onto the same grid, and everything derives from one seed.  Scale knobs match
FIXTURES.md: t1 smoke 4x4 tiles of 64 px, t2 correctness 16x16, bench 64x64
of 256 px.

The tile table's schema is the driver-mandated image+caption shape
(image_id, bytes, w, h, fmt, caption, phash).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..geo.cells import CellGrid
from ..geo.geometry import Polygon, rasterize
from ..geo.wkb import polygon_to_wkb
from .codec import Caption, encode_tile, phash64

NODATA = -99.0

VEG_NAMES = {1: "forest", 2: "woodland", 3: "shrubland", 4: "scrub",
             5: "mallee/mulga", 6: "rainforest", 7: "grassland"}

TILES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])


@dataclass(frozen=True)
class SynthConfig:
    tiles_x: int = 4
    tiles_y: int = 4
    tile_px: int = 64
    pixel_size: float = 25.0
    fmt: str = "npy"
    seed: int = 42
    n_polygons: int = 24
    nodata_patch: bool = True

    @property
    def world_px(self) -> tuple[int, int]:
        return self.tiles_y * self.tile_px, self.tiles_x * self.tile_px

    @property
    def y_north(self) -> float:
        return self.tiles_y * self.tile_px * self.pixel_size

    @property
    def grid(self) -> CellGrid:
        return CellGrid(x0=0.0, y0=self.y_north,
                        cell_size=self.tile_px * self.pixel_size,
                        nx=self.tiles_x, ny=self.tiles_y)


def dem_value(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Analytic DEM: smooth hills + a ramp so slope spans classes 1-6."""
    return (40.0 * np.sin(x / 500.0) + 30.0 * np.cos(y / 700.0)
            + x / 50.0 + 0.002 * y
            + 60.0 * np.exp(-(((x - 1500) ** 2 + (y - 1500) ** 2)
                              / (2 * 400.0 ** 2))))


def dem_window(cfg: SynthConfig, row0: int, col0: int, rows: int,
               cols: int) -> np.ndarray:
    """DEM pixels for a window in global pixel coordinates (row 0 = north)."""
    ps = cfg.pixel_size
    xs = (col0 + np.arange(cols) + 0.5) * ps
    ys = cfg.y_north - (row0 + np.arange(rows) + 0.5) * ps
    gx, gy = np.meshgrid(xs, ys)
    z = dem_value(gx, gy)
    if cfg.nodata_patch:
        # a small nodata hole in the interior of tile (1,1) -- kept shorter
        # than the halo width so tiled edge-fill matches the global fill
        pr0, pc0 = cfg.tile_px + cfg.tile_px // 3, cfg.tile_px + cfg.tile_px // 3
        rr = np.arange(row0, row0 + rows)
        cc = np.arange(col0, col0 + cols)
        rmask = (rr >= pr0) & (rr < pr0 + 3)
        cmask = (cc >= pc0) & (cc < pc0 + 4)
        z[np.ix_(rmask, cmask)] = NODATA
    return z


def make_veg_polygons(cfg: SynthConfig) -> list[dict]:
    """Deterministic vegetation polygons: rectangles and blobs of classes
    1-7 including (a) one huge skew polygon spanning many cells, (b) shapes
    crossing tile borders, (c) class 6 intentionally absent (empty-group
    case)."""
    rng = np.random.default_rng(cfg.seed)
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    H = cfg.tiles_y * cfg.tile_px * cfg.pixel_size
    polys = []
    gid = 1

    def add(poly: Polygon, cls: int):
        nonlocal gid
        polys.append({"gid": gid, "bal_number": cls,
                      "bal_name": VEG_NAMES[cls], "area_m2": poly.area,
                      "geom": polygon_to_wkb(poly), "poly": poly})
        gid += 1

    # the skew case: one huge forest polygon across ~half the world
    big = Polygon(np.array([[0.02 * W, 0.1 * H], [0.55 * W, 0.05 * H],
                            [0.6 * W, 0.45 * H], [0.25 * W, 0.5 * H],
                            [0.05 * W, 0.35 * H]]))
    add(big, 1)

    classes = [1, 2, 3, 4, 5, 7]   # class 6 (rainforest) left empty
    for i in range(cfg.n_polygons - 1):
        cls = classes[i % len(classes)]
        cx, cy = rng.uniform(0.05, 0.95, 2) * [W, H]
        if i % 3 == 0:       # rectangle (often crossing tile borders)
            w, h = rng.uniform(0.03, 0.12, 2) * [W, H]
            ring = np.array([[cx - w, cy - h], [cx + w, cy - h],
                             [cx + w, cy + h], [cx - w, cy + h]])
        else:                # irregular blob
            ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
            rad = rng.uniform(0.02, 0.08, 7) * min(W, H)
            ring = np.column_stack([cx + rad * np.cos(ang),
                                    cy + rad * np.sin(ang)])
        add(Polygon(ring), cls)
    return polys


def veg_polygon_table(cfg: SynthConfig) -> pa.Table:
    """F2 schema: gid, bal_number, bal_name, area_m2, geom (WKB)."""
    polys = make_veg_polygons(cfg)
    return pa.table({
        "gid": pa.array([p["gid"] for p in polys], pa.int64()),
        "bal_number": pa.array([p["bal_number"] for p in polys], pa.int16()),
        "bal_name": pa.array([p["bal_name"] for p in polys], pa.string()),
        "area_m2": pa.array([p["area_m2"] for p in polys], pa.float64()),
        "geom": pa.array([p["geom"] for p in polys], pa.binary()),
    })


def veg_window(cfg: SynthConfig, polys: list[dict], row0: int, col0: int,
               rows: int, cols: int) -> np.ndarray:
    """Vegetation classes rasterized for a pixel window (later gid wins)."""
    ps = cfg.pixel_size
    x0 = col0 * ps
    y0 = cfg.y_north - row0 * ps
    return rasterize([p["poly"] for p in polys],
                     [float(p["bal_number"]) for p in polys],
                     x0, y0, ps, rows, cols, fill=NODATA)


def tile_row(cfg: SynthConfig, layer: str, tx: int, ty: int,
             polys: list[dict] | None = None) -> dict:
    """One encoded tile row (pure function: callable from Ray tasks)."""
    T = cfg.tile_px
    row0, col0 = ty * T, tx * T
    if layer == "dem":
        data = dem_window(cfg, row0, col0, T, T)
    else:
        data = veg_window(cfg, polys if polys is not None
                          else make_veg_polygons(cfg), row0, col0, T, T)
    cap = Caption(layer=layer, x0=col0 * cfg.pixel_size,
                  y0=cfg.y_north - row0 * cfg.pixel_size,
                  pixel_size=cfg.pixel_size,
                  edge={"n": ty == 0, "s": ty == cfg.tiles_y - 1,
                        "w": tx == 0, "e": tx == cfg.tiles_x - 1},
                  tx=tx, ty=ty)
    payload, cap = encode_tile(data, cfg.fmt, cap)
    # phash is computed on the float32 cast: lossless decoders hand
    # back float32, and a block mean within float32 rounding of the
    # grand mean would otherwise flip a bit and falsely quarantine.
    return {"image_id": f"{layer}/{tx}/{ty}", "bytes": payload,
            "w": np.int32(T), "h": np.int32(T), "fmt": cfg.fmt,
            "caption": cap.to_json(),
            "phash": np.int64(phash64(data.astype(np.float32)))}


def tiles_table(cfg: SynthConfig, layers=("dem", "veg")) -> pa.Table:
    """Driver-side tile table (small scales; bench generation goes through
    Ray, see pipelines)."""
    polys = make_veg_polygons(cfg)
    rows = [tile_row(cfg, layer, tx, ty, polys)
            for layer in layers
            for ty in range(cfg.tiles_y)
            for tx in range(cfg.tiles_x)]
    cols = {name: [r[name] for r in rows] for name in TILES_SCHEMA.names}
    return pa.table(cols, schema=TILES_SCHEMA)


def global_arrays(cfg: SynthConfig) -> tuple[np.ndarray, np.ndarray]:
    """Whole-world DEM + veg arrays: the single-array oracle for parity
    tests (only sensible at test scales)."""
    rows, cols = cfg.world_px
    dem = dem_window(cfg, 0, 0, rows, cols)
    veg = veg_window(cfg, make_veg_polygons(cfg), 0, 0, rows, cols)
    return dem, veg


def sites_table(cfg: SynthConfig, n: int = 64) -> pa.Table:
    """Deterministic probe sites (F9): id, lon/lat as planar x/y."""
    rng = np.random.default_rng(cfg.seed + 1)
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    H = cfg.tiles_y * cfg.tile_px * cfg.pixel_size
    # include a couple of out-of-window sites for the -9999 path
    x = np.concatenate([rng.uniform(0, W, n - 2), [-0.1 * W, 1.1 * W]])
    y = np.concatenate([rng.uniform(0, H, n - 2), [0.5 * H, -0.2 * H]])
    return pa.table({
        "site_id": pa.array([f"s{i:05d}" for i in range(n)], pa.string()),
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
    })


def raw_nvis_table(cfg: SynthConfig) -> pa.Table:
    """Raw vegetation input for the prep pipeline (veg_prep.py): the
    pre-classification shape of the reference's NVIS import -- multipolygon
    WKB rows carrying an NVIS major-vegetation-group number, including MVGs
    that map to 'not applicable' (24/25/27/28, the mangrove-fix family)."""
    from ..geo.geometry import Polygon
    from ..geo.wkb import multipolygon_to_wkb

    polys = [p for p in make_veg_polygons(cfg)]
    rows = {"src_id": [], "mvg_number": [], "geom": []}
    i, src = 0, 0
    while i < len(polys):
        k = 1 + (src % 3)                # 1..3 parts per multipolygon
        parts = []
        for p in polys[i:i + k]:
            from ..geo.wkb import from_wkb
            g = from_wkb(p["geom"])
            parts.extend(g if isinstance(g, list) else [g])
        # throw in a degenerate sliver part (validity-fix path)
        if src % 4 == 0:
            parts.append(Polygon(np.array([[0.0, 0.0], [1.0, 0.0],
                                           [2.0, 0.0]])))
        rows["src_id"].append(src)
        rows["mvg_number"].append((src % 32) + 1)
        rows["geom"].append(multipolygon_to_wkb(parts))
        i += k
        src += 1
    return pa.table({
        "src_id": pa.array(rows["src_id"], pa.int64()),
        "mvg_number": pa.array(rows["mvg_number"], pa.int32()),
        "geom": pa.array(rows["geom"], pa.binary()),
    })


# ---------------------------------------------------------------- temporal

def epoch_dem_window(cfg: SynthConfig, epoch: int, row0: int, col0: int,
                     rows: int, cols: int) -> np.ndarray:
    """Epoch ``epoch`` of the synthetic DEM time series: the base DEM plus
    a smooth epoch-dependent perturbation, with a per-epoch moving
    rectangular nodata "cloud" (so temporal composites must skip invalid
    epochs per pixel).  The base nodata patch recurs in EVERY epoch, so
    those pixels are invalid across the whole stack (the all-nodata
    output case)."""
    z = dem_window(cfg, row0, col0, rows, cols)
    ps = cfg.pixel_size
    xs = (col0 + np.arange(cols) + 0.5) * ps
    ys = cfg.y_north - (row0 + np.arange(rows) + 0.5) * ps
    gx, gy = np.meshgrid(xs, ys)
    pert = (3.0 * np.sin(gx / 350.0 + epoch * 0.7)
            + 2.0 * np.cos(gy / 450.0 - epoch * 0.4) + 0.5 * epoch)
    z = np.where(z == NODATA, NODATA, z + pert)
    # moving cloud: an 8x10-pixel nodata rectangle per epoch
    wr, wc = cfg.world_px
    cr0 = (epoch * 29 + 5) % max(wr - 8, 1)
    cc0 = (epoch * 41 + 11) % max(wc - 10, 1)
    rr = np.arange(row0, row0 + rows)
    cc = np.arange(col0, col0 + cols)
    rmask = (rr >= cr0) & (rr < cr0 + 8)
    cmask = (cc >= cc0) & (cc < cc0 + 10)
    z[np.ix_(rmask, cmask)] = NODATA
    return z


def temporal_tiles_table(cfg: SynthConfig, n_epochs: int) -> pa.Table:
    """Multi-epoch tile table: the standard TILES_SCHEMA plus an ``epoch``
    int64 column, one encoded DEM tile per (epoch, cell)."""
    from .codec import Caption, encode_tile, phash64

    T = cfg.tile_px
    rows = []
    for epoch in range(n_epochs):
        for ty in range(cfg.tiles_y):
            for tx in range(cfg.tiles_x):
                data = epoch_dem_window(cfg, epoch, ty * T, tx * T, T, T)
                cap = Caption(
                    layer="dem", x0=tx * T * cfg.pixel_size,
                    y0=cfg.y_north - ty * T * cfg.pixel_size,
                    pixel_size=cfg.pixel_size,
                    edge={"n": ty == 0, "s": ty == cfg.tiles_y - 1,
                          "w": tx == 0, "e": tx == cfg.tiles_x - 1},
                    tx=tx, ty=ty)
                payload, cap = encode_tile(data, cfg.fmt, cap)
                rows.append({"image_id": f"dem/e{epoch}/{tx}/{ty}",
                             "bytes": payload, "w": np.int32(T),
                             "h": np.int32(T), "fmt": cfg.fmt,
                             "caption": cap.to_json(),
                             "phash": np.int64(phash64(data.astype(np.float32))),
                             "epoch": np.int64(epoch)})
    schema = TILES_SCHEMA.append(pa.field("epoch", pa.int64()))
    cols = {name: [r[name] for r in rows] for name in schema.names}
    return pa.table(cols, schema=schema)


# ------------------------------------------------------------- acquisitions

def source_tile_range(cfg: SynthConfig, source: int,
                      n_sources: int) -> tuple[int, int]:
    """Tile-row span ``[ty_first, ty_last]`` of acquisition ``source``:
    horizontal bands, each ~half the world tall, staggered so every
    adjacent pair overlaps (the swath-overlap layout a satellite
    mosaic sees)."""
    step = max(1, cfg.tiles_y // max(n_sources, 1))
    depth = max(2, cfg.tiles_y // 2)
    ty0 = min(source * step, max(cfg.tiles_y - 1, 0))
    return ty0, min(cfg.tiles_y - 1, ty0 + depth - 1)


def acquisition_tiles_table(cfg: SynthConfig, n_sources: int) -> pa.Table:
    """Overlapping-acquisition tile table for mosaic blending: standard
    ``TILES_SCHEMA`` plus a ``source`` int64 column.  Acquisition ``s``
    delivers the tiles of its :func:`source_tile_range` band, valued by
    :func:`epoch_dem_window` (epoch := source) -- so overlap zones
    genuinely DISAGREE between sources and each acquisition carries its
    own moving nodata cloud."""
    from .codec import Caption, encode_tile, phash64

    T = cfg.tile_px
    rows = []
    for s in range(n_sources):
        ty0, ty1 = source_tile_range(cfg, s, n_sources)
        for ty in range(ty0, ty1 + 1):
            for tx in range(cfg.tiles_x):
                data = epoch_dem_window(cfg, s, ty * T, tx * T, T, T)
                cap = Caption(
                    layer="dem", x0=tx * T * cfg.pixel_size,
                    y0=cfg.y_north - ty * T * cfg.pixel_size,
                    pixel_size=cfg.pixel_size,
                    edge={"n": ty == ty0, "s": ty == ty1,
                          "w": tx == 0, "e": tx == cfg.tiles_x - 1},
                    tx=tx, ty=ty)
                payload, cap = encode_tile(data, cfg.fmt, cap)
                rows.append({"image_id": f"dem/s{s}/{tx}/{ty}",
                             "bytes": payload, "w": np.int32(T),
                             "h": np.int32(T), "fmt": cfg.fmt,
                             "caption": cap.to_json(),
                             "phash": np.int64(phash64(data.astype(np.float32))),
                             "source": np.int64(s)})
    schema = TILES_SCHEMA.append(pa.field("source", pa.int64()))
    cols = {name: [r[name] for r in rows] for name in schema.names}
    return pa.table(cols, schema=schema)


def boxes_table(cfg: SynthConfig, *, per_image: int = 24,
                n_classes: int = 3) -> pa.Table:
    """Deterministic detection boxes over the tile images (pixel
    coords): clustered around a few anchors per image so greedy NMS has
    real overlap groups, plus duplicated-score pairs (tie-break path)
    and one degenerate zero-area box per image."""
    rng = np.random.default_rng(cfg.seed + 9)
    T = cfg.tile_px
    rows = {"image_id": [], "box_id": [], "cls": [], "score": [],
            "x0": [], "y0": [], "x1": [], "y1": []}
    bid = 0
    for ty in range(cfg.tiles_y):
        for tx in range(cfg.tiles_x):
            img = f"dem/{tx}/{ty}"
            anchors = rng.uniform(0.15 * T, 0.85 * T, (4, 2))
            for j in range(per_image):
                ax, ay = anchors[j % 4]
                cx = ax + rng.normal(0, 0.03 * T)
                cy = ay + rng.normal(0, 0.03 * T)
                w = rng.uniform(0.08 * T, 0.3 * T)
                h = rng.uniform(0.08 * T, 0.3 * T)
                if j == per_image - 1:
                    w = h = 0.0                    # degenerate box
                score = round(float(rng.uniform(0.05, 0.99)), 2)
                if j % 7 == 3:
                    score = 0.5                    # duplicate scores
                rows["image_id"].append(img)
                rows["box_id"].append(bid)
                rows["cls"].append(int(j % n_classes))
                rows["score"].append(score)
                rows["x0"].append(float(cx - w / 2))
                rows["y0"].append(float(cy - h / 2))
                rows["x1"].append(float(cx + w / 2))
                rows["y1"].append(float(cy + h / 2))
                bid += 1
    return pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "box_id": pa.array(rows["box_id"], pa.int64()),
        "cls": pa.array(rows["cls"], pa.int32()),
        "score": pa.array(rows["score"], pa.float64()),
        "x0": pa.array(rows["x0"], pa.float64()),
        "y0": pa.array(rows["y0"], pa.float64()),
        "x1": pa.array(rows["x1"], pa.float64()),
        "y1": pa.array(rows["y1"], pa.float64())})


def pred_boxes_table(cfg: SynthConfig, *, per_image: int = 24,
                     n_classes: int = 3, drop_every: int = 5,
                     fp_per_image: int = 2) -> pa.Table:
    """Deterministic 'detector output' paired with :func:`boxes_table`:
    every truth box except each ``drop_every``-th reappears jittered
    with a fresh score (so matching sees TPs and localization error),
    plus ``fp_per_image`` far-away pure false positives per image.
    Dropped truths become the FN rows of ``match_boxes``."""
    truth = boxes_table(cfg, per_image=per_image, n_classes=n_classes)
    rng = np.random.default_rng(cfg.seed + 17)
    cols = {c: truth.column(c).to_pylist() for c in truth.schema.names}
    out = {k: [] for k in cols}
    bid = 1_000_000
    for i in range(truth.num_rows):
        if i % drop_every == drop_every - 1:
            continue
        for c in truth.schema.names:
            out[c].append(cols[c][i])
        out["box_id"][-1] = bid
        out["score"][-1] = round(float(rng.uniform(0.2, 0.99)), 2)
        for c in ("x0", "y0", "x1", "y1"):
            out[c][-1] = out[c][-1] + float(rng.normal(0, 0.6))
        bid += 1
    for img in sorted(set(cols["image_id"])):
        for _ in range(fp_per_image):
            x, y = rng.uniform(0.0, 20.0, 2)
            out["image_id"].append(img)
            out["box_id"].append(bid)
            out["cls"].append(0)
            out["score"].append(0.9)
            out["x0"].append(float(x + 100.0))
            out["y0"].append(float(y + 100.0))
            out["x1"].append(float(x + 104.0))
            out["y1"].append(float(y + 104.0))
            bid += 1
    return pa.table({k: pa.array(v, truth.schema.field(k).type)
                     for k, v in out.items()})
