"""End-to-end Ray-Data BAL pipeline.

Dataflow (all streaming, one all-to-all shuffle):

    read tiles (dem + veg layers)
      -> map_batches: strip emitter (self payload + 8 halo strips, keyed by
         receiving cell)                                  [stages/halo.py]
      -> groupby(cell_id).map_groups: assemble tile+halo window ->
         slope/aspect (gradient + nodata fill) -> reclass (aspect 9-class,
         slope 6-class, optional veg remap) -> directional convo x8 ->
         max -> encode 9 BAL bands                        [core/kernels.py]
      -> (optional) per-partition parquet + lineage rows  [checkpoint]

Numeric semantics are the reference's exactly (see core/ docstrings); the
*shape* is idiomatic Ray Data: the per-pixel loops of
``calculate_bal.py:179-218`` become shifted-array LUT gathers inside one
``map_groups`` stage, and the whole-raster in-memory model becomes a keyed
halo exchange.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..core.kernels import DIRECTIONS, compute_bal, slope_aspect
from ..core.remap import ASPECT_RECLASS, apply_remap, parse_remap, slope_reclass
from ..tiles.codec import Caption, encode_palz_codes, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from ..stages.halo import (GridSpec, assemble_window,
                           make_strip_emitter_batch)

ALL_BANDS = DIRECTIONS + ("max",)

#: BAL numeric value -> band label (raw numerics are kept for parity; the
#: 100 rating is the closest distance class, 200 the steep-downslope flame
#: zone -- calculate_bal.py:271, bal_database.py:179-184)
BAL_LABELS = {-99.0: "NODATA", 12.5: "BAL-12.5", 19.0: "BAL-19",
              29.0: "BAL-29", 40.0: "BAL-40", 100.0: "BAL-FZ",
              200.0: "BAL-FZ"}

#: the only values a BAL band can hold -- the palz codec's fixed palette
BAL_PALETTE = np.array(sorted(BAL_LABELS), dtype=np.float32)

LINEAGE_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("input_rows", pa.int64()),
    ("output_rows", pa.int64()),
    ("checksum", pa.int64()),
    ("status", pa.string()),
])


def find_aoi(extent: str | tuple | None, spec: GridSpec):
    """Effective area of interest as (xmin, ymin, xmax, ymax).

    Reference semantics (bal.py:281-323): DEFAULT/MAXOF/MINOF intersect the
    DEM and veg footprints -- in the single-table model both layers share
    the grid, so that intersection IS the grid bbox; any other extent is a
    user rectangle ("xmin ymin xmax ymax", bal.py:233-256) clipped to it.
    """
    gx0, gy1 = 0.0, spec.y_north
    gx1 = spec.tiles_x * spec.tile_px * spec.pixel_size
    gy0 = spec.y_north - spec.tiles_y * spec.tile_px * spec.pixel_size
    if extent is None or (isinstance(extent, str)
                          and extent.upper() in ("DEFAULT", "MAXOF", "MINOF")):
        return (gx0, gy0, gx1, gy1)
    if isinstance(extent, str):
        xmin, ymin, xmax, ymax = (float(v) for v in extent.split())
    else:
        xmin, ymin, xmax, ymax = extent
    box = (max(xmin, gx0), max(ymin, gy0), min(xmax, gx1), min(ymax, gy1))
    if box[0] >= box[2] or box[1] >= box[3]:
        raise ValueError(f"AOI {extent!r} does not intersect the grid")
    return box


def layer_footprint(tiles_ds) -> tuple:
    """(xmin, ymin, xmax, ymax) footprint of a tile layer, from the tile
    CAPTIONS via a tiny distributed min/max aggregate -- no pixel payload
    moves (the reference's get_footprint, bal.py:301-304, for the
    rectangular-mosaic case its rasters actually are)."""
    import ray.data.aggregate as agg

    def tile_bbox(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption
        caps = [Caption.from_json(c)
                for c in b.column("caption").to_pylist()]
        if not caps:
            return pa.table({"xmin": pa.array([], pa.float64()),
                             "ymin": pa.array([], pa.float64()),
                             "xmax": pa.array([], pa.float64()),
                             "ymax": pa.array([], pa.float64())})
        w = b.column("w").to_numpy()
        h = b.column("h").to_numpy()
        x0 = np.array([c.x0 for c in caps])
        y0 = np.array([c.y0 for c in caps])
        ps = np.array([c.pixel_size for c in caps])
        return pa.table({
            "xmin": pa.array([float(x0.min())], pa.float64()),
            "ymin": pa.array([float((y0 - h * ps).min())], pa.float64()),
            "xmax": pa.array([float((x0 + w * ps).max())], pa.float64()),
            "ymax": pa.array([float(y0.max())], pa.float64())})

    row = (tiles_ds.select_columns(["caption", "w", "h"])
           .map_batches(tile_bbox, batch_format="pyarrow")
           .aggregate(agg.Min("xmin", alias_name="xmin"),
                      agg.Min("ymin", alias_name="ymin"),
                      agg.Max("xmax", alias_name="xmax"),
                      agg.Max("ymax", alias_name="ymax")))
    return (row["xmin"], row["ymin"], row["xmax"], row["ymax"])


def find_common_area(spec: GridSpec, veg_ds) -> tuple:
    """Common footprint of the DEM grid and an (off-grid) veg tile layer
    -- the reference's DEFAULT/MAXOF/MINOF footprint intersection
    (bal.py:281-323, Intersect_analysis of the two raster footprints).
    Returns an (xmin, ymin, xmax, ymax) extent for
    ``bal_pipeline(extent=...)``; raises if the footprints are disjoint.
    """
    vx0, vy0, vx1, vy1 = layer_footprint(veg_ds)
    gx0, gy0, gx1, gy1 = find_aoi(None, spec)      # the grid bbox
    box = (max(vx0, gx0), max(vy0, gy0), min(vx1, gx1), min(vy1, gy1))
    if box[0] >= box[2] or box[1] >= box[3]:
        raise ValueError("DEM and veg footprints do not intersect")
    return box




def _aoi_cells(aoi, spec: GridSpec) -> np.ndarray:
    """Cell ids whose tile bbox intersects the AOI rectangle."""
    T, ps = spec.tile_px, spec.pixel_size
    xmin, ymin, xmax, ymax = aoi
    tx0 = max(0, int(np.floor(xmin / (T * ps))))
    tx1 = min(spec.tiles_x - 1, int(np.ceil(xmax / (T * ps)) - 1e-9))
    ty0 = max(0, int(np.floor((spec.y_north - ymax) / (T * ps))))
    ty1 = min(spec.tiles_y - 1, int(np.ceil((spec.y_north - ymin)
                                            / (T * ps)) - 1e-9))
    return np.array(sorted(
        spec.cell_id(tx, ty)
        for ty in range(ty0, ty1 + 1) for tx in range(tx0, tx1 + 1)),
        dtype=np.int64)


def make_bal_group_fn(spec: GridSpec, fdi: int = 80,
                      veg_remap: str | None = None, fmt: str = "palz",
                      bands=ALL_BANDS, out_dir: str | None = None,
                      aoi=None, mask_polys=None, veg_cells=None):
    """Per-cell compute: contributions table -> BAL tile rows (or, when
    ``out_dir`` is set, writes the rows itself and returns a lineage row)."""
    aspect_spec = parse_remap(ASPECT_RECLASS)
    slope_spec = parse_remap(slope_reclass())
    veg_spec = parse_remap(veg_remap) if veg_remap else None
    T, ps = spec.tile_px, spec.pixel_size

    def fn(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        cell = int(g["cell_id"][0])
        tx, ty = cell % spec.tiles_x, cell // spec.tiles_x
        # Completeness gate: every in-grid neighbour tile must have sent its
        # strip for BOTH layers, else the halo would silently degrade to
        # nodata padding and a resumed run would commit wrong pixels.
        # With a partially-covering regridded veg layer (veg_cells set),
        # the veg expectation counts only neighbours the regrid stage
        # actually emits a veg tile for -- an uncovered neighbour sends
        # dem strips but can never send a veg strip.
        neigh = [spec.cell_id(tx + dx, ty + dy)
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                 if 0 <= tx + dx < spec.tiles_x
                 and 0 <= ty + dy < spec.tiles_y]
        expected = {"dem": len(neigh), "veg": len(neigh)}
        if veg_cells is not None:
            expected["veg"] = int(np.isin(
                np.array(neigh, dtype=np.int64), veg_cells).sum())
        complete = all(g["layer"].count(layer) == expected[layer]
                       for layer in ("dem", "veg"))
        dem = assemble_window(g, spec, "dem", tx, ty) if complete else None
        veg = assemble_window(g, spec, "veg", tx, ty) if complete else None
        if dem is None or veg is None:
            return pa.table({n: [] for n in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA) if out_dir is None else \
                pa.table({n: [] for n in LINEAGE_SCHEMA.names},
                         schema=LINEAGE_SCHEMA)

        slope, aspect = slope_aspect(dem, ps, ps)
        aspect_c = apply_remap(aspect, aspect_spec).astype(np.float32)
        slope_c = apply_remap(slope, slope_spec).astype(np.float32)
        veg_c = (apply_remap(veg, veg_spec).astype(np.float32)
                 if veg_spec else veg)

        # compute only the core tile of the assembled window: neighbour
        # reads still span the halo, but the ~25% of gather/max work that
        # produced halo-row outputs (sliced away below) is skipped.
        # palz output runs the whole scan in uint8 palette-INDEX domain
        # (4x less gather/max traffic, bit-identical values -- see convo)
        # and feeds the codes straight to the codec.
        use_idx = fmt == "palz"
        r0, _, c0, _ = spec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0
        grids = compute_bal(veg_c, slope_c, aspect_c, ps, fdi,
                            out_window=(rs, rs + T, cs, cs + T),
                            index_palette=BAL_PALETTE if use_idx else None)

        # extract_by_mask semantics (sa_tools.py:48-136): pixels outside the
        # AOI rectangle become nodata in every output band
        aoi_mask = None
        if aoi is not None:
            xs = tx * T * ps + (np.arange(T) + 0.5) * ps
            ys = spec.y_north - ty * T * ps - (np.arange(T) + 0.5) * ps
            inside_x = (xs >= aoi[0]) & (xs <= aoi[2])
            inside_y = (ys >= aoi[1]) & (ys <= aoi[3])
            aoi_mask = ~(inside_y[:, None] & inside_x[None, :])
            # NB: keep the mask even when it covers the whole tile -- a
            # sub-pixel AOI sliver intersects the tile bbox (so the cell
            # survives the prune) yet contains no pixel centers, and must
            # emit an all-nodata tile, not an unmasked one
        if mask_polys is not None:
            # arbitrary-polygon extract_by_mask (sa_tools.py:48-136):
            # pixel centers outside every mask polygon become nodata
            from ..geo.geometry import rasterize
            inside = rasterize(mask_polys, [1.0] * len(mask_polys),
                               tx * T * ps, spec.y_north - ty * T * ps,
                               ps, T, T, fill=0.0)
            pm = inside == 0.0
            aoi_mask = pm if aoi_mask is None else (aoi_mask | pm)
        rows = {n: [] for n in TILES_SCHEMA.names}
        for band in bands:
            core = grids[band]
            if aoi_mask is not None:
                # index 0 IS the -99 palette entry on the palz path
                core = np.where(aoi_mask, np.uint8(0), core) if use_idx \
                    else np.where(aoi_mask, -99.0, core)
            cap = Caption(layer=f"bal_{band}", x0=tx * T * ps,
                          y0=spec.y_north - ty * T * ps, pixel_size=ps,
                          edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                                "w": tx == 0, "e": tx == spec.tiles_x - 1},
                          tx=tx, ty=ty)
            if use_idx:
                payload, cap = encode_palz_codes(core, BAL_PALETTE, cap)
                core = BAL_PALETTE[core]     # float view for phash only
            else:
                payload, cap = encode_tile(core, fmt, cap)
            rows["image_id"].append(f"bal_{band}/{tx}/{ty}")
            rows["bytes"].append(payload)
            rows["w"].append(T)
            rows["h"].append(T)
            rows["fmt"].append(fmt)
            rows["caption"].append(cap.to_json())
            rows["phash"].append(phash64(core))
        out = pa.table(rows, schema=TILES_SCHEMA)

        if out_dir is None:
            return out
        # checkpointed mode: partitioned write + lineage row (F10)
        part_dir = os.path.join(out_dir, f"cell={cell}")
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, "bands.parquet.tmp")
        final = os.path.join(part_dir, "bands.parquet")
        pq.write_table(out, tmp)
        os.replace(tmp, final)          # atomic per-partition commit
        checksum = np.int64(np.bitwise_xor.reduce(
            np.array(rows["phash"], dtype=np.int64)))
        crc = zlib.crc32(b"".join(rows["bytes"])) & 0x7FFFFFFF
        return pa.table({
            "cell_id": [cell], "tx": [tx], "ty": [ty],
            "input_rows": [group.num_rows], "output_rows": [out.num_rows],
            "checksum": [int(checksum) ^ crc], "status": ["done"],
        }, schema=LINEAGE_SCHEMA)

    return fn


def completed_cells(out_dir: str) -> set[int]:
    """Cells with a committed partition file (resume anti-join input)."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("cell=") and os.path.exists(
                os.path.join(out_dir, name, "bands.parquet")):
            done.add(int(name.split("=")[1]))
    return done


def plan_target_cells(spec: GridSpec, *, extent=None, mask=None,
                      veg_meta=None):
    """The exact cell set a ``bal_pipeline`` run with these arguments
    targets: AOI rectangle ∩ mask bboxes ∩ off-grid-veg coverage.  Kept
    next to ``bal_pipeline`` so the CLI completeness summary cannot
    diverge from the pipeline's own pruning (with ``veg_meta`` and no
    explicit extent, the effective AOI is the common footprint and cells
    the veg mosaic never covers are NOT targets)."""
    import numpy as np

    veg_cells = None
    default = extent is None or (isinstance(extent, str)
                                 and extent.upper() in ("DEFAULT", "MAXOF",
                                                        "MINOF"))
    if veg_meta is not None:
        from ..stages.regrid import covered_target_cells

        if default:
            extent = find_common_area(spec, veg_meta)
            default = False
        veg_cells = covered_target_cells(spec, veg_meta)
    if default:
        target = np.arange(spec.tiles_x * spec.tiles_y, dtype=np.int64)
    else:
        target = _aoi_cells(find_aoi(extent, spec), spec)
    if mask is not None:
        target = np.intersect1d(target,
                                _mask_cells(_as_mask_polys(mask), spec))
    if veg_cells is not None:
        target = np.intersect1d(target, veg_cells)
    return target


def _as_mask_polys(mask) -> list:
    """Normalize a mask argument (WKB bytes, Polygon, or list) to parts."""
    from ..geo.geometry import Polygon
    from ..geo.wkb import from_wkb

    if isinstance(mask, (bytes, bytearray)):
        mask = from_wkb(bytes(mask))
    if isinstance(mask, Polygon):
        return [mask]
    return list(mask)


def _mask_cells(polys, spec: GridSpec) -> np.ndarray:
    """Cells whose tile bbox intersects any mask part's bbox."""
    cells: set[int] = set()
    for p in polys:
        bb = p.bbox
        try:
            box = find_aoi((bb[0], bb[1], bb[2], bb[3]), spec)
        except ValueError:
            continue
        cells.update(_aoi_cells(box, spec).tolist())
    return np.array(sorted(cells), dtype=np.int64)


def bal_pipeline(tiles_ds, spec: GridSpec, fdi: int = 80,
                 veg_remap: str | None = None, fmt: str = "palz",
                 bands=ALL_BANDS, out_dir: str | None = None,
                 resume: bool = False, extent=None, veg_ds=None,
                 mask=None):
    """Build the lazy BAL Dataset.

    Returns a Dataset of BAL tile rows (TILES_SCHEMA) when ``out_dir`` is
    None, else a Dataset of lineage rows (LINEAGE_SCHEMA) whose side effect
    is the partitioned parquet output under ``out_dir``; with ``resume``
    already-committed cells are skipped before the shuffle.  ``extent``
    (find_aoi semantics) restricts output to an AOI rectangle: cells outside
    it never enter the shuffle, edge pixels are masked to nodata.
    ``veg_ds``: a vegetation tile Dataset on a DIFFERENT grid/resolution --
    it is nearest-neighbour resampled onto ``spec`` (the reference's
    ProjectRaster step, bal.py:55-57) and unioned with ``tiles_ds``, which
    then must carry only the dem layer.
    ``mask``: arbitrary-polygon extract_by_mask (sa_tools.py:48-136) -- WKB
    bytes, a Polygon, or a list of parts; cells outside the mask bboxes are
    pruned before the shuffle and pixels outside the polygons become
    nodata.  Composes with ``extent`` (intersection).
    """
    veg_cells = None
    if veg_ds is not None:
        from ..stages.regrid import covered_target_cells, regrid_to_grid

        # ONE materialized metadata pass (captions + shapes only, columns
        # pruned at the read) feeds both the footprint intersection and
        # the coverage set; the full-payload scan happens exactly once,
        # inside regrid
        veg_meta = (veg_ds.select_columns(["caption", "w", "h"])
                    .materialize())
        common = find_common_area(spec, veg_meta)
        if extent is None or (isinstance(extent, str) and extent.upper()
                              in ("DEFAULT", "MAXOF", "MINOF")):
            # reference find_aoi: the effective AOI of a multi-layer run
            # is the footprint INTERSECTION (bal.py:281-323) -- cells the
            # off-grid veg layer never covers are pruned before the
            # shuffle instead of computing all-nodata tiles
            extent = common
        # per-source-tile coverage, NOT the hull bbox: a hole in a
        # non-rectangular veg mosaic must count as uncovered or the gate
        # waits forever for its veg strip and drops the neighbourhood
        veg_cells = covered_target_cells(spec, veg_meta)
        tiles_ds = tiles_ds.union(regrid_to_grid(veg_ds, spec, layer="veg"))
    if spec.halo > spec.tile_px:
        raise ValueError(
            f"halo ({spec.halo}px) exceeds tile size ({spec.tile_px}px): "
            "the strip emitter only reaches the 8 adjacent tiles, so this "
            "grid would assemble windows with silent nodata padding -- use "
            "larger tiles or a finer pixel size")
    aoi = None
    mask_polys = None
    keep_cells = None
    if extent is not None:
        aoi = find_aoi(extent, spec)
        keep_cells = _aoi_cells(aoi, spec)
    if veg_cells is not None:
        # a sliver cell whose bbox clips the AOI but holds no covered
        # pixel CENTER never receives its own regridded veg tile; it is
        # (sub-pixel) outside the common area -- prune it
        keep_cells = veg_cells if keep_cells is None \
            else np.intersect1d(keep_cells, veg_cells)
    if mask is not None:
        mask_polys = _as_mask_polys(mask)
        mcells = _mask_cells(mask_polys, spec)
        keep_cells = mcells if keep_cells is None \
            else np.intersect1d(keep_cells, mcells)
    if keep_cells is not None and keep_cells.size == 0:
        raise ValueError("AOI mask does not intersect the grid")
    if keep_cells is not None:
        # prune input tiles BEFORE the strip emitter: a tile contributes
        # only if it or one of its 8 neighbours is an AOI cell
        kx = keep_cells % spec.tiles_x
        ky = keep_cells // spec.tiles_x
        contributors = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx_, ny_ = kx + dx, ky + dy
                ok = ((nx_ >= 0) & (nx_ < spec.tiles_x)
                      & (ny_ >= 0) & (ny_ < spec.tiles_y))
                contributors.update(
                    (ny_[ok] * spec.tiles_x + nx_[ok]).tolist())
        contrib_arr = np.array(sorted(contributors), dtype=np.int64)
        keep_arr = keep_cells

        def prune_tiles(batch: pa.Table) -> pa.Table:
            caps = [Caption.from_json(c)
                    for c in batch.column("caption").to_pylist()]
            cells = np.array([spec.cell_id(c.tx, c.ty) for c in caps],
                             dtype=np.int64)
            return batch.filter(pa.array(np.isin(cells, contrib_arr)))

        tiles_ds = tiles_ds.map_batches(prune_tiles, batch_format="pyarrow")

    contrib = tiles_ds.map_batches(make_strip_emitter_batch(spec),
                                   batch_format="pyarrow")
    if keep_cells is not None:
        def drop_non_aoi(batch: pa.Table) -> pa.Table:
            keep = np.isin(batch.column("cell_id").to_numpy(), keep_arr)
            return batch.filter(pa.array(keep))

        contrib = contrib.map_batches(drop_non_aoi, batch_format="pyarrow")
    if out_dir is not None and resume:
        done = completed_cells(out_dir)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int64)

            def drop_done(batch: pa.Table) -> pa.Table:
                keep = ~np.isin(batch.column("cell_id").to_numpy(), done_arr)
                return batch.filter(pa.array(keep))

            contrib = contrib.map_batches(drop_done, batch_format="pyarrow")
    fn = make_bal_group_fn(spec, fdi, veg_remap, fmt, bands, out_dir, aoi,
                           mask_polys, veg_cells)
    return contrib.groupby("cell_id").map_groups(fn, batch_format="pyarrow")


def band_histogram(bal_ds):
    """Per-band pixel histogram over BAL values -- the pyramids/statistics
    analogue (calculate_bal.py:89-91) as a streaming aggregate: per-tile
    partial counts inside map_batches, then one tiny groupby."""
    values = np.array([-99.0, 12.5, 19.0, 29.0, 40.0, 100.0, 200.0])

    def partial(batch: pa.Table) -> pa.Table:
        out = {"band": [], "value": [], "pixels": []}
        for row in batch.to_pylist():
            cap = Caption.from_json(row["caption"])
            from ..tiles.codec import decode_tile
            arr = decode_tile(row["bytes"], row["fmt"], cap)
            band = cap.layer.split("_", 1)[1]
            for v in values:
                n = int((arr == np.float32(v)).sum())
                if n:
                    out["band"].append(band)
                    out["value"].append(float(v))
                    out["pixels"].append(n)
        return pa.table(out)

    import ray.data.aggregate as agg
    return (bal_ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["band", "value"])
            .aggregate(agg.Sum("pixels", alias_name="pixels")))
