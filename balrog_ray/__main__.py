"""CLI: the toolbox-run surface of the engine (reference op 21,
``bal.py:326-371`` -- six toolbox params become flags).

    python -m balrog_ray synth --out /tmp/tiles --tiles-x 8 --tiles-y 8
    python -m balrog_ray bal --tiles /tmp/tiles --out /tmp/bal \
        [--fdi 80] [--extent "xmin ymin xmax ymax" | DEFAULT] \
        [--mask-wkb mask.wkb] [--veg-tiles /other/grid/veg] \
        [--veg-remap "1 1 1;..."] [--fmt palz] [--resume]

``bal`` reads any image+caption tile table (layers ``dem`` + ``veg``),
infers the grid from the captions, runs the streaming BAL pipeline and
writes partitioned parquet (cell=N/bands.parquet) plus a lineage table --
re-running with ``--resume`` skips committed cells.  ``--mask-wkb``
restricts output to an arbitrary polygon AOI (extract_by_mask);
``--veg-tiles`` points at a vegetation tile table on a DIFFERENT
grid/resolution, nearest-neighbour resampled onto the DEM grid
(ProjectRaster, reference bal.py:55-57).
"""

from __future__ import annotations

import os

# single-threaded BLAS before numpy loads (see bench.py rationale)
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import argparse
import json
import sys
import time


def infer_grid(path: str):
    """GridSpec from the table's own captions (self-describing rows)."""
    import pyarrow.dataset as pads

    from .stages.halo import GridSpec
    from .tiles.codec import Caption

    tab = pads.dataset(path, format="parquet").to_table(
        columns=["caption", "w"])
    caps = [Caption.from_json(c) for c in tab.column("caption").to_pylist()]
    tiles_x = max(c.tx for c in caps) + 1
    tiles_y = max(c.ty for c in caps) + 1
    c0 = caps[0]
    # every caption knows pixel_size and its own y0, so
    # y_north = y0 + ty * T * ps; tile width comes from the w column
    ps = c0.pixel_size
    tile_px = tab.column("w")[0].as_py()
    y_north = c0.y0 + c0.ty * tile_px * ps
    return GridSpec(tiles_x, tiles_y, tile_px, ps, y_north)



def _init_ray(args) -> bool:
    """The ``ray job submit`` entrypoint contract: on a real cluster the
    job process connects to the running Ray (``--address auto``); the
    sandbox default starts a fresh local session sized by
    ``--num-cpus``.  Returns whether this command owns the session."""
    import ray

    owns = not ray.is_initialized()
    if owns:
        if args.address == "local":
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init(address=args.address)
    from . import tune_data_context

    tune_data_context()        # before any Dataset root is created
    return owns


def _effective_cpus(args) -> int:
    """CPU count that sizes read fan-out / block counts: the flag for a
    local session, the RUNNING CLUSTER's total for --address mode (a
    job submitted to a 256-CPU cluster must not read 32 blocks because
    the flag defaulted to 8)."""
    import ray

    if args.address == "local":
        return args.num_cpus
    return int(ray.cluster_resources().get("CPU", args.num_cpus))

def cmd_bal(args) -> int:
    import ray

    owns_ray = _init_ray(args)
    from .pipelines.bal_pipeline import bal_pipeline, plan_target_cells
    from .sources import read_image_table

    spec = infer_grid(args.tiles)
    ds = read_image_table(args.tiles,
                          override_num_blocks=max(
                              4 * _effective_cpus(args), 16))
    veg_ds = None
    veg_meta = None
    if args.veg_tiles:
        veg_ds = read_image_table(args.veg_tiles)
        veg_meta = (veg_ds.select_columns(["caption", "w", "h"])
                    .materialize())
    mask = None
    if args.mask_wkb:
        mask = open(args.mask_wkb, "rb").read()
    t0 = time.time()
    lineage = bal_pipeline(
        ds, spec, fdi=args.fdi, veg_remap=args.veg_remap, fmt=args.fmt,
        out_dir=args.out, resume=args.resume,
        extent=None if args.extent in (None, "DEFAULT", "MAXOF", "MINOF")
        else args.extent, veg_ds=veg_ds, mask=mask)
    rows = lineage.take_all()
    done = sum(1 for r in rows if r["status"] == "done")
    target = plan_target_cells(
        spec, extent=None if args.extent in (None, "DEFAULT", "MAXOF",
                                             "MINOF") else args.extent,
        mask=mask, veg_meta=veg_meta)
    n_target = len(target)
    print(json.dumps({
        "cells_done": done, "cells_skipped_resume": 0 if not args.resume
        else n_target - done,
        "grid": f"{spec.tiles_x}x{spec.tiles_y}x{spec.tile_px}px",
        "fdi": args.fdi, "seconds": round(time.time() - t0, 2),
        "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    import ray

    owns_ray = _init_ray(args)
    import ray.data

    from .sources import write_image_table
    from .tiles.synth import SynthConfig, tiles_table

    cfg = SynthConfig(tiles_x=args.tiles_x, tiles_y=args.tiles_y,
                      tile_px=args.tile_px, fmt=args.tile_fmt)
    write_image_table(ray.data.from_arrow(tiles_table(cfg)), args.out)
    print(json.dumps({"rows": 2 * args.tiles_x * args.tiles_y,
                      "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_ingest(args) -> int:
    """URL-manifest ingest (reference data_prep/images: download archive
    per URL, unzip, ingest) -> partitioned image table, optionally
    Hilbert-clustered for later bbox reads."""
    import ray

    owns_ray = _init_ray(args)
    from .sources import read_url_tiles, write_image_table

    urls = [ln.strip() for ln in open(args.urls)
            if ln.strip() and not ln.startswith("#")]
    ds = read_url_tiles(urls)
    grid = None
    if args.cluster:
        from .geo.cells import CellGrid

        ds = ds.materialize()
        spec = infer_grid_from_rows(ds)
        grid = CellGrid(x0=0.0, y0=spec.y_north,
                        cell_size=spec.tile_px * spec.pixel_size,
                        nx=spec.tiles_x, ny=spec.tiles_y)
    write_image_table(ds, args.out, cluster_grid=grid,
                      keep_key=bool(grid))
    print(json.dumps({"urls": len(urls), "out": args.out,
                      "clustered": bool(grid)}))
    if owns_ray:
        ray.shutdown()
    return 0


def infer_grid_from_rows(ds):
    """GridSpec from a Dataset's caption rows (ingest has no parquet
    footer to read yet).  The grid extent is a distributed max over
    parsed tile indices -- one single-row partial per block, then a
    two-int aggregate -- so the driver never holds O(tiles) caption
    strings (the pre-round-5 ``take_all`` did: ~GBs at 10^7 tiles);
    only ONE row rides ``take(1)`` for the per-grid constants."""
    import pyarrow as pa
    from ray.data.aggregate import Max

    from .stages.halo import GridSpec
    from .tiles.codec import Caption

    first = ds.select_columns(["caption", "w"]).take(1)[0]
    c0 = Caption.from_json(first["caption"])
    tile_px = int(first["w"])

    def tile_max_partial(b: pa.Table) -> pa.Table:
        tx = ty = -1
        for c in b.column("caption").to_pylist():
            cap = Caption.from_json(c)
            tx = max(tx, cap.tx)
            ty = max(ty, cap.ty)
        return pa.table({"tx": pa.array([tx], pa.int64()),
                         "ty": pa.array([ty], pa.int64())})

    mx = (ds.select_columns(["caption"])
          .map_batches(tile_max_partial, batch_format="pyarrow")
          .aggregate(Max("tx"), Max("ty")))
    return GridSpec(int(mx["max(tx)"]) + 1, int(mx["max(ty)"]) + 1,
                    tile_px, c0.pixel_size,
                    c0.y0 + c0.ty * tile_px * c0.pixel_size)


def cmd_pyramid(args) -> int:
    """Overview pyramid build (reference BuildPyramidsandStatistics,
    calculate_bal.py:89-91): one partition directory per level."""
    import ray

    owns_ray = _init_ray(args)
    from .sources import read_image_table
    from .stages.overviews import write_overviews

    spec = infer_grid(args.tiles)
    ds = read_image_table(args.tiles)
    t0 = time.time()
    built = write_overviews(ds, spec, args.out, args.levels,
                            fmt=args.fmt)
    print(json.dumps({
        "levels": [{"level": lv,
                    "grid": f"{sp.tiles_x}x{sp.tiles_y}x{sp.tile_px}px"}
                   for lv, sp in built],
        "seconds": round(time.time() - t0, 2), "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_validate(args) -> int:
    """Ingest-time quarantine scan: per-tile decode/quality report; bad
    rows become error rows, never task failures (SURVEY §4 poison-pill
    handling vs the reference's silent except at ga_5m/01_...py:241-242)."""
    import ray

    owns_ray = _init_ray(args)
    from .sources import read_image_table
    from .stages.quarantine import validate_tiles

    ds = read_image_table(args.tiles)
    t0 = time.time()
    report = validate_tiles(ds).materialize()
    if args.out:
        report.write_parquet(args.out)
    n = report.count()
    n_bad = report.filter(expr="ok == False").count()
    print(json.dumps({"tiles": n, "quarantined": n_bad,
                      "seconds": round(time.time() - t0, 2),
                      "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 1 if (n_bad and args.strict) else 0


def cmd_chips(args) -> int:
    """Training-chip extraction: tile table -> strided georeferenced
    patch table (stages/chips.py)."""
    import ray

    owns_ray = _init_ray(args)
    from .sources import read_image_table, write_image_table
    from .stages.chips import extract_chips

    ds = read_image_table(args.tiles)
    t0 = time.time()
    chips = extract_chips(ds, chip_px=args.chip_px, stride=args.stride,
                          fmt=args.fmt)
    write_image_table(chips, args.out)
    n = read_image_table(args.out).count()
    print(json.dumps({"chips": n, "chip_px": args.chip_px,
                      "stride": args.stride or args.chip_px,
                      "seconds": round(time.time() - t0, 2),
                      "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_scrub(args) -> int:
    """PII scrub: parquet text corpus -> redacted parquet + match-count
    summary (functions/pii.py), streaming end to end."""
    import ray

    owns_ray = _init_ray(args)
    import ray.data

    from .functions.pii import DEFAULT_PATTERNS, redact_pii

    ds = ray.data.read_parquet(args.docs,
                               columns=[args.id_col, args.text_col])
    t0 = time.time()
    out = redact_pii(ds, text_col=args.text_col,
                     keep_cols=(args.id_col,))
    out.write_parquet(args.out)
    from ray.data.aggregate import Sum

    count_cols = [name for name, _, _ in DEFAULT_PATTERNS]
    totals_row = (ray.data.read_parquet(args.out, columns=count_cols)
                  .aggregate(*[Sum(c, alias_name=c) for c in count_cols]))
    print(json.dumps({"docs": ds.count(),
                      **{c: int(totals_row[c]) for c in count_cols},
                      "seconds": round(time.time() - t0, 2),
                      "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def cmd_derive(args) -> int:
    """Raster-derivative toolbox: run one named derivative stage over a
    tile table and write the output image table (the gdaldem / Spatial
    Analyst single-raster tools as CLI verbs)."""
    import ray

    owns_ray = _init_ray(args)
    from .sources import read_image_table, write_image_table

    spec = infer_grid(args.tiles)
    ds = read_image_table(args.tiles)
    op = args.op
    kw = dict(layer=args.layer, fmt=args.fmt)
    t0 = time.time()
    if op == "hillshade":
        from .stages.terrain import hillshade
        out = hillshade(ds, spec, **kw)
    elif op in ("tpi", "tri", "roughness"):
        from .stages.terrain import dem_metrics
        out = dem_metrics(ds, spec, metric=op, **kw)
    elif op == "d8":
        from .stages.hydrology import flow_direction
        out = flow_direction(ds, spec, **kw)
    elif op == "flow_acc":
        from .stages.hydrology import flow_accumulation
        out = flow_accumulation(ds, spec, **kw)
    elif op == "watershed":
        from .stages.hydrology import watershed
        out = watershed(ds, spec, **kw)
    elif op == "strahler":
        from .stages.hydrology import stream_order
        out = stream_order(ds, spec, **kw)
    elif op == "gauss":
        from .stages.filters import gaussian_blur
        out = gaussian_blur(ds, spec, sigma=args.sigma, **kw)
    elif op == "sobel":
        from .stages.filters import sobel_edges
        out = sobel_edges(ds, spec, **kw)
    elif op == "median":
        from .stages.filters import focal_median
        out = focal_median(ds, spec, radius=args.radius, **kw)
    elif op == "majority":
        from .stages.filters import focal_majority
        out = focal_majority(ds, spec, radius=args.radius, **kw)
    elif op == "fill":
        from .stages.fillnodata import fill_nodata
        out = fill_nodata(ds, spec,
                          max_dist=args.radius * spec.pixel_size, **kw)
    elif op == "fillsinks":
        from .stages.fill_sinks import fill_sinks
        out = fill_sinks(ds, spec, **kw)
    elif op == "expand":
        from .stages.morphology import expand
        out = expand(ds, spec, n_cells=args.radius,
                     zones=tuple(args.zones), **kw)
    elif op == "shrink":
        from .stages.morphology import shrink
        out = shrink(ds, spec, n_cells=args.radius,
                     zones=tuple(args.zones), **kw)
    else:                                # argparse choices guard this
        raise ValueError(f"unknown derive op {op!r}")
    write_image_table(out, args.out)
    n = read_image_table(args.out).count()
    print(json.dumps({"op": op, "tiles": n,
                      "seconds": round(time.time() - t0, 2),
                      "out": args.out}))
    if owns_ray:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="balrog_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=8,
                        help="local-session size; with a cluster "
                             "--address the running cluster's CPU total "
                             "is used instead")
    common.add_argument("--address", default="local",
                        help="'local' (fresh session) or a Ray cluster "
                             "address such as 'auto' under ray job submit")

    b = sub.add_parser("bal", help="run the BAL pipeline over a tile table", parents=[common])
    b.add_argument("--tiles", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--fdi", type=int, default=80,
                   choices=(100, 80, 50, 40))
    b.add_argument("--extent", default="DEFAULT",
                   help='"xmin ymin xmax ymax" or DEFAULT/MAXOF/MINOF')
    b.add_argument("--veg-remap", default=None,
                   help='reclass DSL "lo hi new;..." for the veg layer')
    b.add_argument("--mask-wkb", default=None,
                   help="file with polygon/multipolygon WKB: arbitrary "
                        "AOI mask (extract_by_mask)")
    b.add_argument("--veg-tiles", default=None,
                   help="vegetation tile table on another grid, NN-"
                        "resampled onto the DEM grid (ProjectRaster)")
    b.add_argument("--fmt", default="palz",
                   choices=("palz", "npz", "png", "npy"))
    b.add_argument("--resume", action="store_true")
    b.set_defaults(fn=cmd_bal)

    s = sub.add_parser("synth", help="generate a synthetic tile table", parents=[common])
    s.add_argument("--out", required=True)
    s.add_argument("--tiles-x", type=int, default=8)
    s.add_argument("--tiles-y", type=int, default=8)
    s.add_argument("--tile-px", type=int, default=128)
    s.add_argument("--tile-fmt", default="png", choices=("png", "npz", "npy"))
    s.set_defaults(fn=cmd_synth)

    i = sub.add_parser("ingest", help="download+unzip URL-manifest "
                                      "archives into an image table", parents=[common])
    i.add_argument("--urls", required=True,
                   help="text file: one archive URL per line")
    i.add_argument("--out", required=True)
    i.add_argument("--cluster", action="store_true",
                   help="Hilbert-cluster the output (keeps the sort key "
                        "for bbox predicate-pushdown reads)")
    i.set_defaults(fn=cmd_ingest)

    y = sub.add_parser("pyramid", help="build 2x overview levels "
                                       "(BuildPyramids analogue)",
                       parents=[common])
    y.add_argument("--tiles", required=True)
    y.add_argument("--out", required=True)
    y.add_argument("--levels", type=int, default=3)
    y.add_argument("--fmt", default="npz")
    y.set_defaults(fn=cmd_pyramid)

    c = sub.add_parser("chips", help="extract training chips from a "
                                     "tile table", parents=[common])
    c.add_argument("--tiles", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--chip-px", type=int, default=64)
    c.add_argument("--stride", type=int, default=None)
    c.add_argument("--fmt", default="npz")
    c.set_defaults(fn=cmd_chips)

    d = sub.add_parser("derive", help="run a raster-derivative stage "
                                      "(gdaldem / hydrology / filters) "
                                      "over a tile table",
                       parents=[common])
    d.add_argument("--tiles", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--op", required=True,
                   choices=["hillshade", "tpi", "tri", "roughness", "d8",
                            "flow_acc", "watershed", "strahler", "gauss",
                            "sobel", "median", "majority", "fill",
                            "fillsinks", "expand", "shrink"])
    d.add_argument("--layer", default="dem")
    d.add_argument("--sigma", type=float, default=2.0)
    d.add_argument("--radius", type=int, default=1,
                   help="focal window radius (median/majority), "
                        "fill-nodata search radius, or expand/shrink "
                        "cell count, in pixels")
    d.add_argument("--zones", type=float, nargs="+", default=[1.0],
                   help="class values to expand/shrink")
    d.add_argument("--fmt", default="npz")
    d.set_defaults(fn=cmd_derive)

    s2 = sub.add_parser("scrub", help="PII-redact a parquet text corpus",
                        parents=[common])
    s2.add_argument("--docs", required=True)
    s2.add_argument("--out", required=True)
    s2.add_argument("--text-col", default="text")
    s2.add_argument("--id-col", default="doc_id")
    s2.set_defaults(fn=cmd_scrub)

    v = sub.add_parser("validate", help="quarantine scan: per-tile "
                                        "decode/quality report", parents=[common])
    v.add_argument("--tiles", required=True)
    v.add_argument("--out", default=None,
                   help="write the report as parquet")
    v.add_argument("--strict", action="store_true",
                   help="exit 1 if any tile is quarantined")
    v.set_defaults(fn=cmd_validate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
