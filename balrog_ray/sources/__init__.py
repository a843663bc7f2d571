"""Sources/sinks for the image+caption tile table.

The engine's primary input is one logical table with the driver-specified
schema ``(image_id, bytes, w, h, fmt, caption, phash)`` (BASELINE.json
``input_hint``; reference raster IO at ``calculate_bal.py:49-52`` /
``sa_tools.py:127-129``).  The north rule names Lance as the physical
format; this sandbox has no ``lance`` wheel, so parquet carries the same
schema and the Lance path is gated behind an import-try — on a cluster with
``pylance`` installed ``read_image_table(path, fmt="lance")`` works
unchanged via ``ray.data.read_lance``.

Reads prune columns at the source (projection pushdown into parquet row
groups); writes go through ``Dataset.write_parquet`` / ``write_lance`` so
output stays partitioned (many files, resumable) — never one giant file.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: the driver-specified logical schema (BASELINE.json input_hint)
IMAGE_TABLE_COLUMNS = ("image_id", "bytes", "w", "h", "fmt", "caption",
                       "phash")


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _detect_fmt(path: str) -> str:
    return "lance" if path.rstrip("/").endswith(".lance") else "parquet"


def read_image_table(path: str, *, fmt: str = "auto", columns=None,
                     override_num_blocks: int | None = None,
                     bbox=None, cluster_grid=None):
    """Read an image+caption table as a ``ray.data.Dataset``.

    ``columns`` prunes at the read (only requested columns leave storage);
    ``override_num_blocks`` sizes the block count to the cluster, keeping
    downstream shuffle fan-out proportional to cores rather than files.

    ``bbox=(xmin, ymin, xmax, ymax)`` with ``cluster_grid``: spatial
    range read over a Hilbert-clustered layout written with
    ``keep_key=True`` -- the covering cells' Hilbert ids become a parquet
    predicate, so row-group min/max stats on the (sorted) key column
    prune whole row groups before any payload byte is read: the
    O(perimeter)-files promise of the CLUSTER-ON layout made real at
    the read.
    """
    import ray.data

    if fmt == "auto":
        fmt = _detect_fmt(path)
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    if bbox is not None:
        if cluster_grid is None:
            raise ValueError("bbox read requires cluster_grid (the grid "
                             "the layout was Hilbert-clustered on)")
        import pyarrow.compute as pc

        cells = cluster_grid.cells_for_bbox(*bbox)
        keys = cluster_grid.hilbert_id(cells)
        kw["filter"] = pc.field("hilbert_key").isin(
            pa.array(np.sort(keys), pa.int64()))
    if fmt == "lance":
        if not _have_lance():
            raise NotImplementedError(
                "Lance format requires the 'pylance' package (not available "
                "in this sandbox); the parquet path carries the identical "
                "schema")
        return ray.data.read_lance(path, columns=columns, **kw)
    if fmt == "parquet":
        return ray.data.read_parquet(
            path, columns=list(columns) if columns else None, **kw)
    raise ValueError(f"unknown image-table format: {fmt!r}")


def hilbert_cluster(ds, grid, keep_key: bool = False):
    """Sort an image-tile Dataset by the Hilbert index of each row's tile
    -- the output-layout analogue of the reference's ``CLUSTER ON``
    gist-index (``03_explode_multipolygons_and_classify.sql:79-80``).
    Spatially adjacent tiles land in the same output files/row-groups, so a
    later bbox read touches O(perimeter) files instead of O(area).  One
    all-to-all sort; apply at write time only.  ``keep_key`` leaves the
    ``hilbert_key`` column in place so parquet row-group min/max stats can
    drive bbox predicate pushdown at read time (:func:`read_image_table`
    with ``bbox=``)."""
    from ..tiles.codec import Caption

    def key(batch: pa.Table) -> pa.Table:
        caps = [Caption.from_json(c)
                for c in batch.column("caption").to_pylist()]
        cells = np.array([c.ty * grid.nx + c.tx for c in caps],
                         dtype=np.int64)
        h = grid.hilbert_id(cells) if len(cells) else cells
        return batch.append_column("hilbert_key", pa.array(h, pa.int64()))

    out = ds.map_batches(key, batch_format="pyarrow").sort("hilbert_key")
    return out if keep_key else out.drop_columns(["hilbert_key"])


def write_image_table(ds, path: str, *, fmt: str = "auto",
                      cluster_grid=None, keep_key: bool = False) -> None:
    """Write a Dataset of image rows, partitioned (one file per block).

    ``cluster_grid`` (a ``geo.cells.CellGrid``): spatially cluster the
    output by Hilbert index before writing (see :func:`hilbert_cluster`);
    with ``keep_key`` the sort key column is persisted so later bbox
    reads can prune parquet row groups via predicate pushdown.
    """
    if cluster_grid is not None:
        ds = hilbert_cluster(ds, cluster_grid, keep_key=keep_key)
    if fmt == "auto":
        fmt = _detect_fmt(path)
    if fmt == "lance":
        if not _have_lance():
            raise NotImplementedError(
                "Lance format requires the 'pylance' package")
        ds.write_lance(path)
        return
    if fmt == "parquet":
        ds.write_parquet(path)
        return
    raise ValueError(f"unknown image-table format: {fmt!r}")


def validate_image_schema(schema: pa.Schema) -> None:
    """Fail fast when a table is missing the contract columns (the
    schema-validation replacement for the reference's COG validator,
    SURVEY op 27)."""
    missing = [c for c in IMAGE_TABLE_COLUMNS if c not in schema.names]
    if missing:
        raise ValueError(
            f"image table missing columns {missing}; expected at least "
            f"{list(IMAGE_TABLE_COLUMNS)}")


def write_url_bundles(table: pa.Table, out_dir: str,
                      tiles_per_zip: int = 16) -> list[str]:
    """Pack an image-tile table into zip archives (one manifest.json per
    zip mapping member name -> full tile row metadata) and return
    ``file://`` URLs -- the writer half of the reference's zipped-DEM
    distribution model (``data_prep/images/nsw_dcs``: one DEM archive per
    index row, fetched by URL)."""
    import json
    import os
    import zipfile

    os.makedirs(out_dir, exist_ok=True)
    urls = []
    rows = table.to_pylist()
    for zi in range(0, len(rows), tiles_per_zip):
        zpath = os.path.join(out_dir, f"tiles_{zi // tiles_per_zip:05d}.zip")
        manifest = {}
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
            for j, row in enumerate(rows[zi:zi + tiles_per_zip]):
                member = f"tile_{j:04d}.bin"
                zf.writestr(member, row["bytes"])
                manifest[member] = {k: row[k] for k in IMAGE_TABLE_COLUMNS
                                    if k != "bytes"}
            zf.writestr("manifest.json", json.dumps(manifest))
        urls.append("file://" + os.path.abspath(zpath))
    return urls


def read_url_tiles(urls, *, override_num_blocks: int | None = None):
    """URL-list tile source: the reference's download+unzip ingest
    (``data_prep/images/nsw_dcs_dem_urls``: a manifest of archive URLs,
    each downloaded, unzipped and ingested) as a streaming Ray pipeline.

    Each URL row is fetched INSIDE ``map_batches`` (``urllib``: file://
    and http(s)://; tests exercise BOTH -- file:// bundles and the http
    path against a loopback server, since only loopback is reachable in
    this sandbox), unzipped in memory via ``zipfile``, and every
    member listed in the zip's manifest.json becomes an image-table row.
    Downloads fan out across the cluster with the Dataset's block
    parallelism; no archive ever lands on the driver."""
    import ray.data

    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    url_ds = ray.data.from_items([{"url": u} for u in urls], **kw)

    def fetch(batch: pa.Table) -> pa.Table:
        import io
        import json
        import urllib.request
        import zipfile

        out = {n: [] for n in IMAGE_TABLE_COLUMNS}
        for url in batch.column("url").to_pylist():
            # bounded fetch: a stalled server costs one timeout error
            # (classifiable per-row), never an indefinitely hung task
            with urllib.request.urlopen(url, timeout=60) as resp:
                blob = resp.read()
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                manifest = json.loads(zf.read("manifest.json"))
                for member, meta in manifest.items():
                    out["bytes"].append(zf.read(member))
                    for k in IMAGE_TABLE_COLUMNS:
                        if k != "bytes":
                            out[k].append(meta[k])
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64()),
        })

    return url_ds.map_batches(fetch, batch_format="pyarrow")
