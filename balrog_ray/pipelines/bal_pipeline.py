"""End-to-end Ray-Data BAL pipeline.

Dataflow (all streaming, one all-to-all shuffle):

    read tiles (dem + veg layers)
      -> flat_map: strip emitter (self payload + 8 halo strips, keyed by
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
from ..tiles.codec import Caption, encode_tile, phash64
from ..tiles.synth import TILES_SCHEMA
from ..stages.halo import GridSpec, assemble_window, make_strip_emitter

ALL_BANDS = DIRECTIONS + ("max",)

#: BAL numeric value -> band label (raw numerics are kept for parity; the
#: 100 rating is the closest distance class, 200 the steep-downslope flame
#: zone -- calculate_bal.py:271, bal_database.py:179-184)
BAL_LABELS = {-99.0: "NODATA", 12.5: "BAL-12.5", 19.0: "BAL-19",
              29.0: "BAL-29", 40.0: "BAL-40", 100.0: "BAL-FZ",
              200.0: "BAL-FZ"}

LINEAGE_SCHEMA = pa.schema([
    ("cell_id", pa.int64()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("input_rows", pa.int64()),
    ("output_rows", pa.int64()),
    ("checksum", pa.int64()),
    ("status", pa.string()),
])


def make_bal_group_fn(spec: GridSpec, fdi: int = 80,
                      veg_remap: str | None = None, fmt: str = "npz",
                      bands=ALL_BANDS, out_dir: str | None = None):
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
        expected = 1 + sum(
            1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dx, dy) != (0, 0) and 0 <= tx + dx < spec.tiles_x
            and 0 <= ty + dy < spec.tiles_y)
        complete = all(g["layer"].count(layer) == expected
                       for layer in ("dem", "veg"))
        dem = assemble_window(g, spec, "dem", tx, ty) if complete else None
        veg = assemble_window(g, spec, "veg", tx, ty) if complete else None
        if dem is None or veg is None:
            return pa.table({n: [] for n in TILES_SCHEMA.names},
                            schema=TILES_SCHEMA) if out_dir is None else \
                pa.table({n: [] for n in LINEAGE_SCHEMA.names},
                         schema=LINEAGE_SCHEMA)

        slope, aspect = slope_aspect(dem, ps, ps)
        aspect_c = apply_remap(aspect, aspect_spec).astype(np.float64)
        slope_c = apply_remap(slope, slope_spec).astype(np.float64)
        veg_c = (apply_remap(veg, veg_spec).astype(np.float64)
                 if veg_spec else veg)

        grids = compute_bal(veg_c, slope_c, aspect_c, ps, fdi)

        # slice the core tile out of the assembled window
        r0, _, c0, _ = spec.assembled_window(tx, ty)
        rs, cs = ty * T - r0, tx * T - c0

        rows = {n: [] for n in TILES_SCHEMA.names}
        for band in bands:
            core = grids[band][rs:rs + T, cs:cs + T]
            cap = Caption(layer=f"bal_{band}", x0=tx * T * ps,
                          y0=spec.y_north - ty * T * ps, pixel_size=ps,
                          edge={"n": ty == 0, "s": ty == spec.tiles_y - 1,
                                "w": tx == 0, "e": tx == spec.tiles_x - 1},
                          tx=tx, ty=ty)
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


def bal_pipeline(tiles_ds, spec: GridSpec, fdi: int = 80,
                 veg_remap: str | None = None, fmt: str = "npz",
                 bands=ALL_BANDS, out_dir: str | None = None,
                 resume: bool = False):
    """Build the lazy BAL Dataset.

    Returns a Dataset of BAL tile rows (TILES_SCHEMA) when ``out_dir`` is
    None, else a Dataset of lineage rows (LINEAGE_SCHEMA) whose side effect
    is the partitioned parquet output under ``out_dir``; with ``resume``
    already-committed cells are skipped before the shuffle.
    """
    contrib = tiles_ds.flat_map(make_strip_emitter(spec))
    if out_dir is not None and resume:
        done = completed_cells(out_dir)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int64)

            def drop_done(batch: pa.Table) -> pa.Table:
                keep = ~np.isin(batch.column("cell_id").to_numpy(), done_arr)
                return batch.filter(pa.array(keep))

            contrib = contrib.map_batches(drop_done, batch_format="pyarrow")
    fn = make_bal_group_fn(spec, fdi, veg_remap, fmt, bands, out_dir)
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
