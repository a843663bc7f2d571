"""Shared machinery for ACTIVE-FRONT iterative stages (cost distance,
Strahler stream order; the watershed/flow loops reuse the block sizing):

* :func:`front_blocks` -- the per-round re-block size.  Iterative unions
  otherwise multiply block counts and round k drowns in per-task
  scheduling overhead (measured 177 s -> 14 s on watershed at 16x16).
* :func:`cells_of` / :func:`split_cells` -- driver-held active-cell scan
  and the broadcast-ref cell filter that keeps each round's shuffle
  proportional to the improving front, not the world.
* :func:`make_keyed` -- vectorized tile->cell keying for stages that
  pair co-registered layers per cell (zero-copy ``take`` of the payload
  column; no per-row ``as_py`` blob copies).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def front_blocks(n_cells: int) -> int:
    return max(8, min(128, n_cells // 4))


def cells_of(dsx) -> np.ndarray:
    """Distinct cell_ids of a (materialized) dataset, collected to the
    driver -- bounded by grid size, one int per tile."""
    import ray

    tabs = [t for t in ray.get(
        dsx.select_columns(["cell_id"]).materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return np.empty(0, np.int64)
    return np.unique(pa.concat_tables(tabs).column("cell_id")
                     .to_numpy(zero_copy_only=False))


def split_cells(dsx, ids_ref, keep: bool):
    """Filter a cell-keyed dataset by a ``ray.put`` id array (keep or
    drop) -- a lazy map, no shuffle."""
    import pyarrow.compute as pc
    import ray

    def fn(b: pa.Table) -> pa.Table:
        m = pc.is_in(b.column("cell_id"),
                     value_set=pa.array(ray.get(ids_ref), pa.int64()))
        return b.filter(m if keep else pc.invert(m))
    return dsx.map_batches(fn, batch_format="pyarrow")


def make_keyed(spec, want):
    """Batch fn: image-table rows of the ``want`` layers -> rows
    ``(cell_id, layer, bytes, fmt, caption)`` keyed by owning cell.
    Payload bytes ride a zero-copy ``take``."""
    want = set(want)

    def keyed(b: pa.Table) -> pa.Table:
        import json

        caps = b.column("caption").to_pylist()
        keep, cells, layers = [], [], []
        for i, c in enumerate(caps):
            d = json.loads(c)
            if d["layer"] in want:
                keep.append(i)
                cells.append(spec.cell_id(int(d["tx"]), int(d["ty"])))
                layers.append(d["layer"])
        t = b.select(["bytes", "fmt", "caption"]).take(
            pa.array(keep, pa.int64()))
        return pa.table({
            "cell_id": pa.array(cells, pa.int64()),
            "layer": pa.array(layers, pa.string()),
            "bytes": t.column("bytes"),
            "fmt": t.column("fmt"),
            "caption": t.column("caption")})
    return keyed
