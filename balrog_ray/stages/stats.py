"""Per-layer raster statistics -- the statistics half of the
reference's ``BuildPyramidsandStatistics`` call (SURVEY op 20,
``bal.py`` post-write step) and the normalization-constant pass a
training pipeline runs before feeding pixels to a model (dataset mean /
std per layer).

Scale shape: one decode + five scalars per tile inside ``map_batches``
(nodata-masked count, sum, sum-of-squares, min, max -- float64), then a
per-layer ordered fold over the tiny partial table.  The fold sorts a
layer's partials by (ty, tx) and accumulates sequentially, so the
result is BIT-REPRODUCIBLE across runs and block orders; at extreme
tile counts (partials too many for one group) swap the fold for
``groupby(layer).aggregate(Sum(...))`` partials -- same answer up to
float association, documented here so the trade is explicit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def layer_statistics(tiles_ds, *, layers=None):
    """Image-table Dataset -> one row per layer:
    ``(layer, n_valid, mean, std, min, max)`` over valid (non-nodata)
    pixels.  ``std`` is the population standard deviation."""

    def partial(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        rows = {"layer": [], "tx": [], "ty": [], "n": [], "s": [],
                "ss": [], "mn": [], "mx": []}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            if layers is not None and cap.layer not in layers:
                continue
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.float64)
            rows["layer"].append(cap.layer)
            rows["tx"].append(cap.tx)
            rows["ty"].append(cap.ty)
            rows["n"].append(v.size)
            rows["s"].append(float(v.sum()) if v.size else 0.0)
            rows["ss"].append(float((v * v).sum()) if v.size else 0.0)
            rows["mn"].append(float(v.min()) if v.size else np.inf)
            rows["mx"].append(float(v.max()) if v.size else -np.inf)
        return pa.table({
            "layer": pa.array(rows["layer"], pa.string()),
            "tx": pa.array(rows["tx"], pa.int32()),
            "ty": pa.array(rows["ty"], pa.int32()),
            "n": pa.array(rows["n"], pa.int64()),
            "s": pa.array(rows["s"], pa.float64()),
            "ss": pa.array(rows["ss"], pa.float64()),
            "mn": pa.array(rows["mn"], pa.float64()),
            "mx": pa.array(rows["mx"], pa.float64())})

    def fold(group: pa.Table) -> pa.Table:
        order = np.lexsort((group.column("tx").to_numpy(),
                            group.column("ty").to_numpy()))
        n = group.column("n").to_numpy()[order]
        s = group.column("s").to_numpy()[order]
        ss = group.column("ss").to_numpy()[order]
        tot_n, tot_s, tot_ss = 0, 0.0, 0.0
        for i in range(len(n)):                 # ordered: bit-stable
            tot_n += int(n[i])
            tot_s += s[i]
            tot_ss += ss[i]
        if tot_n:
            mean = tot_s / tot_n
            var = max(0.0, tot_ss / tot_n - mean * mean)
            mn = float(group.column("mn").to_numpy().min())
            mx = float(group.column("mx").to_numpy().max())
        else:
            mean, var, mn, mx = 0.0, 0.0, 0.0, 0.0
        return pa.table({
            "layer": pa.array([group.column("layer")[0].as_py()]),
            "n_valid": pa.array([tot_n], pa.int64()),
            "mean": pa.array([mean], pa.float64()),
            "std": pa.array([float(np.sqrt(var))], pa.float64()),
            "min": pa.array([mn], pa.float64()),
            "max": pa.array([mx], pa.float64())})

    return (tiles_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("layer")
            .map_groups(fold, batch_format="pyarrow"))
