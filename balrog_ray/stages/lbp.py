"""Local Binary Patterns over the tiled raster table -- the classic
texture descriptor (skimage ``feature.local_binary_pattern`` with
``method='default'``, P=8, R=1 role), sibling of the GLCM stage in the
texture family; its per-tile code histograms are the standard input to
texture classifiers.

Deterministic semantics: for each pixel whose full 3x3 neighborhood is
inside the raster AND valid, the 8 neighbors are compared ``>= center``
and packed MSB-first in clockwise order starting at the top-left
neighbor (the skimage default bit order); other pixels emit nodata.
Position-independent -> bit-exact tiled parity on the radius-1 halo
plan.

Scale shape: one halo shuffle for the code tiles (shared
``windowed_stage``); histograms are per-tile partial count rows (<= 256
per tile) + one tiny ``groupby(code).sum`` fold for the global
distribution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .focal import windowed_stage
from .halo import GridSpec

# clockwise from top-left, MSB first (skimage 'default' order)
_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, 1),
         (1, 1), (1, 0), (1, -1), (0, -1))


def lbp_kernel(arr: np.ndarray, nodata: float) -> np.ndarray:
    """Whole-array LBP code plane (float32 codes 0..255, nodata where
    undefined)."""
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    nd = np.float32(nodata)
    valid = a32 != nd
    out = np.full((H, W), nd, np.float32)
    if H < 3 or W < 3:
        return out
    ok = (valid[:-2, :-2] & valid[:-2, 1:-1] & valid[:-2, 2:]
          & valid[1:-1, :-2] & valid[1:-1, 1:-1] & valid[1:-1, 2:]
          & valid[2:, :-2] & valid[2:, 1:-1] & valid[2:, 2:])
    c = a32[1:-1, 1:-1]
    code = np.zeros(c.shape, np.int64)
    for bit, (dy, dx) in enumerate(_OFFS):
        nb = a32[1 + dy:H - 1 + dy, 1 + dx:W - 1 + dx]
        code = (code << 1) | (nb >= c).astype(np.int64)
    inner = np.where(ok, code.astype(np.float32), nd)
    out[1:-1, 1:-1] = inner
    return out


def lbp_codes(tiles_ds, spec: GridSpec, *, layer: str = "dem",
              fmt: str = "npz"):
    """Image-table Dataset -> LBP code tiles (layer ``lbp``)."""
    return windowed_stage(tiles_ds, spec, layer=layer, radius=1,
                          out_layer="lbp", window_fn=lbp_kernel, fmt=fmt)


def lbp_histogram(lbp_ds):
    """LBP code tiles -> exact global ``(code, n_px)`` histogram."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        codes, ns = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            m = arr != np.float32(cap.nodata)
            vals, counts = np.unique(arr[m].astype(np.int64),
                                     return_counts=True)
            codes.extend(int(v) for v in vals)
            ns.extend(int(c) for c in counts)
        return pa.table({"code": pa.array(codes, pa.int64()),
                         "n_px": pa.array(ns, pa.int64())})

    return (lbp_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("code")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .sort("code"))
