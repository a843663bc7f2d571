"""CLAHE -- Contrast-Limited Adaptive Histogram Equalization over the
tiled raster (Zuiderveld 1994; ``cv2.createCLAHE`` /
``skimage.exposure.equalize_adapthist`` role), the adaptive member of
the enhancement family next to the GLOBAL equalize/stretch LUTs in
stages/enhance.py: each tile gets its own clipped histogram, and every
output pixel bilinearly interpolates the equalization LUTs of the four
nearest tile centers, so local contrast is amplified without the
noise blow-up an unclipped adaptive equalization causes.

Semantics (all integer/deterministic so distributed == whole-raster
bit-exact):

* context regions == the tile grid itself (``spec.tile_px`` square);
* per region: ``bins`` integer histogram of valid pixels over the
  CLOSED value range [vmin, vmax] (out-of-range clamps to the end
  bins; bin = floor((v - vmin) / (vmax - vmin) * bins) clipped);
* clip limit ``max(1, floor(clip_limit * n_valid / bins))``; excess
  is redistributed evenly -- every bin gets ``excess // bins``, and
  the first ``excess % bins`` bins (ascending index) get one more
  (single-pass OpenCV-style redistribution, deterministic);
* region LUT: ``lut[i] = cdf_incl(i) * 255 / n_valid`` in float64
  (an all-nodata region keeps an identity-on-zero LUT and can only
  be interpolated against, contributing 0);
* output pixel at global (gr, gc): bilinear blend of the four LUTs
  whose region centers straddle it, weights from the fractional
  offset to the region centers, region indices CLAMPED to the grid
  (standard CLAHE border rule); nodata pixels stay nodata.

Distributed shape: pass 1 is tile-local (decode -> clipped histogram
-> 9 tiny sidecar rows: the ~2 KB histogram keyed to each in-grid
neighbour cell + the original tile payload keyed to its own cell);
pass 2 is ONE ``groupby(cell_id)`` shuffle whose group holds the core
tile plus the <= 9 neighbour histograms -- the halo traffic is
histograms, not pixels (256 x int64 per neighbour vs a pixel strip),
so the exchange is ~100x lighter than a windowed_stage of the same
reach.  Completeness-gated per cell exactly like focal.windowed_stage.

Reference anchor: the reference's enhancement role is GDAL-side
(gdaldem / -scale in data_prep shell steps); CLAHE generalizes the
same single-band contrast surface the BAL inputs flow through.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec

_GROUP_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("kind", pa.string()),
    ("src_tx", pa.int32()), ("src_ty", pa.int32()),
    ("payload", pa.binary()), ("fmt", pa.string()),
    ("caption", pa.string()),
])


def _bin_index(arr: np.ndarray, vmin: float, vmax: float,
               bins: int) -> np.ndarray:
    """Deterministic bin assignment (float64 math, end-bin clamp)."""
    span = np.float64(vmax) - np.float64(vmin)
    if span <= 0:
        raise ValueError("vmax must be > vmin")
    idx = np.floor((arr.astype(np.float64) - np.float64(vmin))
                   / span * bins).astype(np.int64)
    return np.clip(idx, 0, bins - 1)


def clipped_hist(arr: np.ndarray, nodata: float, *, bins: int,
                 clip_limit: float, vmin: float, vmax: float
                 ) -> np.ndarray:
    """Clipped integer histogram of one region's valid pixels, excess
    redistributed evenly (floor to all, remainder to the lowest
    indices).  int64[bins]."""
    valid = arr != np.float32(nodata)
    hist = np.zeros(bins, np.int64)
    if valid.any():
        idx = _bin_index(arr[valid], vmin, vmax, bins)
        np.add.at(hist, idx, 1)
        n_valid = int(valid.sum())
        limit = max(1, int(clip_limit * n_valid / bins))
        over = hist > limit
        excess = int((hist[over] - limit).sum())
        if excess:
            hist[over] = limit
            hist += excess // bins
            rem = excess % bins
            if rem:
                hist[:rem] += 1
    return hist


def hist_to_lut(hist: np.ndarray) -> np.ndarray:
    """Region LUT: inclusive CDF scaled to [0, 255], float64[bins];
    all-zero histogram -> all-zero LUT."""
    n = int(hist.sum())
    if n == 0:
        return np.zeros(len(hist), np.float64)
    return np.cumsum(hist, dtype=np.float64) * (255.0 / n)


def clahe_apply(arr: np.ndarray, nodata: float, luts: np.ndarray,
                *, ty: int, tx: int, tiles_y: int, tiles_x: int,
                tile_px: int, vmin: float, vmax: float) -> np.ndarray:
    """Equalize one tile given the (3, 3, bins) LUT stack of its
    (clamped) neighbourhood: ``luts[dy + 1, dx + 1]`` is the LUT of
    region (ty + dy, tx + dx) -- callers pass the CLAMPED grid
    neighbour for off-grid offsets.  Vectorized bilinear blend."""
    T = tile_px
    bins = luts.shape[-1]
    valid = arr != np.float32(nodata)
    idx = _bin_index(arr, vmin, vmax, bins)

    # global pixel coords of this tile
    gr = ty * T + np.arange(T, dtype=np.float64)[:, None]
    gc = tx * T + np.arange(T, dtype=np.float64)[None, :]
    # continuous region coordinate: region centers sit at (r + 0.5) * T
    # - 0.5 in pixel space -> fractional region index
    fy = (gr - (T / 2.0 - 0.5)) / T
    fx = (gc - (T / 2.0 - 0.5)) / T
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    wy = fy - y0
    wx = fx - x0
    out = np.zeros((arr.shape[0], arr.shape[1]), np.float64)
    for dy, wrow in ((0, 1.0 - wy), (1, wy)):
        ry = np.clip(y0 + dy, 0, tiles_y - 1)
        for dx, wcol in ((0, 1.0 - wx), (1, wx)):
            rx = np.clip(x0 + dx, 0, tiles_x - 1)
            # map the clamped absolute region index into the 3x3 stack
            sy = np.clip(ry - ty, -1, 1) + 1
            sx = np.clip(rx - tx, -1, 1) + 1
            lut_vals = luts[sy, sx, idx]
            out += (wrow * wcol) * lut_vals
    res = out.astype(np.float32)
    res[~valid] = np.float32(nodata)
    return res


def clahe_whole(arr: np.ndarray, nodata: float, *, tile_px: int,
                bins: int = 256, clip_limit: float = 4.0,
                vmin: float, vmax: float) -> np.ndarray:
    """Single-array oracle: same region grid / clip / blend rules on a
    whole raster whose shape is a multiple of ``tile_px``."""
    H, W = arr.shape
    if H % tile_px or W % tile_px:
        raise ValueError("raster shape must be a tile_px multiple")
    ty_n, tx_n = H // tile_px, W // tile_px
    lut_grid = np.zeros((ty_n, tx_n, bins), np.float64)
    for ry in range(ty_n):
        for rx in range(tx_n):
            reg = arr[ry * tile_px:(ry + 1) * tile_px,
                      rx * tile_px:(rx + 1) * tile_px]
            lut_grid[ry, rx] = hist_to_lut(clipped_hist(
                reg, nodata, bins=bins, clip_limit=clip_limit,
                vmin=vmin, vmax=vmax))
    out = np.empty((H, W), np.float32)
    for ty in range(ty_n):
        for tx in range(tx_n):
            stack = np.zeros((3, 3, bins), np.float64)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    cy = min(max(ty + dy, 0), ty_n - 1)
                    cx = min(max(tx + dx, 0), tx_n - 1)
                    stack[dy + 1, dx + 1] = lut_grid[cy, cx]
            tile = arr[ty * tile_px:(ty + 1) * tile_px,
                       tx * tile_px:(tx + 1) * tile_px]
            out[ty * tile_px:(ty + 1) * tile_px,
                tx * tile_px:(tx + 1) * tile_px] = clahe_apply(
                    tile, nodata, stack, ty=ty, tx=tx, tiles_y=ty_n,
                    tiles_x=tx_n, tile_px=tile_px, vmin=vmin,
                    vmax=vmax)
    return out


def clahe(tiles_ds, spec: GridSpec, *, layer: str = "dem",
          bins: int = 256, clip_limit: float = 4.0, vmin: float,
          vmax: float, out_layer: str = "clahe", fmt: str = "npz"):
    """Image-table Dataset -> CLAHE tiles (layer ``out_layer``).  One
    groupby(cell_id) shuffle; halo payloads are 2 KB histograms, not
    pixel strips (see module docstring)."""
    import json

    if bins < 2 or bins > 65536:
        raise ValueError("bins out of range")
    if clip_limit <= 0:
        raise ValueError("clip_limit must be > 0")
    if not vmax > vmin:
        raise ValueError("vmax must be > vmin")
    TX, TY, T = spec.tiles_x, spec.tiles_y, spec.tile_px

    def emit(batch: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        cols = {n: [] for n in _GROUP_SCHEMA.names}
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            payload = batch.column("bytes")[i].as_py()
            tfmt = batch.column("fmt")[i].as_py()
            arr = decode_tile(payload, tfmt, cap)
            hist = clipped_hist(arr, cap.nodata, bins=bins,
                                clip_limit=clip_limit, vmin=vmin,
                                vmax=vmax)
            hbytes = hist.tobytes()
            # core pixels to self
            cols["cell_id"].append(cap.ty * TX + cap.tx)
            cols["kind"].append("core")
            cols["src_tx"].append(cap.tx)
            cols["src_ty"].append(cap.ty)
            cols["payload"].append(payload)
            cols["fmt"].append(tfmt)
            cols["caption"].append(batch.column("caption")[i].as_py())
            # histogram sidecars to every in-grid neighbour (incl self)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = cap.ty + dy, cap.tx + dx
                    if not (0 <= ny < TY and 0 <= nx < TX):
                        continue
                    cols["cell_id"].append(ny * TX + nx)
                    cols["kind"].append("hist")
                    cols["src_tx"].append(cap.tx)
                    cols["src_ty"].append(cap.ty)
                    cols["payload"].append(hbytes)
                    cols["fmt"].append("int64")
                    cols["caption"].append("")
        return pa.table(
            {n: pa.array(cols[n], _GROUP_SCHEMA.field(n).type)
             for n in _GROUP_SCHEMA.names}, schema=_GROUP_SCHEMA)

    def compute(group: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        g = group.to_pydict()
        empty = pa.table({c: [] for c in TILES_SCHEMA.names},
                         schema=TILES_SCHEMA)
        core = [i for i, k in enumerate(g["kind"]) if k == "core"]
        if not core:
            return empty
        ci = core[0]
        cap = Caption.from_json(g["caption"][ci])
        tx, ty = cap.tx, cap.ty
        neigh = sum(1 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                    if 0 <= tx + dx < TX and 0 <= ty + dy < TY)
        hists = {(g["src_ty"][i], g["src_tx"][i]):
                 np.frombuffer(g["payload"][i], np.int64)
                 for i, k in enumerate(g["kind"]) if k == "hist"}
        if len(hists) != neigh:        # completeness gate
            return empty
        stack = np.zeros((3, 3, bins), np.float64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                cy = min(max(ty + dy, 0), TY - 1)
                cx = min(max(tx + dx, 0), TX - 1)
                # clamped neighbour: in-grid by construction; for an
                # off-grid offset the clamp lands on an in-grid region
                # whose histogram arrived via its own sidecar fan-out
                stack[dy + 1, dx + 1] = hist_to_lut(hists[(cy, cx)])
        arr = decode_tile(g["payload"][ci], g["fmt"][ci], cap)
        out = clahe_apply(arr, cap.nodata, stack, ty=ty, tx=tx,
                          tiles_y=TY, tiles_x=TX, tile_px=T,
                          vmin=vmin, vmax=vmax)
        ocap = Caption(layer=out_layer, x0=cap.x0, y0=cap.y0,
                       pixel_size=cap.pixel_size, crs=cap.crs,
                       nodata=cap.nodata, edge=dict(cap.edge),
                       tx=tx, ty=ty)
        payload, ocap = encode_tile(out, fmt, ocap)
        h, w = out.shape
        return pa.table({
            "image_id": pa.array([f"{out_layer}/{tx}/{ty}"],
                                 pa.string()),
            "bytes": pa.array([payload], pa.binary()),
            "w": pa.array([np.int32(w)], pa.int32()),
            "h": pa.array([np.int32(h)], pa.int32()),
            "fmt": pa.array([fmt], pa.string()),
            "caption": pa.array([ocap.to_json()], pa.string()),
            "phash": pa.array([np.int64(phash64(out))], pa.int64()),
        }, schema=TILES_SCHEMA)

    del json
    return (tiles_ds
            .map_batches(emit, batch_format="pyarrow")
            .groupby("cell_id")
            .map_groups(compute, batch_format="pyarrow"))
