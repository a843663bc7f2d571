"""Multi-level 2-D Haar wavelet transform over the tile table --
the classic multiresolution-analysis / compression front-end (PyWavelets
``wavedec2(..., 'haar')`` role; pyramid op 20's frequency-domain
cousin).  Subband energies drive texture features and compressibility
estimates; the LL chain is the overview pyramid in disguise.

Semantics (orthonormal Haar, float64):

* level ``l`` maps each 2x2 block ``[a b; c d]`` of the previous LL to
  ``LL=(a+b+c+d)/2``, ``LH=(a+b-c-d)/2`` (horizontal detail --
  vertical frequency), ``HL=(a-b+c-d)/2``, ``HH=(a-b-c+d)/2``;
* float32 inputs widen to float64, so every sum (<= 27-bit mantissas
  per level, +2 bits/level) and the /2 are EXACT: reconstruction is
  bit-perfect and the transform is deterministic;
* nodata: wavelets have no nodata algebra -- ``nodata_policy="raise"``
  (default) refuses tiles containing nodata loudly;``"zero"``
  substitutes 0.0 (the documented embedding-into-zero contract).

Scale shape: ``tile_px % 2^levels == 0`` is enforced, so every 2x2
reduction at every level nests inside one tile -- the whole transform
is a stateless per-tile ``map_batches``; NO shuffle, NO halo.  Each
input tile emits ``3*levels + 1`` coefficient tiles (layers
``dwt{l}_{lh,hl,hh}`` and ``dwt{L}_ll``) with ``pixel_size`` scaled by
``2^l``, so downstream tile ops (stats, thresholds, chips) run on
subbands unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa


def haar2_level(a: np.ndarray):
    """One analysis level: (H, W) -> four (H/2, W/2) subbands
    ``(ll, lh, hl, hh)``; float64 exact."""
    a = np.asarray(a, np.float64)
    tl = a[0::2, 0::2]
    tr = a[0::2, 1::2]
    bl = a[1::2, 0::2]
    br = a[1::2, 1::2]
    ll = (tl + tr + bl + br) / 2.0
    lh = (tl + tr - bl - br) / 2.0
    hl = (tl - tr + bl - br) / 2.0
    hh = (tl - tr - bl + br) / 2.0
    return ll, lh, hl, hh


def ihaar2_level(ll, lh, hl, hh) -> np.ndarray:
    """Exact inverse of :func:`haar2_level`."""
    H, W = ll.shape
    out = np.empty((H * 2, W * 2), np.float64)
    out[0::2, 0::2] = (ll + lh + hl + hh) / 2.0
    out[0::2, 1::2] = (ll + lh - hl - hh) / 2.0
    out[1::2, 0::2] = (ll - lh + hl - hh) / 2.0
    out[1::2, 1::2] = (ll - lh - hl + hh) / 2.0
    return out


def haar2_kernel(arr: np.ndarray, levels: int) -> dict[str, np.ndarray]:
    """Whole-array multi-level decomposition (the test oracle):
    ``{"dwt{l}_lh": ..., ..., "dwt{L}_ll": ...}``."""
    H, W = np.asarray(arr).shape
    if H % (1 << levels) or W % (1 << levels):
        raise ValueError(f"shape {(H, W)} not divisible by "
                         f"2^levels = {1 << levels}")
    out = {}
    ll = np.asarray(arr, np.float64)
    for lv in range(1, levels + 1):
        ll, lh, hl, hh = haar2_level(ll)
        out[f"dwt{lv}_lh"] = lh
        out[f"dwt{lv}_hl"] = hl
        out[f"dwt{lv}_hh"] = hh
    out[f"dwt{levels}_ll"] = ll
    return out


def ihaar2_kernel(bands: dict[str, np.ndarray],
                  levels: int) -> np.ndarray:
    """Exact reconstruction from :func:`haar2_kernel` output."""
    ll = bands[f"dwt{levels}_ll"]
    for lv in range(levels, 0, -1):
        ll = ihaar2_level(ll, bands[f"dwt{lv}_lh"],
                          bands[f"dwt{lv}_hl"], bands[f"dwt{lv}_hh"])
    return ll


def haar_dwt(tiles_ds, *, layer: str = "dem", levels: int = 2,
             nodata_policy: str = "raise", fmt: str = "npz"):
    """Image-table Dataset -> coefficient-tile Dataset (3*levels + 1
    rows per input tile, layers ``dwt{l}_{band}``).  Stateless
    per-tile map; refuses tile sizes that would split a 2x2 block
    across tiles."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if nodata_policy not in ("raise", "zero"):
        raise ValueError("nodata_policy must be 'raise' or 'zero'")

    def transform(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        cols = {c: [] for c in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            if cap.layer != layer:
                continue
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            if arr.shape[0] % (1 << levels) or \
                    arr.shape[1] % (1 << levels):
                raise ValueError(
                    f"tile {arr.shape} not divisible by 2^{levels}: "
                    f"re-tile to a multiple of {1 << levels} px first")
            nd_mask = arr == np.float32(cap.nodata)
            if nd_mask.any():
                if nodata_policy == "raise":
                    raise ValueError(
                        f"tile {cap.tx},{cap.ty} contains nodata; "
                        f"fill it first (fillnodata stage) or pass "
                        f"nodata_policy='zero'")
                arr = np.where(nd_mask, np.float32(0.0), arr)
            for band, coef in haar2_kernel(arr, levels).items():
                lv = int(band[3])
                c32 = coef.astype(np.float32)
                ocap = dataclasses.replace(
                    cap, layer=band,
                    pixel_size=cap.pixel_size * (1 << lv),
                    nodata=float(np.finfo(np.float32).min))
                payload, ocap = encode_tile(c32, fmt, ocap)
                cols["image_id"].append(f"{band}/{cap.tx}/{cap.ty}")
                cols["bytes"].append(payload)
                cols["w"].append(np.int32(c32.shape[1]))
                cols["h"].append(np.int32(c32.shape[0]))
                cols["fmt"].append(fmt)
                cols["caption"].append(ocap.to_json())
                cols["phash"].append(np.int64(phash64(c32)))
        return pa.table(cols, schema=TILES_SCHEMA)

    return tiles_ds.map_batches(transform, batch_format="pyarrow")


def subband_energy(coef_ds):
    """Coefficient-tile Dataset -> one row per subband:
    ``(band, n_coef, energy_milli)`` with
    ``energy_milli = sum(rint(c^2 * 1000))`` -- integer partials, so
    the ``groupby(band).sum`` fold is exact and order-independent."""

    def partial(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile

        bands, ns, es = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            c = arr.astype(np.float64)
            bands.append(cap.layer)
            ns.append(int(c.size))
            es.append(int(np.rint(c * c * 1000.0).sum()))
        return pa.table({"band": pa.array(bands, pa.string()),
                         "n_coef": pa.array(ns, pa.int64()),
                         "energy_milli": pa.array(es, pa.int64())})

    return (coef_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("band")
            .sum(["n_coef", "energy_milli"]))
