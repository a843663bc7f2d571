"""Tile payload codec: encode/decode raster windows to the ``bytes`` column.

The engine's primary input is a table of encoded raster tiles
(``image_id, bytes, w, h, fmt, caption, phash`` -- the shape mandated by the
driver).  Two formats are supported, both dependency-free:

* ``npy``  -- raw ``numpy.save`` bytes (lossless float32), the default;
* ``npz``  -- zlib-deflated ``npy`` (lossless; ~10x smaller for the
  piecewise-constant BAL class bands);
* ``palz`` -- zlib-deflated uint8 palette indices + the sorted distinct
  values in the caption (lossless, <=256 distinct values): the BAL band
  output format -- 4x less deflate input than npz;
* ``png``  -- minimal 16-bit greyscale PNG (RFC 2083) written with zlib.
  Float payloads are affine-quantized to uint16; scale/offset ride in the
  caption sidecar.  Quantization error over a tile's value range comfortably
  clears the PSNR >= 40 dB invariant.

The role of this module mirrors the reference's raster load/save boundary
(``arcpy.RasterToNumPyArray`` / ``NumPyArrayToRaster``,
``calculate_bal.py:50-52,64-69``): pixels exist as ndarrays only inside a
batch transform; at rest they are encoded rows.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

NODATA = -99.0

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


@dataclass
class Caption:
    """JSON sidecar carried in the ``caption`` column: the tile's
    georeferencing plus codec metadata.  The ``edge`` flags mark *true*
    raster boundaries vs interior seams -- required so tiled border clamping
    matches the whole-raster ALL_NEIGHB semantics."""
    layer: str
    x0: float
    y0: float
    pixel_size: float
    crs: str = "EPSG:28350"
    nodata: float = NODATA
    edge: dict = field(default_factory=lambda: {"n": False, "s": False,
                                                "e": False, "w": False})
    scale: float = 1.0
    offset: float = 0.0
    tx: int = 0
    ty: int = 0
    #: PNG codec: quantized value 0 is reserved for nodata cells (valid
    #: data occupies 1..65535).  Old payloads lack this key -> False.
    nodata_q0: bool = False
    #: palz codec: sorted distinct values; payload bytes are uint8 indices
    #: into this list.  None for every other format.
    palette: list | None = None

    def to_json(self) -> str:
        # vars() instead of dataclasses.asdict(): asdict deep-recurses
        # through every field (measured ~2 ms per BAL cell across the 9
        # band captions); the fields are already JSON-ready scalars/dicts
        return json.dumps(vars(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Caption":
        return cls(**json.loads(s))


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png16_encode(arr: np.ndarray, filter_type: int = 2) -> bytes:
    """Encode a uint16 2-D array as 16-bit greyscale PNG.

    ``filter_type`` 2 ("Up": per-byte vertical delta) makes smooth rasters
    (DEMs) deflate an order of magnitude smaller than filter 0; both the
    filter and its inverse are fully vectorized."""
    a = np.ascontiguousarray(arr, dtype=">u2")
    h, w = a.shape
    if filter_type == 2:
        rows = a.view(np.uint8).reshape(h, 2 * w)
        delta = rows.copy()
        delta[1:] -= rows[:-1]          # uint8 wraparound == PNG Up filter
        raw = np.concatenate(
            [np.full((h, 1), 2, dtype=np.uint8), delta],
            axis=1).tobytes()
    else:
        raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def png16_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", payload[:10])
            if depth != 16 or color != 0:
                raise ValueError("only 16-bit greyscale supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + 2 * w
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].copy()
    if np.all(ftypes == 0):
        pass
    elif np.all(ftypes == 2) or (ftypes[0] == 0 and np.all(ftypes[1:] == 2)):
        # invert the Up filter: per-byte cumulative sum down the columns
        # (uint8 accumulation wraps mod 256 -- exactly the filter inverse)
        data = np.cumsum(data, axis=0, dtype=np.uint8)
    else:
        raise ValueError("only filter types 0/2 supported")
    return data.view(">u2").reshape(h, w).astype(np.uint16)


def encode_tile(arr: np.ndarray, fmt: str = "npy",
                caption: Caption | None = None,
                palette=None) -> tuple[bytes, Caption]:
    """Encode a float raster window; returns (payload, caption-with-codec-
    metadata).  ``palette`` (palz only): the sorted candidate value set,
    skipping the per-tile ``np.unique`` sort when the writer knows it."""
    caption = caption or Caption(layer="", x0=0.0, y0=0.0, pixel_size=1.0)
    a = np.asarray(arr, dtype=np.float32)
    if fmt == "npy":
        buf = io.BytesIO()
        np.save(buf, a)
        return buf.getvalue(), caption
    if fmt == "npz":
        buf = io.BytesIO()
        np.save(buf, a)
        return zlib.compress(buf.getvalue(), 1), caption
    if fmt == "palz":
        # lossless palette codec for few-valued rasters (BAL bands have at
        # most 7 distinct values): uint8 palette indices deflate ~4x less
        # input than float32 npz -- encode CPU and shuffle bytes both drop
        vals = (np.asarray(palette, dtype=np.float32)
                if palette is not None else np.unique(a))
        if len(vals) > 256:
            raise ValueError(
                f"palz supports <=256 distinct values, got {len(vals)}; "
                "use npz/npy for continuous rasters")
        codes = np.searchsorted(vals, a)
        if palette is not None:
            codes = np.minimum(codes, len(vals) - 1)
            if not np.array_equal(vals[codes], a):
                raise ValueError("palz: tile contains values outside the "
                                 "supplied palette")
        codes = codes.astype(np.uint8)
        caption.palette = [float(v) for v in vals]
        h, w = a.shape
        raw = struct.pack(">HH", h, w) + codes.tobytes()
        return zlib.compress(raw, 1), caption
    if fmt == "png":
        # q=0 is reserved for nodata so the sentinel survives quantization
        # exactly even when the tile's minimum is below it (a real DEM can
        # dip under -99 m; an off-by-epsilon nodata breaks every
        # `== NODATA` mask downstream)
        nodata = np.float32(caption.nodata)
        valid = a != nodata
        if valid.any():
            vals = a[valid]
            lo = float(vals.min())
            hi = float(vals.max())
            # Categorical rasters (veg classes, BAL bands) must round-trip
            # value-exact: an affine scale of (hi-lo)/65534 decodes class 3
            # as 3.0000305, which an exact searchsorted class_index then
            # misclassifies.  When every valid value is an integer and the
            # range fits the 16-bit code space, use scale 1 -- (q-1)+lo is
            # then exact in float32.
            integral = bool(np.all(vals == np.round(vals)))
        else:
            lo = hi = 0.0
            integral = True
        if integral and hi - lo <= 65534.0:
            scale = 1.0
        else:
            scale = (hi - lo) / 65534.0 if hi > lo else 1.0
        q = np.zeros(a.shape, dtype=np.uint16)
        # quantize in float64 and clip: float32 division by a subnormal
        # scale can land at 65536, and round()+1 would wrap uint16 to 1
        qv = np.round((a[valid].astype(np.float64) - lo) / scale)
        q[valid] = (np.clip(qv, 0.0, 65534.0) + 1.0).astype(np.uint16)
        caption.scale, caption.offset = scale, lo
        caption.nodata_q0 = True
        return png16_encode(q), caption
    raise ValueError(f"unknown tile format {fmt!r}")


def encode_palz_codes(codes: np.ndarray, palette: np.ndarray,
                      caption: Caption) -> tuple[bytes, Caption]:
    """palz fast path for writers that already hold uint8 palette
    indices (the BAL kernels' index-domain output): byte-identical to
    ``encode_tile(palette[codes], "palz", caption, palette=palette)``
    without the searchsorted + validation gather re-derivation."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    caption.palette = [float(v) for v in np.asarray(palette, np.float32)]
    h, w = codes.shape
    raw = struct.pack(">HH", h, w) + codes.tobytes()
    return zlib.compress(raw, 1), caption


def decode_tile(payload: bytes, fmt: str,
                caption: Caption | None = None) -> np.ndarray:
    if fmt == "npy":
        return np.load(io.BytesIO(payload))
    if fmt == "npz":
        return np.load(io.BytesIO(zlib.decompress(payload)))
    if fmt == "palz":
        raw = zlib.decompress(payload)
        h, w = struct.unpack(">HH", raw[:4])
        codes = np.frombuffer(raw, dtype=np.uint8, offset=4)
        pal = np.asarray(caption.palette, dtype=np.float32)
        return pal[codes].reshape(h, w)
    if fmt == "png":
        q = png16_decode(payload).astype(np.float32)
        if caption is None:
            return q
        if caption.nodata_q0:
            out = ((q - 1.0) * np.float32(caption.scale)
                   + np.float32(caption.offset))
            out[q == 0] = np.float32(caption.nodata)
            return out
        return q * np.float32(caption.scale) + np.float32(caption.offset)
    raise ValueError(f"unknown tile format {fmt!r}")


def phash64(arr: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 block means vs their mean."""
    a = np.asarray(arr, dtype=np.float64)
    h, w = a.shape
    # arrays thinner than 8 px in a dimension would produce zero-height
    # blocks (NaN means -> constant hash); upsample by repetition first
    if h < 8 or w < 8:
        a = np.repeat(np.repeat(a, -(-8 // max(h, 1)), axis=0),
                      -(-8 // max(w, 1)), axis=1)
        h, w = a.shape
    if h % 8 == 0 and w % 8 == 0:
        blocks = a.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ri = (np.arange(8) * h) // 8
        ci = (np.arange(8) * w) // 8
        re = np.append(ri[1:], h)
        ce = np.append(ci[1:], w)
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = a[ri[i]:re[i], ci[j]:ce[j]].mean()
    bits = (blocks > blocks.mean()).reshape(-1).astype(np.uint8)
    value = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return value - (1 << 64) if value >= (1 << 63) else value  # int64 range


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    rng = float(a.max() - a.min()) or 1.0
    return 10.0 * np.log10(rng * rng / mse)
