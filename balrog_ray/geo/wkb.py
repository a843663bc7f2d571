"""Minimal WKB (Well-Known Binary) codec for Point / Polygon / MultiPolygon.

The vegetation-polygon table stores ``geom`` as WKB binary (the interchange
the reference pushes through PostGIS, ``05_create_tables.sql:6-20``).  Only
the 2-D little-endian subset the engine emits/consumes is implemented.
"""

from __future__ import annotations

import struct

import numpy as np

from .geometry import Polygon

_POINT, _POLYGON, _MULTIPOLYGON = 1, 3, 6


def point_to_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def polygon_to_wkb(poly: Polygon) -> bytes:
    rings = [poly.exterior] + list(poly.holes)
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<I", len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def multipolygon_to_wkb(polys: list[Polygon]) -> bytes:
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(polys))]
    out += [polygon_to_wkb(p) for p in polys]
    return b"".join(out)


class _Reader:
    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def take(self, fmt: str):
        vals = struct.unpack_from(fmt, self.data, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals

    def ring(self, endian: str) -> np.ndarray:
        (n,) = self.take(endian + "I")
        dt = "<f8" if endian == "<" else ">f8"
        arr = np.frombuffer(self.data, dtype=dt, count=2 * n,
                            offset=self.pos).reshape(n, 2)
        self.pos += 16 * n
        return arr.astype(np.float64)


def from_wkb(data: bytes):
    """Decode WKB; returns (x, y) for points, :class:`Polygon` for polygons,
    ``list[Polygon]`` for multipolygons."""
    r = _Reader(data)
    obj, _ = _decode_one(r)
    return obj


def _decode_one(r: _Reader):
    (byte_order,) = r.take("B")
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = r.take(endian + "I")
    gtype &= 0xFF  # mask any SRID/dimension flags
    if gtype == _POINT:
        x, y = r.take(endian + "dd")
        return (x, y), r.pos
    if gtype == _POLYGON:
        (nrings,) = r.take(endian + "I")
        rings = [r.ring(endian) for _ in range(nrings)]
        return Polygon(rings[0], rings[1:]), r.pos
    if gtype == _MULTIPOLYGON:
        (n,) = r.take(endian + "I")
        polys = []
        for _ in range(n):
            p, _ = _decode_one(r)
            polys.append(p)
        return polys, r.pos
    raise ValueError(f"unsupported WKB geometry type {gtype}")
