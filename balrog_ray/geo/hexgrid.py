"""Hexagonal cell index -- the H3-analogue half of the engine's cell
kit (the square/quad S2-analogue lives in :mod:`cells` /
:mod:`quad`).  Pointy-top axial hexagons of circumradius ``size``;
point -> cell is the standard axial transform + cube rounding, written
as a fixed IEEE expression tree so the DuckDB oracle can replay it
bit-identically (every op is +,-,*,/ on doubles, ``sqrt(3.0)``, `abs`
and ``floor(v + 0.5)`` in the same order -- no library rounding whose
half-rule could differ).

Hex ids ``(hq, hr)`` are shuffle/join keys exactly like square cell
ids: hexbin aggregation is ``map_batches(hex_of) -> groupby((hq,hr))``
with per-block partials, and k-ring neighbourhoods drive halo-style
meets on hex worlds.
"""

from __future__ import annotations

import numpy as np

_SQRT3 = np.sqrt(3.0)


def hex_of(x, y, size: float):
    """Vectorized point -> axial (q, r) int64 hex ids (pointy-top,
    circumradius ``size``), cube-rounded with the strict-``>`` fix
    order (dx first, then dy, else dz)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    q = (_SQRT3 / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    cy = -q - r
    rx = np.floor(q + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(r + 0.5)
    dx = np.abs(rx - q)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - r)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    fq = np.where(fix_x, -ry - rz, rx)
    fr = np.where(fix_z, -rx - ry, rz)
    return fq.astype(np.int64), fr.astype(np.int64)


def hex_center(hq, hr, size: float):
    """Axial ids -> cell center (x, y)."""
    hq = np.asarray(hq, np.float64)
    hr = np.asarray(hr, np.float64)
    return (size * (_SQRT3 * hq + _SQRT3 / 2.0 * hr),
            size * 1.5 * hr)


def hex_distance(q1, r1, q2, r2):
    """Cube (grid-step) distance between hex cells."""
    dq = np.asarray(q1) - np.asarray(q2)
    dr = np.asarray(r1) - np.asarray(r2)
    return ((np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2).astype(
        np.int64)


def hex_kring(hq: int, hr: int, k: int) -> list[tuple[int, int]]:
    """All cells within grid distance k (1 + 3k(k+1) cells),
    deterministic row-major order."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((hq + dq, hr + dr))
    return out


# The oracle-side replay of hex_of for a point (X, Y) -- interpolate
# column expressions for X/Y and a literal for SIZE.  Field order and
# operator shapes mirror hex_of exactly.
HEX_OF_SQL = """
with _pt as (select {pk} as pk, ({x}) as x, ({y}) as y from {src}),
_ax as (select pk,
               (sqrt(3.0) / 3.0 * x - y / 3.0) / {size} as q,
               (2.0 / 3.0 * y) / {size} as r
        from _pt),
_cu as (select pk, q, r, (-q - r) as cy,
               floor(q + 0.5) as rx,
               floor((-q - r) + 0.5) as ry,
               floor(r + 0.5) as rz
        from _ax),
_fx as (select pk,
               (abs(rx - q) > abs(ry - cy)
                and abs(rx - q) > abs(rz - r)) as fix_x,
               (abs(ry - cy) > abs(rz - r)) as fix_y,
               rx, ry, rz
        from _cu),
hexed as (select pk,
                 cast(case when fix_x then -ry - rz else rx end
                      as bigint) as hq,
                 cast(case when (not fix_x) and (not fix_y)
                           then -rx - ry else rz end
                      as bigint) as hr
           from _fx)
"""
