"""Shared shuffle-sizing rule: hash-join / groupby partition width
derived from the data instead of a literal.

One partition per ``rows_per_part`` rows of the larger input, clamped —
small inputs keep a cheap 8-partition plan, a 100x input widens the
shuffle instead of throttling on 8 reducers.  Every caller that sizes a
keyed shuffle from a row count goes through here so the constant is
tuned in exactly one place.
"""

from __future__ import annotations


def shuffle_width(rows: int, *, rows_per_part: int = 500_000,
                  lo: int = 8, hi: int = 512) -> int:
    return int(min(hi, max(lo, rows // rows_per_part + 1)))
