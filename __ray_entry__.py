"""Driver contract for the Ray-Data BAL engine.

``entry()`` runs the flagship pipeline (the full tiled BAL engine on the
deterministic t1 synthetic world, sized for a smoke check).  ``queries()``
exposes one entry per implemented operator family from SURVEY.md §2 --
SQL-checked entries over the driver's parquet tables plus rows-only entries
for the geospatial/dedup/ANN pipelines; ``oracle_sql()`` returns the DuckDB
equivalents for the former.

Ray is initialised by the driver before import: nothing here calls
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import balrog_ray
from balrog_ray.relational.queries import SQL_CHECKED
from balrog_ray.relational.rows_only import ROWS_ONLY

# nominal hash-aggregator CPU accounting, before any Dataset exists
# (explicit entry-point call; importing balrog_ray alone does nothing)
balrog_ray.tune_data_context()


def entry() -> Any:
    """Flagship: synthetic tiles -> halo exchange -> slope/aspect ->
    AS 3959 classification -> 9 BAL bands -> per-band histogram."""
    from balrog_ray.relational.rows_only import q_bal_band_histogram

    return q_bal_band_histogram("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    for name, (fn, _) in SQL_CHECKED.items():
        out[name] = fn
    out.update(ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in SQL_CHECKED.items()
            if sql is not None}
