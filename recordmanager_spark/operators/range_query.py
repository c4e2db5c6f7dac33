"""Paginated timestamp-range scans (OAI-PMH provider semantics).

Reference: Controller/OaiPmhProvider.php:243-372 — set filter + ``updated``
range, sorted ascending, resumption token = (position, limit). The Spark
form is a plain filter + orderBy + offset/limit; the range predicate pushes
down to the parquet scan so a paginated serve over 100 TB only reads the
matching row groups (min/max stats pruning).

Pagination determinism: the reference relies on a unique index scan order;
we make it explicit by always adding the unique id as the final sort key.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.filter_dsl import compile_filter


def range_page(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    *,
    ts_from: Any = None,
    ts_until: Any = None,
    set_filter: Mapping[str, Any] | None = None,
    offset: int = 0,
    limit: int = 1000,
) -> DataFrame:
    """One page of records with ts in [ts_from, ts_until], ordered by
    (ts, id). ``set_filter`` is a filter-DSL dict (an OAI set is a stored
    filter, OaiPmhProvider.php:268-279)."""
    out = df
    if set_filter:
        out = out.filter(compile_filter(set_filter, df))
    if ts_from is not None:
        out = out.filter(F.col(ts_col) >= F.lit(ts_from))
    if ts_until is not None:
        out = out.filter(F.col(ts_col) <= F.lit(ts_until))
    out = out.orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    if offset:
        out = out.offset(offset)
    return out.limit(limit)
