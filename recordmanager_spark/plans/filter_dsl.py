"""The reference's Mongo-subset filter DSL compiled to Spark Column exprs.

Reference semantics: src/RecordManager/Base/Database/PDODatabase.php:1015-1152
(SQL compilation) and MongoDatabase.php:686-695 (regex conversion). The DSL is
a dict of ``field -> condition`` combined with AND; conditions are scalars
(equality), ``Regex`` wrappers, or operator dicts:

    {"source_id": "alpha",                        # equality
     "deleted": {"$ne": True},                    # not equal
     "updated": {"$gte": ts1, "$lt": ts2},        # range
     "format": {"$in": ["marc", "dc", None]},     # IN incl. null member
     "dedup_id": {"$exists": False},              # null-ness
     "$or": [{...}, {...}],                       # disjunction of sub-filters
     "$nor": [{...}, {...}],                      # negated disjunction
     "title": Regex("^annual report")}            # regex match

Array-valued fields use Mongo contains-semantics: a scalar condition against
an ArrayType column means "array contains value" (reference: EAV subquery
rewrite, PDODatabase.php:1163-1181). The compiler inspects the DataFrame
schema to decide, so the same filter works on both backends, exactly as the
reference's two Database implementations share one logical model.

Because the output is a plain Column expression over a DataFrame, Catalyst
pushes compiled predicates into the parquet scan (PushedFilters) — the Spark
analogue of the reference handing filters to Mongo/MySQL verbatim.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPS = {"$in", "$ne", "$exists", "$gt", "$gte", "$lt", "$lte", "$nin"}


class Regex:
    """Marker for a regex condition (reference: Database/Regex.php)."""

    def __init__(self, pattern: str):
        self.pattern = pattern

    def __repr__(self) -> str:  # pragma: no cover
        return f"Regex({self.pattern!r})"


def _is_array_field(df: DataFrame | None, field: str) -> bool:
    if df is None:
        return False
    try:
        return isinstance(df.schema[field].dataType, T.ArrayType)
    except KeyError:
        return False


def _field_eq(field: str, value: Any, df: DataFrame | None) -> Column:
    col = F.col(field)
    if isinstance(value, Regex):
        if _is_array_field(df, field):
            return F.exists(col, lambda x: x.rlike(value.pattern))
        return col.rlike(value.pattern)
    if value is None:
        return col.isNull()
    if _is_array_field(df, field) and not isinstance(value, (list, tuple)):
        # Mongo contains-semantics on array fields (PDODatabase.php:1172-1181)
        return F.array_contains(col, F.lit(value))
    return col == F.lit(value)


def _field_ops(field: str, ops: Mapping[str, Any], df: DataFrame | None) -> Column:
    col = F.col(field)
    arr = _is_array_field(df, field)
    conds: list[Column] = []
    for op, v in ops.items():
        if op == "$in":
            vals = [x for x in v if x is not None]
            c = None
            if vals:
                if arr:
                    c = F.arrays_overlap(col, F.array(*[F.lit(x) for x in vals]))
                else:
                    c = col.isin(vals)
            if None in v:  # $in with null member (PDODatabase.php:1062-1096)
                # Array attrs live as EAV rows in the reference; "null" there
                # means the record has NO rows for the attr (PDODatabaseTest
                # 'params with null in $in'), i.e. an EMPTY array here.
                absent = (col.isNull() | (F.size(col) == 0)) if arr else col.isNull()
                c = absent if c is None else (c | absent)
            conds.append(c if c is not None else F.lit(False))
        elif op == "$nin":
            vals = [x for x in v if x is not None]
            if arr:
                c = (
                    ~F.arrays_overlap(col, F.array(*[F.lit(x) for x in vals]))
                    if vals
                    else F.lit(True)
                )
            else:
                c = ~col.isin(vals) if vals else F.lit(True)
            if None in v:
                c = c & (
                    (col.isNotNull() & (F.size(col) > 0)) if arr else col.isNotNull()
                )
            else:
                # SQL NOT IN semantics would null out; DSL keeps rows with null
                c = c | col.isNull()
            conds.append(c)
        elif op == "$ne":
            if v is None:
                conds.append(col.isNotNull())
            elif arr:
                conds.append(~F.array_contains(col, F.lit(v)) | col.isNull())
            else:
                # Mongo $ne matches missing/null values too
                conds.append((col != F.lit(v)) | col.isNull())
        elif op == "$exists":
            conds.append(col.isNotNull() if v else col.isNull())
        elif op == "$gt":
            conds.append(col > F.lit(v))
        elif op == "$gte":
            conds.append(col >= F.lit(v))
        elif op == "$lt":
            conds.append(col < F.lit(v))
        elif op == "$lte":
            conds.append(col <= F.lit(v))
        else:
            raise ValueError(f"unsupported operator {op!r} on field {field!r}")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def compile_filter(flt: Mapping[str, Any], df: DataFrame | None = None) -> Column:
    """Compile a filter dict to a single boolean Column (AND of all terms)."""
    if not flt:
        return F.lit(True)
    conds: list[Column] = []
    for field, cond in flt.items():
        if field == "$or":
            sub = [compile_filter(s, df) for s in cond]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(c)
        elif field == "$nor":
            sub = [compile_filter(s, df) for s in cond]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(~c)
        elif isinstance(cond, Mapping) and any(k in _OPS for k in cond):
            conds.append(_field_ops(field, cond, df))
        else:
            conds.append(_field_eq(field, cond, df))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def apply_query(
    df: DataFrame,
    flt: Mapping[str, Any] | None = None,
    *,
    sort: Sequence[tuple[str, int]] | None = None,
    skip: int = 0,
    limit: int | None = None,
    projection: Sequence[str] | None = None,
) -> DataFrame:
    """findRecords-equivalent: filter + sort/skip/limit/projection options.

    Reference: PDODatabase.php:1190-1219. ``sort`` is [(field, 1|-1), ...].
    Note: for deterministic pagination the caller should include a unique
    key as the final sort term (the reference relies on index order).
    """
    out = df.filter(compile_filter(flt or {}, df))
    if sort:
        out = out.orderBy(
            *[F.col(f).asc() if d >= 0 else F.col(f).desc() for f, d in sort]
        )
    if skip:
        out = out.offset(skip)
    if limit is not None:
        out = out.limit(limit)
    if projection:
        out = out.select(*projection)
    return out


def suppressed_condition(df, filters: dict[str, str]):
    """suppressOnField predicate (Record/AbstractRecord.php:446-477).

    ``filters`` maps a projected field to either '/regex/' (match any
    value) or a pipe-separated value list. True = record is suppressed.
    Works over scalar and array<string> columns; missing fields never
    suppress (reference's ``continue``).
    """
    from pyspark.sql import types as T

    cond = F.lit(False)
    for field, flt in filters.items():
        if field not in df.columns:
            continue
        is_re = flt.startswith("/") and (flt.endswith("/") or flt.endswith("/i"))
        # bind via closure factory, NOT lambda default args: pyspark counts
        # default parameters when deciding the higher-order-function arity
        # and would pass (value, index)
        if is_re:
            pat = flt[1 : flt.rindex("/")]
            if flt.endswith("/i"):
                pat = "(?i)" + pat

            def make_test(p):
                return lambda v: v.rlike(p)

            test = make_test(pat)
        else:

            def make_test_in(a):
                return lambda v: v.isin(*a)

            test = make_test_in(tuple(flt.split("|")))
        if isinstance(df.schema[field].dataType, T.ArrayType):
            hit = F.exists(F.coalesce(F.col(field), F.array()), test)
        else:
            hit = F.coalesce(test(F.col(field)), F.lit(False))
        cond = cond | hit
    return cond
