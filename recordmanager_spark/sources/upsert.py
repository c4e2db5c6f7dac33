"""Record-store upsert: MERGE INTO semantics for harvested batches.

Behavioral spec (reference, NOT code): Command/StoreRecordTrait.php:187-310 —
- last-write-wins by ``_id``: an incoming record replaces the stored row
- ``created`` survives from the stored row; new rows get created=updated
- ``updated`` (and ``date``) stamp to the batch timestamp on every touch
- ``normalized_data`` stored empty when identical to ``original_data``
- rows not in the batch are untouched.

Spark-first: one full-outer join on the id — exactly what ``MERGE INTO``
compiles to on Delta; on plain parquet this produces the next table
version. At 100 TB: partition/bucket the store by hash(_id) and the
incoming batch co-partitions, so the merge is a co-located join; the
untouched partitions rewrite only when touched (Delta) or via partition
overwrite (parquet).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_empty_if_identical(
    df: DataFrame,
    original_col: str = "original_data",
    normalized_col: str = "normalized_data",
) -> DataFrame:
    """normalized_data := '' when identical to original (StoreRecordTrait)."""
    return df.withColumn(
        normalized_col,
        F.when(
            F.col(normalized_col) == F.col(original_col), F.lit("")
        ).otherwise(F.coalesce(F.col(normalized_col), F.lit(""))),
    )


def upsert_records(
    existing: DataFrame,
    batch: DataFrame,
    timestamp: _dt.datetime,
    id_col: str = "_id",
    order_col: str | None = None,
) -> DataFrame:
    """Last-write-wins upsert of `batch` into `existing`.

    Columns present in both frames take the batch's value for matched and
    new ids; `created` is preserved for matched ids; `updated` and `date`
    stamp to `timestamp` for every batch row; untouched rows pass through
    unchanged. Result schema = existing's schema.

    A batch may contain the same id twice (re-harvest within one run); the
    store keeps exactly one row per id. With ``order_col`` the row with
    the greatest value wins (the reference's stream-order last-write);
    without it the survivor is arbitrary-but-single (dropDuplicates).
    """
    ts = F.lit(timestamp)
    cols = existing.columns
    if order_col:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(F.col(order_col).desc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        batch = batch.dropDuplicates([id_col])
    b = batch
    for c in cols:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(existing.schema[c].dataType))
    b = b.select(*cols)

    e = existing.alias("e")
    bb = b.alias("b")
    joined = e.join(bb, F.col(f"e.{id_col}") == F.col(f"b.{id_col}"), "full_outer")
    from_batch = F.col(f"b.{id_col}").isNotNull()

    out_cols = []
    for c in cols:
        if c == id_col:
            out_cols.append(
                F.coalesce(F.col(f"b.{c}"), F.col(f"e.{c}")).alias(c)
            )
        elif c == "created":
            # stored created wins; brand-new rows get the batch timestamp
            out_cols.append(
                F.when(
                    F.col(f"e.{id_col}").isNotNull(), F.col(f"e.{c}")
                ).otherwise(ts).alias(c)
            )
        elif c in ("updated", "date"):
            out_cols.append(
                F.when(from_batch, ts).otherwise(F.col(f"e.{c}")).alias(c)
            )
        else:
            out_cols.append(
                F.when(from_batch, F.col(f"b.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
            )
    return joined.select(*out_cols)
