"""Dedup-group merge: fold N member records into one composite document.

Reference: SolrUpdater.php:1124-1279 (processDedupRecord) and :2612-2707
(mergeRecords). Semantics re-expressed relationally:

1. Score each member (field count + title length, ALL-CAPS titles
   penalized by halving, SolrUpdater.php:2612-2650); the best-scored member
   is the "base" record and wins ties for single-valued fields.
2. Per-field merge policy:
   - merged_fields (multi-valued): concatenation in base-first order with
     case-insensitive dedup (SolrUpdater.php:2652-2680, 1226-1256)
   - single_fields: first non-empty value in score order (:2681-2694)
   - summed_fields: numeric sum (:2695-2696)
3. The merged doc gets id = dedup_id, record_format='merged',
   merged_boolean; members get merged_child_boolean and the group's member
   ids as local_ids_str_mv (:1209-1277).

Execution shape: ONE shuffle on the group key. Scoring is a scan-stage
expression; every policy is an aggregate with a map-side partial. Ordering
inside aggregates is made explicit by collecting (rank, value) structs and
array_sort-ing — no reliance on collect_list order, which is undefined
under parallel merge (critical for determinism on a 1000-executor cluster).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.keys import array_iunique


def member_score(title_col: Column, n_fields: Column) -> Column:
    """Reference scoring: non-empty field count + title length; ALL-CAPS
    titles count half (SolrUpdater.php:2612-2650)."""
    tl = F.coalesce(F.length(title_col), F.lit(0))
    allcaps = title_col.isNotNull() & (F.upper(title_col) == title_col) & (
        F.lower(title_col) != title_col
    )
    return n_fields + F.when(allcaps, tl / 2).otherwise(tl)


def merge_groups(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    merged_fields: Sequence[str] = (),
    single_fields: Sequence[str] = (),
    summed_fields: Sequence[str] = (),
    score: Column | None = None,
) -> DataFrame:
    """Produce one merged row per group.

    ``score`` defaults to 0 (then order is by id — deterministic). Higher
    score = better base record. Output columns: group id as ``id_col``,
    every policy field, plus ``local_ids`` (member id list, sorted) and
    ``group_size``.
    """
    score = score if score is not None else F.lit(0)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__score").desc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("__score", score).withColumn(
        "__rank", F.row_number().over(w)
    )

    aggs: list[Column] = [
        F.sort_array(F.collect_list(F.col(id_col))).alias("local_ids"),
        F.count(F.lit(1)).alias("group_size"),
    ]
    for f in merged_fields:
        # collect (rank, values) pairs, sort by rank (base first), flatten,
        # then case-insensitive first-occurrence dedup.
        pairs = F.collect_list(
            F.struct(F.col("__rank").alias("r"), F.col(f).alias("v"))
        )
        # NULL member arrays must not poison the flatten (flatten of an
        # array containing NULL is NULL -> a group of all-null values
        # should merge to [], not NULL)
        ordered = F.flatten(
            F.transform(
                F.array_sort(pairs), lambda p: F.coalesce(p["v"], F.array())
            )
        )
        aggs.append(array_iunique(F.filter(ordered, lambda x: x.isNotNull())).alias(f))
    for f in single_fields:
        # first non-empty value in rank order: min over (rank, value)
        # structs restricted to non-null values — struct ordering compares
        # rank first, so min = best-ranked non-empty.
        pick = F.min(
            F.when(
                F.col(f).isNotNull() & (F.col(f).cast("string") != ""),
                F.struct(F.col("__rank").alias("r"), F.col(f).alias("v")),
            )
        )
        aggs.append(pick["v"].alias(f))
    for f in summed_fields:
        aggs.append(F.sum(F.col(f)).alias(f))

    return ranked.groupBy(F.col(group_col).alias(id_col)).agg(*aggs)


def merged_and_members(
    df: DataFrame,
    group_col: str,
    id_col: str,
    **kwargs,
) -> tuple[DataFrame, DataFrame]:
    """The full processDedupRecord output: (merged docs, member docs
    annotated with merged_child_boolean + local_ids)."""
    merged = merge_groups(df, group_col, id_col, **kwargs).withColumn(
        "record_format", F.lit("merged")
    ).withColumn("merged_boolean", F.lit(True))
    w = Window.partitionBy(group_col)
    members = (
        df.withColumn("merged_child_boolean", F.lit(True))
        .withColumn("local_ids", F.sort_array(F.collect_list(id_col).over(w)))
    )
    return merged, members


def copy_down(
    members: DataFrame,
    merged: DataFrame,
    group_col: str,
    id_col: str,
    fields: Sequence[str],
) -> DataFrame:
    """Copy configured fields from the merged doc back to every member
    (SolrUpdater.php:2718-2737). Broadcast the merged side when small;
    otherwise this is a co-partitioned equi-join on the group key."""
    sel = merged.select(
        F.col(id_col).alias(group_col), *[F.col(f).alias(f"__m_{f}") for f in fields]
    )
    out = members.join(sel, on=group_col, how="left")
    for f in fields:
        out = out.withColumn(
            f,
            F.when(F.col(f"__m_{f}").isNotNull(), F.col(f"__m_{f}")).otherwise(
                F.col(f)
            ),
        ).drop(f"__m_{f}")
    return out
