"""compare-records / check-index analogues (SolrComparer.php:220,
SolrUpdater.php:1476): field-level index diff and orphan detection as
joins instead of per-id HTTP fetch loops."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from recordmanager_spark.operators.index_compare import (
    DEFAULT_IGNORE_FIELDS,
    check_index,
    compare_index_docs,
)


def _diffs(df):
    return {
        (r["id"], r["field"]): (tuple(r["added"]), tuple(r["removed"]))
        for r in df.collect()
    }


def test_compare_field_value_diff(spark):
    records = spark.createDataFrame(
        [("a", "new title", ["x", "y"])],
        "id string, title string, topic array<string>",
    )
    indexed = spark.createDataFrame(
        [("a", "old title", ["y", "z"])],
        "id string, title string, topic array<string>",
    )
    d = _diffs(compare_index_docs(records, indexed))
    assert d == {
        ("a", "title"): (("new title",), ("old title",)),
        ("a", "topic"): (("x",), ("z",)),
    }


def test_compare_set_semantics_ignores_order(spark):
    # PHP's in_array membership both ways: reordered multi-values are
    # NOT a difference (SolrComparer.php:278-288)
    records = spark.createDataFrame(
        [("a", ["x", "y"])], "id string, topic array<string>"
    )
    indexed = spark.createDataFrame(
        [("a", ["y", "x"])], "id string, topic array<string>"
    )
    assert compare_index_docs(records, indexed).count() == 0


def test_compare_index_only_field_reports_removed(spark):
    # allFields is the UNION of both docs' keys: a field present only
    # in the index diffs as fully removed
    records = spark.createDataFrame([("a", "t")], "id string, title string")
    indexed = spark.createDataFrame(
        [("a", "t", "legacy-val")], "id string, title string, legacy string"
    )
    d = _diffs(compare_index_docs(records, indexed))
    assert d == {("a", "legacy"): ((), ("legacy-val",))}


def test_compare_missing_vs_skip_missing(spark):
    records = spark.createDataFrame([("a", "t")], "id string, title string")
    indexed = spark.createDataFrame([], "id string, title string")
    # without skip_missing every field of an unindexed record is added
    d = _diffs(compare_index_docs(records, indexed))
    assert d == {("a", "title"): (("t",), ())}
    # --skip-missing (SolrComparer.php:262) silences them
    assert (
        compare_index_docs(records, indexed, skip_missing=True).count() == 0
    )


def test_compare_index_extra_ids_not_reported(spark):
    # driven from the records side: index rows this batch doesn't touch
    # are check-index's job, not compare's
    records = spark.createDataFrame([("a", "t")], "id string, title string")
    indexed = spark.createDataFrame(
        [("a", "t"), ("zzz", "gone")], "id string, title string"
    )
    assert compare_index_docs(records, indexed).count() == 0


def test_compare_fields_filter_and_ignore_list(spark):
    records = spark.createDataFrame(
        [("a", "t1", "af1", "s1")],
        "id string, title string, allfields string, spelling string",
    )
    indexed = spark.createDataFrame(
        [("a", "t2", "af2", "s2")],
        "id string, title string, allfields string, spelling string",
    )
    # default: allfields/spelling are in the ignore list
    assert "allfields" in DEFAULT_IGNORE_FIELDS
    d = _diffs(compare_index_docs(records, indexed))
    assert set(d) == {("a", "title")}
    # explicit --fields intersects instead
    d = _diffs(compare_index_docs(records, indexed, fields=["allfields"]))
    assert set(d) == {("a", "allfields")}


def test_compare_null_field_treated_as_absent(spark):
    # PHP isset(): a null field is missing, diffing as pure removal
    records = spark.createDataFrame(
        [("a", None)], "id string, title string"
    )
    indexed = spark.createDataFrame([("a", "t")], "id string, title string")
    d = _diffs(compare_index_docs(records, indexed))
    assert d == {("a", "title"): ((), ("t",))}


def test_check_index_orphans(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    indexed = spark.createDataFrame(
        [
            ("r1", "standard"),   # alive
            ("r2", "standard"),   # deleted in db
            ("r3", "standard"),   # missing from db
            ("m1", "merged"),     # alive dedup group
            ("m2", "merged"),     # deleted dedup group
            ("m3", "merged"),     # missing dedup group
        ],
        "id string, record_format string",
    )
    records = spark.createDataFrame(
        [("r1", False, t0), ("r2", True, t0)],
        "id string, deleted boolean, updated timestamp",
    )
    dedup = spark.createDataFrame(
        [("m1", False, t0), ("m2", True, t0)],
        "id string, deleted boolean, updated timestamp",
    )
    out = {
        r["id"]: (r["merged"], r["reason"], r["deleted_at"])
        for r in check_index(
            indexed, records, dedup=dedup, updated_col="updated"
        ).collect()
    }
    assert out == {
        "r2": (False, "deleted", t0),
        "r3": (False, "missing", None),
        "m2": (True, "deleted", t0),
        "m3": (True, "missing", None),
    }


def test_check_index_without_dedup_table(spark):
    # no dedup table supplied: every merged row is unverifiable ->
    # reported missing (conservative), standard rows still checked
    indexed = spark.createDataFrame(
        [("r1", "standard"), ("m1", "merged")],
        "id string, record_format string",
    )
    records = spark.createDataFrame([("r1",)], "id string").withColumn(
        "deleted", F.lit(False)
    )
    out = {r["id"]: r["reason"] for r in check_index(indexed, records).collect()}
    assert out == {"m1": "missing"}


def test_check_index_null_format_is_standard(spark):
    # NULL record_format = standard (the reference reads record_format
    # ?? recordtype; only 'merged' routes to dedup) — a NULL must not
    # silently drop the row from both probes (r11 review finding)
    indexed = spark.createDataFrame(
        [("r1", None), ("r2", None)],
        "id string, record_format string",
    )
    records = spark.createDataFrame(
        [("r1",)], "id string"
    ).withColumn("deleted", F.lit(False))
    out = {r["id"]: r["reason"] for r in check_index(indexed, records).collect()}
    assert out == {"r2": "missing"}
