"""Group-merge policy goldens (SolrUpdater mergeRecords semantics)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from recordmanager_spark.operators import merge as MG


def test_merge_policies(spark):
    rows = [
        Row(gid=1, _id="a", title="Proper Title Longer", topics=["X", "y"], pages=10, note="first"),
        Row(gid=1, _id="b", title="SHOUTY TITLE LONGER THAN OTHER", topics=["Y", "z"], pages=5, note=None),
        Row(gid=2, _id="c", title=None, topics=None, pages=None, note=None),
    ]
    df = spark.createDataFrame(rows)
    score = MG.member_score(F.col("title"), F.when(F.col("note").isNotNull(), 1).otherwise(0))
    out = MG.merge_groups(
        df,
        "gid",
        "_id",
        merged_fields=["topics"],
        single_fields=["note"],
        summed_fields=["pages"],
        score=score,
    ).orderBy("_id")
    g1, g2 = out.collect()
    # all-caps title halved: b scores ~15, a scores 19+1 -> a is base
    assert g1["local_ids"] == ["a", "b"]
    assert g1["group_size"] == 2
    # merged: base-first order, case-insensitive distinct keeps first case
    assert g1["topics"] == ["X", "y", "z"]
    assert g1["note"] == "first"
    assert g1["pages"] == 15
    # singleton group with nulls
    assert g2["topics"] == []
    assert g2["note"] is None
    assert g2["pages"] is None


def test_merged_and_members_and_copy_down(spark):
    rows = [
        Row(gid=1, _id="a", title="T", topics=["x"], pages=1, note="n"),
        Row(gid=1, _id="b", title="T2", topics=["y"], pages=2, note=None),
    ]
    df = spark.createDataFrame(rows)
    merged, members = MG.merged_and_members(
        df, "gid", "_id", merged_fields=["topics"], summed_fields=["pages"]
    )
    m = merged.first()
    assert m["record_format"] == "merged" and m["merged_boolean"]
    assert sorted(members.select("local_ids").first()["local_ids"]) == ["a", "b"]

    down = MG.copy_down(
        df, merged.withColumnRenamed("_id", "gid_out").withColumnRenamed("gid_out", "_id"),
        "gid", "_id", ["topics"],
    )
    got = {r["_id"]: r["topics"] for r in down.collect()}
    assert got["a"] == ["x", "y"] and got["b"] == ["x", "y"]
