"""Normalization pipeline tests (SolrUpdater.php:2300-2430, 2554-2600)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from recordmanager_spark.operators import normalize as N


def _arr_df(spark, values, name="v"):
    schema = T.StructType([T.StructField(name, T.ArrayType(T.StringType()))])
    return spark.createDataFrame([(v,) for v in values], schema)


def test_hierarchical_facet(spark):
    out = (
        _arr_df(spark, [["a/b/c", "x"], [""], None])
        .select(N.hierarchical_facet(F.col("v")).alias("h"))
        .collect()
    )
    assert out[0].h == ["0/a/", "1/a/b/", "2/a/b/c/", "0/x/"]
    assert out[1].h == []
    assert out[2].h == []


def test_allfields_iunique_and_exclusions(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("topic", T.ArrayType(T.StringType())),
            T.StructField("fullrecord", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [("rec1", "Title", ["TITLE", "other"], "<xml/>")], schema
    )
    r = df.select(N.allfields(df).alias("a")).collect()[0]
    # id/fullrecord excluded; case-insensitive dedup keeps first occurrence
    assert r.a == ["Title", "other"]


def test_normalize_fields_trim_and_nonindexed(spark):
    schema = T.StructType(
        [
            T.StructField("title", T.StringType()),
            T.StructField("topic", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(
        [("abcdefghij", ["keep", "drop-me", "keep", "ﬁne"])], schema
    )
    out = N.normalize_fields(
        df, limits={"title": 4}, non_indexed=["drop-me"]
    ).collect()[0]
    assert out.title == "abcd"
    # NFKC folds the 'ﬁ' ligature; dedup applied
    assert out.topic == ["keep", "fine"]


def test_normalize_fields_wildcard_limit(spark):
    schema = T.StructType([T.StructField("title_full_str", T.StringType())])
    df = spark.createDataFrame([("abcdefghij",)], schema)
    out = N.normalize_fields(df, limits={"*_str": 3}).collect()[0]
    assert out.title_full_str == "abc"


def test_institution_in_building(spark):
    out = (
        N.add_institution_to_building(
            _arr_df(spark, [["MAIN", ""], []], name="building"), "INST"
        )
        .collect()
    )
    assert out[0].building == ["INST/MAIN", "INST"]
    assert out[1].building == ["INST"]


def test_institution_other_field_keeps_empty(spark):
    out = N.add_institution_to_building(
        _arr_df(spark, [["X", ""]], name="building2"),
        "INST",
        building_fields=["building2"],
    ).collect()
    assert out[0].building2 == ["INST/X", ""]


def test_indexed_timestamps(spark):
    schema = T.StructType(
        [
            T.StructField("created", T.TimestampType()),
            T.StructField("date", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [(datetime.datetime(2020, 1, 2, 3, 4, 5), datetime.datetime(2021, 6, 7, 8, 9, 10))],
        schema,
    )
    r = N.indexed_timestamps(df).collect()[0]
    assert r.first_indexed == "2020-01-02T03:04:05Z"
    assert r.last_indexed == "2021-06-07T08:09:10Z"
