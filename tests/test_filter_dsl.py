"""Filter-DSL compilation tests — mirrors the reference's query-translation
tests (PDODatabaseTest::testQueryConversion, SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from recordmanager_spark.plans.filter_dsl import Regex, apply_query, compile_filter


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        Row(_id="a.1", source_id="a", deleted=False, n=1, tags=["x", "y"], title="Annual report"),
        Row(_id="a.2", source_id="a", deleted=True, n=5, tags=["y"], title="Other"),
        Row(_id="b.1", source_id="b", deleted=False, n=10, tags=[], title=None),
        Row(_id="b.2", source_id=None, deleted=False, n=None, tags=None, title="annual Report 2"),
    ]
    return spark.createDataFrame(rows)


def ids(df):
    return sorted(r["_id"] for r in df.collect())


def test_equality(records):
    assert ids(records.filter(compile_filter({"source_id": "a"}, records))) == ["a.1", "a.2"]


def test_null_equality(records):
    assert ids(records.filter(compile_filter({"source_id": None}, records))) == ["b.2"]


def test_in_with_null_member(records):
    flt = {"source_id": {"$in": ["b", None]}}
    assert ids(records.filter(compile_filter(flt, records))) == ["b.1", "b.2"]


def test_ne_matches_nulls(records):
    # Mongo $ne semantics: missing/null values match
    flt = {"source_id": {"$ne": "a"}}
    assert ids(records.filter(compile_filter(flt, records))) == ["b.1", "b.2"]


def test_exists(records):
    assert ids(records.filter(compile_filter({"n": {"$exists": False}}, records))) == ["b.2"]


def test_range_ops(records):
    flt = {"n": {"$gte": 1, "$lt": 10}}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.1", "a.2"]


def test_or_nor(records):
    flt = {"$or": [{"n": 1}, {"n": 10}]}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.1", "b.1"]
    flt = {"$nor": [{"n": 1}, {"n": 10}], "deleted": False}
    assert ids(records.filter(compile_filter(flt, records))) == []


def test_array_contains(records):
    # scalar condition on array field = contains (EAV subquery semantics)
    assert ids(records.filter(compile_filter({"tags": "x"}, records))) == ["a.1"]


def test_regex(records):
    flt = {"title": Regex("^[Aa]nnual")}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.1", "b.2"]


def test_apply_query_pagination(records):
    out = apply_query(
        records,
        {"deleted": False},
        sort=[("_id", 1)],
        skip=1,
        limit=1,
        projection=["_id"],
    )
    assert [r["_id"] for r in out.collect()] == ["b.1"]
    assert out.columns == ["_id"]


def test_array_in_null_matches_empty(records):
    # PDODatabaseTest 'params with null in $in': a null member over an EAV
    # array attr matches records with NO attr rows — i.e. empty OR null
    # arrays here, not just null ones.
    flt = {"tags": {"$in": [None]}}
    assert ids(records.filter(compile_filter(flt, records))) == ["b.1", "b.2"]


def test_array_in_null_and_values(records):
    # 'params with null and other values in $in': union of absent-attr and
    # value matches.
    flt = {"tags": {"$in": [None, "x"]}}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.1", "b.1", "b.2"]


def test_array_nin(records):
    # $nin over an array attr: no member may match; with a null member the
    # attr must also be present (non-empty).
    flt = {"tags": {"$nin": ["x"]}}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.2", "b.1", "b.2"]
    flt = {"tags": {"$nin": ["x", None]}}
    assert ids(records.filter(compile_filter(flt, records))) == ["a.2"]
