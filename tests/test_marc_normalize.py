"""Golden tests for MARC Koha/Alma normalize() (item-to-holdings rewrite)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from recordmanager_spark.extractors.marc import parse_marc_in_json
from recordmanager_spark.extractors.marc_normalize import (
    holdings_summary,
    normalize_marc,
)


def _rec(fields):
    return json.dumps({"leader": "00000cam a22000004i 4500", "fields": fields})


def _f952(subs):
    return {"952": {"ind1": " ", "ind2": " ", "subfields": subs}}


KOHA = _rec(
    [
        {"245": {"ind1": "1", "ind2": "0", "subfields": [{"a": "T"}]}},
        # two available items, same branch/location/callnumber -> one holding
        _f952([{"a": "HOME"}, {"b": "MAIN"}, {"c": "LOC"}, {"o": "QA1"}, {"7": "0"}]),
        _f952([{"a": "HOME"}, {"b": "MAIN"}, {"c": "LOC"}, {"o": "QA1"}, {"7": "1"}]),
        # lost item in another branch -> separate holding, unavailable
        _f952([{"b": "BR2"}, {"c": "LOC2"}, {"o": "QB2"}, {"1": "lost"}, {"7": "0"}]),
        {"999": {"ind1": " ", "ind2": " ", "subfields": [{"c": "77"}]}},
    ]
)

ALMA = _rec(
    [
        {"001": "alma-9"},
        _f952([{"b": "LIB"}, {"c": "STACKS"}, {"h": "v.1"}, {"1": "1"}]),
        _f952([{"b": "LIB"}, {"c": "STACKS"}, {"h": "v.1"}, {"1": "0"}]),
    ]
)


def _normalize(spark, raw, **kw):
    df = spark.createDataFrame([(raw,)], "raw string")
    parsed = df.select(parse_marc_in_json("raw").alias("marc"))
    return parsed.select(normalize_marc(F.col("marc"), **kw).alias("marc"))


def _fields(row, tag):
    return [f for f in row.marc.fields if f.tag == tag]


def test_koha_holdings_grouping(spark):
    out = _normalize(spark, KOHA, koha=True).collect()[0]
    h = _fields(out, "952")
    assert len(h) == 2  # two distinct (branch,c,h,o,8) keys
    first = {s.code: s.value for s in h[0].subfields}
    # location re-emitted as $b, availability marker present ($7 in 0/1)
    assert first == {"b": "MAIN", "c": "LOC", "o": "QA1", "9": "1"}
    second = {s.code: s.value for s in h[1].subfields}
    # $1 lost -> unavailable: no $9
    assert second == {"b": "BR2", "c": "LOC2", "o": "QB2"}
    # 001 materialized from 999$c
    f001 = _fields(out, "001")
    assert len(f001) == 1 and f001[0].value == "77"


def test_koha_home_branch(spark):
    out = _normalize(spark, KOHA, koha=True, koha_use_home_branch=True).collect()[0]
    h = _fields(out, "952")
    # branch from $a, still emitted as $b
    assert {s.code: s.value for s in h[0].subfields}["b"] == "HOME"
    # third item has no $a -> its own empty-branch key
    assert len(h) == 2


def test_alma_availability_and_090(spark):
    out = _normalize(spark, ALMA, alma=True).collect()[0]
    h = _fields(out, "952")
    assert len(h) == 1  # same key, merged
    codes = {s.code: s.value for s in h[0].subfields}
    assert codes == {"b": "LIB", "c": "STACKS", "h": "v.1", "9": "1"}  # any $1==1
    f090 = _fields(out, "090")
    assert {s.code: s.value for s in f090[0].subfields} == {"a": "(Alma)alma-9"}


def test_normalize_noop_without_params(spark):
    out = _normalize(spark, KOHA).collect()[0]
    assert len(_fields(out, "952")) == 3  # untouched


def test_holdings_summary(spark):
    df = _normalize(spark, ALMA, alma=True)
    r = df.select(holdings_summary(F.col("marc")).alias("h")).collect()[0]
    assert r.h == [("LIB", "", True)]


def test_no_952_fields(spark):
    plain = _rec([{"245": {"ind1": "1", "ind2": "0", "subfields": [{"a": "T"}]}}])
    out = _normalize(spark, plain, koha=True).collect()[0]
    assert _fields(out, "952") == []
    assert _fields(out, "001") == []  # no 999$c either
