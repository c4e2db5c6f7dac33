"""GeniePlus offline page-processing tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from recordmanager_spark.extractors import marc as MARC
from recordmanager_spark.sources import genieplus as GP

MARC_TEXT = "\n".join(
    [
        "LDR 00000cam a2200000 i 4500",
        "008 210101s2021    fi            000 0 fin d",
        "245 10 $aGenie title :$ba subtitle",
        "100 1_ $aWriter, W.",
    ]
)

PAGE = json.dumps(
    {
        "total": 1,
        "records": [
            {
                "UniqRecNum": [{"display": "G-42"}],
                "MarcRecord": [{"display": MARC_TEXT}],
                "Inventory.Location.CodeDesc": [
                    {"display": "Main"},
                    {"display": "Main"},
                    {"display": "Branch"},
                ],
                "Inventory.SubLoc.CodeDesc": [
                    {"display": "Stacks"},
                    {"display": "Stacks"},
                ],
                "Inventory.CallNumLC": [
                    {"display": "QA1"},
                    {"display": "QA1"},
                    {"display": "QB2"},
                ],
                "Inventory.Barcode": [
                    {"display": "b1"},
                    {"display": "b2"},
                    {"display": "b3"},
                    {"display": "b4"},
                ],
            }
        ],
    }
)


def _harvest(spark, **kw):
    df = spark.createDataFrame([(PAGE,)], "json string")
    return GP.harvest_pages(df, source="lib", **kw)


def test_genieplus_marc_and_injections(spark):
    r = _harvest(spark).collect()[0]
    assert r.oai_id == "genieplus:lib:G-42"
    assert r.local_id == "G-42"
    assert r.marc.leader == "00000cam a2200000 i 4500"
    tags = [f.tag for f in r.marc.fields]
    # original fields, then 999$c, then 852 holdings (appended like the
    # reference's addChild order); the barcode-only item keeps its '--'
    # group, so four holdings in total
    assert tags == ["008", "245", "100", "999", "852", "852", "852", "852"]
    by_tag = {f.tag: f for f in r.marc.fields}
    assert [(s.code, s.value) for s in by_tag["999"].subfields] == [("c", "G-42")]
    h852 = [f for f in r.marc.fields if f.tag == "852"]
    # groups: Main-Stacks-QA1 (b1,b2), Branch--QB2 (b3), --- with barcode b4
    assert [(s.code, s.value) for s in h852[0].subfields] == [
        ("a", "Main"), ("b", "Stacks"), ("h", "QA1"), ("p", "b1"),
    ]
    assert [(s.code, s.value) for s in h852[1].subfields] == [
        ("a", "Main"), ("b", "Stacks"), ("h", "QA1"), ("p", "b2"),
    ]
    assert [(s.code, s.value) for s in h852[2].subfields] == [
        ("a", "Branch"), ("b", ""), ("h", "QB2"), ("p", "b3"),
    ]
    assert [(s.code, s.value) for s in h852[3].subfields] == [
        ("a", ""), ("b", ""), ("h", ""), ("p", "b4"),
    ]


def test_genieplus_item_limit(spark):
    r = _harvest(spark, item_limit_per_location_group=1).collect()[0]
    h852 = [f for f in r.marc.fields if f.tag == "852"]
    assert len(h852) == 3  # one per group
    assert _harvest(spark, item_limit_per_location_group=0).collect()[0]
    r0 = _harvest(spark, item_limit_per_location_group=0).collect()[0]
    assert [f.tag for f in r0.marc.fields if f.tag == "852"] == []


def test_genieplus_feeds_marc_extractor(spark):
    # repartition = the materialization barrier the real pipeline has
    # between harvest and extraction (see harvest_pages plan note)
    h = _harvest(spark).repartition(2)
    out = MARC.to_solr_columns(h, "marc").select("id", "title").collect()[0]
    assert out.title.startswith("Genie title")


def test_genieplus_malformed(spark):
    df = spark.createDataFrame([("nope",), (None,)], "json string")
    assert GP.harvest_pages(df).count() == 0
