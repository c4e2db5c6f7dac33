"""Sierra offline page-processing tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from recordmanager_spark.extractors import marc as MARC
from recordmanager_spark.sources import sierra as SI

PAGE = json.dumps(
    {
        "total": 3,
        "entries": [
            {
                "id": "1001",
                "deleted": False,
                "catalogDate": "2020-03-01",
                "locations": [{"code": "main", "name": "Main"}],
                "fixedFields": {
                    "30": {"label": "Material", "value": "a "},
                    "31": {"label": "BCODE3", "value": "x"},
                },
                "varFields": [
                    {"fieldTag": "_", "content": "00000cam a2200000 i 4500"},
                    {
                        "fieldTag": "t",
                        "marcTag": "245",
                        "ind1": "1",
                        "ind2": "0",
                        "subfields": [
                            {"tag": "a", "content": "Sierra title :"},
                            {"tag": "b", "content": "a subtitle"},
                        ],
                    },
                    {"fieldTag": "y", "marcTag": "8", "content": "080101"},
                    {
                        "fieldTag": "y",
                        "marcTag": "852",
                        "ind1": " ",
                        "ind2": " ",
                        "subfields": [{"tag": "h", "content": "dropme"}],
                    },
                    {"fieldTag": "n", "content": "no marc tag"},
                ],
            },
            {"id": "1002", "deleted": True, "varFields": []},
            {
                "id": "1003",
                "deleted": False,
                "fixedFields": {"31": {"label": "BCODE3", "value": "n"}},
                "varFields": [{"fieldTag": "_", "content": ""}],
            },
        ],
    }
)


def _harvest(spark, **kw):
    df = spark.createDataFrame([(PAGE,)], "json string")
    return SI.harvest_pages(df, **kw).orderBy("local_id")


def test_sierra_conversion(spark):
    rows = _harvest(spark, source="s1").collect()
    assert [r.local_id for r in rows] == ["1001", "1002", "1003"]
    r = rows[0]
    assert r.oai_id == "sierra:s1:1001"
    assert not r.deleted
    assert r.catalog_date == "2020-03-01"
    assert r.marc.leader == "00000cam a2200000 i 4500"
    tags = [f.tag for f in r.marc.fields]
    # sorted by tag; 852 from varFields dropped, location 852 added;
    # marcTag '8' zero-padded to 008 control field; 977 from fixedField 30
    assert tags == ["001", "008", "245", "852", "977"]
    by_tag = {f.tag: f for f in r.marc.fields}
    assert by_tag["001"].value == "1001"
    assert by_tag["008"].value == "080101"
    assert [(s.code, s.value) for s in by_tag["245"].subfields] == [
        ("a", "Sierra title :"),
        ("b", "a subtitle"),
    ]
    assert [(s.code, s.value) for s in by_tag["852"].subfields] == [("b", "main")]
    assert [(s.code, s.value) for s in by_tag["977"].subfields] == [("a", "a")]


def test_sierra_empty_leader_default(spark):
    rows = _harvest(spark).collect()
    assert rows[2].marc.leader == "00000nam  2200000   4500"


def test_sierra_deleted_and_suppressed(spark):
    rows = _harvest(spark, suppressed_bib_code3=["n"]).collect()
    assert [r.deleted for r in rows] == [False, True, True]  # 1003 via BCODE3
    assert rows[1].marc is None


def test_sierra_feeds_marc_extractor(spark):
    """The built struct is consumable by the MARC driver directly."""
    live = _harvest(spark).where(~F.col("deleted") & (F.col("local_id") == "1001"))
    out = MARC.to_solr_columns(live, "marc").collect()[0]
    assert out.title.startswith("Sierra title")
    assert out.id == "1001"


def test_sierra_malformed_page(spark):
    df = spark.createDataFrame([("not json",), (None,)], "json string")
    assert SI.harvest_pages(df).count() == 0
