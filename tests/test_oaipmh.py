"""OAI-PMH response parsing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.sources import oaipmh as OAI

LIST_RECORDS = """<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">
<ListRecords>
  <record>
    <header><identifier>oai:arto.example:123</identifier>
      <datestamp>2023-05-01T10:00:00Z</datestamp>
      <setSpec>journals</setSpec></header>
    <metadata><oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/">
      <title>Hello</title></oai_dc:dc></metadata>
  </record>
  <record>
    <header status="deleted"><identifier>oai:arto.example:124</identifier>
      <datestamp>2023-05-02</datestamp></header>
  </record>
  <resumptionToken completeListSize="2000">page-2</resumptionToken>
</ListRecords></OAI-PMH>"""

LIST_IDENTIFIERS = """<OAI-PMH><ListIdentifiers>
  <header><identifier>oai:x:1</identifier><datestamp>2020-01-01</datestamp></header>
  <header status="deleted"><identifier>oai:x:2</identifier><datestamp>2020-01-02</datestamp></header>
</ListIdentifiers></OAI-PMH>"""


def test_list_records_parse(spark):
    df = spark.createDataFrame([(LIST_RECORDS,)], "xml string")
    rows = OAI.harvest_records(df, id_prefix="arto").orderBy("oai_id").collect()
    assert len(rows) == 2
    live, dead = rows
    assert live.oai_id == "oai:arto.example:123"
    assert live.local_id == "123"  # default: after last ':'
    assert live._id == "arto.123"
    assert live.datestamp == "2023-05-01T10:00:00Z"
    assert live.set_specs == ["journals"]
    assert not live.deleted
    # ET re-serializes with generated ns prefixes; local names survive,
    # which is what the (local-name-based) extractors key on
    assert "title>Hello</" in live.metadata_xml and live.metadata_xml.endswith("dc>")
    assert dead.deleted and dead.metadata_xml is None


def test_id_rewrite(spark):
    df = spark.createDataFrame([(LIST_RECORDS,)], "xml string")
    rows = (
        OAI.harvest_records(
            df, id_search="^oai:arto\\.example:(\\d+)$", id_replace="A\\1"
        )
        .orderBy("oai_id")
        .collect()
    )
    assert rows[0].local_id == "A123"


def test_resumption_token(spark):
    df = spark.createDataFrame([(LIST_RECORDS,), (LIST_IDENTIFIERS,)], "xml string")
    toks = [r.t for r in df.select(OAI.resumption_token(F.col("xml")).alias("t")).collect()]
    assert toks == ["page-2", ""]


def test_list_identifiers_headers(spark):
    df = spark.createDataFrame([(LIST_IDENTIFIERS,)], "xml string")
    rows = OAI.harvest_records(df).orderBy("oai_id").collect()
    assert [(r.oai_id, r.deleted) for r in rows] == [
        ("oai:x:1", False),
        ("oai:x:2", True),
    ]
    assert rows[0].metadata_xml is None


def test_malformed_response(spark):
    df = spark.createDataFrame([("<broken",), (None,)], "xml string")
    assert OAI.harvest_records(df).count() == 0


def test_oai_provider_resumption_token():
    from recordmanager_spark.sinks.oai_provider import resumption_token

    assert resumption_token(0, 100, 250) == "100:100"
    assert resumption_token(100, 100, 250) == "200:100"
    assert resumption_token(200, 100, 250) is None
    assert resumption_token(0, 100, 100) is None


def test_sfx_file_selection_skips_invalid_dates(spark):
    from recordmanager_spark.sources import sfx as SFX

    listing = spark.createDataFrame(
        [
            ("sfx_20240310120000.xml",),
            ("sfx_nodate.xml",),           # no stamp -> skipped with warning
            ("sfx_20240301120000.xml",),   # before window
            ("other_20240310120000.xml",), # wrong prefix
            ("sfx_20240310120000.tmp",),   # wrong suffix
        ],
        ["filename"],
    )
    out = SFX.select_harvest_files(
        listing,
        file_prefix="sfx_",
        file_suffix=".xml",
        start_date="2024-03-05 00:00:00",
    ).collect()
    assert [r.filename for r in out] == ["sfx_20240310120000.xml"]


def test_sfx_normalize_records(spark):
    from recordmanager_spark.sources import sfx as SFX

    xml = (
        "<record><leader>00000cam a22000004i 4500</leader>"
        '<datafield tag="090" ind1=" " ind2=" ">'
        '<subfield code="a"> ABC1 </subfield></datafield></record>'
    )
    no_id = "<record><leader>00000-am a22000004i 4500</leader></record>"
    df = spark.createDataFrame([(xml,), (no_id,)], ["record_xml"])
    out = SFX.sfx_normalize_records(df, source_id="s1").collect()
    assert len(out) == 1  # record without 090$a dropped
    r = out[0]
    assert r.record_id == "ABC1"
    assert r.oai_id == "sfx:s1:ABC1"
    assert r.modified  # leader/06 'c' != '-'
    assert '<controlfield tag="001">ABC1</controlfield></record>' in r.record_xml
