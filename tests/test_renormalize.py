"""records renormalize — the immediate re-normalization pass
(Command/Records/Renormalize.php:105-240 + DedupHandler.php:313-370
updateDedupCandidateKeys + AbstractRecord.php:446-477 getSuppressed).

Decision table pinned here:
- dedup source, no hosts, live  -> keys re-derived; update_needed iff
  any key set changed vs the stored one
- suppressed (suppressOnField)  -> deleted=true, keys cleared,
  dedup_id dropped, update_needed=false
- component (773$w / 941$a)     -> keys cleared, dedup_id dropped
- non-dedup source              -> keys cleared
- normalized_data               -> re-serialized MARC-in-JSON, ''
  when byte-identical to original_data
- normalization XSLT            -> applied per source before parsing
"""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F

from recordmanager_spark.config import parse_datasources_ini
from recordmanager_spark.operators.renormalize import renormalize_records

INI = """
[ka]
institution = K
format = marc
dedup = true
driverParams[] = "kohaNormalization=true"
suppressOnField[format] = "hidden|secret"

[kb]
institution = K
format = marc
"""


def _rec(i, src, title, author, fmt, host=None, old_tk=None, isbn=None):
    fields = [f'{{"001":"r{i}"}}']
    fields.append(
        f'{{"100":{{"ind1":"1","ind2":" ","subfields":[{{"a":"{author}"}}]}}}}'
    )
    if isbn:
        fields.append(
            f'{{"020":{{"ind1":" ","ind2":" ","subfields":[{{"a":"{isbn}"}}]}}}}'
        )
    fields.append(
        f'{{"245":{{"ind1":"1","ind2":"0","subfields":[{{"a":"{title}"}}]}}}}'
    )
    fields.append(
        f'{{"977":{{"ind1":" ","ind2":" ","subfields":[{{"a":"{fmt}"}}]}}}}'
    )
    if host:
        fields.append(
            f'{{"773":{{"ind1":"0","ind2":" ","subfields":[{{"w":"{host}"}}]}}}}'
        )
    data = '{"leader":"L","fields":[' + ",".join(fields) + "]}"
    return (f"{src}.{i}", src, "marc", data, False, old_tk, f"g{i}")

SCHEMA = (
    "_id string, source_id string, format string, original_data string, "
    "deleted boolean, title_keys array<string>, dedup_id string"
)
NOW = datetime.datetime(2026, 8, 16, 12, 0, 0)


@pytest.fixture(scope="module")
def renorm_out(spark):
    sources = parse_datasources_ini(INI)
    rows = [
        _rec(1, "ka", "Alpha title", "Smith, Anna", "book"),
        _rec(2, "ka", "Beta title", "Jones, Bo", "hidden"),
        _rec(3, "ka", "Gamma", "Lee, Cy", "book", host="r1"),
        _rec(4, "kb", "Delta", "Poe, Dee", "book"),
        _rec(
            5, "ka", "Eps", "Fox, Gil", "book",
            old_tk=["epsfox"],
        ),
    ]
    records = spark.createDataFrame(rows, SCHEMA)
    out = renormalize_records(records, sources, now=NOW)
    return {r["_id"]: r for r in out.collect()}


def test_keys_rederived_and_update_needed_on_change(renorm_out):
    r = renorm_out["ka.1"]
    assert r["title_keys"] == ["alphatitlesmith"]
    assert r["update_needed"] is True  # stored keys were empty
    assert r["dedup_id"] == "g1"       # stays in its group
    assert r["deleted"] is False


def test_update_needed_false_when_keys_stable(renorm_out):
    r = renorm_out["ka.5"]
    assert r["title_keys"] == ["epsfox"]
    assert r["update_needed"] is False


def test_suppressed_record_is_deleted_and_leaves_dedup(renorm_out):
    r = renorm_out["ka.2"]
    assert r["deleted"] is True
    assert r["title_keys"] == [] and r["id_keys"] == []
    assert r["dedup_id"] is None
    assert r["update_needed"] is False


def test_component_part_clears_keys_and_keeps_hosts(renorm_out):
    r = renorm_out["ka.3"]
    assert r["host_record_id"] == ["r1"]
    assert r["title_keys"] == []
    assert r["dedup_id"] is None


def test_non_dedup_source_clears_keys(renorm_out):
    r = renorm_out["kb.4"]
    assert r["title_keys"] == []
    assert r["dedup_id"] is None


def test_linking_ids_and_stamp(renorm_out):
    assert renorm_out["ka.1"]["linking_id"] == ["r1"]
    assert renorm_out["ka.1"]["updated"] == NOW


def test_normalized_data_empty_when_identical(renorm_out):
    # no XSLT, koha normalize is a no-op on 952-less records: the
    # round-tripped serialization equals the original -> ''
    assert renorm_out["ka.1"]["normalized_data"] == ""


def test_koha_driver_normalize_rewrites_952(spark):
    """kohaNormalization merges duplicate 952 holdings keys — the
    re-serialized record differs from the original and is stored."""
    sources = parse_datasources_ini(INI)
    data = (
        '{"leader":"L","fields":[{"001":"rk"},'
        '{"952":{"ind1":" ","ind2":" ","subfields":'
        '[{"b":"B1"},{"o":"C1"},{"7":"0"}]}},'
        '{"952":{"ind1":" ","ind2":" ","subfields":'
        '[{"b":"B1"},{"o":"C1"},{"7":"2"}]}}]}'
    )
    records = spark.createDataFrame(
        [("ka.k", "ka", "marc", data, False, None, None)], SCHEMA
    )
    out = renormalize_records(records, sources, now=NOW).collect()[0]
    nd = json.loads(out["normalized_data"])
    f952 = [f for f in nd["fields"] if "952" in f]
    assert len(f952) == 1  # duplicate holdings key merged
    subs = f952[0]["952"]["subfields"]
    assert {"9": "1"} in subs  # availability OR over members


def test_xslt_stage_applies_per_source(spark):
    """A per-source normalization stylesheet rewrites the record before
    parsing; other sources pass through untouched."""
    ini = """
[xa]
format = marc
dedup = true
normalization = fix.xsl

[xb]
format = marc
"""
    sources = parse_datasources_ini(ini)
    xsl = """<xsl:stylesheet version="1.0"
      xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      xmlns:m="http://www.loc.gov/MARC21/slim">
      <xsl:template match="/|@*|node()"><xsl:copy>
        <xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
      <xsl:template match="controlfield[@tag='001']">
        <controlfield tag="001">X-<xsl:value-of select="."/></controlfield>
      </xsl:template>
    </xsl:stylesheet>"""
    xml = (
        '<record><leader>L</leader>'
        '<controlfield tag="001">one</controlfield></record>'
    )
    records = spark.createDataFrame(
        [
            ("xa.1", "xa", "marc", xml, False, None, None),
            ("xb.1", "xb", "marc", xml, False, None, None),
        ],
        SCHEMA,
    )
    out = {
        r["_id"]: r
        for r in renormalize_records(
            records, sources, stylesheets={"xa": xsl}, now=NOW
        ).collect()
    }
    assert out["xa.1"]["linking_id"] == ["X-one"]  # transformed 001
    assert out["xb.1"]["linking_id"] == ["one"]    # untouched
    # normalized_data stored (differs from the XML original)
    assert json.loads(out["xa.1"]["normalized_data"])["fields"][0] == {
        "001": "X-one"
    }


def test_cli_renormalize_lifecycle(tmp_path, spark):
    """End-to-end through the console command: targeted --source rows
    re-derive keys; other sources pass through byte-untouched."""
    from recordmanager_spark.cli import main

    ini = tmp_path / "ds.ini"
    ini.write_text(INI)
    rec = str(tmp_path / "records")
    rows = [
        _rec(1, "ka", "Alpha title", "Smith, Anna", "book"),
        _rec(4, "kb", "Delta", "Poe, Dee", "book", old_tk=["stale"]),
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(rec)
    main(
        [
            "renormalize", "--records", rec, "--config", str(ini),
            "--source", "ka",
        ]
    )
    out = {
        r["_id"]: r for r in spark.read.parquet(rec).collect()
    }
    assert out["ka.1"]["title_keys"] == ["alphatitlesmith"]
    assert out["ka.1"]["update_needed"] is True
    # kb.4 was NOT selected: stored keys survive untouched
    assert out["kb.4"]["title_keys"] == ["stale"]


def test_isbn_and_id_keys_rederived(spark):
    """020$a -> isbn_keys via normalizeISBN (10->13 upconvert), 035$a
    accepted-prefix system control numbers -> id_keys; both feed the
    changed-keys update_needed test (DedupHandler.php:342-367)."""
    sources = parse_datasources_ini(INI)
    data = (
        '{"leader":"L","fields":[{"001":"ri"},'
        '{"020":{"ind1":" ","ind2":" ","subfields":[{"a":"0-306-40615-2"}]}},'
        '{"035":{"ind1":" ","ind2":" ","subfields":[{"a":"(OCoLC)123456"}]}},'
        '{"100":{"ind1":"1","ind2":" ","subfields":[{"a":"Key, Ida"}]}},'
        '{"245":{"ind1":"1","ind2":"0","subfields":[{"a":"Isbn rec"}]}}]}'
    )
    records = spark.createDataFrame(
        [("ka.i", "ka", "marc", data, False, None, None)], SCHEMA
    )
    out = renormalize_records(records, sources, now=NOW).collect()[0]
    assert out["isbn_keys"] == ["9780306406157"]  # 10 -> 13 upconvert
    # getUniqueIDs runs normalizeKey over the value (punctuation drops)
    assert out["id_keys"] == ["ocolc123456"]
    assert out["update_needed"] is True


def test_non_marc_source_keeps_keys_and_applies_xslt(spark):
    """A dc-format source keeps its stored keys/flags byte-untouched
    (key semantics are MARC-driver work) while the XSLT +
    normalized_data stages still run."""
    ini = """
[dsrc]
format = dc
dedup = true
normalization = fix.xsl
"""
    sources = parse_datasources_ini(ini)
    xsl = """<xsl:stylesheet version="1.0"
      xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/|@*|node()"><xsl:copy>
        <xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
      <xsl:template match="title">
        <title>N-<xsl:value-of select="."/></title>
      </xsl:template>
    </xsl:stylesheet>"""
    records = spark.createDataFrame(
        [
            (
                "dsrc.1", "dsrc", "dc",
                "<record><title>Tee</title></record>", False,
                ["storedkey"], "gX",
            )
        ],
        SCHEMA,
    )
    out = renormalize_records(
        records, sources, stylesheets={"dsrc": xsl}, now=NOW
    ).collect()[0]
    assert out["title_keys"] == ["storedkey"]   # untouched
    assert out["dedup_id"] == "gX"              # group survives
    assert out["deleted"] is False
    assert "N-Tee" in out["normalized_data"]    # XSLT output stored
    assert out["updated"] == NOW


def test_unparseable_marc_normalized_data_branches(spark):
    """Pins the serializer stage's degenerate branches across its r13
    mapInPandas -> mapInArrow port: NULL or unparseable stored data
    parses to a struct with null leader/fields (parse_marc_any never
    yields a null struct) and re-serializes to the empty record —
    identical in both serializer forms, never a crashed stage."""
    sources = parse_datasources_ini(INI)
    rows = [
        ("ka.n", "ka", "marc", None, False, None, None),
        ("ka.g", "ka", "marc", "not json, not xml", False, None, None),
        _rec(1, "ka", "Alpha", "Smith, Anna", "book"),
    ]
    records = spark.createDataFrame(rows, SCHEMA)
    out = {
        r["_id"]: r
        for r in renormalize_records(records, sources, now=NOW).collect()
    }
    assert out["ka.n"]["normalized_data"] == '{"leader":"","fields":[]}'
    assert out["ka.g"]["normalized_data"] == '{"leader":"","fields":[]}'
    # the parseable sibling still re-serializes through the same batch
    assert out["ka.1"]["normalized_data"] is not None
