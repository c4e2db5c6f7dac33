"""Golden-output tests for the MARC/DC extractors.

Mirrors the reference's test strategy (SURVEY §5): fixture record in,
full-field assertions out (tests/RecordManagerTest/Base/Record/MarcTest.php
pattern). Fixtures here are hand-written, not copied.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from recordmanager_spark.extractors import dc, marc
from recordmanager_spark.extractors.format_calculator import formats_as_list


def df(val): return val  # noqa: E704 - readability helper


def _marc_json(leader, fields):
    return json.dumps({"leader": leader, "fields": fields})


MARC1 = _marc_json(
    "00000cam a22000004i 4500",
    [
        {"001": "123456"},
        {"007": "ta"},
        {"008": "120101s2011    xxu           000 0 eng d"},
        {"010": {"ind1": " ", "ind2": " ", "subfields": [{"a": "  2011012345"}]}},
        {"020": {"ind1": " ", "ind2": " ", "subfields": [{"a": "978-0-12-345678-6 (hbk.)"}]}},
        {"022": {"ind1": " ", "ind2": " ", "subfields": [{"a": "1234-5678"}]}},
        {"035": {"ind1": " ", "ind2": " ", "subfields": [{"a": "(OCoLC)999999"}]}},
        {"041": {"ind1": "0", "ind2": " ", "subfields": [{"a": "eng"}, {"a": "fin"}]}},
        {"100": {"ind1": "1", "ind2": " ", "subfields": [{"a": "Author, Alice"}, {"d": "1970-"}]}},
        {
            "245": {
                "ind1": "1",
                "ind2": "0",
                "subfields": [{"a": "A grand title :"}, {"b": "subtitle of grandeur /"}],
            }
        },
        {"260": {"ind1": " ", "ind2": " ", "subfields": [{"b": "PubHouse,"}, {"c": "c2011."}]}},
        {"300": {"ind1": " ", "ind2": " ", "subfields": [{"a": "xii, 345 pages :"}]}},
        {"650": {"ind1": " ", "ind2": "0", "subfields": [{"a": "Testing."}]}},
        {"700": {"ind1": "1", "ind2": " ", "subfields": [{"a": "Helper, Bob"}]}},
        {"856": {"ind1": "4", "ind2": "0", "subfields": [{"u": "http://example.com/x"}]}},
    ],
)

# Alt-script record: 245 links to an 880 via $6 occurrence 01.
MARC_ALT = _marc_json(
    "00000cam a22000004i 4500",
    [
        {"001": "alt1"},
        {
            "245": {
                "ind1": "1",
                "ind2": "0",
                "subfields": [{"6": "880-01"}, {"a": "Romanized title"}],
            }
        },
        {
            "880": {
                "ind1": "1",
                "ind2": "0",
                "subfields": [{"6": "245-01/(2/r"}, {"a": "النسخة العربية"}],
            }
        },
        {
            "880": {
                "ind1": "1",
                "ind2": " ",
                "subfields": [{"6": "700-02"}, {"a": "unlinked author"}],
            }
        },
    ],
)


def _parsed(spark, *raws):
    sdf = spark.createDataFrame([(r,) for r in raws], ["raw"])
    return sdf.select(marc.parse_marc_in_json("raw").alias("marc"))


def _solr_row(spark, raw):
    out = marc.to_solr_columns(_parsed(spark, raw), "marc")
    return out.collect()[0]


def test_marc_basic_fields(spark):
    r = _solr_row(spark, MARC1)
    assert r.id == "123456"
    assert r.lccn == "2011012345"
    assert r.ctrlnum == ["(OCoLC)999999"]
    assert r.title == "A grand title : subtitle of grandeur"
    assert r.title_short == "A grand title"
    assert r.title_sub == "subtitle of grandeur /"
    assert r.author == ["Author, Alice 1970-"]
    assert r.author2 == ["Helper, Bob"]
    assert r.publisher == ["PubHouse,"]
    assert r.publish_year == "2011"
    assert r.page_count == 345  # first digit run in "xii, 345 pages"
    assert r.url == ["http://example.com/x"]
    assert r.issn == ["1234-5678"]


def test_marc_isbn_normalized_to_13(spark):
    r = _solr_row(spark, MARC1)
    assert r.isbn == ["9780123456786"]


def test_marc_languages(spark):
    r = _solr_row(spark, MARC1)
    assert r.language == ["eng", "fin"]


def test_marc_allfields_excludes_control(spark):
    r = _solr_row(spark, MARC1)
    assert "123456" not in r.allfields
    assert any("grand title" in v for v in r.allfields)


def test_marc_alt_script_880(spark):
    out = _parsed(spark, MARC_ALT).select(
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_BOTH, "245", ["a"])]
        ).alias("both"),
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_ALT, "245", ["a"])]
        ).alias("alt"),
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_NORMAL, "245", ["a"])]
        ).alias("norm"),
    )
    r = out.collect()[0]
    assert r.norm == ["Romanized title"]
    assert r.alt == ["النسخة العربية"]
    assert r.both == ["Romanized title", "النسخة العربية"]


def test_marc_required_subfields(spark):
    out = _parsed(spark, MARC1).select(
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_NORMAL, "260", ["b"], ["c"])]
        ).alias("with_req"),
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_NORMAL, "260", ["b"], ["z"])]
        ).alias("missing_req"),
    )
    r = out.collect()[0]
    assert r.with_req == ["PubHouse,"]
    assert r.missing_req == []


def test_marc_split_subfields(spark):
    out = _parsed(spark, MARC1).select(
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_NORMAL, "041", ["a"])], split_subfields=True
        ).alias("split"),
        marc.get_fields_subfields(
            F.col("marc"), [(marc.GET_NORMAL, "041", ["a"])]
        ).alias("joined"),
    )
    r = out.collect()[0]
    assert r.split == ["eng", "fin"]
    assert r.joined == ["eng fin"]


# --- format calculator (pure python function; UDF is a thin wrapper) -------


def test_format_book():
    assert formats_as_list("00000cam a22000004i 4500", ["ta"], "120101s2011") == ["Book"]


def test_format_ebook():
    f008 = "120101s2011    xxu                 eng d"
    assert "eBook" in formats_as_list("00000cam a22000004i 4500", ["cr"], f008)


def test_format_journal():
    f008 = "120101c20119999xxu".ljust(21) + "p       0    0eng d"
    # leader/7 = s (serial), 008/21 = p (periodical)
    lst = formats_as_list("00000cas a22000004i 4500", [], f008)
    assert "Journal" in lst


def test_format_newspaper():
    f008 = "1".ljust(21) + "n"
    assert "Newspaper" in formats_as_list("00000cas a22000004i 4500", [], f008)


def test_format_video():
    lst = formats_as_list("00000cgm a22000004i 4500", ["vd"], "")
    assert "Video" in lst and "VideoDisc" in lst


def test_format_map():
    assert "Map" in formats_as_list("00000cem a22000004i 4500", [], "")


def test_format_sound():
    assert "SoundRecording" in formats_as_list("00000cim a22000004i 4500", [], "")
    assert "MusicRecording" in formats_as_list("00000cjm a22000004i 4500", [], "")


def test_format_unknown_fallbacks():
    assert formats_as_list("", [], "") == ["Unknown"]
    assert formats_as_list("00000caa a22000004i 4500", [], "") == ["BookSection"]


# --- DC ---------------------------------------------------------------------

DC1 = """<oai_dc:dc xmlns:oai_dc="http://www.openarchives.org/OAI/2.0/oai_dc/"
    xmlns:dc="http://purl.org/dc/elements/1.1/">
  <recordID>dc-42</recordID>
  <dc:title>Basic title : with a subtitle</dc:title>
  <dc:creator>Writer, Wendy.</dc:creator>
  <dc:contributor>Second, Sam</dc:contributor>
  <dc:subject>testing</dc:subject>
  <dc:subject>spark</dc:subject>
  <dc:publisher>DC House</dc:publisher>
  <dc:date>2019-05-01</dc:date>
  <dc:type>Text</dc:type>
  <dc:language>eng finswe</dc:language>
  <dc:identifier>978-0-12-345678-6</dc:identifier>
  <dc:identifier>https://example.org/dc42</dc:identifier>
  <dc:description>https://example.org/fulltext</dc:description>
  <dc:description>An actual abstract.</dc:description>
</oai_dc:dc>"""


def test_dc_extract(spark):
    sdf = spark.createDataFrame([(DC1,)], ["xml"])
    r = dc.to_solr_columns(sdf, "xml").collect()[0]
    assert r.id == "dc-42"
    assert r.title == "Basic title : with a subtitle"
    assert r.title_short == "Basic title"
    assert r.title_sub == "with a subtitle"
    assert r.author == "Writer, Wendy"
    assert r.author2 == ["Second, Sam"]
    assert r.topic == ["testing", "spark"]
    assert r.language == ["eng", "fin", "swe"]
    assert r.publishDate == "2019"
    assert r.isbn == ["9780123456786"]
    assert set(r.url) == {"https://example.org/dc42", "https://example.org/fulltext"}
    assert r.contents == ["An actual abstract."]
    assert r.format == "Text"
