"""RDF/Turtle import tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.operators.enrich import enrich_with_entities
from recordmanager_spark.sources import rdf as R

TTL = """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix yso: <http://www.yso.fi/onto/yso/> .
@prefix geo: <http://www.w3.org/2003/01/geo/wgs84_pos#> .

yso:p1234 a skos:Concept ;
    skos:prefLabel "kissat"@fi , "katter"@sv , "cats"@en ;
    skos:altLabel "kotikissa"@fi ;
    skos:broader yso:p999 ;
    geo:lat "60.17" ;
    geo:long 24.94 .

yso:p999 skos:prefLabel "el\\u00e4imet"@fi .
<http://plain.example/x> skos:prefLabel "plain" . # trailing comment
"""


def test_unescape_unicode():
    assert R._unescape("el\\u00e4imet") == "eläimet"
    assert R._unescape('say \\"hi\\"\\n') == 'say "hi"\n'


def test_triples_df(spark):
    df = spark.createDataFrame([(TTL,)], "text string")
    t = R.triples_df(df)
    assert t.count() == 10
    langs = (
        t.where(F.col("predicate") == R.SKOS + "prefLabel")
        .where(F.col("subject").endswith("p1234"))
        .select("lang")
        .collect()
    )
    assert sorted(r.lang for r in langs) == ["en", "fi", "sv"]


def test_entities(spark):
    df = spark.createDataFrame([(TTL,)], "text string")
    e = R.import_rdf(df).orderBy("uri").collect()
    by_uri = {r.uri: r for r in e}
    cat = by_uri["http://www.yso.fi/onto/yso/p1234"]
    assert sorted(cat.pref_labels) == ["cats", "katter", "kissat"]
    assert cat.alt_labels == ["kotikissa"]
    assert cat.broader == ["http://www.yso.fi/onto/yso/p999"]
    assert cat.geo_lat == "60.17" and cat.geo_long == "24.94"
    assert by_uri["http://www.yso.fi/onto/yso/p999"].pref_labels == ["eläimet"]


def test_language_filter(spark):
    df = spark.createDataFrame([(TTL,)], "text string")
    e = R.import_rdf(df, languages=["fi"]).collect()
    cat = {r.uri: r for r in e}["http://www.yso.fi/onto/yso/p1234"]
    assert cat.pref_labels == ["kissat"]


def test_feeds_enrichment_join(spark):
    """The imported table is directly consumable by enrich_with_entities."""
    voc = R.import_rdf(spark.createDataFrame([(TTL,)], "text string"))
    recs = spark.createDataFrame(
        [("r1", ["http://www.yso.fi/onto/yso/p1234"]), ("r2", ["http://no/match"])],
        "id string, topics array<string>",
    )
    out = enrich_with_entities(recs, voc, "id", "topics").orderBy("id").collect()
    assert sorted(out[0].topic_add) == ["cats", "katter", "kissat", "kotikissa"]
    assert out[1].topic_add == []
