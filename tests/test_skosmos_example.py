"""Skosmos example client: URL shape, SKOS JSON-LD parsing, two-level
exactMatch walk, and the uriCache round trip with a fake transport
(SkosmosEnrichment.php behavior; the engine stays network-free)."""

from __future__ import annotations

import json

from recordmanager_spark.examples import skosmos as SK

YSO = "http://www.yso.fi/onto/yso/"
LOC = "http://id.loc.gov/authorities/"


def _doc(entity_id, pref=(), alt=(), hidden=(), matches=(), lat=None, lon=None):
    node = {
        "@id": entity_id,
        "@type": [{"@id": SK.SKOS_CORE + "Concept"}],
        SK.SKOS_CORE + "prefLabel": [
            {"@value": v, "@language": lang} for lang, v in pref
        ],
        SK.SKOS_CORE + "altLabel": [
            {"@value": v, "@language": lang} for lang, v in alt
        ],
        SK.SKOS_CORE + "hiddenLabel": [
            {"@value": v, "@language": lang} for lang, v in hidden
        ],
        SK.SKOS_CORE + "exactMatch": [{"@id": m} for m in matches],
    }
    if lat is not None:
        node[SK.WGS84_POS + "lat"] = [{"@value": lat}]
        node[SK.WGS84_POS + "long"] = [{"@value": lon}]
    return json.dumps({"@graph": [node]})


def test_entity_url_shape():
    url = SK.skosmos_entity_url(YSO + "p123", "https://api.finto.fi/rest/v1")
    assert url == (
        "https://api.finto.fi/rest/v1/data?format=application/json&uri="
        "http%3A%2F%2Fwww.yso.fi%2Fonto%2Fyso%2Fp123"
    )
    assert SK.skosmos_entity_url(YSO + "p1", "") == ""
    assert SK.skosmos_entity_url(YSO + "p1", "database") == ""


def test_parse_labels_language_filter_and_location():
    body = _doc(
        YSO + "p1",
        pref=[("fi", "kissa"), ("sv", "katt")],
        alt=[("fi", "katti")],
        hidden=[("fi", "kisu")],
        lat="60.2",
        lon="24.9",
    )
    all_langs = SK.parse_skos_doc(body, YSO + "p1")
    assert all_langs["preferred"] == ["kissa", "katt"]
    assert all_langs["alternative"] == ["katti", "kisu"]  # alt + hidden
    assert all_langs["locations"] == [
        {"lat": "60.2", "lon": "24.9", "wkt": "POINT(24.9 60.2)"}
    ]
    fi_only = SK.parse_skos_doc(body, YSO + "p1", languages=("fi",))
    assert fi_only["preferred"] == ["kissa"]
    assert SK.parse_skos_doc("not json", YSO + "p1")["preferred"] == []
    # a non-concept node contributes nothing
    non_concept = json.dumps(
        {"@graph": [{"@id": YSO + "p1", "@type": [{"@id": "Other"}]}]}
    )
    assert SK.parse_skos_doc(non_concept, YSO + "p1")["preferred"] == []


def test_enrich_uri_two_level_exact_match_walk():
    docs = {
        YSO + "p1": _doc(
            YSO + "p1",
            pref=[("fi", "kissa")],
            matches=[LOC + "sh100", "http://unlisted.example/x"],
        ),
        LOC + "sh100": _doc(
            LOC + "sh100", pref=[("en", "Cats")], alt=[("en", "Felines")]
        ),
    }
    fetched = []

    def fetch_doc(entity_id):
        fetched.append(entity_id)
        return docs.get(entity_id, "")

    out = SK.enrich_uri(
        YSO + "p1",
        fetch_doc,
        allowed_prefixes=(YSO,),
        match_prefixes=(LOC,),
    )
    assert out["preferred"] == ["kissa"]
    assert out["matchPreferred"] == ["Cats"]
    assert out["matchAlternative"] == ["Felines"]
    # the unlisted match vocabulary is never fetched (prefix gate)
    assert fetched == [YSO + "p1", LOC + "sh100"]
    # unlisted main id: empty result, nothing fetched
    fetched.clear()
    empty = SK.enrich_uri(
        "http://unlisted.example/y", fetch_doc, allowed_prefixes=(YSO,)
    )
    assert empty["preferred"] == [] and fetched == []


def test_skosmos_cache_roundtrip(spark):
    """fetch→upsert→re-query over the uriCache seam: pass 1 fetches
    every distinct uri, pass 2 serves from cache (timestamps prove no
    re-fetch), and the cache key is the entity id like the reference's
    linked-data table."""

    def transport(url):
        import json as _json
        from urllib.parse import unquote_plus

        uri = unquote_plus(url.split("uri=", 1)[1])
        return 200, _json.dumps(
            {
                "@graph": [
                    {
                        "@id": uri,
                        "@type": [
                            {
                                "@id": "http://www.w3.org/2004/02/skos/"
                                "core#Concept"
                            }
                        ],
                        "http://www.w3.org/2004/02/skos/core#prefLabel": [
                            {"@value": "label-of-" + uri[-2:], "@language": "fi"}
                        ],
                    }
                ]
            }
        )

    def fetcher(url):
        status, body = transport(url)
        return body if status == 200 else ""

    uris = spark.createDataFrame(
        [(YSO + "p1",), (YSO + "p2",)], "uri string"
    )
    empty_cache = spark.createDataFrame(
        [], "_id string, timestamp double, url string, data string"
    )
    docs, cache1 = SK.skosmos_enrich_uris(
        uris, empty_cache, fetcher, now=500_000.0,
        api_base_url="https://api.finto.fi/rest/v1",
    )
    got = {r.uri: r.data for r in docs.collect()}
    assert set(got) == {YSO + "p1", YSO + "p2"}
    parsed = SK.parse_skos_doc(got[YSO + "p1"], YSO + "p1")
    assert parsed["preferred"] == ["label-of-p1"]
    rows1 = cache1.collect()
    assert {r._id for r in rows1} == {YSO + "p1", YSO + "p2"}  # keyed by id
    assert all(r.timestamp == 500_000.0 for r in rows1)

    cache1_m = spark.createDataFrame(rows1, cache1.schema)
    docs2, cache2 = SK.skosmos_enrich_uris(
        uris, cache1_m, fetcher, now=500_100.0,
        api_base_url="https://api.finto.fi/rest/v1",
    )
    assert {r.uri: r.data for r in docs2.collect()} == got
    assert all(r.timestamp == 500_000.0 for r in cache2.collect())  # no re-fetch
