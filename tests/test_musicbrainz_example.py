"""MusicBrainz example client: query construction (type switch, title
guards, sanitization), release-group expansion, the publisher-number
two-phase fallback, and cache reuse — against a fake transport
(MusicBrainzEnrichment.php behavior; the engine stays network-free)."""

from __future__ import annotations

import json
from urllib.parse import parse_qs, urlsplit

from recordmanager_spark.examples import musicbrainz as MB
from recordmanager_spark.functions.keys import normalize_key_py

BASE = "https://musicbrainz.org"


def _release(rid, rgid=None):
    r = {"id": rid}
    if rgid:
        r["release-group"] = {"id": rgid}
    return r


# query string -> response payload (the fake server); rgid expansions
# are keyed as "rgid:<id>" like the reference's cache ids
RESPONSES = {
    'isrc:"isrc1"': {"releases": [_release("R1", rgid="G1")]},
    "rgid:G1": {"releases": [_release("R1"), _release("R1b")]},
    'catno:"upc1" AND releaseaccent:"AbbeyRoad"': {"releases": [_release("R2")]},
    'reid:"mb1"': {"releases": [_release("R3")]},
    'catno:"emi pcs7088"': {"releases": [_release("R4")]},
    'catno:"cat9" AND releaseaccent:"TitleB"': {"releases": [_release("R5")]},
    'catno:"nolabel miss1"': {"releases": []},
    'catno:"miss1" AND releaseaccent:"TitleC"': {"releases": [_release("R6")]},
}


def make_transport(log):
    def transport(url):
        log.append(url)
        qs = parse_qs(urlsplit(url).query)
        query = qs["query"][0]
        return 200, json.dumps(RESPONSES.get(query, {"releases": []}))

    return transport


def _records(spark):
    return spark.createDataFrame(
        [
            # music ids: isrc (group-expanded), upc->catno w/ title guard,
            # unknown type dropped
            ("A", "AbbeyRoad",
             [("isrc", "isrc1"), ("upc", "upc1"), ("isbn", "xxx")], []),
            # musicb -> reid; plus a sourceless number hitting the fallback
            ("B", "TitleB", [("musicb", "mb1")], [("", "cat9")]),
            # qualified publisher number hit (no fallback fetch needed)
            ("C", "TitleC", [], [("EMI", "PCS7088 (mono)")]),
            # qualified MISS -> bare-number fallback with title guard
            ("D", "TitleC", [], [("NoLabel", "miss1")]),
            # nothing at all
            ("E", "TitleE", [], []),
        ],
        "_id string, title_short string, "
        "music_ids array<struct<type:string,value:string>>, "
        "publisher_numbers array<struct<source:string,value:string>>",
    )


def _empty_cache(spark):
    return spark.createDataFrame(
        [], "_id string, timestamp double, url string, data string"
    )


def test_normalize_key_py_matches_column_engine(spark):
    vals = [
        "PCS7088 (mono)", "Äiti järvi", "Щука", "カタカナ", None, "A-B c!",
        "θάλασσα",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    from pyspark.sql import functions as F
    from recordmanager_spark.functions.keys import normalize_key

    got = [r.k for r in df.select(normalize_key(F.col("s")).alias("k")).collect()]
    # the Column engine null-propagates; the py twin maps None -> ""
    assert got == [normalize_key_py(v) if v is not None else None for v in vals]


def test_enrich_end_to_end(spark):
    log = []
    transport = make_transport(log)

    def fetcher(url):
        status, body = transport(url)
        return body if status == 200 else ""

    enriched, cache = MB.musicbrainz_enrich(
        _records(spark), _empty_cache(spark), fetcher, now=600_000.0,
        base_url=BASE,
    )
    got = {r._id: list(r.mbid_str_mv) for r in enriched.collect()}
    # A: isrc hit expands through release-group G1 (R1, R1b), then the
    # title-guarded catno hit R2 — reference order, music ids first
    assert got["A"] == ["R1", "R1b", "R2"]
    # B: reid hit first, then the sourceless number's fallback hit
    assert got["B"] == ["R3", "R5"]
    # C: "EMI" + "PCS7088 (mono)" sanitize to "emi pcs7088" (cut at the
    # first space/paren, normalizeKey) and the qualified query wins
    assert got["C"] == ["R4"]
    # D: the qualified query missed, the bare+title fallback answered
    assert got["D"] == ["R6"]
    assert got["E"] == []
    # the empty-result qualified query IS cached (negative caching like
    # the reference's getExternalData)
    cached_ids = {r._id for r in cache.collect()}
    assert 'catno:"nolabel miss1"' in cached_ids
    assert "rgid:G1" in cached_ids


def test_cache_prevents_refetch(spark):
    """Timestamps prove cache behavior (the fetch log lives in executor
    workers, so it can't be asserted driver-side): pass 2's cache keeps
    pass 1's timestamps (no re-fetch); an expired pass re-stamps."""
    log = []
    transport = make_transport(log)

    def fetcher(url):
        status, body = transport(url)
        return body if status == 200 else ""

    records = _records(spark)
    enriched, cache1 = MB.musicbrainz_enrich(
        records, _empty_cache(spark), fetcher, now=600_000.0, base_url=BASE
    )
    rows1 = cache1.collect()
    assert rows1 and all(r.timestamp == 600_000.0 for r in rows1)
    cache1_m = spark.createDataFrame(rows1, cache1.schema)

    enriched2, cache2 = MB.musicbrainz_enrich(
        records, cache1_m, fetcher, now=600_100.0, base_url=BASE
    )
    got = {r._id: list(r.mbid_str_mv) for r in enriched2.collect()}
    assert got["A"] == ["R1", "R1b", "R2"]
    # every query answered from the uriCache: no row re-stamped
    assert all(r.timestamp == 600_000.0 for r in cache2.collect())

    # expiry (default 7-day TTL) forces a refetch that re-stamps
    _, cache3 = MB.musicbrainz_enrich(
        records, cache1_m, fetcher, now=600_000.0 + 8 * 86400,
        base_url=BASE,
    )
    stamps = {r.timestamp for r in cache3.collect()}
    assert stamps == {600_000.0 + 8 * 86400}
