"""Integration test for the example Nominatim client: fake transport →
retry/rate-limit discipline → uriCache fetch→upsert→re-query round trip
(NominatimGeocoder.php behavior, engine stays network-free)."""

from __future__ import annotations

import json

import pytest

from recordmanager_spark.examples import nominatim as NM


def _place(cls, importance, geotext, lat="60.2", lon="24.9"):
    return {
        "class": cls,
        "importance": importance,
        "geotext": geotext,
        "lat": lat,
        "lon": lon,
    }


def test_nominatim_url_and_cache_key():
    url = NM.nominatim_url(
        "Helsinki, Finland",
        base_url="https://nominatim.example/search",
        email="ops@example.org",
        preferred_area="24.5,60.0,25.5,60.5",
    )
    assert url.startswith("https://nominatim.example/search?q=Helsinki%2C+Finland")
    assert "format=json" in url and "polygon_text=1" in url
    assert "email=ops%40example.org" in url
    assert "viewbox=24.5%2C60.0%2C25.5%2C60.5" in url
    assert "polygon_threshold=0.01" in url
    key = NM.nominatim_cache_key(url)
    assert key.startswith("nominatim ") and len(key) == len("nominatim ") + 32
    with pytest.raises(ValueError):
        NM.nominatim_url("x", base_url="", email="a@b")
    with pytest.raises(ValueError):
        NM.nominatim_url("x", base_url="https://n", email="")


def test_parse_response_scoring_and_ignored_classes():
    body = json.dumps(
        [
            _place("shop", 0.9, "POINT(1 1)"),  # ignored class
            _place("place", 0.5, "POINT(2 2)"),
            _place("boundary", 0.06, "POLYGON((0 0,1 0,1 1,0 0))"),  # ->0.6
            _place("place", 0.6, "POINT(3 3)"),  # ties the boosted boundary
            _place("place", 0.2, "POINT(4 4)"),  # below the highest
        ]
    )
    got = NM.parse_nominatim_response(body)
    assert [g["wkt"] for g in got] == [
        "POLYGON((0 0,1 0,1 1,0 0))",
        "POINT(3 3)",
    ]
    assert all(g["importance"] == pytest.approx(0.6) for g in got)
    assert NM.parse_nominatim_response("not json") == []
    assert NM.parse_nominatim_response("") == []


def test_parse_response_merges_contiguous_linestrings():
    body = json.dumps(
        [
            _place("place", 0.5, "LINESTRING(0 0,1 1)"),
            _place("place", 0.5, "LINESTRING(1 1,2 2)"),  # continues prev
            _place("place", 0.5, "LINESTRING(5 5,6 6)"),  # disjoint
        ]
    )
    got = NM.parse_nominatim_response(body)
    assert [g["wkt"] for g in got] == [
        "LINESTRING(0 0,1 1,2 2)",
        "LINESTRING(5 5,6 6)",
    ]


def test_fetcher_rate_limit_and_ignored_500():
    calls = []
    sleeps = []
    clock = [0.0]

    def transport(url):
        calls.append(url)
        if "boom" in url:
            return 500, "server error"
        return 200, f"body:{url}"

    def fake_sleep(s):
        sleeps.append(s)
        clock[0] += s

    fetcher = NM.make_nominatim_fetcher(
        transport, delay_ms=1500, sleep=fake_sleep, clock=lambda: clock[0]
    )
    assert fetcher("u1") == "body:u1"
    assert sleeps == []  # first request: no delay
    assert fetcher("u2") == "body:u2"
    assert sleeps == [pytest.approx(1.5)]  # rate limit between requests
    # 500 is in ignore_errors: '' body, no retry storm
    assert fetcher("boom") == ""
    assert calls == ["u1", "u2", "boom"]


def test_geocode_locations_cache_roundtrip(spark):
    """fetch→upsert→re-query: first pass fetches every miss through the
    fake transport, second pass with the upserted cache fetches NOTHING
    and serves identical data — the NominatimGeocoder.php lifecycle over
    the engine's uriCache seam.

    The transport runs inside executor Python workers, so it must be
    self-contained (no test-module globals — cloudpickle would try to
    import this module on the executor) and fetch accounting reads the
    cache TIMESTAMPS: a row fetched at time T keeps timestamp T until a
    genuine re-fetch overwrites it.
    """

    def transport(url):
        import json as _json

        return 200, _json.dumps(
            [
                {
                    "class": "place",
                    "importance": 0.7,
                    "geotext": "POINT(24.9 60.2)",
                    "lat": "60.2",
                    "lon": "24.9",
                }
            ]
        )

    fetcher = NM.make_nominatim_fetcher(
        transport, delay_ms=0, sleep=lambda s: None
    )
    locations = spark.createDataFrame(
        [("Helsinki",), ("Espoo",), ("Vantaa",)], "location string"
    )
    empty_cache = spark.createDataFrame(
        [], "_id string, timestamp double, url string, data string"
    )
    kw = dict(base_url="https://nominatim.example/search", email="ops@example.org")
    enriched, cache1 = NM.geocode_locations(
        locations, empty_cache, fetcher, now=1_000_000.0, **kw
    )
    rows = {r.location: r.data for r in enriched.collect()}
    assert set(rows) == {"Helsinki", "Espoo", "Vantaa"}
    parsed = NM.parse_nominatim_response(rows["Helsinki"])
    assert parsed and parsed[0]["wkt"] == "POINT(24.9 60.2)"
    cache1_rows = cache1.collect()
    # every miss was fetched exactly once at now=1e6
    assert sorted(r.timestamp for r in cache1_rows) == [1_000_000.0] * 3
    # cache keys match the driver-side helper byte-for-byte
    expect_key = NM.nominatim_cache_key(NM.nominatim_url("Helsinki", **kw))
    assert expect_key in {r._id for r in cache1_rows}

    # second pass: warm cache answers everything, nothing re-fetched
    # (timestamps stay at the first-pass value)
    cache1_m = spark.createDataFrame(cache1_rows, cache1.schema)
    enriched2, cache2 = NM.geocode_locations(
        locations, cache1_m, fetcher, now=1_000_100.0, **kw
    )
    assert {r.location: r.data for r in enriched2.collect()} == rows
    assert sorted(r.timestamp for r in cache2.collect()) == [1_000_000.0] * 3

    # expired cache (TTL) re-fetches: timestamps move to the new now
    late = 1_000_000.0 + 8 * 24 * 3600  # past the 7-day default TTL
    enriched3, cache3 = NM.geocode_locations(
        locations, cache1_m, fetcher, now=late, **kw
    )
    assert {r.location: r.data for r in enriched3.collect()} == rows
    assert sorted(r.timestamp for r in cache3.collect()) == [late] * 3
