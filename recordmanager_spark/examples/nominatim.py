"""Nominatim-dialect geocoding client over the uriCache seam.

Behavioral spec (reference, NOT code):
``Base/Enrichment/NominatimGeocoder.php`` — request shape :377-391
(q / format=json / polygon_text=1 / email / viewbox /
polygon_threshold), cache key ``'nominatim ' + md5(url)`` :393-396 with
500 in ignoreErrors, response scoring :407-438 (skip ignored classes,
boundary importance ×10, keep only the highest-importance places),
contiguous LINESTRING merging :447-479, and the rate-limit delay
between requests :369-375.

This module is an EXAMPLE of wiring a real enrichment client through
the engine's network-free seams:

- transport is INJECTED as ``transport(url) -> (status, body)`` — tests
  pass a fake, deployments pass a urllib/requests wrapper;
- retry discipline comes from ``operators.enrich.retrying_fetcher``
  (the reference's AbstractEnrichment backoff), with 500 ignored like
  the reference's geocode call;
- the cache round-trip is ``uri_cache_split`` → ``fetch_uris`` →
  ``uri_cache_upsert`` — the engine never opens a socket itself.

Scale note: ``fetch_uris`` runs the fetcher inside mapInPandas over the
MISS list only. The ``delay_ms`` limiter is per-Python-worker (the
reference is a single process; a cluster has many workers), so the
aggregate request rate is workers / delay. For a public Nominatim
endpoint, coalesce the miss list to one partition first —
``misses.coalesce(1)`` — which reproduces the reference's serialized
politeness exactly; against a self-hosted instance the parallel rate is
usually the point.
"""

from __future__ import annotations

import hashlib
import json
import re
import time
from urllib.parse import urlencode

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.enrich import (
    fetch_uris,
    retrying_fetcher,
    uri_cache_split,
    uri_cache_upsert,
)

__all__ = [
    "DEFAULT_IGNORED_CLASSES",
    "nominatim_url",
    "nominatim_cache_key",
    "make_nominatim_fetcher",
    "parse_nominatim_response",
    "geocode_locations",
]

# NominatimGeocoder.php:110-117
DEFAULT_IGNORED_CLASSES = (
    "amenity", "craft", "emergency", "office", "power", "public_transport",
    "shop", "sport", "tourism",
)


def nominatim_url(
    location: str,
    *,
    base_url: str,
    email: str,
    preferred_area: str | None = None,
    polygon_threshold: float | None = 0.01,
) -> str:
    """The reference's request URL (NominatimGeocoder.php:377-391).

    ``email`` is mandatory there (Nominatim usage policy); the optional
    ``viewbox`` prioritizes a preferred area and ``polygon_threshold``
    asks the server for simplified polygons.
    """
    if not base_url:
        raise ValueError("base_url must be specified for Nominatim")
    if not email:
        raise ValueError("email must be specified for Nominatim")
    params: list[tuple[str, str]] = [
        ("q", location),
        ("format", "json"),
        ("polygon_text", "1"),
        ("email", email),
    ]
    if preferred_area:
        params.append(("viewbox", preferred_area))
    if polygon_threshold:
        params.append(("polygon_threshold", str(polygon_threshold)))
    return base_url + "?" + urlencode(params)


def nominatim_cache_key(url: str) -> str:
    """uriCache _id: 'nominatim ' + md5(url) (NominatimGeocoder.php:394)."""
    return "nominatim " + hashlib.md5(url.encode("utf-8")).hexdigest()


def make_nominatim_fetcher(
    transport,
    *,
    delay_ms: float = 1500.0,
    max_tries: int = 90,
    retry_wait: float = 5.0,
    sleep=None,
    clock=None,
):
    """Wrap ``transport(url) -> (status, body)`` into the engine's
    ``fetcher(url) -> str`` shape with the reference's discipline:

    - a ``delay_ms`` pause between consecutive requests from this
      worker (NominatimGeocoder.php:369-375);
    - AbstractEnrichment retry/backoff with HTTP 500 ignored — a 500
      yields '' instead of raising, like the reference's geocode call.

    ``sleep``/``clock`` are injectable for tests.
    """
    do_sleep = sleep if sleep is not None else time.sleep
    now = clock if clock is not None else time.monotonic
    fetch = retrying_fetcher(
        transport,
        max_tries=max_tries,
        retry_wait=retry_wait,
        ignore_errors=(500,),
        sleep=do_sleep,
    )
    last_request = [None]

    def fetcher(url: str) -> str:
        if last_request[0] is not None:
            since = (now() - last_request[0]) * 1000.0
            if since < delay_ms:
                do_sleep((delay_ms - since) / 1000.0)
        last_request[0] = now()
        return fetch(url)

    return fetcher


_LINESTRING_RE = re.compile(r"^LINESTRING\s*\((.*)\)\s*$", re.S)


def _linestring_points(wkt: str) -> list[str] | None:
    m = _LINESTRING_RE.match(wkt or "")
    if not m:
        return None
    return [p.strip() for p in m.group(1).split(",") if p.strip()]


def _merge_linestrings(items: list[dict]) -> list[dict]:
    """Merge contiguous LINESTRINGs (NominatimGeocoder.php:447-479):
    when one string's end point equals the next one's start point, they
    become a single LINESTRING. Pure coordinate-text comparison — the
    reference round-trips through geoPHP for the same test."""
    results: list[dict] = []
    for current in items:
        prev = results[-1] if results else None
        cur_pts = _linestring_points(current.get("wkt", ""))
        prev_pts = _linestring_points(prev["wkt"]) if prev else None
        if not prev_pts or not cur_pts:
            results.append(dict(current))
            continue
        if prev_pts[0] == cur_pts[-1]:
            merged = cur_pts + prev_pts[1:]
        elif prev_pts[-1] == cur_pts[0]:
            merged = prev_pts + cur_pts[1:]
        else:
            results.append(dict(current))
            continue
        results[-1] = {**prev, "wkt": "LINESTRING(" + ",".join(merged) + ")"}
    return results


def parse_nominatim_response(
    body: str,
    ignored_classes: tuple[str, ...] = DEFAULT_IGNORED_CLASSES,
) -> list[dict]:
    """Decode one Nominatim JSON response into the reference's result
    shape: list of {wkt, lat, lon, importance} for the highest-importance
    places only (NominatimGeocoder.php:407-438).

    - ignored classes are skipped;
    - 'boundary' places get their importance boosted ×10;
    - of the survivors, only those tied at the highest importance stay;
    - contiguous LINESTRING results merge into one.

    Undecodable bodies (and the '' an ignored 500 produces) yield [].
    """
    try:
        places = json.loads(body)
    except (TypeError, ValueError):
        return []
    if not isinstance(places, list):
        return []
    items: list[dict] = []
    highest = None
    for place in places:
        if place.get("class") in ignored_classes:
            continue
        importance = place.get("importance", 0.0)
        if place.get("class") == "boundary":
            importance *= 10
        if highest is None or importance > highest:
            highest = importance
        elif importance < highest:
            continue
        items.append(
            {
                "wkt": place.get("geotext", ""),
                "lat": place.get("lat", ""),
                "lon": place.get("lon", ""),
                "importance": importance,
            }
        )
    results = [i for i in items if i["importance"] == highest]
    return _merge_linestrings(results)


def geocode_locations(
    locations: DataFrame,
    cache: DataFrame,
    fetcher,
    now: float,
    *,
    base_url: str,
    email: str,
    preferred_area: str | None = None,
    polygon_threshold: float | None = 0.01,
    location_col: str = "location",
    max_age_minutes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end cached geocoding pass.

    ``locations`` carries one row per distinct location string; returns
    ``(enriched, new_cache)`` where ``enriched`` = locations + raw
    ``data`` (one fetch's body, parse with
    ``parse_nominatim_response``) and ``new_cache`` is the upserted
    uriCache table to persist for the next run. Composes exactly like
    the reference: request URL → cache split (TTL) → fetch misses →
    upsert → every request answered from the updated cache.

    The Spark-side URL/cache-key expressions mirror ``nominatim_url`` /
    ``nominatim_cache_key`` byte-for-byte (url_encode is
    x-www-form-urlencoded like urllib's urlencode), so driver-computed
    and executor-computed keys always hit the same cache rows.
    """
    reqs = locations.withColumn(
        "url",
        F.concat(
            F.lit(base_url + "?"),
            F.lit("q="),
            F.url_encode(F.col(location_col)),
            F.lit("&" + urlencode([("format", "json"), ("polygon_text", "1"), ("email", email)])),
            F.lit("&viewbox=" + preferred_area if preferred_area else ""),
            F.lit(
                "&polygon_threshold=" + str(polygon_threshold)
                if polygon_threshold
                else ""
            ),
        ),
    ).withColumn("_id", F.concat(F.lit("nominatim "), F.md5(F.col("url"))))
    kwargs = {}
    if max_age_minutes is not None:
        kwargs["max_age_minutes"] = max_age_minutes
    hits, misses = uri_cache_split(reqs, cache, now, **kwargs)
    fetched = fetch_uris(misses, fetcher, now)
    new_cache = uri_cache_upsert(cache, fetched)
    enriched_all, _ = uri_cache_split(reqs, new_cache, now, **kwargs)
    return enriched_all, new_cache
