"""Skosmos-dialect linked-data enrichment client over the uriCache seam.

Behavioral spec (reference, NOT code):
``Base/Enrichment/SkosmosEnrichment.php`` — entity URL shape :664-675
(``<api>/data?format=application/json&uri=<urlencoded id>``, empty for
a missing/'database' base), allowed-URL-prefix gating :373-388, concept
detection by skos:Concept type :581-592, label extraction
(prefLabel → preferred; altLabel + hiddenLabel → alternative) with
optional language filtering :549-570, wgs84 lat/long → location
:620-650, and the two-level skos:exactMatch walk that pulls
matchPreferred/matchAlternative from allowed match vocabularies
:430-480. The reference caches parsed documents in its linked-data
table (getJsonLdDoc :495-540); here the cache round-trip is the
engine's ``uri_cache_split`` → ``fetch_uris`` → ``uri_cache_upsert``
with the HTTP transport injected.

The offline half of this enrichment (the broadcast label join over an
already-materialized entity table) is ``operators/enrich.py``'s
ld_enrichment path; this module is the client that BUILDS that entity
table from live Skosmos responses.
"""

from __future__ import annotations

import json
from urllib.parse import quote_plus

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.enrich import fetch_uris, uri_cache_split, uri_cache_upsert

__all__ = [
    "SKOS_CORE",
    "WGS84_POS",
    "skosmos_entity_url",
    "parse_skos_doc",
    "enrich_uri",
    "skosmos_enrich_uris",
]

SKOS_CORE = "http://www.w3.org/2004/02/skos/core#"
WGS84_POS = "http://www.w3.org/2003/01/geo/wgs84_pos#"


def skosmos_entity_url(entity_id: str, api_base_url: str) -> str:
    """SkosmosEnrichment.php:664-675: ``<api>/data?format=application/
    json&uri=<id>``; '' when the base is empty or the 'database'
    sentinel (cache-only operation)."""
    url = api_base_url or ""
    if not url or url == "database":
        return ""
    if not url.endswith("/"):
        url += "/"
    return url + "data?format=application/json&uri=" + quote_plus(entity_id)


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _node_id(node: dict) -> str:
    return node.get("@id") or node.get("uri") or ""


def _is_concept(node: dict) -> bool:
    for t in _as_list(node.get("@type") or node.get("type")):
        tid = t.get("@id") if isinstance(t, dict) else t
        if tid in (SKOS_CORE + "Concept", "skos:Concept", "Concept"):
            return True
    return False


def _prop(node: dict, iri: str, prefixed: str):
    return _as_list(node.get(iri) if iri in node else node.get(prefixed))


def _label_values(vals, languages) -> list[str]:
    out: list[str] = []
    for v in vals:
        if isinstance(v, dict):
            lang = v.get("@language") or v.get("lang")
            value = v.get("@value") or v.get("value")
        else:
            lang, value = None, v
        if value is None:
            continue
        if languages and lang is not None and lang not in languages:
            continue
        out.append(str(value))
    return out


def _scalar(vals):
    for v in vals:
        if isinstance(v, dict):
            if "@value" in v or "value" in v:
                return v.get("@value") or v.get("value")
        else:
            return v
    return None


def parse_skos_doc(
    body: str,
    entity_id: str,
    languages: tuple[str, ...] = (),
) -> dict:
    """One JSON-LD document → the reference's per-node result shape.

    Returns {preferred, alternative, locations, exact_matches}:
    preferred/alternative from the entity's OWN concept node (altLabel
    and hiddenLabel both feed alternative, SkosmosEnrichment.php:
    423-427); locations from wgs84 lat/long as (lat, lon, wkt POINT);
    exact_matches = the skos:exactMatch ids of every concept node in
    the graph — the caller decides which match vocabularies to fetch
    (prefix gating) and merges their labels via :func:`enrich_uri`.
    Accepts both expanded (full-IRI) and skos:-prefixed keys;
    undecodable bodies yield the empty result like the reference's
    failed getJsonLdDoc.
    """
    result = {
        "preferred": [],
        "alternative": [],
        "locations": [],
        "exact_matches": [],
    }
    try:
        doc = json.loads(body)
    except (TypeError, ValueError):
        return result
    graph = doc.get("@graph") or doc.get("graph") or []
    if not isinstance(graph, list):
        return result
    for node in graph:
        if not isinstance(node, dict) or not _is_concept(node):
            continue
        if _node_id(node) == entity_id:
            result["preferred"] += _label_values(
                _prop(node, SKOS_CORE + "prefLabel", "skos:prefLabel"),
                languages,
            )
            for prop in ("altLabel", "hiddenLabel"):
                result["alternative"] += _label_values(
                    _prop(node, SKOS_CORE + prop, "skos:" + prop), languages
                )
            lat = _scalar(_prop(node, WGS84_POS + "lat", "wgs84:lat"))
            lon = _scalar(_prop(node, WGS84_POS + "long", "wgs84:long"))
            if lat is not None and lon is not None:
                result["locations"].append(
                    {"lat": str(lat), "lon": str(lon),
                     "wkt": f"POINT({lon} {lat})"}
                )
        for m in _prop(node, SKOS_CORE + "exactMatch", "skos:exactMatch"):
            mid = m.get("@id") if isinstance(m, dict) else m
            if mid:
                result["exact_matches"].append(str(mid))
    return result


def enrich_uri(
    entity_id: str,
    fetch_doc,
    *,
    allowed_prefixes: tuple[str, ...],
    match_prefixes: tuple[str, ...] = (),
    languages: tuple[str, ...] = (),
) -> dict:
    """The reference's full two-level walk for ONE entity id
    (getEnrichmentData :362-480): prefix-gate the id, fetch + parse its
    document, then fetch every allowed skos:exactMatch id and collect
    its labels as matchPreferred/matchAlternative. ``fetch_doc(id) ->
    str`` is the injected (usually cache-backed) document source."""
    empty = {
        "preferred": [], "alternative": [],
        "matchPreferred": [], "matchAlternative": [], "locations": [],
    }
    if not any(entity_id.startswith(p) for p in allowed_prefixes):
        return empty
    main = parse_skos_doc(fetch_doc(entity_id) or "", entity_id, languages)
    out = {
        "preferred": main["preferred"],
        "alternative": main["alternative"],
        "matchPreferred": [],
        "matchAlternative": [],
        "locations": main["locations"],
    }
    for mid in main["exact_matches"]:
        if not any(mid.startswith(p) for p in match_prefixes):
            continue
        match = parse_skos_doc(fetch_doc(mid) or "", mid, languages)
        out["matchPreferred"] += match["preferred"]
        out["matchAlternative"] += match["alternative"]
        out["locations"] += match["locations"]
    return out


def skosmos_enrich_uris(
    uris: DataFrame,
    cache: DataFrame,
    fetcher,
    now: float,
    *,
    api_base_url: str,
    uri_col: str = "uri",
    max_age_minutes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cache-backed document fetch for a distinct-URI worklist.

    Returns ``(docs, new_cache)``: ``docs`` = uris + raw JSON-LD
    ``data`` (parse with :func:`parse_skos_doc` / walk with
    :func:`enrich_uri` against the updated cache), ``new_cache`` the
    upserted uriCache to persist. The entity URL and the cache key are
    both the Skosmos shapes; like the reference, the cache key is the
    entity id itself (getJsonLdDoc caches by id, not URL).
    """
    reqs = uris.withColumn(
        "url",
        F.concat(
            F.lit(
                (api_base_url.rstrip("/") + "/")
                if api_base_url and api_base_url != "database"
                else ""
            ),
            F.lit("data?format=application/json&uri="),
            F.url_encode(F.col(uri_col)),
        ),
    ).withColumn("_id", F.col(uri_col))
    kwargs = {}
    if max_age_minutes is not None:
        kwargs["max_age_minutes"] = max_age_minutes
    hits, misses = uri_cache_split(reqs, cache, now, **kwargs)
    fetched = fetch_uris(misses, fetcher, now)
    new_cache = uri_cache_upsert(cache, fetched)
    docs, _ = uri_cache_split(reqs, new_cache, now, **kwargs)
    return docs, new_cache
