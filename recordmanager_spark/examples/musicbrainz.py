"""MusicBrainz-dialect enrichment client over the uriCache seam.

Behavioral spec (reference, NOT code):
``Base/Enrichment/MusicBrainzEnrichment.php`` — identifier
sanitization :149-154 (truncate at the first whitespace/paren/bracket,
then normalizeKey), the music-id type switch :92-105 (isrc stays,
upc/ismn/ian → catno with a ``releaseaccent`` title guard :107-111,
musicb → reid, anything else drops), the publisher-number two-phase
:118-136 (source-qualified ``catno:"src num"`` first, bare number +
title guard ONLY when the qualified query returned nothing), the
release-search URL ``<base>/ws/2/release?query=..&fmt=json`` :169-174,
and the release-group expansion :177-191 (a hit whose release carries a
release-group id is replaced by EVERY release of that group via a
second ``rgid:`` query; a hit without one contributes its own id). The
reference caches by the query string (getExternalData's id argument);
so does this client.

The offline-join form of this enrichment (a pre-materialized
(id_type, id_value, title, mbid) lookup table) is
``operators/enrich.enrich_music_ids``; this module is the client that
answers the SAME questions against a live MusicBrainz API through the
engine's network-free seams: transport injected as
``fetch(url) -> (status, body)``, retry via ``retrying_fetcher``, cache
via ``uri_cache_split`` → ``fetch_uris`` → ``uri_cache_upsert``.

Scale shape: every fetch round runs over a DISTINCT-query worklist
(bounded by distinct identifiers, not records), the parse is one
Arrow-batched pandas UDF over those few rows, and the id lists join
back to records on the query string. The record side never carries
response bodies.
"""

from __future__ import annotations

import json
from urllib.parse import quote_plus, urlencode

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..functions.keys import normalize_key
from ..operators.enrich import fetch_uris, uri_cache_split, uri_cache_upsert

__all__ = [
    "sanitize_id_col",
    "lucene_escape",
    "mb_release_url",
    "mb_rgid_query",
    "parse_release_search",
    "parse_rgid_search",
    "resolve_mb_queries",
    "musicbrainz_enrich",
]


def sanitize_id_col(c) -> F.Column:
    """MusicBrainzEnrichment.php:149-154: cut at the first whitespace /
    ``(`` / ``[`` and fold through normalizeKey — as a Column, so the
    query worklist builds JVM-side."""
    col = F.col(c) if isinstance(c, str) else c
    return normalize_key(F.regexp_replace(col, r"[\s(\[].*$", ""))


def lucene_escape(c) -> F.Column:
    """``addcslashes($v, '"\\')`` — backslash-escape quotes and
    backslashes before quoting into the Lucene query."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col, r'([\\"])', r"\\$1")


def mb_release_url(query: str, base_url: str) -> str:
    """Release search URL (MusicBrainzEnrichment.php:169-174)."""
    return base_url + "/ws/2/release?" + urlencode(
        {"query": query, "fmt": "json"}
    )


def mb_rgid_url(rgid: str, base_url: str) -> str:
    """Release-group expansion URL (MusicBrainzEnrichment.php:179-181)."""
    return base_url + "/ws/2/release/?query=rgid:" + quote_plus(rgid) + "&fmt=json"


def mb_rgid_query(rgid: str) -> str:
    """The cache key of a group expansion — the reference caches it as
    ``rgid:<id>`` (:181)."""
    return "rgid:" + rgid


def _parse_release_search_py(body: str) -> list[dict]:
    """One release-search response → ordered hit tokens.

    Per release, IN RESPONSE ORDER: a release carrying a release-group
    id yields ``(rg, <rgid>)`` (to be expanded by a second query, :178);
    one without yields ``(id, <release id>)`` (:189). Undecodable bodies
    yield no tokens, like the reference's falsy getExternalData."""
    tokens = []
    try:
        data = json.loads(body)
        for release in data.get("releases") or []:
            rgid = (release.get("release-group") or {}).get("id")
            if rgid:
                tokens.append({"kind": "rg", "value": str(rgid)})
            elif release.get("id"):
                tokens.append({"kind": "id", "value": str(release["id"])})
    except (TypeError, ValueError):
        pass
    return tokens


def _parse_rgid_search_py(body: str) -> list[str]:
    """A ``rgid:`` expansion response → every release id of the group,
    in response order (MusicBrainzEnrichment.php:184-186)."""
    try:
        data = json.loads(body)
        return [
            str(r["id"]) for r in (data.get("releases") or []) if r.get("id")
        ]
    except (TypeError, ValueError):
        return []


def parse_release_search(col):
    """Arrow-batched parse of release-search bodies (built lazily — DDL
    schema parsing needs an active SparkSession)."""

    @pandas_udf("array<struct<kind: string, value: string>>")
    def _udf(bodies: pd.Series) -> pd.Series:
        return bodies.map(_parse_release_search_py)

    return _udf(col)


def parse_rgid_search(col):
    @pandas_udf("array<string>")
    def _udf(bodies: pd.Series) -> pd.Series:
        return bodies.map(_parse_rgid_search_py)

    return _udf(col)


def _cache_round(
    worklist: DataFrame,
    cache: DataFrame,
    fetcher,
    now: float,
    max_age_minutes: int | None,
) -> tuple[DataFrame, DataFrame]:
    """One split → fetch-misses → upsert → re-split round; returns
    (docs with ``data``, updated cache)."""
    kwargs = {}
    if max_age_minutes is not None:
        kwargs["max_age_minutes"] = max_age_minutes
    hits, misses = uri_cache_split(worklist, cache, now, **kwargs)
    fetched = fetch_uris(misses, fetcher, now)
    # materialize each round: the three chained resolve rounds otherwise
    # re-execute every earlier round's fetch on each downstream action
    # (lazy mapInPandas re-runs = duplicate live HTTP requests). The
    # checkpoint is bounded by the distinct-query worklist, not records.
    new_cache = uri_cache_upsert(cache, fetched).localCheckpoint(eager=True)
    docs, _ = uri_cache_split(worklist, new_cache, now, **kwargs)
    return docs, new_cache


def resolve_mb_queries(
    queries: DataFrame,
    cache: DataFrame,
    fetcher,
    now: float,
    *,
    base_url: str,
    query_col: str = "query",
    max_age_minutes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """getMBIDs (MusicBrainzEnrichment.php:164-194) for a DISTINCT-query
    worklist: release search, then release-group expansion, preserving
    the reference's hit order (response order; a group hit expands in
    place to the group's release list).

    Returns ``(resolved, new_cache)`` where resolved = (query_col,
    ``mbids`` array<string>).
    """
    q = queries.select(query_col).where(
        F.col(query_col).isNotNull() & (F.col(query_col) != "")
    ).distinct()
    reqs = q.withColumn("_id", F.col(query_col)).withColumn(
        "url",
        F.concat(
            F.lit(base_url + "/ws/2/release?"),
            F.lit("query="),
            F.url_encode(F.col(query_col)),
            F.lit("&fmt=json"),
        ),
    )
    docs, cache = _cache_round(reqs, cache, fetcher, now, max_age_minutes)
    parsed = docs.select(
        F.col(query_col),
        parse_release_search(F.col("data")).alias("__toks"),
    )

    # second level: every distinct rgid becomes its own cached query
    rgids = (
        parsed.select(F.explode("__toks").alias("__t"))
        .where(F.col("__t.kind") == "rg")
        .select(F.col("__t.value").alias("__rgid"))
        .distinct()
    )
    rg_reqs = rgids.select(
        F.concat(F.lit("rgid:"), F.col("__rgid")).alias("_id"),
        F.concat(
            F.lit(base_url + "/ws/2/release/?query=rgid:"),
            F.url_encode(F.col("__rgid")),
            F.lit("&fmt=json"),
        ).alias("url"),
        F.col("__rgid"),
    )
    rg_docs, cache = _cache_round(rg_reqs, cache, fetcher, now, max_age_minutes)
    rg_ids = rg_docs.select(
        F.col("__rgid"),
        parse_rgid_search(F.col("data")).alias("__rg_ids"),
    )

    # expand in place: posexplode keeps token order, the join swaps each
    # rg token for its group's ordered release list
    tok = parsed.select(
        query_col, F.posexplode_outer("__toks").alias("__pos", "__t")
    )
    tok = tok.join(
        F.broadcast(rg_ids),
        F.col("__t.value") == F.col("__rgid"),
        "left",
    ).select(
        query_col,
        "__pos",
        F.when(F.col("__t.kind") == "id", F.array(F.col("__t.value")))
        .when(F.col("__t.kind") == "rg", F.coalesce("__rg_ids", F.array()))
        .otherwise(F.array())
        .alias("__ids"),
    )
    resolved = tok.groupBy(query_col).agg(
        F.flatten(
            F.array_sort(F.collect_list(F.struct("__pos", "__ids")))["__ids"]
        ).alias("mbids")
    )
    return resolved, cache


def musicbrainz_enrich(
    records: DataFrame,
    cache: DataFrame,
    fetcher,
    now: float,
    *,
    base_url: str,
    id_col: str = "_id",
    title_col: str = "title_short",
    music_ids_col: str = "music_ids",
    pub_numbers_col: str = "publisher_numbers",
    out_col: str = "mbid_str_mv",
    max_age_minutes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full enrich() flow (MusicBrainzEnrichment.php:78-140) against
    a live API through the cache seam. Returns ``(enriched records,
    updated cache)``; ``out_col`` holds the reference-ordered mbid list
    (music-id hits first, then publisher-number hits, duplicates
    removed keeping first occurrence like array unique semantics on the
    Solr side).

    Three resolve rounds, each over a distinct-query worklist:
    music-id queries; source-qualified publisher numbers; then the
    bare-number + title fallback ONLY for numbers whose qualified query
    missed (:126-132) — the response-dependent second phase the
    reference runs per record, here batched corpus-wide.
    """
    # the title guard is escaped but NOT sanitized — the reference quotes
    # $solrArray['title_short'] / getShortTitle() raw (:107-111, :127-130)
    esc_title = lucene_escape(F.col(title_col))

    base = records.select(
        F.col(id_col).alias("__rid"),
        esc_title.alias("__t_esc"),
        F.col(music_ids_col).alias("__mids"),
        F.col(pub_numbers_col).alias("__pnums"),
    )

    # --- music ids (:89-114)
    mids = base.select(
        "__rid", "__t_esc",
        F.posexplode_outer("__mids").alias("__pos", "__m"),
    ).select(
        "__rid", "__t_esc", "__pos",
        sanitize_id_col(F.col("__m.type")).alias("__ty"),
        lucene_escape(sanitize_id_col(F.col("__m.value"))).alias("__v"),
    )
    mapped = (
        F.when(F.col("__ty") == "isrc", F.lit("isrc"))
        .when(F.col("__ty").isin("upc", "ismn", "ian"), F.lit("catno"))
        .when(F.col("__ty") == "musicb", F.lit("reid"))
    )
    mq = mids.withColumn("__mt", mapped).where(
        F.col("__mt").isNotNull()
    ).select(
        "__rid", F.lit(0).alias("__phase"), "__pos",
        F.concat(
            F.col("__mt"), F.lit(':"'), F.col("__v"), F.lit('"'),
            F.when(
                F.col("__mt") == "catno",
                F.concat(
                    F.lit(' AND releaseaccent:"'), F.col("__t_esc"), F.lit('"')
                ),
            ).otherwise(F.lit("")),
        ).alias("query"),
    )
    r1, cache = resolve_mb_queries(
        mq, cache, fetcher, now,
        base_url=base_url, max_age_minutes=max_age_minutes,
    )
    m_hits = mq.join(r1, "query", "left").select(
        "__rid", "__phase", "__pos",
        F.coalesce("mbids", F.array()).alias("__ids"),
    )

    # --- publisher numbers (:118-136)
    pnums = base.select(
        "__rid", "__t_esc",
        F.posexplode_outer("__pnums").alias("__pos", "__p"),
    ).select(
        "__rid", "__t_esc", "__pos",
        sanitize_id_col(F.col("__p.source")).alias("__src"),
        lucene_escape(sanitize_id_col(F.col("__p.value"))).alias("__num"),
    ).where(F.col("__num").isNotNull() & (F.col("__num") != ""))
    qual = pnums.where(F.col("__src") != "").select(
        "__rid", "__pos",
        F.concat(
            F.lit('catno:"'),
            lucene_escape(F.concat_ws(" ", "__src", "__num")),
            F.lit('"'),
        ).alias("query"),
    )
    # NOTE: the reference escapes "$source $id" as one string AFTER both
    # halves were normalizeKey'd; sanitize strips quotes/backslashes so
    # the inner lucene_escape above is a no-op kept for shape parity.
    r2, cache = resolve_mb_queries(
        qual, cache, fetcher, now,
        base_url=base_url, max_age_minutes=max_age_minutes,
    )
    q_hits = qual.join(r2, "query", "left").select(
        "__rid", "__pos", F.coalesce("mbids", F.array()).alias("__qids")
    )

    # fallback: numbers with no source OR an empty qualified result
    pn = pnums.join(q_hits, ["__rid", "__pos"], "left").withColumn(
        "__qids", F.coalesce("__qids", F.array())
    )
    fb = pn.where(F.size("__qids") == 0).select(
        "__rid", "__pos",
        F.concat(
            F.lit('catno:"'), F.col("__num"),
            F.lit('" AND releaseaccent:"'), F.col("__t_esc"), F.lit('"'),
        ).alias("query"),
    )
    r3, cache = resolve_mb_queries(
        fb, cache, fetcher, now,
        base_url=base_url, max_age_minutes=max_age_minutes,
    )
    f_hits = fb.join(r3, "query", "left").select(
        "__rid", "__pos", F.coalesce("mbids", F.array()).alias("__fids")
    )
    p_hits = (
        pn.join(f_hits, ["__rid", "__pos"], "left")
        .select(
            "__rid", F.lit(1).alias("__phase"), "__pos",
            F.when(F.size("__qids") > 0, F.col("__qids"))
            .otherwise(F.coalesce("__fids", F.array()))
            .alias("__ids"),
        )
    )

    gathered = (
        m_hits.unionByName(p_hits)
        .groupBy("__rid")
        .agg(
            F.array_distinct(
                F.flatten(
                    F.array_sort(
                        F.collect_list(F.struct("__phase", "__pos", "__ids"))
                    )["__ids"]
                )
            ).alias(out_col)
        )
    )
    enriched = records.join(
        gathered.withColumnRenamed("__rid", id_col), id_col, "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.array()))
    return enriched, cache
