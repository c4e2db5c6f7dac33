"""robots.txt harvester — builds/refreshes the per-host robots table
that ``functions/robots.robots_gate`` (and ``[corpus:] robots_txt =``)
consumes.

Follows the engine's injected-transport policy (reference parity:
RecordManager keeps networking behind per-deployment HTTP clients —
``AbstractEnrichment.php:243-305`` is the retry discipline this reuses
via :func:`operators.enrich.retrying_fetcher`): the fetch callable is
passed in, tests pass a deterministic fake, the engine itself never
opens a socket.

RFC 9309 fetch-status semantics (§2.3.1): 2xx -> parse the body;
"unavailable" (404 and kin) -> NO restrictions (empty robots, allow
all); "unreachable" (5xx / transport failure after retries) -> RFC
says assume COMPLETE disallow — surfaced here as ``robots_txt = NULL``
plus an ``unreachable`` flag, so the caller chooses between the strict
RFC reading (drop the host's documents) and the common-crawler
pragmatic reading (treat as allow). ``robots_gate`` treats NULL as
allowed, so strict callers filter ``unreachable`` hosts first.

Scale shape: the fetch worklist is DISTINCT HOSTS — bounded by the
frontier, not the corpus; one Arrow-batched scan over it is the single
network boundary. Refresh joins the prior table broadcast and
re-fetches only expired rows (the uriCache TTL split pattern).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.robots import url_host_expr

__all__ = [
    "robots_frontier",
    "fetch_robots",
    "refresh_robots",
    "ROBOTS_SCHEMA",
]

# fetcher(url) -> body, or None for unreachable-after-retries
RobotsFetcher = Callable[[str], Optional[str]]

ROBOTS_SCHEMA = (
    "host string, robots_txt string, unreachable boolean, "
    "fetched_at double"
)


def robots_frontier(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(host) — the distinct lowercased authorities of a document/URL
    frame: the fetch worklist, bounded by hosts, never corpus-sized."""
    return (
        docs.select(url_host_expr(url_col).alias("host"))
        .where(F.col("host") != "")
        .distinct()
    )


def fetch_robots(
    hosts: DataFrame,
    fetcher_factory: Callable[[], RobotsFetcher],
    now: float,
    scheme: str = "https",
) -> DataFrame:
    """Fetch ``<scheme>://<host>/robots.txt`` for every host row.

    ``fetcher_factory`` resolves INSIDE the task (a live HTTP session
    cannot ship from the driver — the Solr-pusher transport pattern)
    and returns ``fetcher(url) -> body | None``; wrap a raw
    ``fetch(url) -> (status, body)`` client with
    :func:`operators.enrich.retrying_fetcher` for the reference's
    retry/backoff discipline, mapping 404 to '' (allow-all) and
    returning None only after retries are exhausted (unreachable)."""
    ts = float(now)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher_factory()
        for pdf in batches:
            bodies = [
                fetch(f"{scheme}://{h}/robots.txt") for h in pdf["host"]
            ]
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "robots_txt": pd.Series(
                        bodies, dtype="object"
                    ),
                    "unreachable": pd.Series(
                        [b is None for b in bodies], dtype="bool"
                    ),
                    "fetched_at": pd.Series(
                        [ts] * len(bodies), dtype="float64"
                    ),
                }
            )

    return hosts.select("host").mapInPandas(run, ROBOTS_SCHEMA)


def refresh_robots(
    docs: DataFrame,
    prior: DataFrame | None,
    fetcher_factory: Callable[[], RobotsFetcher],
    now: float,
    ttl_seconds: float = 24 * 3600.0,
    url_col: str = "url",
    scheme: str = "https",
) -> DataFrame:
    """The incremental harvest: frontier hosts whose prior row is
    missing or older than ``ttl_seconds`` are re-fetched; fresh rows
    pass through untouched (RFC 9309 §2.4 allows caching up to 24 h).
    Returns the full refreshed table for the frontier's hosts."""
    frontier = robots_frontier(docs, url_col)
    if prior is None:
        return fetch_robots(frontier, fetcher_factory, now, scheme)
    cutoff = float(now) - float(ttl_seconds)
    prior_f = prior.join(F.broadcast(frontier), "host", "left_semi")
    fresh = prior_f.where(F.col("fetched_at") >= cutoff)
    stale_hosts = frontier.join(
        F.broadcast(fresh.select("host")), "host", "left_anti"
    )
    return fresh.unionByName(
        fetch_robots(stale_hosts, fetcher_factory, now, scheme)
    )
