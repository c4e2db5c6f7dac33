"""robots.txt harvester example (examples/robots_fetcher.py): frontier
derivation, fetch-status semantics (2xx body / 404 allow-all /
unreachable NULL+flag), TTL-driven incremental refresh, and the full
loop into robots_gate."""

from __future__ import annotations

from recordmanager_spark.examples.robots_fetcher import (
    fetch_robots,
    refresh_robots,
    robots_frontier,
)
from recordmanager_spark.functions.robots import robots_gate


def _make_factory():
    """Build a factory CLOSURE: cloudpickle ships closures by value
    (a module-level function would serialize as an import reference,
    and executors cannot import the test module). Side effects on the
    executor (call logs) do NOT propagate back — tests assert observable
    outputs (fetched_at stamps) instead."""
    robots = {
        "https://a.example/robots.txt": "User-agent: *\nDisallow: /x\n",
        "https://b.example/robots.txt": "",      # 404 -> allow all
        # c.example: unreachable -> fetcher returns None
    }

    def factory():
        def fetch(url):
            return robots.get(url)  # None for c.example

        return fetch

    return factory


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "https://a.example/x/1"),
            (2, "https://a.example/ok"),
            (3, "https://B.EXAMPLE/x/1"),
            (4, "https://c.example/x"),
        ],
        "id long, url string",
    )


def test_frontier_is_distinct_lowercased_hosts(spark):
    hosts = {r["host"] for r in robots_frontier(_docs(spark)).collect()}
    assert hosts == {"a.example", "b.example", "c.example"}


def test_fetch_status_semantics(spark):
    out = {
        r["host"]: (r["robots_txt"], r["unreachable"])
        for r in fetch_robots(
            robots_frontier(_docs(spark)), _make_factory(), now=1000.0
        ).collect()
    }
    assert out["a.example"] == ("User-agent: *\nDisallow: /x\n", False)
    assert out["b.example"] == ("", False)       # 404: no restrictions
    assert out["c.example"] == (None, True)      # unreachable, flagged


def test_refresh_only_refetches_expired_hosts(spark):
    docs = _docs(spark)
    t0 = fetch_robots(
        robots_frontier(docs), _make_factory(), now=1000.0
    ).localCheckpoint()
    # a/b fresh, c expired (never-succeeded rows carry fetched_at too;
    # give c an old stamp to force the re-fetch)
    prior = t0.withColumn(
        "fetched_at",
        t0["fetched_at"] - (t0["host"] == "c.example").cast("int") * 99999,
    )
    out = refresh_robots(
        docs, prior, _make_factory(), now=1500.0, ttl_seconds=3600.0
    )
    rows = {r["host"]: r["fetched_at"] for r in out.collect()}
    assert rows["a.example"] == 1000.0   # fresh: passed through
    assert rows["b.example"] == 1000.0
    assert rows["c.example"] == 1500.0   # expired: re-fetched
    # hosts no longer in the frontier drop out of the refreshed table
    fewer = _docs(spark).where("id = 1")
    out2 = refresh_robots(fewer, prior, _make_factory(), now=1500.0)
    assert {r["host"] for r in out2.collect()} == {"a.example"}


def test_full_loop_into_robots_gate(spark):
    docs = _docs(spark)
    table = fetch_robots(
        robots_frontier(docs), _make_factory(), now=1.0
    )
    verdicts = {
        r["id"]: r["robots_allowed"]
        for r in robots_gate(docs, table).collect()
    }
    # a: /x blocked, /ok allowed; b: 404 empty -> allowed;
    # c: unreachable NULL -> gate's permissive default (strict callers
    # filter unreachable hosts first)
    assert verdicts == {1: False, 2: True, 3: True, 4: True}
