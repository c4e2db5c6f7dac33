"""URL canonicalization rules (RFC 3986 §6 + tracking strip) and the
canonical-URL dedup winner selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.functions.urls import (
    canonical_url_dedup,
    canonicalize_url,
)


def _canon(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [
        r.c for r in df.select(canonicalize_url("u", **kw).alias("c")).collect()
    ]


def test_canonicalize_rules(spark):
    got = _canon(
        spark,
        [
            "HTTPS://News.Example:443/a?utm_source=x&b=2&a=1#frag",
            "http://site.example:80/",
            "http://site.example:8080/x",       # non-default port kept
            "https://site.example",             # empty path -> /
            "https://site.example/x?fbclid=1",  # all params stripped
            "https://site.example/x?b=2&a=1",   # params sorted
            "  https://pad.example/x  ",        # trimmed
            "not a url at all #tail",           # passthrough, fragment cut
            "ftp://Mixed.Case/Path:80",         # unknown scheme: port kept
        ],
    )
    assert got == [
        "https://news.example/a?a=1&b=2",
        "http://site.example/",
        "http://site.example:8080/x",
        "https://site.example/",
        "https://site.example/x",
        "https://site.example/x?a=1&b=2",
        "https://pad.example/x",
        "not a url at all",
        "ftp://mixed.case/Path:80",
    ]


def test_strip_www_opt_in(spark):
    urls = ["https://www.site.example/x", "https://site.example/x"]
    assert _canon(spark, urls) == urls  # default keeps www
    assert _canon(spark, urls, strip_www=True) == [
        "https://site.example/x",
        "https://site.example/x",
    ]


def test_path_case_and_query_values_preserved(spark):
    # only scheme/host fold; path and parameter values are semantics
    [got] = _canon(spark, ["https://A.B/CaseD?K=V"])
    assert got == "https://a.b/CaseD?K=V"


def test_tracking_param_edge_forms(spark):
    """Exact-name entries strip the bare valueless form and never
    over-match longer names; custom names with regex metacharacters
    are treated as literals."""
    got = _canon(
        spark,
        [
            "https://s.example/x?a=1&fbclid",         # bare valueless
            "https://s.example/x?fbclid2=keep&a=1",   # longer name kept
            "https://s.example/x?utm_campaign=z&a=1", # family prefix
        ],
    )
    assert got == [
        "https://s.example/x?a=1",
        "https://s.example/x?a=1&fbclid2=keep",
        "https://s.example/x?a=1",
    ]
    got2 = _canon(
        spark,
        ["https://s.example/x?ref[src]=t&a=1&ref=keep"],
        tracking_params=("ref[src]=",),
    )
    assert got2 == ["https://s.example/x?a=1&ref=keep"]


def test_canonical_url_dedup_winner(spark):
    df = spark.createDataFrame(
        [
            (1, "https://s.example/x?b=2&a=1", 10),
            (2, "https://s.example/x?a=1&b=2&utm_source=t", 50),
            (3, "https://s.example/x?a=1&b=2", 50),  # ties lose to id 2
            (4, "https://s.example/y", 5),
        ],
        "doc_id long, url string, quality long",
    )
    out = canonical_url_dedup(df, quality_col="quality").collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].canonical_url == by_id[2].canonical_url
    assert [by_id[i].keep for i in (1, 2, 3, 4)] == [False, True, False, True]
