"""Crawl opt-out gate: robots-meta / X-Robots-Tag noindex detection
(functions/html.py), the WARC envelope's http_headers pass-through,
and the [corpus:] optout / optout_domains stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.functions.html import (
    robots_header_noindex,
    robots_meta_noindex,
    robots_optout,
)


def _evl(spark, col, rows, schema="s string"):
    df = spark.createDataFrame([(r,) for r in rows], schema)
    return [r[0] for r in df.select(col).collect()]


def test_robots_meta_variants(spark):
    cases = [
        ('<meta name="robots" content="noindex">', True),
        ('<META NAME=ROBOTS CONTENT="NONE">', True),  # case + bare attr
        ("<meta content='noindex' name='robots'>", True),  # attr order
        ('<meta name="robots" content="index, follow">', False),
        ('<meta name="robots" content="nonevent">', False),  # \b guard
        ('<meta name="description" content="noindex tips">', False),
        ("body mentions noindex outside any meta", False),
        (None, False),
    ]
    got = _evl(spark, robots_meta_noindex("s"), [c for c, _ in cases])
    assert got == [e for _, e in cases]


def test_robots_header_variants(spark):
    cases = [
        ("HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex", True),
        ("HTTP/1.1 200 OK\r\nx-robots-tag: googlebot: none", True),
        ("HTTP/1.1 200 OK\r\nX-Robots-Tag: all", False),
        # only line-anchored header names count
        ("HTTP/1.1 200 OK\r\nVia: X-Robots-Tag: noindex", False),
        (None, False),
    ]
    got = _evl(spark, robots_header_noindex("s"), [c for c, _ in cases])
    assert got == [e for _, e in cases]


def test_robots_optout_combined(spark):
    df = spark.createDataFrame(
        [
            ("<p>ok</p>", "X-Robots-Tag: noindex"),
            ('<meta name=robots content=noindex>', None),
            ("<p>ok</p>", None),
        ],
        "html string, hdr string",
    )
    got = [
        r[0]
        for r in df.select(robots_optout("html", "hdr")).collect()
    ]
    assert got == [True, True, False]


def test_warc_response_keeps_http_headers():
    from recordmanager_spark.sources.warc import parse_warc_text

    body = "<html>hi</html>"
    http = (
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n"
        f"Content-Length: {len(body)}\r\n\r\n{body}"
    )
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://a.example/\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http.encode())}\r\n\r\n{http}\r\n\r\n"
    )
    rows = parse_warc_text("f", rec)
    assert len(rows) == 1
    assert rows[0][8] == body  # payload is still the bare body
    assert "X-Robots-Tag: noindex" in rows[0][9]  # envelope kept
    # non-HTTP records carry no header column
    meta = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: text/plain\r\n"
        "Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    assert parse_warc_text("f", meta)[0][9] is None


def test_corpus_optout_stages(spark, tmp_path):
    from recordmanager_spark.corpus_config import (
        apply_corpus_pipeline,
        parse_corpus_ini,
    )

    lst = tmp_path / "optout_domains.txt"
    lst.write_text("optout.example\n# comment\n")
    cfg = parse_corpus_ini(
        "[corpus:web]\n"
        "optout = true\n"
        f"optout_domains = {lst}\n"
        "strip_html = true\n"
        "keep_text = true\n"
    )["web"]
    assert cfg.optout and cfg.optout_domains == str(lst)

    df = spark.createDataFrame(
        [
            # meta noindex -> dropped (and the gate must run BEFORE
            # strip_html removes the meta element)
            (
                "https://ok.example/1",
                '<html><head><meta name="robots" content="noindex">'
                "</head><body>one</body></html>",
                None,
            ),
            # header noindex -> dropped
            (
                "https://ok.example/2",
                "<html><body>two</body></html>",
                "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex",
            ),
            # opted-out domain (subdomain match) -> dropped
            (
                "https://sub.optout.example/3",
                "<html><body>three</body></html>",
                None,
            ),
            # clean -> kept
            (
                "https://ok.example/4",
                "<html><body>four</body></html>",
                None,
            ),
        ],
        "doc_id string, text string, http_headers string",
    )
    out = apply_corpus_pipeline(df, cfg)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {"https://ok.example/4": "four"}


def test_corpus_optout_without_headers_column(spark, tmp_path):
    from recordmanager_spark.corpus_config import (
        apply_corpus_pipeline,
        parse_corpus_ini,
    )

    cfg = parse_corpus_ini(
        "[corpus:web]\noptout = true\nkeep_text = true\n"
    )["web"]
    df = spark.createDataFrame(
        [
            ("a", '<meta name="robots" content="noindex">x'),
            ("b", "clean"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"] for r in apply_corpus_pipeline(df, cfg).collect()}
    assert got == {"b"}
