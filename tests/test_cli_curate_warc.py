"""curate with a config-declared WARC source: segment directory ->
curated parquet in ONE command, no --input — the reference's
datasources.ini harvest architecture (sources are config entries, not
code) applied to the crawl tier via `[corpus:] source = warc:<dir>`.
"""

import gzip

from recordmanager_spark.cli import main


def _warc_response(doc_id: int, body: str) -> str:
    block = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"WARC-Target-URI: https://crawl.example/{doc_id}\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block.encode('utf-8'))}\r\n\r\n"
        + block
        + "\r\n\r\n"
    )


def test_curate_from_warc_source(spark, tmp_path):
    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    # segment 0: plain; segment 1: gzip (one member per record, the
    # Common Crawl layout) — both transports through one config entry
    (seg_dir / "seg0.warc").write_text(
        _warc_response(0, "<p>the quick brown fox jumps over the dog</p>")
        + _warc_response(1, "<p>the quick brown fox jumps over the dog</p>")
        + _warc_response(2, "<div>tiny</div>"),
        encoding="utf-8",
    )
    (seg_dir / "seg1.warc.gz").write_bytes(
        gzip.compress(
            _warc_response(
                3, "<p>der schnelle braune fuchs springt und ist nicht da</p>"
            ).encode("utf-8")
        )
        + gzip.compress(
            _warc_response(
                4, "<p>a completely different sentence that is kept</p>"
            ).encode("utf-8")
        )
    )
    ini = tmp_path / "corpus.ini"
    ini.write_text(
        "[corpus:crawl]\n"
        f"source = warc:{seg_dir}\n"
        "strip_html = true\n"
        "languages[] = en\n"
        "dedup = exact\n"
        "min_tokens = 4\n"
        "keep_text = true\n"
    )
    out = str(tmp_path / "curated")
    main(
        [
            "curate",
            "--config", str(ini),
            "--corpus", "crawl",
            "--out", out,
        ]
    )
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    # 1 deduped against 0 (min target-URI keeps .../0), 2 token-gated,
    # 3 language-gated (derived lang = de), 4 kept
    assert set(rows) == {
        "https://crawl.example/0",
        "https://crawl.example/4",
    }
    r0 = rows["https://crawl.example/0"]
    assert r0["text"] == "the quick brown fox jumps over the dog"
    assert r0["lang"] == "en"  # derived — the crawl carried no lang col
    assert r0["source"].endswith("seg0.warc")
    assert rows["https://crawl.example/4"]["source"].endswith("seg1.warc.gz")


def test_curate_no_input_no_source_errors(tmp_path):
    import pytest

    ini = tmp_path / "c.ini"
    ini.write_text("[corpus:a]\nmin_tokens = 1\n")
    with pytest.raises(SystemExit, match="source"):
        main(
            [
                "curate", "--config", str(ini), "--corpus", "a",
                "--out", str(tmp_path / "o"),
            ]
        )


def test_parse_rejects_unknown_source_scheme():
    import pytest

    from recordmanager_spark.corpus_config import parse_corpus_ini

    with pytest.raises(ValueError, match="source"):
        parse_corpus_ini("[corpus:x]\nsource = ftp:/nope\n")
