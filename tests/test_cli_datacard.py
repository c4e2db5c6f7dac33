"""datacard console command: documents parquet -> per-group summary,
JSON lines or parquet — the count-values console pattern applied to
the corpus tier (operators/diagnostics.corpus_datacard, whose values
are oracle-twinned by corpus_datacard_docs)."""

import json

from recordmanager_spark.cli import main


def test_datacard_prints_and_writes(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (0, "web", "en", "the quick brown fox jumps over the dog"),
            (1, "web", "en", "the quick brown fox jumps over the dog"),
            (2, "web", "de", "ein kurzer satz"),
            (3, "books", "en", "an entirely different document body here"),
        ],
        "doc_id long, source string, lang string, text string",
    ).write.parquet(src)

    main(["datacard", "--input", src])
    rows = [
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    by_g = {(r["source"], r["lang"]): r for r in rows}
    assert set(by_g) == {("web", "en"), ("web", "de"), ("books", "en")}
    web_en = by_g[("web", "en")]
    assert web_en["n_docs"] == 2
    assert web_en["n_unique"] == 1  # 0 and 1 are exact duplicates
    assert web_en["dup_rate"] == 0.5

    out = str(tmp_path / "card")
    main(["datacard", "--input", src, "--by", "source", "--out", out])
    got = {r["source"]: r for r in spark.read.parquet(out).collect()}
    assert got["web"]["n_docs"] == 3 and got["books"]["n_docs"] == 1

    # the 100 TB sketch path runs and keeps the group structure
    main(["datacard", "--input", src, "--approx"])
    rows = [
        json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    assert len(rows) == 3
