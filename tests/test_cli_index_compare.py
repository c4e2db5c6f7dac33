"""CLI lifecycle for the `compare-records` and `check-index` commands
(Command/Solr/CompareRecords.php, Command/Solr/CheckIndex.php)."""

from __future__ import annotations

import datetime

from recordmanager_spark.cli import main


def test_compare_records_cli(spark, tmp_path, capsys):
    recs = str(tmp_path / "recs")
    idx = str(tmp_path / "idx")
    spark.createDataFrame(
        [("a", "new title"), ("b", "same")],
        "id string, title string",
    ).write.parquet(recs)
    spark.createDataFrame(
        [("a", "old title"), ("b", "same")],
        "id string, title string",
    ).write.parquet(idx)
    main(["compare-records", "--records", recs, "--index", idx])
    out = capsys.readouterr().out
    assert "Record a field title would be changed:" in out
    assert "--- old title" in out
    assert "+++ new title" in out
    assert "1 field differences" in out
    assert "Record b" not in out

    # parquet output path + --single-id filter
    diff_out = str(tmp_path / "diff")
    main(
        [
            "compare-records", "--records", recs, "--index", idx,
            "--single-id", "b", "--out", diff_out,
        ]
    )
    assert spark.read.parquet(diff_out).count() == 0


def test_check_index_cli(spark, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    recs = str(tmp_path / "recs")
    ded = str(tmp_path / "ded")
    t0 = datetime.datetime(2024, 6, 1, 0, 0, 0)
    spark.createDataFrame(
        [("r1", "standard"), ("r2", "standard"), ("m1", "merged")],
        "id string, record_format string",
    ).write.parquet(idx)
    spark.createDataFrame(
        [("r1", False, t0)],
        "id string, deleted boolean, updated timestamp",
    ).write.parquet(recs)
    spark.createDataFrame(
        [("m1", True, t0)],
        "id string, deleted boolean, updated timestamp",
    ).write.parquet(ded)

    main(
        [
            "check-index", "--index", idx, "--records", recs,
            "--dedup", ded, "--report-only",
        ]
    )
    out = capsys.readouterr().out
    assert "Found orphan single record r2 in index (database record missing)" in out
    assert "Found orphan merged record m1 in index (database record deleted" in out
    assert "2 orphaned records" in out
    assert "r1" not in out

    # delete-list path
    dl = str(tmp_path / "deletes")
    main(
        [
            "check-index", "--index", idx, "--records", recs,
            "--dedup", ded, "--out", dl,
        ]
    )
    got = {r["id"]: r["reason"] for r in spark.read.parquet(dl).collect()}
    assert got == {"r2": "missing", "m1": "deleted"}
