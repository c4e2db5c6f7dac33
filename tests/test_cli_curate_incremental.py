"""Incremental curate: `dedup_index = <table>` in the [corpus:] section
probes a persisted fingerprint index instead of the full corpus — the
reference's changed-since ingest architecture on the corpus tier. Run 1
bootstraps the index; run 2 drops cross-ingest duplicates and appends
only new fingerprints.
"""

import uuid

import pytest

from recordmanager_spark.cli import main


@pytest.fixture
def index_table(spark):
    name = "t_fp_idx_" + uuid.uuid4().hex[:8]
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_two_ingests_dedup_across_runs(spark, tmp_path, index_table):
    ini = tmp_path / "corpus.ini"
    ini.write_text(
        "[corpus:daily]\n"
        f"dedup_index = {index_table}\n"
        "min_tokens = 2\n"
        "keep_text = true\n"
    )

    batch1 = str(tmp_path / "b1")
    spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),   # within-batch dup of 1
            (3, "a different document"),
        ],
        "doc_id long, text string",
    ).write.parquet(batch1)
    out1 = str(tmp_path / "out1")
    main(
        [
            "curate", "--config", str(ini), "--corpus", "daily",
            "--input", batch1, "--out", out1,
        ]
    )
    kept1 = {r["doc_id"] for r in spark.read.parquet(out1).collect()}
    assert kept1 == {1, 3}  # 2 deduped within the batch
    idx1 = {
        r["canonical_id"]: r["fp"]
        for r in spark.table(index_table).collect()
    }
    assert set(idx1) == {1, 3}  # min-id canonicals, one per fingerprint

    batch2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [
            (10, "the quick brown fox"),  # dup of ingest-1 doc 1
            (11, "a brand new document"),
            (12, "a brand new document"),  # within-batch dup of 11
        ],
        "doc_id long, text string",
    ).write.parquet(batch2)
    out2 = str(tmp_path / "out2")
    main(
        [
            "curate", "--config", str(ini), "--corpus", "daily",
            "--input", batch2, "--out", out2,
        ]
    )
    kept2 = {r["doc_id"] for r in spark.read.parquet(out2).collect()}
    assert kept2 == {11}  # 10 dropped via the index, 12 within batch
    idx2 = {r["canonical_id"] for r in spark.table(index_table).collect()}
    assert idx2 == {1, 3, 11}  # only the new fingerprint appended


def test_dedup_index_rejects_minhash_combo(tmp_path):
    from recordmanager_spark.corpus_config import parse_corpus_ini

    with pytest.raises(ValueError, match="dedup_index"):
        parse_corpus_ini(
            "[corpus:x]\ndedup = minhash\ndedup_index = t\n"
        )
