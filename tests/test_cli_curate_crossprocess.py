"""TRUE cross-process incremental curate: two separate CLI processes
(`python -m recordmanager_spark curate`) against one warehouse
directory. The r10-high data-loss bug was precisely a cross-PROCESS
artifact (fresh in-memory catalog + surviving warehouse dir -> the old
code bootstrapped an empty index and rmtree'd the survivor); the
in-process test simulates the restart with DROP TABLE — this one
doesn't simulate anything."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _curate(cwd, ini, batch, out):
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        SPARK_GRAFT_CPUS="2",
        SPARK_GRAFT_DRIVER_MEM="2g",
    )
    return subprocess.run(
        [
            sys.executable, "-m", "recordmanager_spark", "curate",
            "--config", str(ini), "--corpus", "daily",
            "--input", str(batch), "--out", str(out),
        ],
        cwd=str(cwd), env=env, capture_output=True, text=True,
        timeout=420,
    )


def test_curate_index_survives_real_process_boundary(spark, tmp_path):
    ini = tmp_path / "corpus.ini"
    ini.write_text(
        "[corpus:daily]\n"
        "dedup_index = xproc_fp_idx\n"
        "keep_text = true\n"
    )
    b1 = tmp_path / "b1"
    spark.createDataFrame(
        [(1, "the quick brown fox"), (3, "a different document")],
        "doc_id long, text string",
    ).write.parquet(str(b1))
    b2 = tmp_path / "b2"
    spark.createDataFrame(
        [
            (10, "the quick brown fox"),   # dup of process-1 doc 1
            (11, "a brand new document"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(b2))

    r1 = _curate(tmp_path, ini, b1, tmp_path / "out1")
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "+2 rows" in r1.stdout

    r2 = _curate(tmp_path, ini, b2, tmp_path / "out2")
    assert r2.returncode == 0, r2.stderr[-3000:]
    # cross-process dedup held: doc 10 dropped via the recovered index
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert kept2 == {11}
    assert "+1 rows" in r2.stdout  # only the new fingerprint appended

    # the index data itself survived both processes: prior rows intact,
    # new row appended (read the warehouse files directly — this spark
    # session's catalog never knew the table)
    idx = spark.read.parquet(
        str(tmp_path / "spark-warehouse" / "xproc_fp_idx")
    )
    assert {r["canonical_id"] for r in idx.collect()} == {1, 3, 11}
