"""Stateful streaming dedup test: applyInPandasWithState change detection."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from recordmanager_spark.streaming.pipeline import dedup_new_or_changed

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def test_streaming_dedup_new_or_changed(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two new records
    spark.createDataFrame(
        [("A", "h1"), ("B", "h1")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = dedup_new_or_changed(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r._id, r.content_hash, r.is_new)
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        assert ("A", "h1", True) in first and ("B", "h1", True) in first

        # batch 2: A unchanged (suppressed), B changed, C new
        spark.createDataFrame(
            [("A", "h1"), ("B", "h2"), ("C", "h1")], SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = [
            (r._id, r.content_hash, r.is_new)
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        ]
        assert ("B", "h2", False) in rows  # changed, not new
        assert ("C", "h1", True) in rows  # new id
        # A's unchanged redelivery was suppressed: only one A row ever
        assert sum(1 for r in rows if r[0] == "A") == 1
    finally:
        q.stop()


def test_streaming_first_seen_dedup(spark, tmp_path):
    """First fingerprint arrival emits once (smallest id wins within a
    batch); re-deliveries and duplicates are suppressed across batches
    over one checkpoint."""
    import uuid

    from recordmanager_spark.streaming.pipeline import streaming_first_seen

    base = str(tmp_path)
    schema = "doc_id string, fingerprint string"
    batches = [
        [("b", "f1"), ("a", "f1"), ("c", "f2")],  # f1 ties -> 'a' wins
        [("a", "f1"), ("d", "f3")],  # f1 suppressed, f3 new
    ]
    rows = []
    for i, data in enumerate(batches):
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "append"
        ).json(f"{base}/in")
        out = streaming_first_seen(
            spark.readStream.schema(schema).json(f"{base}/in")
        )

        def gather(bdf, _epoch, run=i):
            rows.extend(
                (r["fingerprint"], r["doc_id"], r["n_seen"], run)
                for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(gather)
            .outputMode("update")
            .queryName("t_first_seen_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert sorted(rows) == [("f1", "a", 2, 0), ("f2", "c", 1, 0), ("f3", "d", 1, 1)]


def test_streaming_first_seen_emit_updates(spark, tmp_path):
    """emit_updates=True: a suppressed re-arrival in a later batch
    re-emits the winner with the cumulative n_seen (audit mode);
    untouched fingerprints stay silent."""
    import uuid

    from recordmanager_spark.streaming.pipeline import streaming_first_seen

    base = str(tmp_path)
    schema = "doc_id string, fingerprint string"
    batches = [
        [("b", "f1"), ("a", "f1"), ("c", "f2")],
        [("x", "f1"), ("y", "f1"), ("d", "f3")],  # f1 x2 again, f2 silent
    ]
    rows = []
    for i, data in enumerate(batches):
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "append"
        ).json(f"{base}/in")
        out = streaming_first_seen(
            spark.readStream.schema(schema).json(f"{base}/in"),
            emit_updates=True,
        )

        def gather(bdf, _epoch, run=i):
            rows.extend(
                (r["fingerprint"], r["doc_id"], r["n_seen"], run)
                for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(gather)
            .outputMode("update")
            .queryName("t_fs_upd_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert sorted(rows) == [
        ("f1", "a", 2, 0),  # first batch: a wins the tie, 2 arrivals
        ("f1", "a", 4, 1),  # audit update: 2 more suppressed arrivals
        ("f2", "c", 1, 0),
        ("f3", "d", 1, 1),  # new fingerprint in batch 2
    ]


def test_streaming_first_seen_state_ttl_readmits(spark, tmp_path):
    """Bounded-state mode: a fingerprint idle past state_ttl_seconds is
    evicted by the processing-time timeout, so a later duplicate
    re-admits and re-emits as first-seen with n_seen restarting at 1
    (exact dedup within the TTL window, approximate beyond — the
    documented trade). Runs ONE continuous micro-batch query
    (processingTime trigger): under availableNow a registered timeout
    keeps the engine alive forever, per the operator docstring."""
    import time
    import uuid

    from recordmanager_spark.streaming.pipeline import streaming_first_seen

    base = str(tmp_path)
    schema = "doc_id string, fingerprint string"
    rows = []

    def write_file(data, name):
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "append"
        ).json(f"{base}/in/{name}")

    def wait_for(n, deadline=90.0):
        t0 = time.time()
        while len(rows) < n:
            assert time.time() - t0 < deadline, rows
            time.sleep(0.2)

    write_file([("a", "f1")], "b1")
    out = streaming_first_seen(
        spark.readStream.schema(schema).json(f"{base}/in/*"),
        state_ttl_seconds=1.0,
    )
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _e: rows.extend(
                (r["fingerprint"], r["doc_id"], r["n_seen"])
                for r in bdf.collect()
            )
        )
        .outputMode("update")
        .queryName("t_fs_ttl_" + uuid.uuid4().hex[:8])
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_for(1)
        assert rows == [("f1", "a", 1)]
        # idle past the TTL: empty micro-batches fire the timeout and
        # evict f1's state
        time.sleep(4.0)
        write_file([("b", "f1")], "b2")
        wait_for(2)
        assert rows == [("f1", "a", 1), ("f1", "b", 1)]
    finally:
        q.stop()
