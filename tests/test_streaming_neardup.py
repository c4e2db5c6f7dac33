"""Streaming minhash/LSH near-dup: cross-batch match emission, bounded
reps, checkpoint restart, and signature parity with the batch engine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from recordmanager_spark.streaming.pipeline import streaming_minhash_neardup

SCHEMA = "doc_id string, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden all day"
)
NEAR = BASE.replace("garden", "meadow")
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


def _start(spark, src, ckpt, name):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_minhash_neardup(stream, threshold=0.5)
    return (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_streaming_neardup_matches_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("a", BASE), ("x", OTHER)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = _start(spark, src, ckpt, "nd_out")
    try:
        q.processAllAvailable()
        # batch 1: everything registers as a rep, nothing matches
        assert spark.sql("SELECT * FROM nd_out").count() == 0

        # batch 2: near-dup of a, plus an unrelated doc
        spark.createDataFrame(
            [("b", NEAR), ("y", OTHER + " with an extra tail sentence")],
            SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM nd_out").collect()
        b_hits = [r for r in rows if r.doc_id == "b"]
        assert b_hits, "near-duplicate b must match rep a in >=1 band"
        assert all(r.matched_id == "a" for r in b_hits)
        assert all(r.est_jaccard >= 0.5 for r in b_hits)
        # y is a near-dup of x (shared long prefix) OR novel depending on
        # banding, but it must never match a
        assert all(r.matched_id != "a" for r in rows if r.doc_id == "y")
    finally:
        q.stop()


def test_streaming_neardup_state_survives_restart(spark, tmp_path):
    """Rep state persists across a query restart over one checkpoint
    (foreachBatch + availableNow, one fresh query per batch — the
    streaming_first_seen restart harness)."""
    import uuid

    base = str(tmp_path)
    src = f"{base}/in"
    os.makedirs(src)
    batches = [[("a", BASE)], [("b", NEAR)]]
    rows = []
    for i, data in enumerate(batches):
        spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        out = streaming_minhash_neardup(
            spark.readStream.schema(SCHEMA).parquet(src), threshold=0.5
        )

        def gather(bdf, _epoch, run=i):
            rows.extend(
                (r["doc_id"], r["matched_id"], run) for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(gather)
            .outputMode("update")
            .queryName("t_nd_restart_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    assert ("b", "a", 1) in rows, (
        "rep state must survive the checkpoint restart",
        rows,
    )
    assert not any(r[2] == 0 for r in rows)  # batch 1 emitted nothing


def test_streaming_sig_matches_batch_signature(spark):
    """The streaming per-row signature expression and the batch
    minhash_signature groupBy produce identical signatures."""
    from recordmanager_spark.operators.text_dedup import minhash_signature

    docs = spark.createDataFrame(
        [("a", BASE), ("b", NEAR), ("c", OTHER), ("d", "short"), ("e", "")],
        SCHEMA,
    )
    batch = {
        r["id"]: list(r["sig"])
        for r in minhash_signature(
            docs, "doc_id", "text", num_perm=16, shingle_n=3
        ).collect()
    }
    # reproduce the streaming scan-stage signature via the operator
    # itself: band keys are sig-slices, so equal band keys across all
    # bands for every doc == equal signatures. Compare directly instead
    # by evaluating the same expression path on a batch DataFrame.
    from recordmanager_spark.functions.text import (
        ngrams_from_tokens,
        normalize_for_fingerprint,
        tokenize,
    )
    from recordmanager_spark.operators.text_dedup import _PERM_XOR

    xors = ",".join(f"{int(_PERM_XOR[p])}L" for p in range(16))
    sig_sql = (
        "try_element_at(transform(array(transform(__sh, s -> "
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))), "
        f"hs -> transform(array({xors}), x -> "
        "array_min(transform(hs, h -> h ^ x)))), 1)"
    )
    stream_like = docs.select(
        F.col("doc_id").alias("id"),
        ngrams_from_tokens(
            tokenize(normalize_for_fingerprint("text")), 3
        ).alias("__sh"),
    ).select("id", F.expr(sig_sql).alias("sig"))
    streaming = {r["id"]: list(r["sig"]) for r in stream_like.collect()}
    assert streaming == batch


def test_streaming_neardup_state_ttl_evicts_reps(spark, tmp_path):
    """TTL mode: a bucket idle past state_ttl_seconds loses its reps,
    so a later near-duplicate re-registers instead of matching (one
    continuous processingTime query — the first_seen TTL harness)."""
    import time
    import uuid

    base = str(tmp_path)
    rows = []

    def write_file(data, name):
        spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode(
            "append"
        ).json(f"{base}/in/{name}")

    write_file([("a", BASE)], "b1")
    out = streaming_minhash_neardup(
        spark.readStream.schema(SCHEMA).json(f"{base}/in/*"),
        threshold=0.5,
        state_ttl_seconds=1.0,
    )
    q = (
        out.writeStream.foreachBatch(
            lambda bdf, _e: rows.extend(
                (r["doc_id"], r["matched_id"]) for r in bdf.collect()
            )
        )
        .outputMode("update")
        .queryName("t_nd_ttl_" + uuid.uuid4().hex[:8])
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while not q.lastProgress and time.time() < deadline:
            time.sleep(0.2)
        time.sleep(4.0)  # idle past the TTL: a's reps evict
        write_file([("b", NEAR)], "b2")
        t0 = time.time()
        while time.time() - t0 < 30:
            time.sleep(0.5)
        # b arrived after eviction: it must NOT match a anywhere
        assert rows == [], rows
    finally:
        q.stop()


# -- register_matches: the drift-chain recall flag (r10 verdict item) --------

# A 14-word base; B edits word 11, C additionally edits word 7. Chosen
# (searched offline against the engine's own signature family) so that:
# - sig agreement A-B = 0.75, B-C = 0.625 (both match at threshold 0.5),
#   A-C = 0.375 (below threshold: C can never match A directly),
# - B meets A ONLY in band 1's bucket, and C meets B ONLY in that same
#   bucket — so under the default (matched docs don't register) C finds
#   nothing there but A, misses, and registers as novel: the documented
#   drift-chain divergence. With register_matches=True, B registered on
#   match, so C chains to B — the batch connected component A-B-C.
_W = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november".split()
CHAIN_A = " ".join(_W)
CHAIN_B = " ".join(w if i != 11 else "e1x" for i, w in enumerate(_W))
CHAIN_C = " ".join(
    w if i != 7 else "e1y" for i, w in enumerate(CHAIN_B.split())
)


def _run_chain(spark, tmp_path, register_matches):
    import uuid

    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    rows = []
    for i, data in enumerate(
        [[("a", CHAIN_A)], [("b", CHAIN_B)], [("c", CHAIN_C)]]
    ):
        spark.createDataFrame(data, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        out = streaming_minhash_neardup(
            spark.readStream.schema(SCHEMA).parquet(src),
            threshold=0.5,
            register_matches=register_matches,
        )

        def gather(bdf, _epoch):
            rows.extend(
                (r["doc_id"], r["matched_id"]) for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(gather)
            .outputMode("update")
            .queryName("t_nd_chain_" + uuid.uuid4().hex[:8])
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return set(rows)


def test_chain_divergence_default_vs_register_matches(spark, tmp_path):
    # default: B matches A, C is (wrongly, vs batch semantics) novel
    base = tmp_path / "default"
    base.mkdir()
    edges = _run_chain(spark, base, register_matches=False)
    assert ("b", "a") in edges
    assert not any(d == "c" for d, _ in edges), edges

    # flag: C chains to B; chased edges reproduce the batch component
    base = tmp_path / "flag"
    base.mkdir()
    edges = _run_chain(spark, base, register_matches=True)
    assert ("b", "a") in edges
    assert ("c", "b") in edges
    parent = {}
    for d, m in edges:
        parent.setdefault(d, m)
    def root(x):
        while x in parent:
            x = parent[x]
        return x
    assert {root("a"), root("b"), root("c")} == {"a"}

    # ... which is exactly what the batch engine computes transitively
    from recordmanager_spark.operators.text_dedup import (
        minhash_near_duplicates,
        near_dup_prune,
    )

    docs = spark.createDataFrame(
        [("a", CHAIN_A), ("b", CHAIN_B), ("c", CHAIN_C)], SCHEMA
    )
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.5
    )
    pruned = near_dup_prune(docs, pairs, id_col="doc_id")
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in pruned.collect()
    }
    assert len(set(clusters.values())) == 1, clusters
