"""Performance probes beyond bench.py's one-shot pass.

Two modes:

    python tools/perf_probe.py medians [sf_dir] [query ...]
        5-run medians (noop-sink materialization, warm session) for the
        named queries — default: the similarity/dedup family whose
        single-run numbers PERFORMANCE.md flags as high-variance.

    python tools/perf_probe.py soak [sf_dir]
        10x-replicated-corpus throughput soak for the round-4 dedup
        operators (exact_substring_dedup, near_dup_prune at a ~30% dup
        rate, streaming_first_seen), reporting rows/s/core and the peak
        per-stage shuffle write read from the Spark UI REST API.

Methodology notes: timings exclude session startup (a warm-up query and
a pandas-UDF warm-up run first, like bench.py); medians are the right
statistic on this box (±20-70% single-run variance on the similarity
family); the soak replicates the sf corpus 10x with offset ids, which
doubles as a worst-case duplicate-rate test for the substring/streaming
paths (every document arrives 10 times).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402

MEDIAN_DEFAULTS = [
    "minhash_near_dup",
    "simhash_near_dup",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf_full",
    "embedding_neardup",
    "exact_substring_dedup_docs",
    "near_dup_prune_docs",
    "quality_buckets_docs",
]

CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    return get_spark(
        "perf_probe", extra_conf={"spark.ui.enabled": "true"}
    )


def _warm(spark, sf_dir):
    entry_mod.queries()["q1_pricing_summary"](spark, sf_dir).collect()
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import col, pandas_udf

    def _warm_fn(v):
        return v * 1.0

    _warm_fn.__annotations__ = {
        "v": __import__("pandas").Series, "return": __import__("pandas").Series
    }
    spark.range(10000, numPartitions=CORES).select(
        pandas_udf(_warm_fn, "double")(col("id"))
    ).collect()


def _noop_time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _query_time(qs, name, spark, sf_dir) -> float:
    """Construction + noop materialization, like bench.py — queries
    that resolve work at construction time (dedup_er's driver CC, the
    IVF k-means collects) are NOT free to build."""
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _peak_shuffle_mb(spark) -> float | None:
    """Max per-stage shuffle write since session start, via the UI REST
    API (enabled for probes only; engine sessions keep the UI off)."""
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages", timeout=5
            )
        )
        return max(
            (s.get("shuffleWriteBytes", 0) for s in stages), default=0
        ) / 1e6
    except Exception:
        return None


def cmd_medians(sf_dir: str, names: list[str]) -> None:
    spark = _spark()
    _warm(spark, sf_dir)
    qs = entry_mod.queries()
    print(f"# 5-run medians at {sf_dir} (seconds)")
    print(f"{'query':34s} {'median':>7s} {'min':>7s} {'max':>7s}")
    for name in names:
        runs = [_query_time(qs, name, spark, sf_dir) for _ in range(5)]
        print(
            f"{name:34s} {statistics.median(runs):7.2f} "
            f"{min(runs):7.2f} {max(runs):7.2f}"
        )
    spark.stop()


def _docs10(spark, sf_dir):
    """The sf documents table replicated 10x with offset ids — the same
    shape dedup_er's 1067 rec/s/core row was measured on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text",
        )
        .repartition(CORES)
        .localCheckpoint(eager=True)
    )


def cmd_soak(sf_dir: str) -> None:
    spark = _spark()
    _warm(spark, sf_dir)
    corpus = _docs10(spark, sf_dir)
    n = corpus.count()
    print(f"# soak corpus: {n} docs (10x {sf_dir}), {CORES} cores")

    from recordmanager_spark.operators.substring_dedup import (
        exact_substring_dedup,
    )

    secs = _noop_time(exact_substring_dedup(corpus, window=20))
    print(
        f"exact_substring_dedup     {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )

    from recordmanager_spark.operators.packing import perplexity_score_stub
    from recordmanager_spark.operators.text_dedup import near_dup_prune

    scored = corpus.withColumn("q", perplexity_score_stub("doc_id", "soak"))
    # ~30% of docs in near-dup clusters: docs whose base id % 10 < 3 pair
    # with their first replica — transitive chains across replicas
    pairs = corpus.where(
        (F.pmod(F.col("doc_id"), 10_000_000) % 10 < 3)
        & (F.col("doc_id") < 90_000_000)
    ).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 10_000_000).alias("id_b"),
    )
    n_pairs = pairs.count()
    secs = _noop_time(near_dup_prune(scored, pairs, quality_col="q"))
    print(
        f"near_dup_prune            {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"({n_pairs} edges, ~{10 * n_pairs / n:.0f}0% of docs clustered)"
    )

    # streaming first-seen: every content arrives 10x (the replicas share
    # fingerprints), state = distinct contents
    import tempfile
    import uuid

    from recordmanager_spark.streaming.pipeline import streaming_first_seen

    base = tempfile.mkdtemp(prefix="rm_soak_")
    stream_in = corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.pmod("doc_id", F.lit(10_000_000)).cast("string")).alias(
            "fingerprint"
        ),
    )
    stream_in.write.mode("overwrite").json(f"{base}/in")
    t0 = time.time()
    emitted = []
    q = (
        streaming_first_seen(
            spark.readStream.schema("doc_id string, fingerprint string").json(
                f"{base}/in"
            )
        )
        .writeStream.foreachBatch(
            lambda bdf, _e: emitted.append(bdf.count())
        )
        .outputMode("update")
        .queryName("soak_" + uuid.uuid4().hex[:8])
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = time.time() - t0
    print(
        f"streaming_first_seen      {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"({sum(emitted)} distinct contents in state)"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()


def cmd_soak5(sf_dir: str) -> None:
    """10x-corpus throughput soak for the round-5 operators."""
    spark = _spark()
    _warm(spark, sf_dir)
    corpus = _docs10(spark, sf_dir)
    n = corpus.count()
    print(f"# soak corpus: {n} docs (10x {sf_dir}), {CORES} cores")

    from recordmanager_spark.functions.urls import canonical_url_dedup
    from recordmanager_spark.operators import dsir as DS
    from recordmanager_spark.operators import quality_classifier as QC
    from recordmanager_spark.operators.contamination import (
        bloom_contaminated,
        bloom_filter_words,
    )
    from recordmanager_spark.operators.text_dedup import (
        minhash_incremental,
        minhash_signature,
    )

    # URL dedup at a pathological dup rate: every page exists under 50
    # cosmetic variants
    with_url = corpus.withColumn(
        "url",
        F.concat(
            F.lit("https://Site.Example/p/"),
            F.pmod("doc_id", F.lit(n // 50 + 1)).cast("string"),
            F.lit("?b=2&a=1&utm_source=soak"),
        ),
    )
    secs = _noop_time(canonical_url_dedup(with_url))
    print(
        f"canonical_url_dedup       {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"(~50 variants per canonical url)"
    )

    # DSIR scoring pass over the full soak corpus (stats from the sf
    # slice so the probe measures the SCAN, not the stat collects)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tc = DS.ngram_bucket_counts(base.where(F.col("lang") == "en"), n_buckets=1024)
    rc = DS.ngram_bucket_counts(base, n_buckets=1024)
    ratios = DS.dsir_log_ratio_micros(tc, rc, n_buckets=1024)
    secs = _noop_time(
        DS.dsir_score(corpus, ratios, n_buckets=1024).select(
            "doc_id", "log_weight", "score"
        )
    )
    print(
        f"dsir_score (1024 buckets) {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )

    model = QC.train_nb_quality(
        base.where(F.col("lang") == "en"),
        base.where(F.col("lang") != "en"),
        n_buckets=1024,
    )
    secs = _noop_time(
        QC.nb_quality_score(corpus, model).select("doc_id", "nb_prob")
    )
    print(
        f"nb_quality_score          {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )

    # incremental minhash: index = 9 replicas, batch = 1 replica (every
    # batch doc is a 9-way dup of the index — worst-case match density)
    index_docs = corpus.where(F.col("doc_id") >= 10_000_000)
    batch = corpus.where(F.col("doc_id") < 10_000_000)
    index = minhash_signature(index_docs, "doc_id", "text")
    nb = batch.count()
    t0 = time.time()
    annotated, _ = minhash_incremental(batch, index)
    annotated.write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"minhash_incremental       {secs:7.2f}s  "
        f"{nb / secs:9.0f} batch rows/s  {nb / secs / CORES:7.0f} rows/s/core  "
        f"(index {n - nb} docs built inline, 100% dup batch)"
    )

    words = bloom_filter_words(
        base.where(F.pmod("doc_id", F.lit(97)) == 0), "text",
        n=5, m_bits=1 << 17, k=3,
    )
    secs = _noop_time(
        bloom_contaminated(
            corpus, "doc_id", "text", words, m_bits=1 << 17, k=3, n=5
        ).select("doc_id", "n_hits")
    )
    print(
        f"bloom_contaminated (2^17) {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()


def cmd_soak6(sf_dir: str) -> None:
    """Round-6 soaks: the hot-fingerprint boilerplate case for exact
    dedup, and the embedding/ANN family on a replicated corpus including
    one skewed-cell case (every vector near one centroid)."""
    spark = _spark()
    _warm(spark, sf_dir)

    # --- hot-fingerprint exact dedup: 500k copies of ONE text --------
    # The worst-case 100 TB shape: a boilerplate page (cookie banner,
    # parked domain) that appears hundreds of millions of times. The
    # groupBy+join plan collapses the hot key map-side; the old
    # min-over-window shape serialized all 500k rows through one task.
    from recordmanager_spark.operators.text_dedup import (
        distinct_by_text,
        exact_duplicates,
    )

    boiler = spark.range(500_000, numPartitions=CORES).select(
        (F.col("id") + 100_000_000).alias("doc_id"),
        F.lit(
            "This domain is parked free courtesy of the registrar. "
            "Accept cookies to continue to the site you requested."
        ).alias("text"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.unionByName(boiler).localCheckpoint(eager=True)
    n = corpus.count()
    print(f"# hot-key corpus: {n} docs ({sf_dir} + 500k copies of one text)")
    secs = _noop_time(exact_duplicates(corpus, "doc_id", "text"))
    print(
        f"exact_duplicates (hotkey) {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )
    secs = _noop_time(distinct_by_text(corpus, "doc_id", "text"))
    print(
        f"distinct_by_text (hotkey) {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core"
    )
    # the superseded window shape, timed for the record
    from pyspark.sql import Window

    from recordmanager_spark.functions.text import fingerprint

    w = Window.partitionBy("fp")
    old = (
        corpus.select("doc_id", fingerprint("text").alias("fp"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
    )
    secs = _noop_time(old)
    print(
        f"  (old window shape)      {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  — hot key serialized through one task"
    )

    # --- embedding/ANN family on a 50x-replicated corpus -------------
    from recordmanager_spark.operators.similarity import (
        cluster_corpus,
        embedding_near_duplicates,
        knn_ivf,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = 50
    big = (
        emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            # nudge each replica so vectors are near- but not exact dups
            F.transform(
                "embedding",
                lambda x, i: x + (F.col("rep") * (i + 1)) * F.lit(1e-5),
            ).alias("embedding"),
        )
        .repartition(CORES)
        .localCheckpoint(eager=True)
    )
    nv = big.count()
    print(f"# ANN corpus: {nv} vectors ({reps}x {sf_dir} embeddings, nudged)")

    t0 = time.time()
    assignments, stats = cluster_corpus(big, n_cells=64, kmeans_iters=2)
    assignments.write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"cluster_corpus (64c,2it)  {secs:7.2f}s  "
        f"{nv / secs:9.0f} rows/s  {nv / secs / CORES:7.0f} rows/s/core"
    )

    queries = big.where(F.col("vec_id") < 200)
    t0 = time.time()
    knn_ivf(big, queries, k=10, n_cells=64, n_probe=8).write.format(
        "noop"
    ).mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"knn_ivf (200q,64c,8p)     {secs:7.2f}s  "
        f"{nv / secs:9.0f} rows/s  {nv / secs / CORES:7.0f} rows/s/core"
    )

    secs = _noop_time(embedding_near_duplicates(big, threshold=0.999))
    print(
        f"embedding_neardup (lsh)   {secs:7.2f}s  "
        f"{nv / secs:9.0f} rows/s  {nv / secs / CORES:7.0f} rows/s/core"
    )

    # --- skewed-cell case: EVERY vector lands near one centroid ------
    # All replicas of vector 1 plus per-row micro-noise: one k-means cell
    # receives the whole corpus; near-dup banding sees one mega-bucket.
    base = emb.where(F.col("vec_id") == 1).select("embedding").first()[0]
    skew = (
        spark.range(nv, numPartitions=CORES)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.lit([float(x) for x in base]).cast("array<float>"),
                lambda x, i: x
                + (F.pmod(F.col("id") * (i + 7), F.lit(997)).cast("float"))
                * F.lit(1e-6),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    a2, s2 = cluster_corpus(skew, n_cells=64, kmeans_iters=1)
    a2.write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"cluster_corpus (skewed)   {secs:7.2f}s  "
        f"{nv / secs:9.0f} rows/s  — one cell holds the whole corpus "
        f"(assignment is a scan; only the n_cells-row stats shuffle)"
    )
    secs = _noop_time(
        embedding_near_duplicates(skew, threshold=0.999999)
    )
    print(
        f"embedding_neardup (skew)  {secs:7.2f}s  "
        f"{nv / secs:9.0f} rows/s  — all rows share every band bucket"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()


def cmd_soak8(sf_dir: str) -> None:
    """Round-8 soaks: (a) the per-group frequency cap on a fully
    degenerate corpus — ONE domain holding 2M rows, the shape where a
    rank window would serialize everything through a single task; the
    census join-back must stay flat and keep ~cap survivors. (b) hash
    LM training + scoring throughput on a 10x-replicated corpus —
    training state must stay b1+b2-bounded and scoring scan-only."""
    spark = _spark()
    _warm(spark, sf_dir)

    from recordmanager_spark.operators.lm_score import (
        lm_logprob,
        train_hash_lm,
    )
    from recordmanager_spark.operators.packing import cap_per_group

    # --- (a) one mega-domain x 2M rows + 1000 healthy domains ---------
    n_mega, n_healthy = 2_000_000, 50_000
    mega = spark.range(n_mega, numPartitions=CORES).select(
        F.col("id").alias("doc_id"), F.lit("megasite.example").alias("dom")
    )
    healthy = spark.range(n_healthy, numPartitions=CORES).select(
        (F.col("id") + n_mega).alias("doc_id"),
        F.concat(F.lit("site"), F.pmod("id", F.lit(1000)).cast("string"))
        .alias("dom"),
    )
    corpus = mega.unionByName(healthy)
    out = cap_per_group(corpus, ["dom"], cap=100, id_col="doc_id")
    t0 = time.time()
    kept = out.groupBy(F.col("dom") == "megasite.example").count().collect()
    secs = time.time() - t0
    n = n_mega + n_healthy
    by = {r[0]: r["count"] for r in kept}
    print(
        f"cap_per_group (2M one-domain)  {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"mega kept={by.get(True, 0)} (~cap, binomial around 100), "
        f"healthy kept={by.get(False, 0)} (exact: every under-cap row)"
    )

    # --- (b) LM train + score over 10x corpus --------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            "text",
            "lang",
        )
        # the sf parquet is one row group; without this the whole soak
        # scores on a single task (see testdata-single-partition note)
        .repartition(CORES)
        .localCheckpoint(eager=True)
    )
    n = big.count()
    t0 = time.time()
    model = train_hash_lm(big.where(F.col("lang") == "en"), "text")
    t_train = time.time() - t0
    t0 = time.time()
    scored = lm_logprob(big, model, "text", "doc_id")
    n_scored = scored.where(F.col("avg_logprob").isNotNull()).count()
    t_score = time.time() - t0
    print(
        f"lm train (10x corpus)          {t_train:7.2f}s  "
        f"state={len(model['lnc1den_micros'])}+{len(model['lnc2_micros'])} "
        f"buckets regardless of corpus size"
    )
    print(
        f"lm score (10x corpus)          {t_score:7.2f}s  "
        f"{n / t_score:9.0f} rows/s  {n / t_score / CORES:7.0f} rows/s/core  "
        f"scored={n_scored} (scan-only, zero exchanges)"
    )


def cmd_soak9(sf_dir: str) -> None:
    """Round-9 soaks: (a) BM25 with a fully degenerate HOT TERM — a
    token present in EVERY document, so one query term matches the
    whole corpus: the (query, doc) aggregation and the two-stage top-k
    must stay bounded (a single-window top-k would pull every matching
    doc through one task). (b) scan throughput of the hygiene chain
    (HTML strip + mojibake repair) and (c) the WARC byte-walk parse,
    both pure scan-stage."""
    spark = _spark()
    _warm(spark, sf_dir)

    from recordmanager_spark.functions.html import html_to_text
    from recordmanager_spark.functions.text import fix_mojibake
    from recordmanager_spark.operators.retrieval import bm25_topk
    from recordmanager_spark.sources.warc import warc_records

    big = _docs10(spark, sf_dir)
    n = big.count()

    # --- (a) hot-term BM25: "soakterm" in all n docs -------------------
    hot = big.select(
        "doc_id",
        F.concat(F.lit("soakterm "), "text").alias("text"),
    )
    queries = spark.createDataFrame(
        [(0, "soakterm"), (1, "soakterm quick data lorem")],
        "query_id long, query_text string",
    )
    t0 = time.time()
    rows = bm25_topk(
        hot, queries, k=10, query_id_col="query_id",
        query_text_col="query_text",
    ).collect()
    secs = time.time() - t0
    per_q = {}
    for r in rows:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q[0] == 10 and per_q[1] == 10, per_q
    print(
        f"bm25 hot-term ({n} docs, term in 100%)  {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"top-k exact at k=10 per query (two-stage bound held)"
    )

    # --- (b) hygiene chain: HTML strip + mojibake repair ---------------
    marked = big.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><nav><a href='/'>Home</a></nav><p>Caf"),
            F.lit("\u00c3\u00a9 "),  # corrupted e-acute
            F.col("text"),
            F.lit("</p><script>x()</script></body></html>"),
        ).alias("html"),
    )
    t0 = time.time()
    out = marked.select(
        F.sum(F.length(fix_mojibake(html_to_text("html")))).alias("chars")
    ).collect()[0]["chars"]
    secs = time.time() - t0
    print(
        f"hygiene chain (strip+repair)   {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"({out / 1e6:.0f}M visible chars, zero exchanges)"
    )

    # --- (c) WARC render + byte-walk parse ------------------------------
    body = F.concat(F.lit("<p>"), F.substring("text", 1, 200), F.lit("</p>"))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: u"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )
    segs = (
        big.select(
            F.pmod(F.col("doc_id"), F.lit(CORES * 4)).cast("string").alias(
                "path"
            ),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("path")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["rec"]
                ),
                "",
            ).alias("value")
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    parsed = warc_records(segs).count()
    secs = time.time() - t0
    assert parsed == n, (parsed, n)
    print(
        f"warc byte-walk parse           {secs:7.2f}s  "
        f"{n / secs:9.0f} rec/s  {n / secs / CORES:7.0f} rec/s/core  "
        f"({CORES * 4} segments, all records recovered)"
    )


def cmd_soak10(sf_dir: str) -> None:
    """Round-10 soaks over the 10x corpus (~50k docs at sf0.1):
    (a) curate-from-WARC end-to-end — REAL segment files on disk
    through load_corpus_source -> landing-zone staging -> the
    [corpus:] pipeline (strip_html, derived language-ID gate, exact
    dedup, token gate); (b) whole-document FFD bin packing at the
    docstring design point (budget 2048, 64 shards) with the packing
    efficiency it exists to deliver; (c) the streaming minhash/LSH
    near-dup state machine draining one availableNow pass."""
    import shutil
    import tempfile

    spark = _spark()
    _warm(spark, sf_dir)

    from recordmanager_spark.corpus_config import (
        apply_corpus_pipeline,
        load_corpus_source,
        parse_corpus_ini,
    )

    big = _docs10(spark, sf_dir)
    n = big.count()

    # --- (a) curate from WARC segment FILES -----------------------------
    n_segs = CORES * 4
    http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    body = F.concat(F.lit("<p>"), F.substring("text", 1, 200), F.lit("</p>"))
    block = F.concat(F.lit(http), body)
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
              "https://soak.example/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Type: application/http; msgtype=response"
              "\r\nContent-Length: "),
        F.octet_length(block).cast("string"),
        F.lit("\r\n\r\n"),
        block,
        F.lit("\r\n\r\n"),
    )
    segs = (
        big.select(
            F.pmod(F.col("doc_id"), F.lit(n_segs)).alias("path"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("path")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["rec"]
                ),
                "",
            ).alias("value")
        )
        .collect()
    )
    seg_dir = tempfile.mkdtemp(prefix="rm_soak10_segs_")
    stage_dir = tempfile.mkdtemp(prefix="rm_soak10_stage_")
    for r in segs:
        with open(f"{seg_dir}/seg{r['path']}.warc", "w") as fh:
            fh.write(r["value"])
    cfg = parse_corpus_ini(
        f"[corpus:soak]\nsource = warc:{seg_dir}\nstrip_html = true\n"
        "languages[] = en\ndedup = exact\nmin_tokens = 3\n"
    )["soak"]
    t0 = time.time()
    docs = load_corpus_source(spark, cfg.source)
    docs.write.mode("overwrite").parquet(stage_dir)  # the landing-zone hop
    kept = apply_corpus_pipeline(
        spark.read.parquet(stage_dir), cfg
    ).count()
    secs = time.time() - t0
    print(
        f"curate from WARC files         {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"({n_segs} segments -> parse+stage+strip+langID+dedup+gate "
        f"-> {kept} kept)"
    )
    shutil.rmtree(seg_dir, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)

    # --- (b) FFD bin packing at the design point ------------------------
    from recordmanager_spark.functions.text import token_count
    from recordmanager_spark.operators.packing import pack_bins_ffd

    d = big.select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    t0 = time.time()
    bins = pack_bins_ffd(
        d, id_col="doc_id", tokens_col="n_tokens",
        budget=2048, num_shards=64,
    )
    eff = (
        bins.select("bin_id", "bin_fill")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.avg(F.lit(2048) - F.col("bin_fill")).alias("slack"),
        )
        .collect()[0]
    )
    secs = time.time() - t0
    print(
        f"FFD packing (2048, 64 shards)  {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"({eff['nb']} bins, efficiency "
        f"{1 - eff['slack'] / 2048:.3f})"
    )

    # --- (c) streaming near-dup drain -----------------------------------
    from recordmanager_spark.streaming.pipeline import (
        streaming_minhash_neardup,
    )

    base = tempfile.mkdtemp(prefix="rm_soak10_stream_")
    big.select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    ).write.mode("overwrite").json(f"{base}/in")
    stream = spark.readStream.schema("doc_id string, text string").json(
        f"{base}/in"
    )
    out = streaming_minhash_neardup(stream, threshold=0.5)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    secs = time.time() - t0
    print(
        f"streaming near-dup drain       {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"(one availableNow pass, signatures + keyed bucket state)"
    )
    shutil.rmtree(base, ignore_errors=True)


def cmd_soak7(sf_dir: str) -> None:
    """Round-7 soaks: the DEGENERATE-bucket cases for the bounded-state
    bucket pairing (operators/bucket_pairs.py) — one boilerplate text /
    fingerprint / blocking key repeated hundreds of thousands of times,
    the shape where the former collect+slice cap both concentrated the
    whole bucket in one aggregation buffer AND silently dropped
    beyond-cap members. The hub path must stay linear (<= n*cap pairs)
    and report every member."""
    spark = _spark()
    _warm(spark, sf_dir)

    from recordmanager_spark.operators.text_dedup import (
        hamming_near_duplicates,
        minhash_near_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # --- minhash: 200k near-identical boilerplate docs ----------------
    # every copy shares every band bucket; cap=200 -> hub pairs
    boiler = spark.range(50_000, numPartitions=CORES).select(
        (F.col("id") + 100_000_000).alias("doc_id"),
        F.concat(
            F.lit(
                "this domain is parked free of charge accept cookies to "
                "continue to the requested site contact the registrar "
            ),
            # tiny unique tail so jaccard stays high but texts differ
            F.col("id").cast("string"),
        ).alias("text"),
    )
    corpus = docs.unionByName(boiler).localCheckpoint(eager=True)
    n = corpus.count()
    print(f"# minhash corpus: {n} docs ({sf_dir} + 50k boilerplate copies)", flush=True)
    out = minhash_near_duplicates(corpus, "doc_id", "text", threshold=0.2)
    t0 = time.time()
    covered = out.select(
        F.countDistinct("id_a") + F.countDistinct("id_b")
    ).first()
    pairs_n = out.count()
    secs = time.time() - t0
    print(
        f"minhash_near_dup (mega-bucket) {secs:7.2f}s  "
        f"{n / secs:9.0f} rows/s  {n / secs / CORES:7.0f} rows/s/core  "
        f"pairs={pairs_n} (<= n*hub_cap, linear; old shape dropped all "
        f"but 200 members per bucket)"
    )

    # --- hamming: 300k identical fingerprints -------------------------
    sigs = spark.range(300_000, numPartitions=CORES).select(
        F.col("id"),
        F.lit(0x0F0F0F0F0F0F0F0F).cast("long").alias("hash"),
    )
    out = hamming_near_duplicates(sigs, total_bits=64, max_hamming=2,
                                  bucket_cap=2000)
    t0 = time.time()
    pairs_n = out.count()
    secs = time.time() - t0
    nn = 300_000
    print(
        f"hamming_neardup (mega-bucket)  {secs:7.2f}s  "
        f"{nn / secs:9.0f} rows/s  {nn / secs / CORES:7.0f} rows/s/core  "
        f"pairs={pairs_n} (every member reported through <= 64 hub reps)"
    )

    # --- blocking: one poison title key over 400k records -------------
    # "annual report"-style garbage key shared by every record; the
    # bounded-state cap keeps the candidate list at <= 101 salted-min
    # reps with O(1) agg state (the old slice-after-collect shipped all
    # 400k verify payload structs into ONE final-agg buffer)
    from recordmanager_spark.operators.dedup import deduplicate

    nrec = 400_000
    recs = spark.range(nrec, numPartitions=CORES).select(
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias(
            "source_id"
        ),
        F.array(F.lit("annual report")).alias("title_keys"),
        F.array().cast("array<string>").alias("isbn_keys"),
        F.lit("book").alias("format"),
        F.lit(None).cast("string").alias("access_restrictions"),
        F.array().cast("array<string>").alias("isbn"),
        F.array().cast("array<string>").alias("unique_ids"),
        F.array().cast("array<string>").alias("issn"),
        F.lit(None).cast("int").alias("publish_year"),
        F.lit(None).cast("int").alias("page_count"),
        F.lit(None).cast("string").alias("series_issn"),
        F.lit(None).cast("string").alias("series_numbering"),
        F.lit("annual report").alias("title"),
        F.lit("").alias("author"),
    ).localCheckpoint(eager=True)
    t0 = time.time()
    res = deduplicate(recs, key_cols=["title_keys", "isbn_keys"])
    res.write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"deduplicate (poison key)       {secs:7.2f}s  "
        f"{nrec / secs:9.0f} rows/s  {nrec / secs / CORES:7.0f} rows/s/core"
        f"  (candidates bounded to 101 salted-min reps)"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()



def cmd_soak11(sf_dir: str) -> None:
    """Round-11 soak: the distributed connected-components path past
    the adaptive-CC driver threshold — the tier a 100 TB dedup run
    actually lands on (2M driver-side edges is ~1-2 GB of heap; beyond
    that connected_components routes to min-label propagation with
    pointer jumping, operators/dedup.py:_cc_distributed). Two shapes:

    (a) realistic dedup graph: 2.8M verified edges over 3.2M nodes in
        groups of 8 (path-shaped within each group — the hardest
        8-node layout for propagation) through the PUBLIC
        connected_components API with the default 2M threshold, so the
        adaptive branch itself decides to go distributed. Correctness
        is asserted exactly (every node's component == its group min),
        not sampled.
    (b) diameter stress: one 65,536-node chain — pointer jumping must
        converge in ~log2(L) rounds, far under max_iterations=20.
    """
    spark = _spark()
    _warm(spark, sf_dir)
    from recordmanager_spark.operators.dedup import connected_components

    # --- (a) 2.8M-edge dedup-shaped graph ------------------------------
    n_nodes = 3_200_000
    g = 8
    edges = (
        spark.range(n_nodes)
        .where(F.pmod("id", F.lit(g)) != g - 1)
        .select(
            F.format_string("r%09d", "id").alias("id_a"),
            F.format_string("r%09d", F.col("id") + 1).alias("id_b"),
        )
    )
    n_edges = edges.count()
    report: dict = {}
    t0 = time.time()
    comp = connected_components(edges, report=report)
    # exact correctness check doubles as the materialization: every
    # node's component must equal its group-min id
    expected = F.format_string(
        "r%09d",
        (F.substring("id", 2, 9).cast("long") / g).cast("long") * g,
    )
    bad = comp.where(F.col("component") != expected).count()
    n_ids = comp.count()
    secs = time.time() - t0
    assert report.get("path") == "distributed", report
    assert bad == 0, f"{bad} wrong component labels"
    assert n_ids == n_nodes
    print(
        f"distributed CC (groups of {g})   {secs:7.2f}s  "
        f"{n_edges} edges  {n_edges / secs:9.0f} edges/s  "
        f"{n_edges / secs / CORES:7.0f} edges/s/core  "
        f"iterations={report.get('iterations')}"
    )

    # --- (b) one long chain: pointer-jumping depth ----------------------
    chain_n = 65_536
    chain = spark.range(chain_n - 1).select(
        F.format_string("c%09d", "id").alias("id_a"),
        F.format_string("c%09d", F.col("id") + 1).alias("id_b"),
    )
    report2: dict = {}
    t0 = time.time()
    comp2 = connected_components(
        chain, driver_threshold=0, report=report2
    )
    n_comp = comp2.select("component").distinct().count()
    secs2 = time.time() - t0
    assert report2.get("path") == "distributed"
    assert n_comp == 1, n_comp
    print(
        f"distributed CC (1x{chain_n} chain) {secs2:7.2f}s  "
        f"iterations={report2.get('iterations')} "
        f"(log2(L)={chain_n.bit_length() - 1}, max=20)"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()


def cmd_soak12(sf_dir: str) -> None:
    """Round-12 soak: the fingerprint-DENSITY cost curve — why winnowing
    at contract-pinned k=5/w=4 is ~10-30x the cost of minhash on the
    same corpus even though both run the identical bounded-state banded
    pair-join shape. Winnowing emits ~2/(w+1) fingerprints per
    CHARACTER (one per window, pre-dedup), so postings volume scales
    with corpus BYTES; minhash emits a fixed n_hashes/bands per
    DOCUMENT. Measured at 10x documents, plus winnowing at a
    production-grade k=8/w=50 (guarantee threshold t=w+k-1=57 chars)
    to show the knob that collapses the gap.
    """
    spark = _spark()
    _warm(spark, sf_dir)
    from recordmanager_spark.operators.text_dedup import (
        minhash_near_duplicates,
        winnow_fingerprints,
        winnow_near_duplicates,
    )

    docs = _docs10(spark, sf_dir)
    n_docs = docs.count()
    n_chars = docs.select(F.sum(F.length("text"))).first()[0]
    print(f"corpus: {n_docs} docs, {n_chars / 1e6:.1f}M chars")

    configs = [
        ("winnow k=5 w=4 (contract)", dict(k=5, w=4)),
        ("winnow k=8 w=50 (production)", dict(k=8, w=50)),
    ]
    for label, kw in configs:
        posts = (
            winnow_fingerprints(docs, "doc_id", "text", **kw)
            .select(F.sum(F.size("fp")).alias("n"))
            .first()["n"]
        )
        t0 = time.time()
        winnow_near_duplicates(
            docs, "doc_id", "text", min_shared=2, bucket_cap=1000, **kw
        ).write.format("noop").mode("overwrite").save()
        secs = time.time() - t0
        print(
            f"{label:32s} {secs:7.2f}s  {posts / 1e6:6.2f}M postings "
            f"({posts / n_chars:.3f}/char)  "
            f"{n_docs / secs:6.0f} docs/s  "
            f"{n_docs / secs / CORES:6.1f} docs/s/core"
        )
    t0 = time.time()
    minhash_near_duplicates(
        docs, "doc_id", "text"
    ).write.format("noop").mode("overwrite").save()
    secs = time.time() - t0
    print(
        f"{'minhash (defaults)':32s} {secs:7.2f}s  "
        f"(fixed bands/doc postings)        "
        f"{n_docs / secs:6.0f} docs/s  "
        f"{n_docs / secs / CORES:6.1f} docs/s/core"
    )
    peak = _peak_shuffle_mb(spark)
    if peak is not None:
        print(f"peak per-stage shuffle write: {peak:.0f} MB")
    spark.stop()


def _stage_shuffles(spark) -> dict[int, int]:
    """stageId -> shuffleWriteBytes via the UI REST API (probe sessions
    enable the UI; engine sessions keep it off)."""
    try:
        base = spark.sparkContext.uiWebUrl
        if not base:
            return {}
        apps = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages", timeout=5
            )
        )
        return {
            s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages
        }
    except Exception:
        return {}


def cmd_soak13(sf_dir: str) -> None:
    """Round-13 heavy-tier scale soaks (opt-r13 item 5): the heaviest
    bench operators at 10x the sf documents, recording wall,
    rows/s/core, and the NEW stages' shuffle write per case — the sf0.1
    driver bench is construction/driver-bound for this tier (c8/c32
    ratios ~1 at r12), so data-path decisions need a scale point.

    The 10x replicas are exact text copies with offset ids: every
    fingerprint/band posting reaches ~10x density, so the capped-bucket
    skew guards bind corpus-wide — deliberately the adversarial-density
    regime for the pair generators."""
    spark = _spark()
    _warm(spark, sf_dir)
    from recordmanager_spark.operators import text_dedup as TD

    big = _docs10(spark, sf_dir)
    n = big.count()
    print(f"# soak13 corpus: {n} docs (10x {sf_dir}), {CORES} cores")

    def case(label: str, df, extra: str = "") -> None:
        seen = set(_stage_shuffles(spark))
        spark.sparkContext.setJobDescription(f"soak13 {label}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        secs = time.time() - t0
        sh = _stage_shuffles(spark)
        new = [v for k, v in sh.items() if k not in seen]
        print(
            f"{label:34s} {secs:7.2f}s  {n / secs:8.0f} rows/s  "
            f"{n / secs / CORES:6.0f} rows/s/core  "
            f"shuffle new-stages: total {sum(new) / 1e6:8.1f} MB, "
            f"max {max(new, default=0) / 1e6:7.1f} MB{extra}",
            flush=True,
        )

    case(
        "winnow k=5/w=4 min_shared=30",
        TD.winnow_near_duplicates(
            big, "doc_id", "text", min_shared=30, bucket_cap=1000
        ),
    )
    case(
        "minhash threshold=0.2",
        TD.minhash_near_duplicates(big, "doc_id", "text", threshold=0.2),
    )
    case(
        "simhash max_hamming=3",
        TD.simhash_near_duplicates(big, "doc_id", "text", max_hamming=3),
    )

    # renormalize at 10x the sf record count (same synthetic MARC shape
    # as the bench query, keys from range — throughput soak, not oracle)
    from recordmanager_spark.config import parse_datasources_ini
    from recordmanager_spark.operators.renormalize import renormalize_records

    ini = "[ka]\nformat = marc\ndedup = true\n" \
          "suppressOnField[format] = \"hidden|secret\"\n\n[kb]\nformat = marc\n"
    sources = parse_datasources_ini(ini)
    n_orders = 10 * 150_000
    r = spark.range(0, n_orders * 4, 4, numPartitions=CORES)
    k = F.col("id")
    host_part = F.when(
        k % 7 == 0,
        F.format_string(
            ',{"773":{"ind1":"0","ind2":" ","subfields":[{"w":"h%s"}]}}',
            (k / 7).cast("long").cast("string"),
        ),
    ).otherwise(F.lit(""))
    data = F.format_string(
        '{"leader":"L","fields":[{"001":"r%s"},'
        '{"100":{"ind1":"1","ind2":" ","subfields":[{"a":"Auth%s, First"}]}},'
        '{"245":{"ind1":"1","ind2":"0","subfields":[{"a":"Title%s"}]}},'
        '{"977":{"ind1":" ","ind2":" ","subfields":[{"a":"%s"}]}}%s]}',
        k.cast("string"),
        (k % 20).cast("string"),
        (k % 50).cast("string"),
        F.when(k % 11 == 0, F.lit("hidden")).otherwise(F.lit("book")),
        host_part,
    )
    records = r.select(
        F.concat(F.lit("s"), k.cast("string")).alias("_id"),
        F.when(k % 2 == 0, F.lit("ka")).otherwise(F.lit("kb")).alias(
            "source_id"
        ),
        F.lit("marc").alias("format"),
        data.alias("original_data"),
        F.lit(False).alias("deleted"),
        F.when(
            k % 5 == 0,
            F.array(
                F.concat(
                    F.lit("title"), (k % 50).cast("string"),
                    F.lit("auth"), (k % 20).cast("string"),
                )
            ),
        ).alias("title_keys"),
        F.when(k % 3 == 0, F.concat(F.lit("g"), k.cast("string"))).alias(
            "dedup_id"
        ),
    )
    seen = set(_stage_shuffles(spark))
    spark.sparkContext.setJobDescription("soak13 renormalize")
    t0 = time.time()
    renormalize_records(records, sources).write.format("noop").mode(
        "overwrite"
    ).save()
    secs = time.time() - t0
    sh = _stage_shuffles(spark)
    new = [v for kk, v in sh.items() if kk not in seen]
    print(
        f"{'renormalize (10x records)':34s} {secs:7.2f}s  "
        f"{n_orders / secs:8.0f} rows/s  "
        f"{n_orders / secs / CORES:6.0f} rows/s/core  "
        f"shuffle new-stages: total {sum(new) / 1e6:8.1f} MB, "
        f"max {max(new, default=0) / 1e6:7.1f} MB",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "medians"
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and "/" in rest[0] else "/root/testdata/sf0.1"
    names = [a for a in rest if "/" not in a]
    if mode == "medians":
        cmd_medians(sf_dir, names or MEDIAN_DEFAULTS)
    elif mode == "soak":
        cmd_soak(sf_dir)
    elif mode == "soak5":
        cmd_soak5(sf_dir)
    elif mode == "soak6":
        cmd_soak6(sf_dir)
    elif mode == "soak7":
        cmd_soak7(sf_dir)
    elif mode == "soak8":
        cmd_soak8(sf_dir)
    elif mode == "soak9":
        cmd_soak9(sf_dir)
    elif mode == "soak10":
        cmd_soak10(sf_dir)
    elif mode == "soak11":
        cmd_soak11(sf_dir)
    elif mode == "soak12":
        cmd_soak12(sf_dir)
    elif mode == "soak13":
        cmd_soak13(sf_dir)
    else:
        raise SystemExit(
            f"unknown mode {mode!r} (medians|soak|soak5|soak6|soak7|soak8)"
        )
