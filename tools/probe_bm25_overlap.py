"""A/B probe: bm25 inline prune mechanism (r13, VERDICT item 4).

The r12 prune-before-aggregation shape joins the exploded token stream
against broadcast(q_vocab), which makes the corpus-scan STAGE depend on
the vocabulary broadcast build — the scan sits idle while the tiny
vocab job runs (+0.77 s median at sf0.1 vs the pre-r12 shape whose
corpus map stage had no broadcast dependency and overlapped it).

V0 = HEAD shape (broadcast vocab joins the token stream).
V1 = isin-literal prune: the vocabulary is collected at CONSTRUCTION
     (queries are tiny by the operator's contract — the same eager-
     action trade as the adaptive-CC sizing take) and the token stream
     is pruned by a literal IN-set predicate inside the scan stage, so
     execution has no broadcast barrier at all. Semantically identical:
     inner join on a distinct key == semi-join == IN-set membership.

Fresh construction per run, noop sink, interleaved, medians.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from recordmanager_spark.session import get_spark  # noqa: E402
from recordmanager_spark.operators import retrieval as RET  # noqa: E402
from recordmanager_spark.functions.text import (  # noqa: E402
    normalize_for_fingerprint,
    tokenize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K1, B = 1.2, 0.75


def bm25_isin(corpus, queries, k=5, n_partial=32):
    q_toks = queries.select(
        F.col("query_id"),
        F.explode(tokenize(normalize_for_fingerprint("query_text"))).alias(
            "term"
        ),
    )
    qtf = q_toks.groupBy("query_id", "term").agg(
        F.count(F.lit(1)).alias("qtf")
    )
    # construction-time collect of the tiny vocabulary (contract: the
    # query set broadcasts, so it collects too)
    vocab = sorted(
        r["term"] for r in qtf.select("term").distinct().collect()
    )
    base = corpus.select(
        F.col("doc_id"),
        tokenize(normalize_for_fingerprint("text")).alias("__toks"),
    )
    toks = base.select(
        "doc_id", F.size("__toks").alias("dl"), F.explode("__toks").alias("term")
    )
    hits = (
        toks.where(F.col("term").isin(vocab))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = RET.build_corpus_stats(corpus, "text")
    scored_terms = (
        hits.join(dfreq, "term")
        .join(F.broadcast(qtf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("__N") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(K1)
                    * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__contrib"),
        )
    )
    agg = scored_terms.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__contrib"), 6).alias("score")
    )
    part = agg.groupBy(
        "query_id",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_partial)).alias("__salt"),
    ).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("score")).alias("ns"),
                        F.col("doc_id").alias("doc_id"),
                        F.col("score").alias("score"),
                    )
                )
            ),
            1,
            k,
        ).alias("__top")
    )
    cand = part.select("query_id", F.explode("__top").alias("c")).select(
        "query_id",
        F.col("c.doc_id").alias("doc_id"),
        F.col("c.score").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def main() -> None:
    spark = get_spark("probe_bm25_overlap")
    sc = spark.sparkContext

    def build(variant: str):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        queries_df = docs.where(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 80).alias("query_text"),
        )
        if variant == "V0":
            return RET.bm25_topk(docs, queries_df, k=5)
        return bm25_isin(docs, queries_df, k=5)

    base = {tuple(r) for r in build("V0").collect()}
    got = {tuple(r) for r in build("V1").collect()}
    assert got == base, f"V1 changed results: {len(got)} vs {len(base)}"
    print(f"parity ok: {len(base)} rows identical", flush=True)

    for v in ("V0", "V1"):
        sc.setJobDescription(f"warm {v}")
        build(v).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {"V0": [], "V1": []}
    for rnd in range(7):
        for v in ("V0", "V1"):
            sc.setJobDescription(f"round {rnd} {v}")
            t0 = time.time()
            build(v).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[v].append(dt)
            print(f"round {rnd} {v}: {dt:6.2f}s", flush=True)
    print("\nmedians (7 interleaved rounds, build+exec):")
    for v in ("V0", "V1"):
        r = times[v]
        print(
            f"  {v}: median {statistics.median(r):6.2f} "
            f"min {min(r):6.2f} max {max(r):6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
