"""A/B probe: bm25 inline-build shapes (opt r12).

B0 = current shape: token stream joins broadcast(q_vocab) BEFORE the
     (term, doc) aggregation (prune-before-shuffle).
B1 = pre-round shape: full build_postings aggregation, THEN the
     broadcast vocabulary join (whole inverted index shuffles).

Fresh construction per run, noop sink, interleaved, medians.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recordmanager_spark.session import get_spark  # noqa: E402
from recordmanager_spark.operators import retrieval as RET  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("probe_bm25_shapes")
    sc = spark.sparkContext

    def build(variant: str):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        queries_df = docs.where(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 80).alias("query_text"),
        )
        if variant == "B0":
            return RET.bm25_topk(docs, queries_df, k=5)
        # B1: pre-round shape — pass the full postings build explicitly,
        # which routes through the postings-then-join branch.
        postings = RET.build_postings(docs)
        return RET.bm25_topk(docs, queries_df, k=5, postings=postings)

    for v in ("B0", "B1"):
        sc.setJobDescription(f"warm {v}")
        build(v).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {"B0": [], "B1": []}
    for rnd in range(5):
        for v in ("B0", "B1"):
            sc.setJobDescription(f"round {rnd} {v}")
            t0 = time.time()
            build(v).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[v].append(dt)
            print(f"round {rnd} {v}: {dt:6.2f}s", flush=True)
    print("\nmedians (5 interleaved rounds, build+exec):")
    for v in ("B0", "B1"):
        r = times[v]
        print(
            f"  {v}: median {statistics.median(r):6.2f} "
            f"min {min(r):6.2f} max {max(r):6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
