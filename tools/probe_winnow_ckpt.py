"""A/B probe: winnow_neardup_pairs materialization variants (opt r12).

V0 = current zero-materialization shape (library function as-is).
V1 = localCheckpoint(eager=False) on `capped` only (truncates the chain
     once per pair-join SIDE -> chain runs once instead of twice).
V2 = localCheckpoint on `posts` AND `capped` (chain's internal 4-scan
     fan-out also collapses to one).

Fresh construction per run (mirrors bench.py build+exec), noop sink,
interleaved V0,V1,V2 x 5 rounds, medians reported.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from recordmanager_spark.session import get_spark  # noqa: E402
from recordmanager_spark.operators import text_dedup as TD  # noqa: E402
from recordmanager_spark.operators.bucket_pairs import salt_slot  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.rdd.getNumPartitions()
    return docs


def _spread_docs(spark):
    # mirror entry's _t(..., spread=True): repartition the scan so the
    # hash chain spreads across cores (entry does this for winnow).
    import __spark_entry__ as entry_mod

    return entry_mod._t(spark, SF_DIR, "documents", spread=True)


def _winnow_variant(df, ckpt_posts: bool, ckpt_capped: bool):
    k, w, min_shared, bucket_cap = 5, 4, 30, 1000
    fp = TD.winnow_fingerprints(df, "doc_id", "text", k, w)
    posts = fp.select("id", F.explode_outer("fp").alias("h"))
    if ckpt_posts:
        posts = posts.localCheckpoint(eager=False)
    sizes = posts.groupBy("h").agg(F.count(F.lit(1)).alias("__n"))
    big_keys = sizes.where(F.col("__n") > bucket_cap).select("h")
    small = posts.join(big_keys, "h", "left_anti")
    reps = (
        posts.join(big_keys, "h", "left_semi")
        .groupBy("h", salt_slot("id", bucket_cap).alias("__slot"))
        .agg(F.min("id").alias("id"))
        .select("h", "id")
    )
    capped = small.unionByName(reps)
    if ckpt_capped:
        capped = capped.localCheckpoint(eager=False)
    a = capped.select(F.col("h"), F.col("id").alias("id_a"))
    b = capped.select(F.col("h"), F.col("id").alias("id_b"))
    return (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def main() -> None:
    spark = get_spark("probe_winnow_ckpt")
    sc = spark.sparkContext

    def build(variant: str):
        df = _spread_docs(spark)
        if variant == "V0":
            return TD.winnow_near_duplicates(
                df, "doc_id", "text", min_shared=30, bucket_cap=1000
            )
        if variant == "V1":
            return _winnow_variant(df, ckpt_posts=False, ckpt_capped=True)
        return _winnow_variant(df, ckpt_posts=True, ckpt_capped=True)

    # warm: one throwaway run of each shape so codegen/scan caches are
    # equally warm before the timed rounds
    for v in ("V0", "V1", "V2"):
        sc.setJobDescription(f"warm {v}")
        build(v).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {"V0": [], "V1": [], "V2": []}
    for rnd in range(5):
        for v in ("V0", "V1", "V2"):
            sc.setJobDescription(f"round {rnd} {v}")
            t0 = time.time()
            q = build(v)
            q.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[v].append(dt)
            print(f"round {rnd} {v}: {dt:6.2f}s", flush=True)
    print("\nmedians (5 interleaved rounds, build+exec):")
    for v in ("V0", "V1", "V2"):
        r = times[v]
        print(
            f"  {v}: median {statistics.median(r):6.2f} "
            f"min {min(r):6.2f} max {max(r):6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
