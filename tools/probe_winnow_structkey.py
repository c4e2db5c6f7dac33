"""A/B probe: winnow pair-join key width (r13, VERDICT item 3).

The pair join/groupBy is comparator-bound on a 32-char md5-hex UTF8
key; the r12 BinaryType experiment (unhex) was SLOWER (19.1 vs 12.0 s)
because BinaryType's equality/hash paths beat UTF8String's optimized
comparators in reverse. Untested so far: decoding the hex into native
LONGS, whose comparators/hashing are the cheapest Spark has.

V0 = current hex-string key (library function as-is).
V1 = struct<h1 bigint, h2 bigint> key — 4x conv(8-hex) + shift/or,
     injective from the 128-bit digest, so equality (and therefore the
     pair set and shared counts) is exactly preserved.
V2 = same decode, but as TWO top-level join/groupBy columns instead of
     a struct wrapper (codegen compares primitives without the struct
     indirection).

Fresh construction per run (mirrors bench build+exec), noop sink,
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

K, W, MIN_SHARED, BUCKET_CAP = 5, 4, 30, 1000

# 32-char md5 hex -> two bigints (8 hex chars fit unsigned in a bigint,
# shiftleft|or reassembles exactly; injective, order irrelevant here —
# only equality feeds the join/groupBy)
_H1 = (
    "(shiftleft(cast(conv(substring(h, 1, 8), 16, 10) as bigint), 32)"
    " | cast(conv(substring(h, 9, 8), 16, 10) as bigint))"
)
_H2 = (
    "(shiftleft(cast(conv(substring(h, 17, 8), 16, 10) as bigint), 32)"
    " | cast(conv(substring(h, 25, 8), 16, 10) as bigint))"
)


def _winnow_longkey(df, as_struct: bool):
    fp = TD.winnow_fingerprints(df, "doc_id", "text", K, W)
    raw = fp.select("id", F.explode_outer("fp").alias("h"))
    if as_struct:
        posts = raw.select(
            "id",
            F.expr(f"named_struct('h1', {_H1}, 'h2', {_H2})").alias("h"),
        )
        key = ["h"]
    else:
        posts = raw.select(
            "id", F.expr(_H1).alias("h1"), F.expr(_H2).alias("h2")
        )
        key = ["h1", "h2"]
    sizes = posts.groupBy(*key).agg(F.count(F.lit(1)).alias("__n"))
    big_keys = sizes.where(F.col("__n") > BUCKET_CAP).select(*key)
    small = posts.join(big_keys, key, "left_anti")
    reps = (
        posts.join(big_keys, key, "left_semi")
        .groupBy(*key, salt_slot("id", BUCKET_CAP).alias("__slot"))
        .agg(F.min("id").alias("id"))
        .select(*key, "id")
    )
    capped = small.unionByName(reps)
    a = capped.select(*key, F.col("id").alias("id_a"))
    b = capped.select(*key, F.col("id").alias("id_b"))
    return (
        a.join(b, key)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= MIN_SHARED)
    )


def main() -> None:
    spark = get_spark("probe_winnow_structkey")
    sc = spark.sparkContext
    import __spark_entry__ as entry_mod

    def docs():
        return entry_mod._t(spark, SF_DIR, "documents", spread=True)

    def build(variant: str):
        if variant == "V0":
            return TD.winnow_near_duplicates(
                docs(), "doc_id", "text",
                min_shared=MIN_SHARED, bucket_cap=BUCKET_CAP,
            )
        return _winnow_longkey(docs(), as_struct=(variant == "V1"))

    # parity gate first: identical (id_a, id_b, shared) multiset
    base = {tuple(r) for r in build("V0").collect()}
    for v in ("V1", "V2"):
        got = {tuple(r) for r in build(v).collect()}
        assert got == base, f"{v} changed results: {len(got)} vs {len(base)}"
    print(f"parity ok: {len(base)} pairs identical across variants", flush=True)

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
