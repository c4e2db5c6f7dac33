"""Construction census: time to BUILD each registered query's plan.

Execution cost is bench.py's job; THIS measures driver-side latency to
go from ``queries()[name](spark, sf_dir)`` to a DataFrame — py4j
round trips, SQL-text compilation, analyzer time, and any
construction-time actions (the dedup family's driver-side CC, the IVF
k-means collects). A query that takes seconds to BUILD is a
per-submission tax on every job that uses it, invisible in executor
metrics.

Method: one warm session (q1 + a pandas-UDF round trip + ONE nested-
higher-order-function analysis, which C2-compiles the analyzer/lambda-
resolution paths — the first big HOF analysis in a fresh JVM pays ~4 s
of JIT that belongs to the session, not the query). Each query is then
built once, in registration order.

Usage: python tools/construction_census.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    spark = get_spark("census", shuffle_partitions=16)
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    from pyspark.sql import functions as F

    def _warm_fn(v):
        return v * 1.0

    _warm_fn.__annotations__ = {
        "v": __import__("pandas").Series, "return": __import__("pandas").Series
    }
    spark.range(1000).select(
        F.pandas_udf(_warm_fn, "double")(F.col("id"))
    ).collect()
    # analyzer JIT warm-up: the first multi-KB lambda-bearing expression
    # a fresh JVM analyzes pays ~4 s of C2-compiling the analyzer /
    # lambda-resolution / type-coercion paths; that cost belongs to the
    # SESSION, not to whichever query happens to build first. Synthetic
    # trees don't heat the same rule paths (measured: a 40-branch nested
    # transform/aggregate warm-up left marc_rich_extract at ~5 s), so
    # warm with the engine's own hottest expression — the twin-compiled
    # relator-classified author struct over a 1-row parsed MARC corpus.
    import recordmanager_spark.extractors.marc as MARC
    import recordmanager_spark.sqlalg as S
    import recordmanager_spark.sqltwin as TW

    wdf = spark.createDataFrame(
        [('{"leader":"l","fields":[{"001":"x"}]}',)], "raw string"
    ).select(MARC.parse_marc_in_json("raw").alias("marc"))
    tw = TW.marc_twin()
    wdf.select(
        F.expr(str(tw.primary_authors(S.col("marc")))).alias("w")
    ).collect()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir)
            timings[name] = time.time() - t0
        except Exception as ex:  # pragma: no cover - census must finish
            print(f"ERROR {name}: {ex}", file=sys.stderr)
            timings[name] = float("nan")
    total = time.time() - t_all
    print(f"# construction census at {sf_dir}: {len(timings)} queries, "
          f"{total:.1f}s total")
    for name, secs in sorted(
        timings.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0)
    )[:top_n]:
        print(f"{name:34s} {secs:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
