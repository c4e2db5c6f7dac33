"""Generic per-query timing probe: build + noop-exec a named query N
times inside one warmed session and print per-run times + medians.
Pair with git stash/checkout legs for interleaved A/B of a code change
(the box has documented ±50% one-shot swings; only interleaved medians
decide).

Usage: python tools/probe_query_times.py [sf_dir] [runs] <query> [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    targets = sys.argv[3:]
    spark = get_spark("probe_query_times")
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    def _warm_fn(v):
        return v * 1.0

    _warm_fn.__annotations__ = {
        "v": __import__("pandas").Series,
        "return": __import__("pandas").Series,
    }
    spark.range(10000).select(
        F.pandas_udf(_warm_fn, "double")(F.col("id"))
    ).collect()
    for name in targets:
        builds, execs = [], []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"probe {name} run{r}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            print(
                f"{name} run{r}: build={t1 - t0:.2f}s exec={t2 - t1:.2f}s",
                flush=True,
            )
            del df
        print(
            f"{name} MEDIAN build={statistics.median(builds):.2f}s "
            f"exec={statistics.median(execs):.2f}s "
            f"total={statistics.median(b + e for b, e in zip(builds, execs)):.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
