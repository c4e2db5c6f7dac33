"""r13b UDF profiler probe: run one query with Spark 4's Python UDF
profiler (spark.sql.pyspark.udf.profiler=perf) and print the per-UDF
cProfile tables, so §4.2 per-task work is attacked with evidence, not
guesses.

Usage: python tools/probe_udf_profile.py [sf_dir] <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = sys.argv[2:]
    spark = get_spark("probe_udf_profile")
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    for name in targets:
        print(f"=== {name} ===", flush=True)
        spark.sparkContext.setJobDescription(f"profile: {name}")
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.profile.show(type="perf")
        spark.profile.clear()


if __name__ == "__main__":
    main()
