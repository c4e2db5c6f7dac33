"""r13 construction-tier probe: split each heavy builder's BUILD time
into (a) eager Spark actions (the adaptive-CC sizing take, the k-means
seed/Lloyd collects) and (b) everything else (py4j plan construction,
SQL-text compilation, analyzer time).

The r12 scaling block showed c8/c32 ~= 1 for dedup_er / knn_ivf_full —
the cost is driver-side, but WHICH driver cost decides the fix: action
wall-clock means sequential AQE stage materialization; the remainder
means plan-build py4j chatter (twin/let-bind territory).

Usage: python tools/probe_construction_r13.py [sf_dir] [runs] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402

TARGETS = [
    "dedup_er",
    "knn_ivf_full",
    "dedup_incremental",
    "component_dedup",
    "pipeline_end_to_end",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    targets = sys.argv[3:] or TARGETS
    spark = get_spark("probe_construction_r13")
    qs = entry_mod.queries()
    # session warm-up (match construction_census.py: q1 + pandas UDF +
    # one heavy HOF analysis so analyzer JIT belongs to the session)
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    from pyspark.sql import functions as F

    def _warm_fn(v):
        return v * 1.0

    _warm_fn.__annotations__ = {
        "v": __import__("pandas").Series,
        "return": __import__("pandas").Series,
    }
    spark.range(1000).select(
        F.pandas_udf(_warm_fn, "double")(F.col("id"))
    ).collect()
    import recordmanager_spark.extractors.marc as MARC

    spark.createDataFrame(
        [("{}",)], "raw string"
    ).select(
        MARC.parse_marc_in_json("raw").alias("m")
    ).select(MARC.work_keys("m")).collect()

    # --- instrument the eager construction actions -----------------------
    import recordmanager_spark.operators.dedup as DD
    import recordmanager_spark.operators.similarity as SIM

    action_log: list[tuple[str, float]] = []

    orig_take = DD._take_all_partitions

    def timed_take(df, n):
        t0 = time.time()
        out = orig_take(df, n)
        action_log.append(("cc_take", time.time() - t0))
        return out

    DD._take_all_partitions = timed_take

    orig_df_cls = None
    # time DataFrame.collect / limit().collect() inside ivf_assign by
    # wrapping the module-level functions it calls is intrusive; instead
    # wrap ivf_assign itself and record its total as "ivf_assign".
    orig_ivf = SIM.ivf_assign

    def timed_ivf(*a, **kw):
        t0 = time.time()
        out = orig_ivf(*a, **kw)
        action_log.append(("ivf_assign", time.time() - t0))
        return out

    SIM.ivf_assign = timed_ivf

    print(f"# sf={sf_dir} runs={runs}")
    for name in targets:
        for r in range(runs):
            action_log.clear()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            total = time.time() - t0
            actions = sum(t for _, t in action_log)
            detail = " ".join(f"{k}={t:.2f}" for k, t in action_log)
            print(
                f"{name} run{r}: build={total:.2f}s actions={actions:.2f}s "
                f"other={total - actions:.2f}s [{detail}]",
                flush=True,
            )
            del df


if __name__ == "__main__":
    main()
