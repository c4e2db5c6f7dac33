"""r13b systematic Python-boundary sweep: run EVERY bench query with
the Spark 4 UDF profiler and report, per query, the total Python
core-time and the hottest non-wait frames — so no §4.2 hotspot hides
in the mid-tier. ipc.py:50 (stream-open wait on upstream) is reported
separately: it is wait, not work.

Usage: python tools/probe_udf_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = sys.argv[2:]
    if not targets:
        import bench

        targets = bench.BENCH_QUERIES
    spark = get_spark("probe_udf_sweep")
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    spark.conf.set("spark.sql.pyspark.udf.profiler", "perf")
    for name in targets:
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # keep sweeping
            print(f"{name}: ERROR {exc}", flush=True)
            spark.profile.clear()
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            spark.profile.show(type="perf")
        text = buf.getvalue()
        spark.profile.clear()
        totals = []
        for m in re.finditer(
            r"in ([0-9.]+) seconds", text
        ):
            totals.append(float(m.group(1)))
        wait = sum(
            float(w)
            for w in re.findall(
                r"^\s*\d+\s+([0-9.]+)\s+[0-9.]+\s+[0-9.]+\s+[0-9.]+"
                r"\s+ipc\.py:50", text, re.M,
            )
        )
        work = sum(totals) - wait
        hot = []
        for line in text.splitlines():
            m = re.match(
                r"\s*[\d/]+\s+([0-9.]+)\s+[0-9.]+\s+[0-9.]+\s+[0-9.]+\s+(\S+)$",
                line,
            )
            if m and float(m.group(1)) >= 0.3 and "ipc.py:50" not in m.group(2):
                hot.append(f"{m.group(2)}={m.group(1)}")
        print(
            f"{name}: py_work={work:.2f}s wait={wait:.2f}s "
            f"n_udfs={len(totals)} hot=[{', '.join(hot[:6])}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
