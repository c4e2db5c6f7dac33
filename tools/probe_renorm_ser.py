"""In-session interleaved A/B of the renormalize serializer stage:
mapInArrow (HEAD) vs the r12 mapInPandas form, alternated RUN BY RUN in
one warmed session so steal bursts hit both arms equally. The pandas
arm is reconstructed here by monkeypatching DataFrame.mapInArrow back
to a mapInPandas wrapper that performs the exact pre-r13b conversion
(all columns through pandas both ways, struct -> dict via PySpark's
converters, the original assign/zip serializer loop).

Usage: python tools/probe_renorm_ser.py [sf_dir] [pairs]
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
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("probe_renorm_ser")
    qs = entry_mod.queries()
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    from pyspark.sql import DataFrame

    real_map_in_arrow = DataFrame.mapInArrow

    def pandas_shim(self, func, schema, barrier=False):
        # reproduce the r12 shape: the SAME serializer logic but through
        # mapInPandas with full-row pandas conversion. func here is
        # renormalize's _ser_batches (arrow form); we cannot reuse it,
        # so rebuild the pandas loop from the closure's cells.
        cells = {
            n: c.cell_contents
            for n, c in zip(func.__code__.co_freevars, func.__closure__)
        }
        keep = cells["keep"]
        data_idx = cells["data_idx"]
        _serialize_one = cells["_serialize_one"]

        def _pd_batches(batches):
            def one(m, orig, mk, nsrc):
                if not mk:
                    if nsrc is None:
                        return None
                    return "" if nsrc == orig else nsrc
                if not isinstance(m, dict):
                    return None
                ser = _serialize_one((m.get("leader"), m.get("fields")))
                return "" if ser == orig else ser

            for pdf in batches:
                pdf = pdf.assign(
                    normalized_data=[
                        one(m, o, mk, ns)
                        for m, o, mk, ns in zip(
                            pdf["__marc_norm"], pdf[data_idx],
                            pdf["__is_marc"], pdf["__norm_src"],
                        )
                    ]
                )
                yield pdf[keep]

        return self.mapInPandas(_pd_batches, schema=schema)

    import gc as _gc

    results: dict[str, list[float]] = {"arrow": [], "pandas": []}
    for p in range(pairs):
        # alternate order within pairs and release state between runs
        # (bench-style untimed hygiene) so neither arm systematically
        # absorbs the previous run's ContextCleaner bleed
        order = ("arrow", "pandas") if p % 2 == 0 else ("pandas", "arrow")
        for arm in order:
            DataFrame.mapInArrow = (
                real_map_in_arrow if arm == "arrow" else pandas_shim
            )
            spark.sparkContext.setJobDescription(f"renorm {arm} pair{p}")
            t0 = time.time()
            df = qs["renormalize_marc"](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            results[arm].append(t2 - t1)
            print(
                f"pair{p} {arm}: build={t1 - t0:.2f}s exec={t2 - t1:.2f}s",
                flush=True,
            )
            del df
            _gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
    DataFrame.mapInArrow = real_map_in_arrow
    for arm, vals in results.items():
        print(
            f"{arm}: median exec={statistics.median(vals):.2f}s "
            f"min={min(vals):.2f}s n={len(vals)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
