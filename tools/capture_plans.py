"""Capture .explain("formatted") for registered queries into text files.

Usage: python tools/capture_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query (default: the
bench registry's headline list). The judge reads these against the code,
so the capture is the plan of the EXACT DataFrame queries() returns.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from recordmanager_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.BENCH_QUERIES)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entry_mod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
