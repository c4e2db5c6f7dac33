"""bench.py's query list must stay a subset of the driver registry, and
every registered query must have an oracle (the round-9 lesson: a
registered query without an oracle puts a permanent err row in the
external correctness record)."""

import bench
import __spark_entry__ as entry


def test_bench_queries_are_registered():
    qs = entry.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, missing


def test_every_query_has_an_oracle():
    assert set(entry.queries()) == set(entry.oracle_sql())
