"""Seeded randomized parity: compare_index_docs vs a pure-Python model
of SolrComparer.php's semantics (union-of-fields, isset() null
handling, set-membership value diffs, skip-missing). One Spark job
over many random docs — the fuzz version of the hand-picked cases in
test_index_compare.py."""

from __future__ import annotations

import random

from pyspark.sql import types as T

from recordmanager_spark.operators.index_compare import compare_index_docs

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("topic", T.ArrayType(T.StringType())),
        T.StructField("year", T.LongType()),
    ]
)

VOCAB = ["a", "b", "c", "d", "é", ""]


def _rand_doc(rng, i):
    title = rng.choice([None, *VOCAB])
    topic = (
        None
        if rng.random() < 0.3
        else [rng.choice(VOCAB) for _ in range(rng.randrange(0, 4))]
    )
    year = rng.choice([None, 1999, 2000, 2001])
    return (f"id{i}", title, topic, year)


def _model(records, indexed, skip_missing):
    """Pure-Python reference: dict-of-dicts melt + set diff."""

    def melt(rows):
        out = {}
        for rid, title, topic, year in rows:
            d = {}
            if title is not None:
                d["title"] = {title}
            if topic is not None:
                d["topic"] = {str(x) for x in topic}
            if year is not None:
                d["year"] = {str(year)}
            out[rid] = d
        return out

    new, old = melt(records), melt(indexed)
    expected = {}
    for rid, nd in new.items():
        od = old.get(rid)
        if od is None:
            if skip_missing:
                continue
            od = {}
        for field in set(nd) | set(od):
            nv = nd.get(field, set())
            ov = od.get(field, set())
            added, removed = nv - ov, ov - nv
            if added or removed:
                expected[(rid, field)] = (
                    tuple(sorted(added)),
                    tuple(sorted(removed)),
                )
    return expected


def test_fuzz_parity_with_python_model(spark):
    rng = random.Random(0xC0FFEE)
    records = [_rand_doc(rng, i) for i in range(200)]
    # the index shares ~70% of ids (with independently perturbed docs),
    # drops the rest, and holds extra ids the batch never touches
    indexed = [
        _rand_doc(rng, i) for i in range(200) if rng.random() < 0.7
    ] + [_rand_doc(rng, 1000 + i) for i in range(30)]

    rdf = spark.createDataFrame(records, SCHEMA)
    idf = spark.createDataFrame(indexed, SCHEMA)
    for skip_missing in (False, True):
        got = {
            (r["id"], r["field"]): (tuple(r["added"]), tuple(r["removed"]))
            for r in compare_index_docs(
                rdf, idf, skip_missing=skip_missing
            ).collect()
        }
        assert got == _model(records, indexed, skip_missing), (
            f"skip_missing={skip_missing}"
        )
