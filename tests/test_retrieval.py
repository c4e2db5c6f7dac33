"""BM25 retrieval + RRF fusion: scores vs a hand-computed reference,
determinism, bounded top-k staging, and postings reuse."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from recordmanager_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    rrf_fuse,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "quick quick quick fox"),
    (4, "a lazy dog sleeps all day the dog dreams"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _bm25_ref(query_terms, k1=1.2, b=0.75):
    """Pure-python BM25 over DOCS for one query (qtf=1 per term)."""
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in query_terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if not tf:
                continue
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[i] = scores.get(i, 0.0) + idf * tfn
    return {i: round(s, 6) for i, s in scores.items()}


def test_postings_shape(corpus):
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in build_postings(corpus).collect()
    }
    assert rows[("quick", 3)] == (3, 4)
    assert rows[("the", 0)] == (2, 9)
    assert rows[("dog", 4)] == (2, 9)


def test_bm25_matches_reference(spark, corpus):
    queries = spark.createDataFrame(
        [(100, "quick fox"), (101, "lazy dog")],
        ["query_id", "query_text"],
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(corpus, queries, k=5).collect()
    }
    for qid, terms in ((100, ["quick", "fox"]), (101, ["lazy", "dog"])):
        ref = _bm25_ref(terms)
        order = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc, score) in enumerate(order, start=1):
            assert got[(qid, doc)] == (pytest.approx(score), rank), (
                qid,
                doc,
            )
    # docs with no query term never appear
    assert (100, 2) not in got and (101, 2) not in got


def test_bm25_qtf_weighting(spark, corpus):
    """A term repeated in the query multiplies its contribution."""
    q1 = spark.createDataFrame([(0, "fox")], ["query_id", "query_text"])
    q2 = spark.createDataFrame(
        [(0, "fox fox")], ["query_id", "query_text"]
    )
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, q1).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(corpus, q2).collect()}
    for d in s1:
        assert s2[d] == pytest.approx(2 * s1[d], abs=2e-6)


def test_bm25_topk_truncates_and_ranks(spark, corpus):
    queries = spark.createDataFrame(
        [(7, "the quick lazy dog fox")], ["query_id", "query_text"]
    )
    out = bm25_topk(corpus, queries, k=2).collect()
    assert len(out) == 2
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_bm25_two_stage_bound_consistency(spark, corpus):
    """n_partial=1 (single window) and n_partial=8 agree exactly."""
    queries = spark.createDataFrame(
        [(0, "quick fox lazy dog the")], ["query_id", "query_text"]
    )
    a = sorted(
        bm25_topk(corpus, queries, k=4, n_partial=1).collect(),
        key=lambda r: r["rank"],
    )
    b = sorted(
        bm25_topk(corpus, queries, k=4, n_partial=8).collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_bm25_prebuilt_postings_identical(spark, corpus):
    queries = spark.createDataFrame(
        [(0, "quick dog")], ["query_id", "query_text"]
    )
    p = build_postings(corpus)
    inline = bm25_topk(corpus, queries, k=5).collect()
    probed = bm25_topk(corpus, queries, k=5, postings=p).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, probed))


def test_rrf_fuse(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)], ["query_id", "doc_id", "rank"]
    )
    out = {
        r["doc_id"]: (r["rrf"], r["rank"])
        for r in rrf_fuse([a, b], k=10).collect()
    }
    assert out[11] == (pytest.approx(round(1 / 62 + 1 / 61, 6)), 1)
    assert out[10][1] == 2  # 1/61 beats 1/62 and 1/63
    assert out[13][0] == pytest.approx(round(1 / 62, 6))
    # tie: doc 12 (1/63) vs none -> ranks are dense 1..4
    assert sorted(v[1] for v in out.values()) == [1, 2, 3, 4]


def test_rrf_tie_breaks_on_doc_id(spark):
    a = spark.createDataFrame(
        [(0, 5, 1), (0, 3, 2)], ["query_id", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(0, 3, 1), (0, 5, 2)], ["query_id", "doc_id", "rank"]
    )
    out = sorted(rrf_fuse([a, b], k=2).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [3, 5]  # equal rrf -> id asc


def test_bm25_bucketed_postings_index(spark, corpus):
    """Probing a PERSISTED term-bucketed postings index: identical
    ranking to the inline build, the index scan reads its bucket spec
    (co-located term groupBys), and the probe plan drops the postings
    build's exchanges — the BM25 analogue of the fingerprint/banded
    index contracts."""
    import io
    import re
    from contextlib import redirect_stdout

    from recordmanager_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    def _ex(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n = sum(
            1
            for sec in re.split(r"^\(\d+\) ", plan, flags=re.M)[1:]
            if sec.startswith("Exchange")
        )
        return n, plan

    queries = spark.createDataFrame(
        [(0, "quick fox"), (1, "lazy dog")], ["query_id", "query_text"]
    )
    inline = bm25_topk(corpus, queries, k=5)
    n_inline, _ = _ex(inline)

    import shutil

    spark.sql("DROP TABLE IF EXISTS t_bm25_postings")
    shutil.rmtree("spark-warehouse/t_bm25_postings", ignore_errors=True)
    write_bucketed(build_postings(corpus), "t_bm25_postings", "term", 4)
    try:
        idx = read_bucketed(spark, "t_bm25_postings")
        probed = bm25_topk(corpus, queries, k=5, postings=idx)
        n_bucketed, plan = _ex(probed)
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, probed.collect())
        )
        # the index arrives pre-partitioned: the postings-build exchange
        # disappears and the term-keyed df census inherits the bucket
        # partitioning (measured 10 -> 7 when pinned)
        assert n_bucketed <= n_inline - 3, (n_bucketed, n_inline)
        assert "Bucketed: true" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bm25_postings")


def test_bm25_persisted_stats_zero_corpus_scans(spark, corpus):
    """postings + stats both persisted: the probe plan contains ZERO
    scans of the corpus source — the 100 TB serving shape."""
    import io
    from contextlib import redirect_stdout

    from recordmanager_spark.operators.retrieval import build_corpus_stats

    queries = spark.createDataFrame(
        [(0, "quick fox"), (1, "lazy dog")], ["query_id", "query_text"]
    )
    # materialize index + stats as if written at ingest
    postings = spark.createDataFrame(
        build_postings(corpus).collect(),
        "term string, doc_id long, tf long, dl int",
    )
    stats = spark.createDataFrame(
        build_corpus_stats(corpus).collect(), "__N long, __avgdl double"
    )
    inline = bm25_topk(corpus, queries, k=5)
    probed = bm25_topk(corpus, queries, k=5, postings=postings, stats=stats)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, probed.collect())
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    # the corpus is an in-memory LocalTableScan of (doc_id, text); with
    # index + stats injected, no node reads the text column at all
    assert "text" not in plan.lower().replace("query_text", ""), plan
