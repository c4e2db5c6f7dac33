"""Contamination detection: exact broadcast-set and Bloom-filter paths
agree where the filter has no false positives, and the filter behaves
like a Bloom filter (supersets only, bounded size)."""

from __future__ import annotations

import pytest

from recordmanager_spark.operators import contamination as CT


def _corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),   # contains bench gram
        (2, "totally unrelated words nothing shared here"),
        (3, "prefix alpha beta gamma delta epsilon suffix"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )


def test_bloom_matches_exact_when_filter_is_large(spark):
    docs, bench = _corpus(spark), _bench(spark)
    exact = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in CT.flag_contaminated(
            docs, "doc_id", "text", bench, "text", n=5
        ).collect()
    }
    words = CT.bloom_filter_words(bench, "text", n=5, m_bits=1 << 16, k=3)
    bloom = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in CT.bloom_contaminated(
            docs, "doc_id", "text", words, m_bits=1 << 16, k=3, n=5
        ).collect()
    }
    # 2 bench grams set <=6 of 65536 bits: fp odds are negligible, the
    # two paths must agree exactly
    assert bloom == exact
    assert exact[1][1] and exact[3][1] and not exact[2][1]


def test_bloom_only_over_flags(spark):
    docs, bench = _corpus(spark), _bench(spark)
    exact = {
        r.doc_id: r.n_hits
        for r in CT.flag_contaminated(
            docs, "doc_id", "text", bench, "text", n=5
        ).collect()
    }
    # a pathologically small filter (64 bits) saturates: every gram hits
    words = CT.bloom_filter_words(bench, "text", n=5, m_bits=64, k=3)
    bloom = {
        r.doc_id: r.n_hits
        for r in CT.bloom_contaminated(
            docs, "doc_id", "text", words, m_bits=64, k=3, n=5
        ).collect()
    }
    assert all(bloom[i] >= exact[i] for i in bloom)


def test_bloom_filter_words_shape_and_validation(spark):
    bench = _bench(spark)
    words = CT.bloom_filter_words(bench, "text", n=5, m_bits=4096, k=3)
    assert len(words) == 64
    assert any(w != 0 for w in words)
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    docs = _corpus(spark)
    with pytest.raises(ValueError):
        CT.bloom_contaminated(docs, "doc_id", "text", words, m_bits=8192)


def test_fuzzy_decontaminate(spark):
    """Paraphrase twins flag via signature agreement; unrelated docs
    don't; the best match is (max agreement, min bench id)."""
    from pyspark.sql import Row

    from recordmanager_spark.operators.contamination import (
        fuzzy_decontaminate,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a familiar tune in the background of the old town square"
    )
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text="completely unrelated content about "
                               "distributed query engines and parquet"),
            Row(doc_id=3, text="Q: " + base),  # exact twin of bench 10
        ]
    )
    bench = spark.createDataFrame(
        [
            Row(bench_id=10, btext="Q: " + base),  # light paraphrase
            Row(bench_id=11, btext="totally different benchmark prompt "
                                   "about astronomy and tides"),
        ]
    )
    out = {r.doc_id: r for r in fuzzy_decontaminate(
        corpus, bench, "doc_id", "text",
        bench_id_col="bench_id", bench_text_col="btext",
        est_threshold=0.5,
    ).collect()}
    assert out[1].is_contaminated and out[1].matched_bench_id == 10
    assert 0.5 <= out[1].agreement <= 1.0
    assert not out[2].is_contaminated and out[2].matched_bench_id is None
    assert out[3].is_contaminated and out[3].agreement == 1.0
