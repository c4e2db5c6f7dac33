"""boilerplate_ngram_report: rank/threshold semantics on a controlled
fixture (the DuckDB twin is hash-checked by boilerplate_ngrams_docs)."""

from recordmanager_spark.operators.diagnostics import (
    boilerplate_ngram_report,
)


def test_ranks_thresholds_and_ties(spark):
    # 10 docs: all share the template trigram chain; half carry a rarer
    # phrase; each has a unique tail so unique grams must be pruned
    rows = [
        (
            i,
            "call us today now "
            + ("limited time offer only " if i % 2 == 0 else "")
            + f"unique tail {i} xyz{i}",
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_ngram_report(
        df, n=3, min_doc_frac=0.3, top_k=5
    ).collect()
    assert [r["gram"] for r in out][:2] == ["call us today", "us today now"]
    assert out[0]["n_docs"] == 10 and out[0]["doc_frac"] == 1.0
    # the rarer phrase (5/10 docs) clears the 0.3 threshold and ranks
    # below the universal grams; tie order within equal counts is the
    # gram string ascending
    fives = [r for r in out if r["n_docs"] == 5]
    assert fives and [r["gram"] for r in fives] == sorted(
        r["gram"] for r in fives
    )
    # unique tails (1/10 < 0.3) are pruned before the top-k
    assert all(r["n_docs"] >= 3 for r in out)


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert boilerplate_ngram_report(empty).count() == 0
