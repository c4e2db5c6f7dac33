"""Exact-substring dedup (Lee et al. ExactSubstr) unit tests."""

from __future__ import annotations

from recordmanager_spark.operators.substring_dedup import exact_substring_dedup


def _run(spark, docs, window):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {
        r.doc_id: r
        for r in exact_substring_dedup(df, window=window).collect()
    }


def test_shared_span_removed_from_both(spark):
    shared = "one two three four five"
    got = _run(
        spark,
        [
            ("a", f"alpha start {shared} alpha end"),
            ("b", f"beta opening {shared} beta closing"),
        ],
        window=5,
    )
    # the 5-token shared run duplicates exactly one 5-gram in each doc
    assert got["a"].n_dup_grams == 1
    assert got["a"].removed_tokens == 5
    assert got["a"].cleaned_text == "alpha start alpha end"
    assert got["b"].cleaned_text == "beta opening beta closing"
    assert got["a"].kept_tokens == 4


def test_overlapping_grams_merge_into_one_span(spark):
    shared = "t1 t2 t3 t4 t5 t6 t7"  # 7 tokens -> 3 overlapping 5-grams
    got = _run(
        spark,
        [("a", f"x {shared} y"), ("b", f"p q {shared} r")],
        window=5,
    )
    assert got["a"].n_dup_grams == 3
    # merged interval covers the whole 7-token run, not 3 * 5
    assert got["a"].removed_tokens == 7
    assert got["a"].cleaned_text == "x y"
    assert got["b"].cleaned_text == "p q r"


def test_within_document_repeat_counts(spark):
    body = "a b c d e"
    got = _run(spark, [("solo", f"{body} mid {body}")], window=5)
    # the run occurs twice in ONE document -> still duplicated
    assert got["solo"].n_dup_grams == 2
    assert got["solo"].removed_tokens == 10
    assert got["solo"].cleaned_text == "mid"


def test_unique_documents_untouched(spark):
    got = _run(
        spark,
        [("a", "all these tokens differ here"), ("b", "and so do these ones now")],
        window=3,
    )
    assert got["a"].removed_tokens == 0
    assert got["a"].cleaned_text == "all these tokens differ here"
    assert got["a"].n_tokens == 5


def test_short_documents_have_no_grams(spark):
    got = _run(spark, [("a", "tiny doc"), ("b", "tiny doc")], window=5)
    assert got["a"].n_dup_grams == 0
    assert got["a"].removed_tokens == 0
    assert got["a"].cleaned_text == "tiny doc"


def test_two_separate_islands(spark):
    s1 = "i1 i2 i3 i4 i5"
    s2 = "j1 j2 j3 j4 j5"
    gap = "gap1 gap2 gap3 gap4 gap5 gap6"
    got = _run(
        spark,
        [("a", f"{s1} {gap} {s2}"), ("b", f"{s1} other filler words {s2}")],
        window=5,
    )
    # two disjoint spans; the unique gap stays
    assert got["a"].removed_tokens == 10
    assert got["a"].cleaned_text == gap


def test_join_strategy_pins_identical_output(spark):
    """broadcast / forced-shuffle / AQE-default join strategies for the
    duplicate-position join all produce identical rows (the strategy is
    a pure physical choice)."""
    docs = [
        (f"d{i}", f"head{i} one two three four five tail{i}") for i in range(6)
    ] + [("u", "all unique tokens live here now")]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    def rows(**kw):
        return sorted(
            map(tuple, exact_substring_dedup(df, window=5, **kw).collect())
        )

    default = rows()
    assert default == rows(broadcast_positions=True)
    assert default == rows(broadcast_positions=False)
