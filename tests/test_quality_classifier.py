"""NB hashed-feature quality classifier: closed-form training separates
the classes, length normalization, prior behavior, external-weights
seam."""

from __future__ import annotations

from recordmanager_spark.operators import quality_classifier as QC


def _corpus(spark):
    rows = []
    for i in range(30):
        text = (
            "the quick brown fox jumps clean prose"
            if i % 2 == 0
            else "buy now click here spam spam casino"
        )
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_classifier_separates_classes(spark):
    df = _corpus(spark)
    model = QC.train_nb_quality(
        df.where("doc_id % 2 = 0"), df.where("doc_id % 2 = 1"), n_buckets=64
    )
    out = {r.doc_id: r for r in QC.nb_quality_score(df, model).collect()}
    assert all(out[i].nb_label for i in range(0, 30, 2))
    assert not any(out[i].nb_label for i in range(1, 30, 2))
    assert all(out[i].nb_prob > 0.5 for i in range(0, 30, 2))
    assert all(0.0 <= out[i].nb_prob <= 1.0 for i in range(30))


def test_length_normalization_bounds_logit(spark):
    # a doc repeating one good gram 100x must not score wildly above a
    # doc saying it once — the mean normalizes length away
    df = spark.createDataFrame(
        [(1, "good text"), (2, " ".join(["good text"] * 100))],
        "doc_id long, text string",
    )
    pos = spark.createDataFrame([(0, "good text")], "doc_id long, text string")
    neg = spark.createDataFrame([(0, "bad stuff")], "doc_id long, text string")
    model = QC.train_nb_quality(pos, neg, n_buckets=64)
    out = {r.doc_id: r.nb_logit for r in QC.nb_quality_score(df, model).collect()}
    assert abs(out[1] - out[2]) < abs(out[1]) * 0.5 + 1.0


def test_empty_doc_scores_prior_only(spark):
    pos = spark.createDataFrame([(0, "a b")] * 3, "doc_id long, text string")
    neg = spark.createDataFrame([(0, "c d")], "doc_id long, text string")
    model = QC.train_nb_quality(pos, neg, n_buckets=32)
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    [row] = QC.nb_quality_score(df, model).collect()
    assert abs(row.nb_logit - model["prior_micro"] / 1e6) < 1e-6


def test_external_weights_seam(spark):
    # a hand-built weight table (as from a real fastText dump) plugs in
    model = {
        "weights_micro": [0] * 16,
        "prior_micro": 2_000_000,  # strong positive prior
        "n_buckets": 16,
        "salt": "ext",
    }
    df = spark.createDataFrame([(1, "anything")], "doc_id long, text string")
    [row] = QC.nb_quality_score(df, model, threshold=0.8).collect()
    assert row.nb_prob > 0.85 and row.nb_label
