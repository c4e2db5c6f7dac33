"""Hashed backoff bigram LM scoring (operators/lm_score.py) — the
CCNet/KenLM-style perplexity quality gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.operators import lm_score as LM

REF_ROWS = [
    (i, "the quick brown fox jumps over the lazy dog " * 3)
    for i in range(30)
]


def _train(spark):
    ref = spark.createDataFrame(REF_ROWS, "doc_id long, text string")
    return LM.train_hash_lm(ref, "text", b1=256, b2=1024)


def test_reference_text_outscores_gibberish(spark):
    model = _train(spark)
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "dog lazy the over jumps fox brown quick the"),  # shuffled
            (3, "zxq vbnm qwerty asdf ghjkl zxcvb nmqw ertyu"),  # noise
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_logprob for r in LM.lm_logprob(df, model).collect()}
    assert out[1] > out[2] > out[3], out


def test_short_docs_score_null_and_determinism(spark):
    model = _train(spark)
    df = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, None), (4, "two tokens")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in LM.lm_logprob(df, model).collect()}
    assert rows[1].avg_logprob is None and rows[1].n_scored is None
    assert rows[2].avg_logprob is None
    assert rows[3].avg_logprob is None
    assert rows[4].n_scored == 1 and rows[4].avg_logprob is not None
    again = {r.doc_id: r for r in LM.lm_logprob(df, model).collect()}
    assert {k: v.avg_logprob for k, v in rows.items()} == {
        k: v.avg_logprob for k, v in again.items()
    }


def test_scoring_is_scan_stage(spark):
    """The corpus never shuffles: the whole score folds over the token
    array with the micro tables as plan literals."""
    from tools.plan_audit import unique_exchange_count

    model = _train(spark)
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox").alias("text"),
    )
    out = LM.lm_logprob(df, model)
    assert unique_exchange_count(out) == 0
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan and "Join" not in plan


def test_training_state_is_bucket_bounded(spark):
    """Model tables are exactly b1/b2 long however big the corpus —
    the aggregation state contract."""
    model = _train(spark)
    assert len(model["lnc1den_micros"]) == 256
    assert len(model["lnuni_micros"]) == 256
    assert len(model["lnc2_micros"]) == 1024
    assert len(model["c2_nonzero"]) == 1024
    assert all(isinstance(v, int) for v in model["lnc2_micros"])
