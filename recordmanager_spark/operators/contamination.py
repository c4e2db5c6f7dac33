"""Benchmark-contamination detection for training corpora.

Flags documents whose word n-grams overlap a benchmark/eval set — the
standard n-gram decontamination step (GPT-3 appendix C / PaLM-style
13-gram overlap), a training-data-pipeline extension beyond the
reference's surface.

Scale shape (100 TB corpus, small benchmark):

- The benchmark side (exam questions, eval prompts — MBs, not TBs) is
  reduced to its DISTINCT gram set and **broadcast**; the corpus is never
  shuffled for the probe: each scan task checks its documents' grams
  against the broadcast hash set.
- Only (doc_id, hit) rows for documents that actually overlap flow into
  the groupBy — contaminated documents are a tiny minority by
  construction, so the aggregate and the flag join-back are on a
  near-empty relation, which is itself broadcast back onto the corpus
  (zero full-corpus shuffles end to end).
- Gram text is canonicalized through the same
  ``normalize_for_fingerprint`` used by the dedup family, so
  punctuation/case differences cannot hide overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import ngrams_from_tokens, normalize_for_fingerprint, tokenize


def ngram_set(col: Column | str, n: int) -> Column:
    """Distinct normalized word n-grams of a text column (documents shorter
    than n tokens contribute their whole text as one gram)."""
    c = F.col(col) if isinstance(col, str) else col
    return ngrams_from_tokens(tokenize(normalize_for_fingerprint(c)), n)


def flag_contaminated(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str,
    n: int = 8,
    min_hits: int = 1,
    broadcast_hits: bool = True,
) -> DataFrame:
    """Annotate ``docs`` with (n_hits, contaminated).

    ``n_hits`` counts the document's DISTINCT grams that appear anywhere
    in the benchmark; ``contaminated`` is ``n_hits >= min_hits``.

    ``broadcast_hits`` assumes the contaminated subset is small (the
    normal case); pass False to fall back to a shuffled join when a
    corpus is known to overlap massively (e.g. re-checking a benchmark
    against itself).
    """
    bench_grams = (
        benchmark.select(F.explode(ngram_set(bench_text_col, n)).alias("g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_set(text_col, n)).alias("g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    out = docs.join(hits, id_col, "left")
    return out.withColumn(
        "n_hits", F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    ).withColumn("contaminated", F.col("n_hits") >= min_hits)
