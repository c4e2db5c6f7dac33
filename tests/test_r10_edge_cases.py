"""Empty-input edge cases for the round-10 surfaces: every path must
return an empty result, never raise — a daily ingest with nothing new
and a search with no hits are normal operation, not errors."""

import os
import tempfile

from recordmanager_spark import corpus_config as CC


def test_empty_batch_through_incremental_pipeline(spark):
    cfg = CC.parse_corpus_ini(
        "[corpus:x]\nlanguages[] = en\ndedup_index = i\nmin_tokens = 2\n"
    )["x"]
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    idx = spark.createDataFrame([], "fp string, canonical_id long")
    assert CC.apply_corpus_pipeline(empty, cfg, tables={"i": idx}).count() == 0


def test_warc_source_empty_dir_and_empty_segment(spark):
    d = tempfile.mkdtemp()
    assert CC.load_corpus_source(spark, f"warc:{d}").count() == 0
    open(os.path.join(d, "seg0.warc"), "w").close()
    assert CC.load_corpus_source(spark, f"warc:{d}").count() == 0


def test_bm25_zero_hit_query(spark):
    from recordmanager_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(0, "zzznope")], "query_id int, query_text string"
    )
    assert bm25_topk(docs, qs, k=5).count() == 0


def test_ffd_empty_input(spark):
    from recordmanager_spark.operators.packing import pack_bins_ffd

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = pack_bins_ffd(
        empty, id_col="doc_id", tokens_col="n_tokens", budget=16,
        num_shards=2,
    )
    assert out.count() == 0
