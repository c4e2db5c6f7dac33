"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the ``noop`` batch sink so EVERY
output column is actually computed. Rounds 1-3 timed ``df.count()``,
which lets Catalyst prune deterministic projections entirely — xpath-
engine extraction queries were measuring XML *generation*, while
from_xml struct engines (whose corrupt-record marker defeats pruning)
paid full price. That asymmetry reported the r3 struct migrations as
regressions when honest materialization shows them several times FASTER
(see PERFORMANCE.md "bench methodology"). Timings exclude session
startup (warm-up query runs first).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from recordmanager_spark.session import get_spark

BENCH_QUERIES = [
    # scan/agg/join headliners
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    # engine operators
    "filter_dsl_orders",
    "count_values_tokens",
    "host_component_merge",
    "group_merge_orders",
    "dedup_er",
    "events_hourly_rollup",
    # extraction / mapping / enrichment / split
    # (dc_extract pins the xpath FALLBACK engine — ~10x the struct cost
    # honestly materialized; the headline tracks the production engines,
    # so only the struct twin is benched)
    "dc_extract_struct",
    "ead_extract",
    "lido_extract",
    "upsert_orders",
    "copy_down_merged",
    "suppression_filter",
    "value_mapping_orders",
    "field_rules_orders",
    "link_resolution_lineitem",
    "enrich_topics_nation",
    "xml_split_customers",
    "normalize_fields_docs",
    # training-data extensions
    "exact_dup_docs",
    "exact_substring_dedup_docs",
    "near_dup_prune_docs",
    "quality_buckets_docs",
    "chunk_documents_docs",
    "bpe_tokenize_docs",
    "minhash_near_dup",
    "simhash_near_dup",
    "hamming_neardup_hashes",
    "knn_bruteforce",
    # the ANN path a production corpus would use (brute force above is the
    # exact oracle, not the scale path)
    "knn_ivf_full",
    "knn_pq_full",
    "knn_ivfadc_full",
    "url_canonical_dedup_docs",
    "skew_report_events",
    "corpus_datacard_docs",
    "dsir_select_docs",
    "nb_quality_docs",
    "minhash_incremental_docs",
    "text_quality",
    "multimodal_features",
    "media_probe_docs",
    "gopher_repetition_docs",
    "pii_scrub_docs",
    "contamination_docs",
    "fuzzy_decontamination_docs",
    # round-7 additions
    "tfidf_keywords_docs",
    "shuffle_shards_docs",
    "paragraph_dedup_docs",
    # round-8 additions
    "domain_cap_docs",
    "lm_perplexity_docs",
    "exact_dup_incremental_docs",
    "corpus_config_pipeline_docs",
    "minhash_calibration_docs",
    # round-9 additions
    "corpus_config_minhash_docs",
    "bm25_topk_docs",
    "hybrid_search_docs",
    "mojibake_repair_docs",
    "ann_recall_lsh",
    "html_extract_docs",
    "warc_extract_docs",
    "source_overlap_docs",
    "soft_dedup_weights_docs",
    "token_divergence_docs",
    "ngram_novelty_docs",
    # round-10 additions
    "corpus_config_warc_docs",
    "corpus_config_incremental_docs",
    "boilerplate_ngrams_docs",
    "shard_manifest_docs",
    # round-11 additions
    "index_diff_docs",
    "check_index_docs",
    "pack_bins_ffd_docs",
    "image_resize_docs",
    # round-12 additions
    # (r11 verdict: the heaviest registered query was hidden behind a
    # shape-only exclusion; it is headline-worthy by cost — ~10-19 s at
    # sf0.1 after the spread fix, down from 60 s single-partition)
    "winnow_neardup_pairs",
    # WAV synth + Arrow fingerprint scan + banded Hamming pairing — the
    # audio leg of the multimodal dedup story
    "audio_neardup_docs",
    # broadcast robots join + per-host-cached RFC 9309 Arrow verdict scan
    "robots_gate_docs",
    # full immediate-renormalize pass: parse + key/flag exprs +
    # mapInPandas re-serialization (round-12b)
    "renormalize_marc",
]

# Every registered query is either benched above or listed here with the
# reason it is excluded from the headline number (r10 verdict: exclusions
# must be committed and justified, not implicit). Reasons are one of:
# - fixture-bound: the query synthesizes its XML corpus inline, so wall
#   time measures fixture GENERATION, not the operator (the family's
#   engines are benched via representatives: ead_extract, lido_extract,
#   dc_extract_struct, xml_split_customers)
# - duplicate plan shape of <q>: same physical plan as a benched query;
#   timing it twice adds noise, not coverage
# - scan-stage: a zero-exchange expression chain over one scan — the
#   bench's noop-sink floor dominates; correctness is oracle-checked and
#   the plan shape is pinned by tools/plan_audit.py
# - streaming harness: micro-batch scheduling dominates at sf0.1; soak
#   throughput is tracked in PERFORMANCE.md instead
# tests/test_bench_registry.py enforces benched + excluded == registered.
BENCH_EXCLUSIONS = {
    "allfields_customer": "scan-stage concat/normalize chain",
    "authority_enrich_customers": "duplicate plan shape of enrich_topics_nation (broadcast dim join)",
    "bloom_contamination_docs": "duplicate plan shape of contamination_docs (bloom bit-array literal swap)",
    "c4_clean_docs": "scan-stage line-filter expressions",
    "callnumber_sort_keys": "scan-stage call-number parse expressions",
    "cluster_corpus_embeddings": "duplicate core of knn_ivf_full (same centroid-assign pandas UDF)",
    "component_dedup": "duplicate plan shape of dedup_er (shared blocking/verify/CC machinery)",
    "component_parts_policy": "duplicate plan shape of group_merge_orders",
    "config_pipeline_orders": "composition of benched stages (filter_dsl/value_mapping/field_rules); adds only ini compilation",
    "copy_down_parent": "duplicate plan shape of copy_down_merged",
    "corpus_token_stats_docs": "duplicate plan shape of corpus_datacard_docs (same census agg)",
    "count_values_event_type": "duplicate plan shape of count_values_tokens",
    "count_values_lang": "duplicate plan shape of count_values_tokens",
    "count_values_mapped": "duplicate plan shape of count_values_tokens",
    "dc_extract": "pins the xpath FALLBACK engine (~10x struct cost by design); production twin dc_extract_struct is benched",
    "dedup_check": "duplicate plan shape of dedup_er (invariant re-verify over its output)",
    "dedup_incremental": "duplicate plan shape of dedup_er (batch-sized probe of the same machinery)",
    "deletion_antijoin": "scan-stage broadcast anti-join; no corpus-sized exchange",
    "dirty_hosts_propagation": "scan-stage broadcast semi-join propagation",
    "doaj_extract": "fixture-bound",
    "eaccpf_extract": "fixture-bound",
    "ead3_split_extract": "fixture-bound",
    "ead_split_extract": "fixture-bound",
    "embedding_neardup": "duplicate banded-bucket plan shape of hamming_neardup_hashes",
    "ese_extract": "fixture-bound",
    "events_json_extract": "scan-stage get_json_object chain",
    "export_filtered_orders": "write-dominated export manifest; sink behavior pinned by pytest",
    "filter_dsl_events_page": "duplicate plan shape of filter_dsl_orders",
    "forward_authority_extract": "fixture-bound",
    "forward_film_extract": "fixture-bound",
    "fulltext_trait_docs": "scan-stage trait projection",
    "genieplus_harvest_extract": "fixture-bound",
    "geo_centers": "scan-stage WKT/DMS expressions",
    "geocode_customers": "duplicate plan shape of enrich_topics_nation (broadcast cache join)",
    "geocode_simplify_customers": "duplicate plan shape of enrich_topics_nation (broadcast cache join + ladder)",
    "gopher_quality_docs": "scan-stage quality-gate expressions (gopher_repetition_docs carries the family's cost)",
    "hierarchical_facets_geo": "scan-stage facet-path concat",
    "id_sort_keys": "scan-stage scalar key grid",
    "indexed_timestamps_orders": "scan-stage date_format projections",
    "incremental_changed": "scan-stage watermark filter",
    "knn_lsh": "duplicate plan shape of ann_recall_lsh (same LSH probe, plus the recall join)",
    "lang_id_pred": "scan-stage n-gram scoring (text_quality carries the family)",
    "line_dedup_docs": "duplicate plan shape of paragraph_dedup_docs (same gram census join-back)",
    "linemarc_extract": "fixture-bound",
    "llm_corpus_pipeline_docs": "composition of benched stages (corpus_config_pipeline_docs is the benched composition)",
    "lrmi_extract": "fixture-bound",
    "marc_authority_extract": "fixture-bound",
    "marc_extract": "fixture-bound",
    "marc_holdings_normalize": "fixture-bound",
    "marc_rich_extract": "fixture-bound",
    "mix_sources_docs": "scan-stage deterministic hash device",
    "music_enrich_orders": "duplicate plan shape of enrich_topics_nation (broadcast dim join)",
    "ngram_jaccard_pairs": "duplicate plan shape of minhash_near_dup (same shingle + pair-verify machinery)",
    "oai_harvest_parse": "fixture-bound",
    "oai_provider_serve": "fixture-bound",
    "once_per_group_orders": "scan-stage dropDuplicates on the group key",
    "optout_filter_docs": "scan-stage robots-directive regex expressions",
    "pack_sequences_docs": "duplicate plan shape of chunk_documents_docs (same posexplode packing core)",
    "pipeline_end_to_end": "fixture-bound composition of benched stages",
    "preview_marc_record": "one-record command surface; nothing corpus-sized to time",
    "qdc_extract": "fixture-bound",
    "range_scan_page": "bounded top-k (TakeOrderedAndProject); plan-audited",
    "rdf_import_entities": "fixture-bound",
    "regexp_mapping_orders": "duplicate plan shape of value_mapping_orders",
    "scalar_functions_grid": "scan-stage scalar grid (ICU parity pinned by pytest)",
    "scalar_functions_grid2": "scan-stage scalar grid",
    "semantic_dedup_embeddings": "duplicate core of knn_ivf_full (k-means assign + within-cluster cosine)",
    "sfx_harvest_files": "fixture-bound",
    "sierra_harvest_extract": "fixture-bound",
    "solr_batch_sizes": "sink batch accounting; write-path behavior pinned by pytest",
    "stateful_skip_unchanged": "streaming harness",
    "stratified_sample_docs": "scan-stage deterministic hash device",
    "streaming_content_dedup": "streaming harness",
    "streaming_hourly_rollup": "streaming harness",
    "streaming_neardup_docs": "streaming harness",
    "temperature_mix_docs": "scan-stage deterministic hash device",
    "title_keys_docs": "scan-stage scalar key grid",
    "token_stats": "scan-stage 1-row aggregate (text_quality carries the family)",
    "train_split_docs": "scan-stage deterministic hash device",
    "uri_cache_ttl": "scan-stage TTL split + broadcast upsert join",
    "url_blocklist_docs": "scan-stage host/badword expressions",
    "winnow_fingerprint_docs": "scan-stage rolling-hash windows (the hash chain's cost is benched inside winnow_neardup_pairs, which executes it as its first stage)",
    "work_keys_marc": "fixture-bound",
    "xslt_normalize_orders": "fixture-bound",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("bench")

    qs = entry_mod.queries()
    # warm-up: JVM + parquet footer caches
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    # warm-up: Python UDF worker pool + Arrow serialization path, so
    # pandas-UDF queries measure steady-state throughput, not the one-time
    # worker fork (executors reuse pythonExec workers across queries)
    from pyspark.sql.functions import col, pandas_udf  # noqa: PLC0415

    def _warm_fn(v):
        return v * 1.0

    _warm_fn.__annotations__ = {"v": __import__("pandas").Series, "return": __import__("pandas").Series}
    _warm = pandas_udf(_warm_fn, "double")
    spark.range(10000, numPartitions=32).select(_warm(col("id"))).collect()

    # Inter-query hygiene (see the loop body). Default ON: the pre-hygiene
    # methodology let state leaked by earlier queries distort later timed
    # regions (a measurement bug per guide §1/§5 — documented with the old
    # numbers kept in OPTIMIZATION_r12.md). Set SPARK_GRAFT_BENCH_HYGIENE=0
    # to reproduce the r11-and-earlier loop exactly.
    hygiene = os.environ.get("SPARK_GRAFT_BENCH_HYGIENE", "1") != "0"

    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    for name in BENCH_QUERIES:
        # build = queries() callable returning the DataFrame. This is where
        # every eager construction action lives (adaptive-CC sizing takes,
        # k-means / training collects, census stage materialization) — the
        # costs that warm per-query medians amortize away and that every
        # cross-round bench dispute so far has actually been about.
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        # exec = noop sink: every output column materializes; nothing is
        # written. Pure plan-execution time of the returned DataFrame.
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        timings[name] = round(t2 - t0, 3)
        phases[name] = {"build": round(t1 - t0, 3), "exec": round(t2 - t1, 3)}
        n = df.count()  # row count for the log line only — untimed
        print(
            f"# {name}: {n} rows in {timings[name]}s"
            f" (build {phases[name]['build']}s + exec {phases[name]['exec']}s)",
            file=sys.stderr,
        )
        t_h0 = time.time()
        if hygiene:
            # Inter-query state release (untimed, JMH-style; guide §5).
            # Several operators legitimately persist/localCheckpoint state
            # their own consumers need within the query (k-means centroids,
            # minhash batch signatures, CC frontiers). Spark only reaps
            # those blocks — and every query's shuffle files and broadcasts
            # — via ContextCleaner, which acts on DRIVER GC; a 48g driver
            # heap rarely GCs, so by query ~60 the accumulated blocks
            # compete with execution memory and later heavy queries spill
            # (measured: winnow 9-11 s standalone vs 15-65 s in-bench on
            # identical code; renormalize exec 2.6 vs 48 s). Releasing
            # between timed regions measures each query, not the leak.
            del df
            gc.collect()  # drop py4j refs so the JVM side is unreachable
            spark.catalog.clearCache()  # CacheManager entries (persist)
            spark.sparkContext._jvm.System.gc()  # ContextCleaner reaps
            # Post-GC settle (r13, ADVICE r12): ContextCleaner reaps
            # ASYNCHRONOUSLY after the System.gc() returns, so without a
            # settle the block/shuffle removal RPCs overlap the NEXT
            # query's timed build region (measured as a consistent
            # +0.3-0.5 s on hamming_neardup_hashes, the query after the
            # heaviest state producer). 0.5 s untimed absorbs the reap;
            # cross-query cached state is intentionally disallowed by
            # this methodology — each query computes from parquet.
            # Env-guarded (default ON) so the settle can be A/B'd and
            # tuned independently of the release itself.
            if os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "1") != "0":
                time.sleep(0.5)
            phases[name]["hygiene_untimed"] = round(time.time() - t_h0, 3)

    # Full per-query timings + build/exec phases go to a sidecar file and
    # stderr; the driver captures only the LAST 2000 characters of stdout
    # and parses the final JSON line, so that line must stay small.
    # Round 9's full phases dict grew the line to ~5.7 KB and the driver
    # recorded `parsed: null` (BENCH_r09.json) — keep stdout compact:
    # total, sf, query count, and the five slowest queries.
    detail = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "phases": phases,
        "sf": sf,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail), file=sys.stderr)
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": top5,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
