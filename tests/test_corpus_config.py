"""Corpus-pipeline config compiler (corpus_config.py): ini parsing,
stage sequencing, and the optional LM/sample stages the contract query
does not exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recordmanager_spark import corpus_config as CC

INI = """
; comment
[corpus:a]
languages[] = en
languages[] = "fi"
dedup = exact
min_tokens = 2
cap_group[] = source
cap_n = 3
split[] = 0.5
split[] = 0.5
keep_text = true

[corpus:b]
sample_rate = 0.25

[other:ignored]
min_tokens = 99
"""


def test_parse_sections_and_dialect():
    cfgs = CC.parse_corpus_ini(INI)
    assert set(cfgs) == {"a", "b"}
    a = cfgs["a"]
    assert a.languages == ["en", "fi"]
    assert a.dedup == "exact"
    assert a.min_tokens == 2 and a.max_tokens is None
    assert a.cap_group == ["source"] and a.cap_n == 3
    assert a.split == [0.5, 0.5] and a.keep_text is True
    assert cfgs["b"].sample_rate == 0.25


def test_parse_rejects_bad_specs():
    with pytest.raises(ValueError, match="config-compilable"):
        CC.parse_corpus_ini("[corpus:x]\ndedup = simhash\n")
    with pytest.raises(ValueError, match="cap_n"):
        CC.parse_corpus_ini("[corpus:x]\ncap_group[] = source\n")
    with pytest.raises(ValueError, match="lm_reference_lang"):
        CC.parse_corpus_ini("[corpus:x]\nlm_min_avg_logprob = -9\n")
    with pytest.raises(ValueError, match="dsir_k"):
        CC.parse_corpus_ini("[corpus:x]\ndsir_target = en\n")
    with pytest.raises(ValueError, match="decontaminate_method"):
        CC.parse_corpus_ini(
            "[corpus:x]\ndecontaminate = b\ndecontaminate_method = magic\n"
        )


def test_parse_minhash_and_decontaminate_keys():
    ini = """
[corpus:m]
dedup = minhash
minhash_threshold = 0.3
minhash_num_perm = 32
minhash_bands = 8
minhash_rows = 4
blocklist = /tmp/words.txt
blocklist_max_hits = 1
decontaminate = bench
decontaminate_method = bloom
decontaminate_ngram = 6
decontaminate_min_hits = 2
dsir_target = en
dsir_k = 100
dsir_buckets = 256
"""
    m = CC.parse_corpus_ini(ini)["m"]
    assert m.dedup == "minhash" and m.minhash_threshold == 0.3
    assert m.minhash_num_perm == 32 and m.minhash_bands == 8
    assert m.blocklist == "/tmp/words.txt" and m.blocklist_max_hits == 1
    assert m.decontaminate == "bench"
    assert m.decontaminate_method == "bloom"
    assert m.decontaminate_ngram == 6 and m.decontaminate_min_hits == 2
    assert m.dsir_target == "en" and m.dsir_k == 100
    assert m.dsir_buckets == 256


def test_pipeline_stage_order_and_outputs(spark):
    cfgs = CC.parse_corpus_ini(INI)
    df = spark.createDataFrame(
        [
            (1, "en", "s1", "alpha beta gamma"),
            (2, "en", "s1", "ALPHA beta gamma"),  # exact dup of 1
            (3, "de", "s1", "alpha beta gamma"),  # dropped: language
            (4, "en", "s1", "tiny"),              # dropped: min_tokens
            (5, "fi", "s2", "yksi kaksi kolme"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    out = CC.apply_corpus_pipeline(df, cfgs["a"])
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 5}
    assert rows[1].split in ("train", "val")
    assert rows[1].n_tokens == 3
    assert "text" in out.columns  # keep_text = true
    # default drops text
    cfgs["a"].keep_text = False
    assert "text" not in CC.apply_corpus_pipeline(df, cfgs["a"]).columns


def test_pipeline_lm_gate(spark):
    ini = """
[corpus:q]
lm_min_avg_logprob = -6.5
lm_reference_lang = en
"""
    cfg = CC.parse_corpus_ini(ini)["q"]
    ref_text = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(i, "en", ref_text) for i in range(20)]
        + [(100, "xx", "zxq vbnm qwerty asdf ghjkl zzz yyy www qqq")],
        "doc_id long, lang string, text string",
    )
    out = CC.apply_corpus_pipeline(df, cfg)
    kept = {r.doc_id for r in out.collect()}
    assert 100 not in kept  # gibberish scores under the gate
    assert set(range(20)) <= kept


def test_pipeline_sample_deterministic(spark):
    cfg = CC.parse_corpus_ini("[corpus:s]\nsample_rate = 0.5\n")["s"]
    df = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(400)],
        "doc_id long, lang string, text string",
    )
    a = sorted(r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect())
    b = sorted(r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect())
    assert a == b
    assert 120 <= len(a) <= 280  # ~200 of 400


def test_pipeline_blocklist_gate(spark, tmp_path):
    bl = tmp_path / "bad.txt"
    bl.write_text("# comment line\nfoo\nBAR\n\n")
    cfg = CC.parse_corpus_ini(
        f"[corpus:bl]\nblocklist = {bl}\nkeep_text = true\n"
    )["bl"]
    df = spark.createDataFrame(
        [
            (1, "en", "clean text here"),
            (2, "en", "this has foo inside"),       # hit: foo
            (3, "en", "loud BAR word"),             # hit: bar (ci)
            (4, "en", "foobar is one token"),       # whole-token: no hit
        ],
        "doc_id long, lang string, text string",
    )
    kept = {r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()}
    assert kept == {1, 4}
    # max_hits = 1 tolerates a single distinct word
    cfg.blocklist_max_hits = 1
    kept = {r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()}
    assert kept == {1, 2, 3, 4}


def test_pipeline_minhash_dedup_matches_direct_operators(spark):
    from recordmanager_spark.operators.text_dedup import (
        minhash_near_duplicates,
        near_dup_prune,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, "en", base),
            (2, "en", base + " lambda"),   # near-dup of 1 -> pruned
            (3, "en", "completely different words entirely unrelated"),
        ],
        "doc_id long, lang string, text string",
    )
    cfg = CC.parse_corpus_ini(
        "[corpus:m]\ndedup = minhash\nminhash_threshold = 0.5\n"
    )["m"]
    got = sorted(
        r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()
    )
    pairs = minhash_near_duplicates(df, "doc_id", "text", threshold=0.5)
    want = sorted(
        r.doc_id
        for r in near_dup_prune(df, pairs, id_col="doc_id")
        .where(F.col("keep"))
        .collect()
    )
    assert got == want == [1, 3]


def test_pipeline_decontaminate_ngram_and_bloom(spark):
    doc = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, "en", doc), (2, "en", "totally clean words " * 3)],
        "doc_id long, lang string, text string",
    )
    bench = spark.createDataFrame(
        [(doc,)], "text string"
    )
    for method in ("ngram", "bloom"):
        cfg = CC.parse_corpus_ini(
            "[corpus:d]\ndecontaminate = benchmark\n"
            f"decontaminate_method = {method}\ndecontaminate_ngram = 5\n"
        )["d"]
        out = CC.apply_corpus_pipeline(
            df, cfg, tables={"benchmark": bench}
        )
        kept = {r.doc_id for r in out.collect()}
        assert kept == {2}, method
        assert "contaminated" not in out.columns


def test_pipeline_decontaminate_resolves_catalog_table(spark):
    df = spark.createDataFrame(
        [(1, "en", "aa bb cc dd ee ff gg hh"), (2, "en", "clean doc")],
        "doc_id long, lang string, text string",
    )
    spark.createDataFrame(
        [("aa bb cc dd ee ff gg hh",)], "text string"
    ).createOrReplaceTempView("rm_test_bench_view")
    cfg = CC.parse_corpus_ini(
        "[corpus:d]\ndecontaminate = rm_test_bench_view\n"
        "decontaminate_ngram = 5\n"
    )["d"]
    kept = {r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()}
    assert kept == {2}


def test_pipeline_dsir_stage_matches_direct(spark):
    from recordmanager_spark.operators.dsir import dsir_select

    df = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else "de",
          f"token{i % 7} word{i % 5} common text body") for i in range(60)],
        "doc_id long, lang string, text string",
    )
    cfg = CC.parse_corpus_ini(
        "[corpus:ds]\ndsir_target = en\ndsir_k = 10\ndsir_buckets = 128\n"
    )["ds"]
    got = sorted(
        r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()
    )
    want = sorted(
        r.doc_id
        for r in dsir_select(
            df, df.where(F.col("lang") == "en"), 10, n_buckets=128
        ).collect()
    )
    assert got == want and len(got) == 10


def test_pipeline_lm_gate_null_passthrough(spark):
    """<2-token documents have NULL avg_logprob and must PASS the LM
    gate (length gating belongs to min_tokens) — r8 ADVICE."""
    ini = """
[corpus:q]
lm_min_avg_logprob = -6.5
lm_reference_lang = en
"""
    cfg = CC.parse_corpus_ini(ini)["q"]
    ref_text = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(i, "en", ref_text) for i in range(20)] + [(200, "en", "solo")],
        "doc_id long, lang string, text string",
    )
    kept = {r.doc_id for r in CC.apply_corpus_pipeline(df, cfg).collect()}
    assert 200 in kept


def test_hygiene_stage_strip_html_and_mojibake(spark):
    """Stage 0 rewrites the text column in place before any gate reads
    it: HTML strips to visible text, mojibake repairs, and downstream
    token gates see the CLEANED token counts."""
    from recordmanager_spark.corpus_config import (
        apply_corpus_pipeline,
        parse_corpus_ini,
    )
    from recordmanager_spark.functions.text import MOJIBAKE_MAP

    inv = {g: b for b, g in MOJIBAKE_MAP}
    ini = """
[corpus:clean]
strip_html = true
fix_mojibake = true
min_tokens = 3
keep_text = true
"""
    cfg = parse_corpus_ini(ini)["clean"]
    assert cfg.strip_html and cfg.fix_mojibake
    rows = [
        # 5 visible tokens after stripping; nav text would add 2 more
        (0, "<p>one two three four five</p><script>var x;</script>", "en"),
        # mojibake repairs; 3 tokens pass the gate
        (1, "caf" + inv["é"] + " au lait", "en"),
        # after stripping only 2 tokens remain -> dropped by min_tokens
        (2, "<div>too short</div>", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r["text"]
        for r in apply_corpus_pipeline(df, cfg).collect()
    }
    assert out[0] == "one two three four five"
    assert out[1] == "café au lait"
    assert 2 not in out


def test_hygiene_stage_defaults_off(spark):
    from recordmanager_spark.corpus_config import parse_corpus_ini

    cfg = parse_corpus_ini("[corpus:x]\nmin_tokens = 1\n")["x"]
    assert not cfg.strip_html and not cfg.fix_mojibake
