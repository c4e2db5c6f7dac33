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
    with pytest.raises(ValueError, match="only 'exact'"):
        CC.parse_corpus_ini("[corpus:x]\ndedup = minhash\n")
    with pytest.raises(ValueError, match="cap_n"):
        CC.parse_corpus_ini("[corpus:x]\ncap_group[] = source\n")
    with pytest.raises(ValueError, match="lm_reference_lang"):
        CC.parse_corpus_ini("[corpus:x]\nlm_min_avg_logprob = -9\n")


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
