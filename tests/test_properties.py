"""Property-based tests (hypothesis) for the scalar key functions.

One Spark round-trip per test: hypothesis generates a BATCH of inputs
inside an inner function, the batch evaluates in a single DataFrame pass,
and per-example invariants check against independent Python models.
Inputs stay ASCII where regex semantics are involved (PCRE/Java parity —
the reference's patterns are ASCII-\\w).
"""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from recordmanager_spark.functions import keys as K

_BATCH = st.lists(st.text(string.printable, max_size=60), min_size=1, max_size=60)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r.o for r in df.select(col_fn(F.col("v")).alias("o")).collect()]


def _isbn10_check(digits9: str) -> str:
    s = sum(int(d) * (10 - i) for i, d in enumerate(digits9))
    r = (11 - s % 11) % 11
    return "X" if r == 10 else str(r)


def _isbn13_check(digits12: str) -> str:
    s = sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(digits12))
    return str((10 - s % 10) % 10)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(string.digits, min_size=9, max_size=9), min_size=1, max_size=40))
def test_isbn10_upgrade_roundtrip(spark, bodies):
    """Any valid ISBN-10 upgrades to the valid 978 ISBN-13."""
    isbns = [b + _isbn10_check(b) for b in bodies]
    out = _eval(spark, K.normalize_isbn, isbns)
    for b, o in zip(bodies, out):
        assert o == "978" + b + _isbn13_check("978" + b)
        assert len(o) == 13 and o.isdigit()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(string.digits, min_size=9, max_size=9), min_size=1, max_size=40))
def test_isbn10_bad_check_digit_rejected(spark, bodies):
    isbns = []
    for b in bodies:
        good = _isbn10_check(b)
        bad = "0" if good != "0" else "1"
        isbns.append(b + bad)
    out = _eval(spark, K.normalize_isbn, isbns)
    assert all(o == "" for o in out)


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_normalize_key_idempotent_and_clean(spark, values):
    out = _eval(spark, K.normalize_key, values)
    again = _eval(spark, K.normalize_key, out)
    for o, o2 in zip(out, again):
        assert o2 == o  # idempotent
        # no ASCII punctuation/space/control survives
        assert not any(ch in o for ch in string.punctuation + string.whitespace)
        assert o == o.lower()


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_title_key_prefix_bounds(spark, values):
    """createTitleKey accumulation: the crossing word is kept, so the key
    is bounded by 35 chars + one word, and by 4 long words' worth."""
    out = _eval(spark, K.title_key_prefix, values)
    for v, o in zip(values, out):
        words = v.split(" ")
        assert o == "".join(words) or len(o) <= 35 + max(len(w) for w in words)
        # prefix property: the key is a concatenation of the first words
        acc = ""
        for w in words:
            if acc == o:
                break
            acc += w
        assert acc == o or o == ""


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(string.ascii_letters + string.digits, max_size=20), min_size=1, max_size=40))
def test_id_sort_key_parity(spark, values):
    """PCRE ^\\w*(\\d+)$ greedy quirk: ids ending in a digit yield the LAST
    digit; everything else passes through unchanged."""
    out = _eval(spark, K.create_id_sort_key, values)
    for v, o in zip(values, out):
        if v and v[-1].isdigit():
            assert o == v[-1]
        else:
            assert o == v


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_strip_trailing_punctuation_stable(spark, values):
    """Reference semantics are NOT idempotent (rtrim runs before the
    period rule, which can expose more strippable chars: '(.' -> '('
    -> ''). The honest invariants: only a suffix is ever removed, the
    rtrim set never terminates the output unless the period rule exposed
    it, and clean strings pass through unchanged."""
    out = _eval(spark, K.strip_trailing_punctuation, values)
    again = _eval(spark, K.strip_trailing_punctuation, out)
    for v, o, o2 in zip(values, out, again):
        assert v.startswith(o)  # only a suffix removed
        assert o.startswith(o2)
        # no trailing rtrim-set char unless a later single-char removal
        # (period rule / unbalanced-bracket drop) exposed it
        if not any(v.startswith(o + ch) for ch in (".", ")", "]")):
            assert not o.endswith((" ", "/", ";", ",", "=", ":", "(", "[")), (v, o)
    clean = ["abc", "Smith, A.", "x9"]
    assert _eval(spark, K.strip_trailing_punctuation, clean) == clean


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_strip_leading_punctuation_stable(spark, values):
    # Full reference set (MetadataUtils.php:650): " \t\\#*!¡?/:;.,=(['\"´`” ̈"
    lead = (
        " ", "\t", "\\", "#", "*", "!", "¡", "?", "/", ":", ";", ".", ",",
        "=", "(", "[", "'", '"', "´", "`", "”", "̈",
    )
    out = _eval(spark, K.strip_leading_punctuation, values)
    again = _eval(spark, K.strip_leading_punctuation, out)
    for v, o, o2 in zip(values, out, again):
        assert o2 == o  # idempotent
        # preservePunctuationOnly: an all-punctuation string survives whole
        if all(ch in lead for ch in v):
            assert o == v
        else:
            assert not o.startswith(lead)
            # only a prefix is ever removed
            assert v.endswith(o)


def _strip_article_model(s):
    for art in K.ARTICLES:
        if s.startswith(art):
            return s[len(art):]
    return s


def _strip_punct_model(s):
    """stripPunctuation: punct runs -> one space, PHP trim, preserve the
    original when nothing remains (MetadataUtils.php:535-560)."""
    import unicodedata

    out = []
    for ch in s:
        if ch in "\t=´`” " or unicodedata.category(ch).startswith("P"):
            if out and out[-1] == " ":
                continue
            out.append(" ")
        else:
            out.append(ch)
    r = "".join(out).strip(" \t\n\r\0\x0b")
    return s if r == "" else r


def _sort_title_model(v):
    """Python mirror of createSortTitle (MetadataUtils.php:698-711): strip
    the first matching article from the lowercased string, collapse
    punctuation (preserving punctuation-only strings whole), re-strip the
    article if the collapse changed the first character."""
    s = _strip_article_model(v.lower())
    start = s[:1]
    p = _strip_punct_model(s)
    if p[:1] != start:
        p = _strip_article_model(p)
    return p


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_create_sort_title_canonical(spark, values):
    """Sort titles are lowercase and match the reference model exactly
    (the model subsumes canonical-form claims: collapse + PHP trim, except
    on the preserve-punctuation-only path where the input survives whole)."""
    out = _eval(spark, K.create_sort_title, values)
    for v, o in zip(values, out):
        assert o == o.lower()
        assert o == _sort_title_model(v), (v, o)


@settings(max_examples=15, deadline=None)
@given(_BATCH)
def test_fingerprint_normalization_invariants(spark, values):
    """The dedup fingerprint ignores case, punctuation, and whitespace
    runs — the equivalence classes exact-dup dedup is defined over."""
    from recordmanager_spark.functions import text as TX

    out = _eval(spark, TX.normalize_for_fingerprint, values)
    noisy = [("  " + v.upper().replace(" ", "   ") + " !!") for v in values]
    out_noisy = _eval(spark, TX.normalize_for_fingerprint, noisy)
    again = _eval(spark, TX.normalize_for_fingerprint, out)
    for o, on, o2 in zip(out, out_noisy, again):
        assert on == o  # case/whitespace/trailing-punct invariant
        assert o2 == o  # idempotent
        assert "  " not in o and o == o.strip()


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.text(string.ascii_letters, min_size=1, max_size=8), max_size=8),
        min_size=1,
        max_size=20,
    )
)
def test_array_iunique_case_insensitive_distinct(spark, arrays):
    """array_iunique: first-occurrence order, case-insensitively unique
    (MetadataUtils.php:721-740)."""
    df = spark.createDataFrame([(a,) for a in arrays], "v array<string>")
    out = [r.o for r in df.select(K.array_iunique(F.col("v")).alias("o")).collect()]
    for a, o in zip(arrays, out):
        seen, model = set(), []
        for x in a:
            if x.lower() not in seen:
                seen.add(x.lower())
                model.append(x)
        assert o == model


_WORD = st.text(string.ascii_lowercase, min_size=1, max_size=5)
_DOC = st.lists(_WORD, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=12))
def test_exact_substring_dedup_invariants(spark, docs):
    """removed + kept = n_tokens; cleaned text has exactly kept tokens;
    never removes more than exists; duplicated whole-doc pairs with
    >= window tokens lose their entire span."""
    from recordmanager_spark.operators.substring_dedup import (
        exact_substring_dedup,
    )

    rows = [(f"d{i}", t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = exact_substring_dedup(df, window=3).collect()
    by_id = {r.doc_id: r for r in out}
    for i, t in enumerate(docs):
        r = by_id[f"d{i}"]
        toks = [x for x in t.split() if x]
        assert r.n_tokens == len(toks)
        assert r.removed_tokens + r.kept_tokens == r.n_tokens
        assert 0 <= r.removed_tokens <= r.n_tokens
        cleaned = [x for x in r.cleaned_text.split() if x]
        assert len(cleaned) == r.kept_tokens
        # kept tokens are a subsequence of the original
        it = iter(toks)
        assert all(any(x == y for y in it) for x in cleaned)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "fi", "zh"]), st.integers(0, 10**6)),
        min_size=3,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
def test_quality_buckets_invariants(spark, rows):
    """Every row lands in exactly one bucket; per group, head count is
    within one of n/3 when scores are distinct; buckets are monotone in
    score within a group."""
    from recordmanager_spark.operators.packing import quality_buckets

    data = [(f"d{i}", lang, float(sc)) for i, (lang, sc) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id string, lang string, score double")
    out = quality_buckets(df, "score").collect()
    assert len(out) == len(data)
    by_lang: dict = {}
    for r in out:
        assert r.bucket in ("head", "middle", "tail")
        by_lang.setdefault(r.lang, []).append((r.score, r.bucket))
    order = {"head": 0, "middle": 1, "tail": 2}
    for members in by_lang.values():
        members.sort()
        labels = [order[b] for _, b in members]
        assert labels == sorted(labels)  # monotone in score
        n = len(members)
        heads = labels.count(0)
        import math

        assert abs(heads - n / 3) <= 1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            string.ascii_lowercase + "     ", min_size=0, max_size=80
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lm_logprob_invariants(spark, texts):
    """Hashed-LM scoring invariants on arbitrary whitespace-y text:
    n_scored = tokens - 1 (NULL under two tokens), avg_logprob is a
    finite negative log-probability, and scoring is insensitive to
    case and surrounding whitespace (tokenization lowercases+trims)."""
    import math as _m

    from recordmanager_spark.operators import lm_score as LM

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(5)],
        "doc_id long, text string",
    )
    model = LM.train_hash_lm(ref, "text", b1=64, b2=256)
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in LM.lm_logprob(df, model).collect()}
    up = spark.createDataFrame(
        [(i, f"  {t.upper()} ") for i, t in rows], "doc_id long, text string"
    )
    out_up = {r.doc_id: r for r in LM.lm_logprob(up, model).collect()}
    for i, t in rows:
        n_toks = len([w for w in t.split() if w])
        if n_toks < 2:
            assert out[i].avg_logprob is None and out[i].n_scored is None
        else:
            assert out[i].n_scored == n_toks - 1
            assert out[i].avg_logprob < 0
            assert _m.isfinite(out[i].avg_logprob)
        assert out_up[i].avg_logprob == out[i].avg_logprob


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=30),
)
def test_cap_per_group_invariants(spark, groups, cap):
    """cap_per_group on arbitrary group layouts: under-cap groups keep
    every row; survivors are always a subset; deterministic."""
    from collections import Counter

    from recordmanager_spark.operators.packing import cap_per_group

    rows = [(i, f"g{g}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sorted(r.doc_id for r in cap_per_group(df, ["grp"], cap).collect())
    out2 = sorted(r.doc_id for r in cap_per_group(df, ["grp"], cap).collect())
    assert out == out2
    sizes = Counter(g for _, g in ((i, f"g{g}") for i, g in enumerate(groups)))
    kept = Counter()
    all_ids = set(i for i, _ in rows)
    for i in out:
        assert i in all_ids
        kept[f"g{groups[i]}"] += 1
    for g, n in sizes.items():
        if n <= cap:
            assert kept[g] == n, (g, n, kept[g])
        else:
            assert 0 < kept[g] <= n
