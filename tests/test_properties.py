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
    out = _eval(spark, K.strip_trailing_punctuation, values)
    again = _eval(spark, K.strip_trailing_punctuation, out)
    for o, o2 in zip(out, again):
        assert o2 == o  # idempotent
        assert not o.endswith((" ", "/", ";", ",", "=", ":"))
