"""Property tests for the round-9 surface: WARC framing round-trips
arbitrary payloads, mojibake repair is idempotent, HTML stripping never
leaks markup. Pure-python properties run under hypothesis; Spark-side
checks batch many generated rows into ONE job (per-example Spark jobs
would be minutes, not seconds)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from recordmanager_spark.sources.warc import gunzip_members, parse_warc_bytes

PAYLOAD_ALPHABET = (
    string.ascii_letters + string.digits + " \r\n<>/:-—éüß" + "WARC/1.0"
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet=PAYLOAD_ALPHABET, min_size=0, max_size=200),
        min_size=1,
        max_size=8,
    )
)
def test_warc_framing_roundtrips_any_payload(payloads):
    """Whatever the payload contains — including 'WARC/1.0' lines and
    multibyte chars — framed records parse back exactly, in order."""
    blob = b""
    for i, p in enumerate(payloads):
        body = p.encode("utf-8")
        blob += (
            f"WARC/1.0\r\nWARC-Type: resource\r\n"
            f"WARC-Target-URI: u{i}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    rows = parse_warc_bytes("f", blob)
    assert [(r[4], r[8]) for r in rows] == [
        (f"u{i}", p) for i, p in enumerate(payloads)
    ]


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=500), st.integers(1, 4))
def test_gunzip_members_roundtrips(data, n_members):
    import gzip

    chunks = [data[i::n_members] for i in range(n_members)]
    blob = b"".join(gzip.compress(c) for c in chunks)
    assert gunzip_members(blob) == b"".join(chunks)


def _random_mojibake_texts(n=300, seed=9):
    from recordmanager_spark.functions.text import MOJIBAKE_MAP

    rng = random.Random(seed)
    pieces = [b for b, _ in MOJIBAKE_MAP] + list(string.printable[:70])
    return [
        "".join(rng.choice(pieces) for _ in range(rng.randint(0, 30)))
        for _ in range(n)
    ]


def test_mojibake_fix_idempotent_on_random_soup(spark):
    """One Spark job over 300 generated corruption soups: repairing a
    repaired string changes nothing, and the Spark fold equals the
    python fold."""
    from pyspark.sql import functions as F

    from recordmanager_spark.functions.text import MOJIBAKE_MAP, fix_mojibake

    texts = _random_mojibake_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    out = df.select(
        "i",
        fix_mojibake("t").alias("once"),
        fix_mojibake(fix_mojibake("t")).alias("twice"),
    ).collect()

    def pyfix(s):
        for a, b in MOJIBAKE_MAP:
            s = s.replace(a, b)
        return s

    for r in out:
        assert r["once"] == r["twice"], texts[r["i"]]
        assert r["once"] == pyfix(texts[r["i"]])


def test_html_strip_never_leaks_tags(spark):
    """One Spark job over generated tag soups: html_to_text output
    contains no '<' unless the soup spelled it as an entity."""
    from recordmanager_spark.functions.html import html_to_text

    rng = random.Random(10)
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br/>", "text ",
        "words here ", "<script>bad()</script>", "<!-- c -->",
        "<a href='u'>link</a>", "<b>", "</b>", "<title>t</title>",
    ]
    soups = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 25)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(soups)], ["i", "s"]
    )
    for r in df.select("i", html_to_text("s").alias("t")).collect():
        assert "<" not in r["t"] and ">" not in r["t"], soups[r["i"]]
        assert "bad()" not in r["t"]
