"""Mojibake repair: map derivation, fold semantics, Spark parity with a
pure-python fold, and idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from recordmanager_spark.functions.text import (
    MOJIBAKE_MAP,
    fix_mojibake,
    has_mojibake,
)


def _py_fix(s: str) -> str:
    for bad, good in MOJIBAKE_MAP:
        s = s.replace(bad, good)
    return s


def test_map_longest_first():
    lens = [len(bad) for bad, _ in MOJIBAKE_MAP]
    assert lens == sorted(lens, reverse=True)
    # every 3-byte corruption precedes every 2-byte one, so curly-quote
    # forms never get half-eaten by their 2-char prefixes
    assert all(l in (2, 3) for l in lens)


def test_map_roundtrip_is_utf8_as_cp1252():
    for bad, good in MOJIBAKE_MAP:
        # re-encoding the corruption byte-per-char recovers the utf-8
        enc = b"".join(
            ch.encode("cp1252") if ord(ch) not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else bytes([ord(ch)])
            for ch in bad
        )
        assert enc.decode("utf-8") == good


def test_spark_fix_matches_python(spark):
    cases = [
        "Caf" + _c("é") + " " + _c("—") + " na" + _c("ï") + "ve",
        _c("“") + "quoted" + _c("”") + " and " + _c("’") + "apostrophe",
        "clean ascii text stays",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], ["i", "s"])
    out = {
        r["i"]: (r["fixed"], r["flag"])
        for r in df.select(
            "i",
            fix_mojibake("s").alias("fixed"),
            has_mojibake("s").alias("flag"),
        ).collect()
    }
    for i, s in enumerate(cases):
        assert out[i][0] == _py_fix(s)
        assert out[i][1] == (s != _py_fix(s))


def test_fix_is_idempotent(spark):
    s = "Caf" + _c("é") + _c("…") + _c("ü") + "ber"
    df = spark.createDataFrame([(s,)], ["s"])
    once = df.select(fix_mojibake("s").alias("f"))
    twice = once.select(fix_mojibake("f").alias("f"))
    assert once.collect()[0]["f"] == twice.collect()[0]["f"]


def _c(good: str) -> str:
    """The corrupted form of a repaired character, from the map."""
    inv = {g: b for b, g in MOJIBAKE_MAP}
    return inv[good]
