"""Sequence packing, source mixing, stratified sampling.

Each operator is checked against the obvious sequential Python model:
lay documents end-to-end per shard and cut every `budget` tokens;
repeat each doc floor(w) (+1 for the deterministic fractional slice);
keep iff unit_hash < rate.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from recordmanager_spark.operators import packing as PK


def _unit(salt: str, key) -> float:
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:8], 16) / 2**32


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, i % 3, 10 + (i * 7) % 90) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")


def test_pack_sequences_model(spark, docs):
    out = {
        r["doc_id"]: r
        for r in PK.pack_sequences(
            docs, id_col="doc_id", tokens_col="n_tokens", budget=100,
            shard_col="shard",
        ).collect()
    }
    # sequential model per shard
    rows = sorted(docs.collect(), key=lambda r: (r["shard"], r["doc_id"]))
    cum: dict[int, int] = {}
    for r in rows:
        before = cum.get(r["shard"], 0)
        cum[r["shard"]] = before + r["n_tokens"]
        got = out[r["doc_id"]]
        assert got["pack_offset"] == before
        assert got["bin_start"] == before // 100
        assert got["bin_end"] == (before + max(r["n_tokens"], 1) - 1) // 100
        assert got["n_bins"] == got["bin_end"] - got["bin_start"] + 1


def test_pack_sequences_bins_are_dense(spark, docs):
    out = PK.pack_sequences(
        docs, id_col="doc_id", tokens_col="n_tokens", budget=100,
        shard_col="shard",
    )
    # every bin from 0..max must be touched by some document (the stream
    # has no holes) and no document may claim more tokens than it spans
    per_shard = (
        out.groupBy("shard")
        .agg(
            F.max("bin_end").alias("hi"),
            F.count_distinct("bin_start").alias("starts"),
            F.sum("n_tokens").alias("total"),
        )
        .collect()
    )
    for r in per_shard:
        assert r["hi"] == (r["total"] - 1) // 100


def test_pack_sequences_zero_token_doc(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 100), (3, 0)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in PK.pack_sequences(
            df, id_col="doc_id", tokens_col="n_tokens", budget=100
        ).collect()
    }
    # zero-token docs occupy no span: start == end, and the following doc
    # starts where the previous real doc ended
    assert out[1]["n_bins"] == 1 and out[1]["bin_start"] == out[1]["bin_end"]
    assert out[2]["pack_offset"] == 0
    assert out[3]["pack_offset"] == 100
    assert out[3]["bin_start"] == 1


def test_mix_sources_model(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    out = PK.mix_sources(
        df, {"a": 2.5, "b": 0.25}, source_col="source", id_col="doc_id",
        salt="t",
    ).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["rep"])
    for i in range(100):
        w = 2.5 if i % 2 == 0 else 0.25
        expect = int(w) + (1 if _unit("t", i) < w - int(w) else 0)
        got = sorted(by_doc.get(i, []))
        assert got == list(range(expect)), (i, w, got)


def test_stratified_sample_model(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fi") for i in range(200)],
        "doc_id long, lang string",
    )
    kept = {
        r["doc_id"]
        for r in PK.stratified_sample(
            df, {"en": 0.5}, stratum_col="lang", id_col="doc_id", salt="s"
        ).collect()
    }
    for i in range(200):
        rate = 0.5 if i % 2 == 0 else 1.0
        assert (i in kept) == (_unit("s", i) < rate)


def test_stratified_sample_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id long, lang string"
    )
    a = PK.stratified_sample(df, {"en": 0.37}, id_col="doc_id")
    b = PK.stratified_sample(df.repartition(7), {"en": 0.37}, id_col="doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_temperature_mix_flattens(spark):
    """τ>1 upsamples the minority source and downsamples the majority;
    τ=1 is (expected-value) passthrough; repeats are deterministic."""
    from recordmanager_spark.operators import packing as PK

    rows = [(f"d{i}", "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = PK.temperature_mix(
        df, source_col="source", id_col="doc_id", temperature=2.0
    )
    by_src = {
        r.source: r.n
        for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    # flattened shares: sqrt(.9)=.9487, sqrt(.1)=.3162 -> z=1.2649
    # big: .75*100/90=.833 epochs, small: .25*100/10=2.5 epochs
    assert by_src["small"] > 10  # upsampled
    assert by_src["big"] < 90  # downsampled
    # expected totals: big ~75, small ~25 (within Bernoulli slack)
    assert 60 <= by_src["big"] <= 90
    assert 20 <= by_src["small"] <= 30
    # deterministic
    again = PK.temperature_mix(
        df, source_col="source", id_col="doc_id", temperature=2.0
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_temperature_one_is_proportional(spark):
    from recordmanager_spark.operators import packing as PK

    rows = [(f"d{i}", "a" if i < 7 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = PK.temperature_mix(
        df, source_col="source", id_col="doc_id", temperature=1.0
    )
    # τ=1 -> every weight is exactly 1.0 -> identity with rep=0
    got = sorted((r.doc_id, r.rep) for r in out.collect())
    assert got == sorted((f"d{i}", 0) for i in range(10))


def test_quality_buckets_per_group(spark):
    """Head/middle/tail by per-group exact percentiles: 9 docs per lang
    split 3/3/3; groups bucket independently."""
    from recordmanager_spark.operators import packing as PK

    rows = [(f"{lang}{i}", lang, float(i)) for lang in ("en", "fi") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, score double")
    out = {r.doc_id: r.bucket for r in PK.quality_buckets(df, "score").collect()}
    for lang in ("en", "fi"):
        assert [out[f"{lang}{i}"] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )


def test_quality_buckets_approx_exact_parity(spark):
    """The production approx path and the oracle exact path assign the
    same buckets on a seeded corpus, except possibly documents whose
    score falls inside the sketch's rank-error band around a cut
    (bounded here at 2%)."""
    from recordmanager_spark.operators import packing as PK

    rows = [
        (f"d{i}", ["en", "en", "en", "fi", "sv"][i % 5], None)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, score double"
    ).withColumn("score", PK.perplexity_score_stub("doc_id", salt="parity"))
    exact = {
        r.doc_id: r.bucket
        for r in PK.quality_buckets(df, "score", approach="exact").collect()
    }
    approx = {
        r.doc_id: r.bucket
        for r in PK.quality_buckets(df, "score", approach="approx").collect()
    }
    assert set(exact) == set(approx)
    mismatches = sum(1 for k in exact if exact[k] != approx[k])
    assert mismatches <= 0.02 * len(exact), mismatches


def test_quality_buckets_null_group(spark):
    """NULL group values bucket against the NULL group's own
    percentiles (null-safe threshold join), not silently into tail."""
    from recordmanager_spark.operators import packing as PK

    rows = [(f"n{i}", None, float(i)) for i in range(9)] + [
        (f"e{i}", "en", float(i)) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, score double")
    for approach in ("exact", "approx"):
        out = {
            r.doc_id: r.bucket
            for r in PK.quality_buckets(
                df, "score", approach=approach
            ).collect()
        }
        for pre in ("n", "e"):
            assert [out[f"{pre}{i}"] for i in range(9)] == (
                ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
            ), (approach, pre)


def test_quality_buckets_bad_approach(spark):
    import pytest

    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame([("a", "en", 0.5)], "doc_id string, lang string, score double")
    with pytest.raises(ValueError):
        PK.quality_buckets(df, "score", approach="histogram")


def test_perplexity_stub_deterministic(spark):
    from pyspark.sql import functions as F

    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "t string")
    got = [r.s for r in df.select(PK.perplexity_score_stub("t").alias("s")).collect()]
    assert got[0] == got[2] and 0.0 <= got[0] < 1.0 and got[0] != got[1]


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunks tile the document with the requested overlap: dropping
    each chunk's first `overlap` chars (after the first) reconstructs
    the text exactly, starts advance by the stride, and the final chunk
    reaches the end of the document."""
    from recordmanager_spark.operators import packing as PK

    text = "".join(chr(ord("a") + i % 26) for i in range(100))
    df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    rows = sorted(
        (r.chunk_idx, r.chunk_start, r.chunk_text)
        for r in PK.chunk_documents(
            df, chunk_chars=30, overlap=10
        ).collect()
    )
    assert [r[0] for r in rows] == list(range(len(rows)))
    assert [r[1] for r in rows] == [1 + 20 * i for i in range(len(rows))]
    rebuilt = rows[0][2] + "".join(t[10:] for _, _, t in rows[1:])
    assert rebuilt == text
    # every chunk except the last is full-size; the last reaches the end
    assert all(len(t) == 30 for _, _, t in rows[:-1])
    last_idx, last_start, last_text = rows[-1]
    assert last_start + len(last_text) - 1 == len(text)


def test_chunk_documents_short_and_empty(spark):
    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame(
        [("short", "tiny"), ("empty", ""), ("null", None)],
        "doc_id string, text string",
    )
    rows = {
        r.doc_id: (r.chunk_idx, r.chunk_text)
        for r in PK.chunk_documents(df, chunk_chars=30, overlap=10).collect()
    }
    assert rows == {
        "short": (0, "tiny"),
        "empty": (0, ""),
        "null": (0, ""),
    }


def test_chunk_documents_exact_boundary(spark):
    """A document exactly chunk_chars long yields ONE chunk (no trailing
    empty chunk), and one char over yields two."""
    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame(
        [("exact", "x" * 30), ("over", "y" * 31)], "doc_id string, text string"
    )
    got = {}
    for r in PK.chunk_documents(df, chunk_chars=30, overlap=10).collect():
        got.setdefault(r.doc_id, []).append(r.chunk_text)
    assert got["exact"] == ["x" * 30]
    assert sorted(got["over"], key=len, reverse=True) == ["y" * 30, "y" * 11]


def test_chunk_documents_bad_overlap(spark):
    import pytest

    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame([("a", "t")], "doc_id string, text string")
    with pytest.raises(ValueError):
        PK.chunk_documents(df, chunk_chars=10, overlap=10)


def test_train_val_test_split_properties(spark):
    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    out = PK.train_val_test_split(df, fractions=(0.75, 0.125, 0.125))
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    assert set(counts) == {"train", "val", "test"}
    # hash-uniform: proportions within a loose tolerance
    assert abs(counts["train"] / 2000 - 0.75) < 0.05
    # deterministic and stable under incremental rerun: a subset keeps
    # its assignments
    sub = PK.train_val_test_split(
        df.where("doc_id < 500"), fractions=(0.75, 0.125, 0.125)
    )
    full = {r.doc_id: r.split for r in out.collect()}
    assert all(full[r.doc_id] == r.split for r in sub.collect())


def test_train_val_test_split_validation(spark):
    import pytest

    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        PK.train_val_test_split(df, fractions=(0.5, 0.4))  # sums to 0.9
    with pytest.raises(ValueError):
        PK.train_val_test_split(df, fractions=(0.5, 0.5), labels=("a",))


def test_corpus_token_stats(spark):
    from pyspark.sql import functions as F

    from recordmanager_spark.operators import packing as PK

    df = spark.createDataFrame(
        [
            ("s1", "en", "a bb ccc"),
            ("s1", "en", "dddd eeeee"),
            ("s1", "de", ""),
            ("s2", "en", "one two three four"),
        ],
        "source string, lang string, text string",
    )
    rows = {(r.source, r.lang): r for r in PK.corpus_token_stats(df).collect()}
    en = rows[("s1", "en")]
    assert en.n_docs == 2 and en.ws_tokens == 5
    # bpe-ish: a(1) bb(1) ccc(1) dddd(1) eeeee(2) = 6
    assert en.bpe_ish_tokens == 6
    assert en.mean_doc_tokens == 2.5
    de = rows[("s1", "de")]
    assert de.ws_tokens == 0 and de.token_share == 0.0
    total = sum(r.ws_tokens for r in rows.values())
    assert abs(sum(r.token_share for r in rows.values()) - 1.0) < 1e-4
    assert total == 9


def test_cap_per_group_semantics(spark):
    """Under-cap groups keep every row exactly; over-cap groups thin to
    ~cap deterministically (rerun-identical); survivors are a subset."""
    from recordmanager_spark.operators.packing import cap_per_group

    rows = [(i, "big" if i < 400 else "small") for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = cap_per_group(df, ["grp"], cap=50, id_col="doc_id")
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in out.collect())
    assert a == b  # deterministic
    small = [i for i in a if i >= 400]
    assert small == list(range(400, 440))  # under-cap: exact keep
    big = [i for i in a if i < 400]
    # expected 50 of 400; binomial(400, 1/8) stays inside [20, 90]
    # with overwhelming probability, and the value is FIXED by md5
    assert 20 <= len(big) <= 90, len(big)
    assert set(big) <= set(range(400))


def test_cap_per_group_plan_shape(spark):
    """Census join-back: co-partitioned shuffle-hash join (no broadcast
    of the corpus-sized census), no window, bounded aggregation state."""
    from recordmanager_spark.operators.packing import cap_per_group
    from tools.plan_audit import unique_exchange_count

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    out = cap_per_group(df, ["grp"], cap=10, id_col="doc_id")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" not in plan  # census must never broadcast
    assert unique_exchange_count(out) <= 2


def test_shard_manifest_detects_membership_change(spark):
    """The manifest's bit-XOR content hash is order-insensitive and
    flips iff a shard's membership changes — the diffable re-run
    contract shuffle_shards documents."""
    from recordmanager_spark.operators.packing import shard_manifest

    rows = [(i, 10 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    m1 = {r["shard"]: r for r in shard_manifest(
        df, "doc_id", 4, seed="7", tokens_col="n_tokens").collect()}
    # order-insensitive: a reversed/replayed input gives byte-equal rows
    m2 = {r["shard"]: r for r in shard_manifest(
        spark.createDataFrame(list(reversed(rows)),
                              "doc_id long, n_tokens long"),
        "doc_id", 4, seed="7", tokens_col="n_tokens").collect()}
    assert m1 == m2
    assert sum(r["n_docs"] for r in m1.values()) == 50
    assert sum(r["n_tokens"] for r in m1.values()) == sum(t for _, t in rows)
    # dropping one doc changes exactly its shard's row
    df2 = df.where("doc_id <> 13")
    m3 = {r["shard"]: r for r in shard_manifest(
        df2, "doc_id", 4, seed="7", tokens_col="n_tokens").collect()}
    changed = [s for s in m1 if m1[s] != m3.get(s)]
    assert len(changed) == 1
    s = changed[0]
    assert m3[s]["n_docs"] == m1[s]["n_docs"] - 1
    assert m3[s]["content_hash"] != m1[s]["content_hash"]
    # different seed reshuffles -> different manifest
    m4 = {r["shard"]: r for r in shard_manifest(
        df, "doc_id", 4, seed="8", tokens_col="n_tokens").collect()}
    assert m4 != m1
