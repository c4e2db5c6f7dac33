"""FFD whole-document bin packing: budget respected, FFD quality,
determinism across partitionings, oversize flagging."""

from __future__ import annotations

from recordmanager_spark.operators.packing import pack_bins_ffd


def _pack(spark, rows, budget, shards=1, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    if parts:
        df = df.repartition(parts)
    return pack_bins_ffd(
        df, budget=budget, num_shards=shards
    ).collect()


def test_no_bin_exceeds_budget_and_docs_stay_whole(spark):
    rows = [(i, 10 + (i * 37) % 200) for i in range(60)]
    out = _pack(spark, rows, budget=256, shards=4)
    assert len(out) == 60  # every doc exactly once
    fills = {}
    for r in out:
        fills.setdefault(r["bin_id"], 0)
        fills[r["bin_id"]] += r["n_tokens"]
        assert not r["oversize"]
    for b, f in fills.items():
        assert f <= 256, (b, f)
    # bin_fill column agrees with the recomputed fill
    for r in out:
        assert r["bin_fill"] == fills[r["bin_id"]]


def test_ffd_packs_tightly(spark):
    # 6 docs of 100 + 6 of 150 into budget 250 -> FFD pairs them: 6 bins
    rows = [(i, 150) for i in range(6)] + [(10 + i, 100) for i in range(6)]
    out = _pack(spark, rows, budget=250)
    bins = {r["bin_id"] for r in out}
    assert len(bins) == 6
    assert all(r["bin_fill"] == 250 for r in out)


def test_oversize_gets_own_bin(spark):
    out = _pack(spark, [(1, 5000), (2, 100), (3, 100)], budget=1024)
    big = next(r for r in out if r["id"] == 1)
    assert big["oversize"] and big["bin_fill"] == 5000
    others = [r for r in out if r["id"] != 1]
    assert all(r["bin_id"] != big["bin_id"] for r in others)


def test_deterministic_across_partitionings(spark):
    rows = [(i, 10 + (i * 53) % 300) for i in range(80)]
    a = sorted(map(tuple, _pack(spark, rows, budget=512, shards=8)))
    b = sorted(map(tuple, _pack(spark, rows, budget=512, shards=8, parts=7)))
    assert a == b
