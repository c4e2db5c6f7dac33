from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from recordmanager_spark.operators import similarity as SIM

VECS = [
    Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
    Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),
    Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
    Row(vec_id=3, embedding=[0.0, 0.0, 1.0]),
    Row(vec_id=4, embedding=[-1.0, 0.0, 0.0]),
]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_knn_bruteforce_matches_numpy(spark):
    df = spark.createDataFrame(VECS)
    q = df.where("vec_id = 0")
    out = SIM.knn_bruteforce(df, q, k=2).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2]
    expected = round(_cos([1, 0, 0], [0.9, 0.1, 0.0]), 6)
    assert out[0]["cosine"] == pytest.approx(expected, abs=1e-6)
    assert [r["rank"] for r in out] == [1, 2]


def test_knn_lsh_subset_of_exact_scores(spark):
    df = spark.createDataFrame(VECS)
    q = df.where("vec_id = 0")
    approx = SIM.knn_lsh(df, q, k=3, num_planes=2).collect()
    # every returned neighbor must carry the exact cosine score
    for r in approx:
        truth = _cos(VECS[0].embedding, VECS[r["neighbor_id"]].embedding)
        assert r["cosine"] == pytest.approx(round(truth, 6), abs=1e-6)


def test_embedding_near_duplicates(spark):
    df = spark.createDataFrame(VECS)
    out = SIM.embedding_near_duplicates(df, threshold=0.95, num_planes=1)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # 0 and 1 are nearly parallel; orthogonal/opposite pairs excluded
    assert pairs <= {(0, 1)}
