"""Hyperplane-LSH bucketing + multi-probe ANN: determinism and the recall
property multi-probe exists for (Hamming-1 neighbours become reachable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def buckets(emb):
    return {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }


def test_bucket_assignment_deterministic(emb, buckets):
    again = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }
    assert again == buckets
    assert all(len(b) == 8 and set(b) <= {"0", "1"} for b in buckets.values())


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_multiprobe_covers_hamming1_neighbours(emb, buckets):
    """Single-bucket LSH only pairs identical buckets; multi-probe must also
    pair every (query, candidate) whose buckets differ in exactly one bit —
    and nothing beyond Hamming distance 1."""
    big_k = 10_000  # no top-k truncation: observe the full candidate sets
    with_b = emb.select(
        "vec_id", "embedding",
        similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("label"),
    )
    single = _pairs(similarity.ivf_topk(with_b, k=big_k, bucket_col="label"))
    multi = _pairs(similarity.lsh_multiprobe_topk(emb, k=big_k))

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert single <= multi  # own-bucket candidates always survive
    gained = multi - single
    assert gained, "fixture should contain Hamming-1 bucket pairs"
    assert all(ham(buckets[q], buckets[n]) == 1 for q, n in gained)
    missed = {
        (q, n)
        for q in buckets for n in buckets
        if q != n and ham(buckets[q], buckets[n]) == 1
    }
    assert missed == gained  # every Hamming-1 pair is probed, none skipped
