"""Corpus-level group similarity: the union-sketch identity (min-hash of a
union of shingle sets == element-wise MIN of per-doc min-hashes) and the
pair-level agreement arithmetic, checked against a pure-Python model."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import dedup

SF = "/root/testdata/sf0.001"
K = 6


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip()) if t]


def _py_shingles(text: str, n: int = 3) -> list[str]:
    toks = _py_tokens(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _py_minhash(shingle_set: set[str], seed: int) -> str | None:
    if not shingle_set:
        return None
    return min(
        hashlib.md5(f"{seed}:{s}".encode()).hexdigest() for s in shingle_set
    )


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "source")
        .cache()
    )


def test_union_sketch_matches_python_model(spark, docs):
    """grouped_minhash == min-hash computed directly on the UNION of each
    group's shingle multiset (pure-Python model) — the identity the one-scan
    aggregate relies on."""
    got = {
        r["source"]: [r[f"mh{i}"] for i in range(K)]
        for r in dedup.grouped_minhash(docs, "source", k=K).collect()
    }
    union: dict[str, set[str]] = {}
    for r in docs.select("source", "text").collect():
        union.setdefault(r["source"], set()).update(_py_shingles(r["text"]))
    assert set(got) == set(union)
    for src, shingle_set in union.items():
        want = [_py_minhash(shingle_set, i) for i in range(K)]
        assert got[src] == want, src


def test_pair_agreement_arithmetic(spark, docs):
    """group_similarity's agree / jaccard_ppm columns follow from the
    sketches: agree = #positions equal (NULLs never agree),
    jaccard_ppm = floor(agree * 1e6 / k)."""
    sig = {
        r["source"]: [r[f"mh{i}"] for i in range(K)]
        for r in dedup.grouped_minhash(docs, "source", k=K).collect()
    }
    rows = dedup.group_similarity(docs, "source", k=K).collect()
    srcs = sorted(sig)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        a, b = sig[r["group_a"]], sig[r["group_b"]]
        agree = sum(
            1 for x, y in zip(a, b) if x is not None and x == y
        )
        assert r["group_a"] < r["group_b"]
        assert r["agree"] == agree
        assert r["jaccard_ppm"] == agree * 1_000_000 // K


def test_identical_groups_agree_everywhere(spark):
    """Two groups holding the same texts sketch identically ⇒ full
    agreement; a disjoint third group agrees (almost surely) nowhere."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "g1"),
        (2, "one two three four five six seven", "g1"),
        (3, "alpha beta gamma delta epsilon zeta", "g2"),
        (4, "one two three four five six seven", "g2"),
        (5, "completely different shingle universe here now", "g3"),
    ]
    df = _spark_of_rows(rows)
    got = {
        (r["group_a"], r["group_b"]): (r["agree"], r["jaccard_ppm"])
        for r in dedup.group_similarity(df, "source", k=K).collect()
    }
    assert got[("g1", "g2")] == (K, 1_000_000)
    assert got[("g1", "g3")][0] == 0
    assert got[("g2", "g3")][0] == 0


def _spark_of_rows(rows):
    from anomaly_detection_spark.session import get_spark

    spark = get_spark()
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])
