"""k-anonymity / l-diversity profiles (functions/privacy.py), Gumbel-top-k
weighted resampling (scoring.gumbel_topk_resample), and cross-document
repeated n-grams (repetition.corpus_dup_ngrams): planted fixtures with
exactly-known answers plus pure-Python model parity."""

from __future__ import annotations

import hashlib
import math
import random

from anomaly_detection_spark.functions.privacy import (
    k_anonymity_profile, l_diversity_profile)
from anomaly_detection_spark.functions.repetition import corpus_dup_ngrams
from anomaly_detection_spark.functions.scoring import gumbel_topk_resample


# ---------------------------------------------------------------------
# k-anonymity / l-diversity
# ---------------------------------------------------------------------

def test_k_anonymity_bands_exact(spark):
    # QI class sizes: a=1 (unique), b=3 (small, k=5), c=7 (anonymous).
    rows = [("a",)] * 1 + [("b",)] * 3 + [("c",)] * 7
    df = spark.createDataFrame(rows, "qi string")
    got = {r["k_band"]: (r["n_classes"], r["n_rows"])
           for r in k_anonymity_profile(df, ["qi"], k=5).collect()}
    assert got == {"unique": (1, 1), "small": (1, 3), "anonymous": (1, 7)}


def test_l_diversity_bands_exact(spark):
    # class a: 3 rows, 1 sensitive value -> homogeneous
    # class b: 3 rows, 2 values -> low (l=3); class c: 3 rows, 3 -> diverse
    rows = ([("a", 1)] * 3
            + [("b", 1), ("b", 1), ("b", 2)]
            + [("c", 1), ("c", 2), ("c", 3)])
    df = spark.createDataFrame(rows, "qi string, s int")
    got = {r["l_band"]: (r["n_classes"], r["n_rows"])
           for r in l_diversity_profile(df, ["qi"], "s", l=3).collect()}
    assert got == {"homogeneous": (1, 3), "low": (1, 3), "diverse": (1, 3)}


# ---------------------------------------------------------------------
# Gumbel-top-k resampling
# ---------------------------------------------------------------------

def _py_gumbel(items, k, seed="gumbel"):
    keyed = []
    for i, logw_micro in items:
        h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        key = logw_micro / 1000000.0 - math.log(-math.log(u))
        keyed.append((math.floor(key * 1000000.0 + 0.5), i, logw_micro))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [(r + 1, i, lw, km)
            for r, (km, i, lw) in enumerate(keyed[:k])]


def test_gumbel_resample_model_parity(spark):
    rng = random.Random(5)
    items = [(i, rng.randint(-3_000_000, 3_000_000)) for i in range(200)]
    df = spark.createDataFrame(items, "doc_id long, dsir_logw_micro long")
    got = [(r["rank"], r["doc_id"], r["dsir_logw_micro"],
            r["gumbel_key_micro"])
           for r in gumbel_topk_resample(df, k=20).orderBy("rank").collect()]
    assert got == _py_gumbel(items, 20)


def test_gumbel_resample_deterministic_and_weight_dominant(spark):
    # Same input twice -> identical sample; an overwhelming weight is
    # always rank 1 (log-weight dwarfs any Gumbel noise, |G| <~ 22 here).
    items = [(i, 0) for i in range(50)] + [(99, 100_000_000)]
    df = spark.createDataFrame(items, "doc_id long, dsir_logw_micro long")
    a = [r["doc_id"] for r in gumbel_topk_resample(df, 5).collect()]
    b = [r["doc_id"] for r in gumbel_topk_resample(df, 5).collect()]
    assert a == b and a[0] == 99


def test_gumbel_resample_seed_changes_sample(spark):
    items = [(i, 0) for i in range(300)]
    df = spark.createDataFrame(items, "doc_id long, dsir_logw_micro long")
    a = {r["doc_id"] for r in gumbel_topk_resample(df, 10, seed="s1").collect()}
    b = {r["doc_id"] for r in gumbel_topk_resample(df, 10, seed="s2").collect()}
    assert a != b


# ---------------------------------------------------------------------
# corpus_dup_ngrams
# ---------------------------------------------------------------------

def test_corpus_dup_ngrams_planted(spark):
    shared = "alpha beta gamma delta epsilon"          # one shared 5-gram
    docs = [
        (1, shared + " zeta"),        # grams: 2 distinct, 1 shared
        (2, shared),                  # grams: 1, shared
        (3, "u1 u2 u3 u4 u5 u6"),     # 2 distinct unique grams
        (4, "too short"),             # no 5-grams -> zeros
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_ppm"])
           for r in corpus_dup_ngrams(df, n=5, min_docs=2).collect()}
    assert got[1] == (2, 1, 500000)
    assert got[2] == (1, 1, 1000000)
    assert got[3] == (2, 0, 0)
    assert got[4] == (0, 0, 0)


def test_corpus_dup_ngrams_within_doc_repeat_not_dup(spark):
    # A gram repeated only WITHIN one doc is not a cross-doc duplicate
    # (per-doc grams are distinct before the docs-per-gram count).
    s = "a b c d e"
    df = spark.createDataFrame(
        [(1, s + " " + s)], "doc_id long, text string")
    r = corpus_dup_ngrams(df, n=5, min_docs=2).collect()[0]
    assert r["dup_grams"] == 0
