"""Model-based curation scoring (functions/scoring.py): hashed-linear
quality classifier and DSIR importance weights vs independent pure-Python
reference models on seeded random corpora, plus the integer keep-decision
contract and empty-document behavior."""

from __future__ import annotations

import hashlib
import math
import random

from anomaly_detection_spark.functions.scoring import (
    classify_quality, dsir_log_weights)

D = 64
WEIGHTS = [((i * 2654435761) % 1997 - 998) * 1000 for i in range(D)]
TARGET = [(i * 7919) % 97 + 1 for i in range(D)]


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % D


def _mk_corpus(seed: int, n: int):
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(200)] + ["the", "a", "of", "and"]
    return [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 50))))
            for i in range(n)]


# ---------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------

def _py_classify(docs, thr):
    out = []
    for i, text in docs:
        toks = text.split()
        s = sum(WEIGHTS[_bucket(t)] for t in toks)
        out.append((i, len(toks), s, int(s >= thr * len(toks))))
    return out


def test_classifier_random_model_parity(spark):
    docs = _mk_corpus(77, 150)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["doc_id"], r["n_toks"], r["logit_sum_micro"], r["keep"])
           for r in classify_quality(df, WEIGHTS, 50_000)
           .orderBy("doc_id").collect()]
    assert got == _py_classify(docs, 50_000)


def test_classifier_empty_doc_keeps_zero_sum(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one token here")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in classify_quality(df, WEIGHTS, 0)
            .collect()}
    assert rows[1]["n_toks"] == 0 and rows[1]["logit_sum_micro"] == 0
    assert rows[2]["n_toks"] == 0 and rows[2]["keep"] == 1  # 0 >= 0
    assert rows[3]["n_toks"] == 3


def test_classifier_threshold_is_exact_integer_compare(spark):
    # One-token doc: keep flips exactly at weight == thr * 1.
    tok = "w3"
    w = WEIGHTS[_bucket(tok)]
    df = spark.createDataFrame([(1, tok)], "doc_id long, text string")
    at = classify_quality(df, WEIGHTS, w).collect()[0]["keep"]
    above = classify_quality(df, WEIGHTS, w + 1).collect()[0]["keep"]
    assert (at, above) == (1, 0)


# ---------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------

def _py_dsir(docs):
    raw = [0] * D
    for _, text in docs:
        for t in text.split():
            raw[_bucket(t)] += 1
    raw_total = sum(raw)
    tgt_total = sum(TARGET)

    def lr(b):
        num = (TARGET[b] + 1) * (raw_total + D)
        den = (tgt_total + D) * (raw[b] + 1)
        return math.floor(math.log(num / den) * 1000000.0 + 0.5)

    return [(i, len(text.split()),
             sum(lr(_bucket(t)) for t in text.split()))
            for i, text in docs]


def test_dsir_random_model_parity(spark):
    docs = _mk_corpus(91, 150)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["doc_id"], r["n_toks"], r["dsir_logw_micro"])
           for r in dsir_log_weights(df, TARGET)
           .orderBy("doc_id").collect()]
    assert got == _py_dsir(docs)


def test_dsir_upweights_target_heavy_docs(spark):
    # Put ALL target mass on one token's bucket: docs made of that token
    # must outscore docs made of a token whose bucket has minimal mass.
    hot, cold = "hot_token", "cold_token"
    tgt = [0] * D
    tgt[_bucket(hot)] = 1000
    docs = [(1, " ".join([hot] * 10)), (2, " ".join([cold] * 10))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r["dsir_logw_micro"]
            for r in dsir_log_weights(df, tgt).collect()}
    assert rows[1] > rows[2]


def test_dsir_empty_doc_scores_zero(spark):
    docs = [(1, ""), (2, "w1 w2 w3")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dsir_log_weights(df, TARGET).collect()}
    assert rows[1]["n_toks"] == 0 and rows[1]["dsir_logw_micro"] == 0
