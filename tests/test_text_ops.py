"""TF-IDF top-terms invariants: the distributed explode→agg→window pipeline
must match a naive in-memory recomputation exactly (rational idf = n_docs/df,
no log damping — chosen because IEEE */÷ are correctly rounded cross-engine)."""

import math
from collections import Counter

import pandas as pd

from anomaly_detection_spark.queries import q_doc_top_terms

SF = "/root/testdata/sf0.001"


def _naive_top_terms(docs: pd.DataFrame, k: int = 3):
    toks = {
        r.doc_id: [t for t in str(r.text).lower().strip().split() if t]
        for r in docs.itertuples()
        if r.text is not None
    }
    n_docs = len(docs)  # all docs, including NULL-text ones
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    out = []
    for doc_id, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((term, c, df[term], c * (float(n_docs) / df[term])) for term, c in tf.items()),
            key=lambda x: (-x[3], x[0]),
        )
        for rank, (term, c, d, score) in enumerate(scored[:k], start=1):
            out.append((doc_id, rank, term, c, d, math.floor(score * 1e6 + 0.5)))
    return sorted(out)


def test_doc_top_terms_matches_naive(spark):
    got = sorted(
        (r.doc_id, r.rank, r.term, r.tf, r.df, r.score_micro)
        for r in q_doc_top_terms(spark, SF).collect()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert got == _naive_top_terms(docs)


def test_doc_top_terms_rank_shape(spark):
    pdf = q_doc_top_terms(spark, SF).toPandas()
    per_doc = pdf.groupby("doc_id")["rank"].agg(["min", "max", "count"])
    assert (per_doc["min"] == 1).all()
    assert (per_doc["max"] == per_doc["count"]).all()  # dense 1..k ranks
    assert (per_doc["count"] <= 3).all()
