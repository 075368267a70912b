"""Planted-string fixtures for the Gopher quality gate and per-doc token
entropy: each rule violated by exactly one crafted document, entropy checked
against hand-computed values (uniform ⇒ log2(k), constant ⇒ 0)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from anomaly_detection_spark.functions import text
from anomaly_detection_spark.queries import q_gopher_quality, q_token_entropy


GOOD = "the quick brown fox jumps over and over the lazy dog of tales " * 5
SHORT = "the cat sat of it and"                       # < 50 words
SYMBOLIC = ("the code of tags " + "#tag " * 20) * 3   # >1 '#' per 10 words
TINY_WORDS = "a b c d e f g h i j " * 6               # mean word len < 3
NUMERIC = "the 123 456 789 000 111 222 333 444 of " * 6  # <80% alpha words


def _flags(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    fl = text.gopher_flags(F.col("text"))
    return df.select(*[v.alias(k) for k, v in fl.items()]).collect()[0].asDict()


def test_gopher_good_doc_keeps(spark):
    r = _flags(spark, GOOD)
    assert r == {"n_toks": 65, "wc_ok": 1, "mwl_ok": 1, "sym_ok": 1,
                 "alpha_ok": 1, "sw_ok": 1, "keep": 1}


def test_gopher_each_rule_fires_alone(spark):
    assert _flags(spark, SHORT)["wc_ok"] == 0
    r = _flags(spark, SYMBOLIC)
    assert r["sym_ok"] == 0 and r["wc_ok"] == 1 and r["keep"] == 0
    r = _flags(spark, TINY_WORDS)
    assert r["mwl_ok"] == 0 and r["wc_ok"] == 1
    r = _flags(spark, NUMERIC)
    assert r["alpha_ok"] == 0 and r["wc_ok"] == 1 and r["keep"] == 0


def test_gopher_stopword_kinds_rule(spark):
    # 60 distinct-ish words but only ONE stopword kind present
    one_sw = "the " + " ".join(f"word{i} nice{i}" for i in range(30))
    r = _flags(spark, one_sw)
    assert r["sw_ok"] == 0 and r["wc_ok"] == 1


def test_token_entropy_planted(spark, tmp_path):
    rows = [(1, "x x x x x x x x"),          # constant: H = 0, ttr 125000
            (2, "a b c d a b c d"),          # uniform 4: H = 2.0, ttr 500000
            (3, "w w w y")]                   # H = log2(4) - 3*log2(3)/4
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in q_token_entropy(spark, str(tmp_path)).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["ttr_ppm"] == 125000
    assert got[2]["entropy"] == 2.0 and got[2]["distinct_toks"] == 4
    h3 = round(math.log2(4) - 3 * math.log2(3) / 4, 6)
    assert got[3]["entropy"] == h3 and got[3]["n_toks"] == 4


def test_gopher_query_matches_flags_over_corpus(spark):
    df = q_gopher_quality(spark, "/root/testdata/sf0.001")
    n = df.count()
    agg = df.agg(F.sum("keep"), F.sum("wc_ok")).collect()[0]
    # the synthetic corpus straddles the 50-word Gopher floor: the gate
    # must neither pass everything nor drop everything
    assert n == 500 and 0 < agg[0] < n and 0 < agg[1] < n


def test_normalization_dup_gain_planted(spark, tmp_path):
    from anomaly_detection_spark.queries import q_normalization_dup_gain
    rows = [(0, "hello world", "s"), (5, "foo bar", "s"),
            (1, "unique text here", "t")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["source"]: r.asDict()
           for r in q_normalization_dup_gain(spark, str(tmp_path)).collect()}
    # doc 0 and 5 are re-emitted upper-cased + double-spaced: byte-exact
    # finds nothing, normalization collapses each pair
    assert got["s"] == {"source": "s", "n_docs": 4, "exact_dups": 0,
                        "norm_dups": 2, "gain_ppm": 500000}
    assert got["t"]["norm_dups"] == 0 and got["t"]["gain_ppm"] == 0


def test_tokenizer_fertility_exact(spark, tmp_path):
    from anomaly_detection_spark.queries import q_tokenizer_fertility
    rows = [(1, "can't stop", "en"),   # ws 2; subword: can ' t stop = 4
            (2, "a1b2", "xx")]         # ws 1; subword: a 1 b 2 = 4
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["lang"]: r.asDict()
           for r in q_tokenizer_fertility(spark, str(tmp_path)).collect()}
    assert got["en"]["ws_tokens"] == 2 and got["en"]["subword_tokens"] == 4
    assert got["en"]["fertility_ppm"] == 2_000_000
    assert got["xx"]["fertility_ppm"] == 4_000_000
    assert got["xx"]["chars_per_tok_milli"] == 1000


def test_shard_balance_exact_deal(spark):
    from anomaly_detection_spark.functions.curation import shard_balance
    # tokens 8,7,6,5,4,3,2,1 dealt round-robin over 2 shards in desc
    # order: shard0 gets 8,6,4,2 = 20; shard1 gets 7,5,3,1 = 16
    rows = [(i, 8 - i) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["shard"]: r.asDict()
           for r in shard_balance(df, n_shards=2, bucket_width=4).collect()}
    assert got[0]["tokens"] == 20 and got[1]["tokens"] == 16
    assert got[0]["n_docs"] == 4 and got[1]["n_docs"] == 4
    # dev_ppm truncates toward zero in BOTH engines (Spark DIV, DuckDB
    # integer //): (20*2-36)*1e6 -> 111111, (16*2-36)*1e6 -> -111111
    assert got[0]["dev_ppm"] == 111111 and got[1]["dev_ppm"] == -111111


def test_vocab_drift_planted_novel_types(spark, tmp_path):
    from anomaly_detection_spark.queries import q_vocab_drift
    rows = [(0, "alpha beta", "en"), (2, "alpha gamma", "en"),
            (1, "alpha beta", "en"), (3, "beta beta", "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    r = q_vocab_drift(spark, str(tmp_path)).collect()[0].asDict()
    # base vocab {alpha, beta, gamma}; cur texts get ' neo1term'/' neo3term'
    # appended -> cur vocab {alpha, beta, neo1term, neo3term}
    assert r["base_types"] == 3 and r["cur_types"] == 4
    assert r["new_types"] == 2 and r["dropped_types"] == 1
    # cur occurrences: alpha, beta, neo1term, beta, beta, neo3term = 6,
    # of which 2 are OOV
    assert r["oov_ppm"] == 2 * 1_000_000 // 6


def test_ngram_novelty_planted(spark, tmp_path):
    from anomaly_detection_spark.queries import q_ngram_novelty
    rows = [(0, "a b c d", "s"),      # base: grams {a b c, b c d}
            (2, "q r s t", "s"),      # base: {q r s, r s t}
            (1, "a b c x", "s"),      # cur: {a b c (seen), b c x (novel)}
            (3, "a b c d", "s")]      # cur: both grams seen
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in q_ngram_novelty(spark, str(tmp_path)).collect()}
    assert got[1] == {"doc_id": 1, "n_grams": 2, "novel_grams": 1,
                      "novelty_ppm": 500000}
    assert got[3]["novel_grams"] == 0 and got[3]["novelty_ppm"] == 0


def test_dup_source_matrix_planted(spark, tmp_path):
    from anomaly_detection_spark.queries import q_dup_source_matrix
    same = "spark join filter window batch stream merge sort key value"
    rows = [(0, same, "mirror_a"), (1, same, "mirror_b"),
            (2, "totally different words nothing shared here at all ok",
             "clean")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    got = [r.asDict() for r in q_dup_source_matrix(spark, str(tmp_path)).collect()]
    assert got == [{"source_a": "mirror_a", "source_b": "mirror_b",
                    "n_pairs": 1, "share_ppm": 1_000_000}]
