"""Training-pipeline operators: sequence packing, as-of join, repetition
stats, contamination overlap — each checked against a serial brute force
(SURVEY.md §5: tiny obviously-correct oracle on the same data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.functions import curation, repetition, timeseries


def test_pack_sequences_matches_serial_prefix(spark):
    rows = [(i, t) for i, t in zip(range(0, 20, 2), [3, 5, 2, 9, 1, 4, 7, 2, 6, 8])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # bucket_width=3 forces many buckets; seq_len=7 forces boundary crossings
    got = {
        r["doc_id"]: r
        for r in curation.pack_sequences(
            df, "n_tokens", "doc_id", seq_len=7, bucket_width=3
        ).collect()
    }
    before = 0
    for i, t in sorted(rows):
        r = got[i]
        assert r["seq_start"] == before // 7
        assert r["offset_in_seq"] == before % 7
        assert r["n_seqs_spanned"] == (before + t - 1) // 7 - before // 7 + 1
        before += t
    assert before == sum(t for _, t in rows)


def test_asof_join_brute_force(spark):
    left = [
        (1, 10, "a"), (1, 20, "b"), (1, 5, "c"),   # c precedes any ref
        (2, 15, "d"), (2, 30, "e"),
        (3, 50, "f"),                               # key with no refs
        (1, 12, "g"),                               # equal-ts tie with a ref
    ]
    right = [(1, 8, 100.0), (1, 12, 200.0), (2, 15, 300.0), (4, 1, 400.0)]
    l = spark.createDataFrame(left, "k long, ts long, tag string")
    r = spark.createDataFrame(right, "k long, ts long, v double")
    out = {
        row["tag"]: row
        for row in timeseries.asof_join(l, r, "k", "ts", ["tag"]).collect()
    }
    assert len(out) == len(left)

    def brute(k, ts):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        return max(cands) if cands else None

    for k, ts, tag in left:
        exp = brute(k, ts)
        row = out[tag]
        if exp is None:
            assert row["ref_ts"] is None and row["ref_v"] is None
        else:
            assert (row["ref_ts"], row["ref_v"]) == exp


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d"), (3, "too short")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition.repetition_stats(df).collect()}
    assert set(got) == {1, 2}  # <3 tokens excluded
    r1 = got[1]
    assert r1["n_tokens"] == 4
    assert r1["top_token_ppm"] == 1_000_000
    assert r1["top_bigram_ppm"] == 1_000_000      # 'x x' is all 3 bigrams
    assert r1["dup_trigram_ppm"] == 500_000       # 2 trigrams, 1 distinct
    r2 = got[2]
    assert r2["top_token_ppm"] == 250_000
    assert r2["top_bigram_ppm"] == 333_333
    assert r2["dup_trigram_ppm"] == 0


def test_contamination_planted(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),   # shares 'alpha beta gamma'
         (2, "one two three four"),       # no overlap
         (3, "beta gamma delta epsilon")],  # shares 'beta gamma delta'
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta zz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in repetition.contamination_overlap(corpus, bench).collect()
    }
    assert set(got) == {1, 3}  # doc 2 clean -> not reported
    assert got[1]["n_shingles"] == 2 and got[1]["n_contaminated"] == 2
    assert got[1]["contamination_ppm"] == 1_000_000
    assert got[3]["n_shingles"] == 2 and got[3]["n_contaminated"] == 1
    assert got[3]["contamination_ppm"] == 500_000


def test_boilerplate_detects_planted_template(spark):
    """50 docs share a 5-token header (3 pure header trigrams, df=50);
    bodies are unique. The detector must surface the header trigrams at
    the top, and templated docs must carry a positive boilerplate ratio
    while clean docs stay at zero."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark.functions.repetition import (
        boilerplate_phrases,
        boilerplate_ratio,
    )

    header = "terms of service apply now "
    rows = [
        (i, (header if i < 50 else "") + f"w{i}a w{i}b w{i}c w{i}d")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = boilerplate_phrases(df, n=3, top_k=3).collect()
    assert {r["phrase"] for r in top} == {
        "terms of service", "of service apply", "service apply now",
    }
    assert all(r["df_docs"] == 50 and r["df_ppm"] == 500_000 for r in top)

    ratios = {r["doc_id"]: r for r in
              boilerplate_ratio(df, boilerplate_phrases(df, n=3, top_k=3),
                                n=3).collect()}
    # templated: 7 distinct trigrams (3 header + 2 boundary + 2 body),
    # 3 boilerplate -> floor(1e6*3/7 + 0.5) = 428571 ppm
    assert ratios[0]["n_boiler"] == 3
    assert ratios[0]["boiler_ppm"] == 428_571
    assert ratios[99]["n_boiler"] == 0 and ratios[99]["boiler_ppm"] == 0


def test_incremental_exact_dups_planted(spark):
    """The appended-commit dedup: only new docs whose text already exists
    in the corpus surface, each with its corpus match count + canonical;
    novel appended docs are absent. The big side is only probed — the
    plan must broadcast the NEW side's fingerprint set, not exchange the
    corpus."""
    from anomaly_detection_spark.functions.dedup import incremental_exact_dups

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta"),
         (4, "epsilon")],
        "doc_id long, text string",
    )
    appended = spark.createDataFrame(
        [(100, "alpha beta"),      # dup of 1 and 3
         (101, "totally new"),     # novel
         (102, "epsilon")],        # dup of 4
        "doc_id long, text string",
    )
    out = incremental_exact_dups(corpus, appended)
    rows = {r["new_id"]: r for r in out.collect()}
    assert set(rows) == {100, 102}
    assert rows[100]["n_corpus_matches"] == 2
    assert rows[100]["corpus_canonical_id"] == 1
    assert rows[102]["n_corpus_matches"] == 1
    assert rows[102]["corpus_canonical_id"] == 4

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_session_paths_deterministic_order_and_share(spark):
    from anomaly_detection_spark.queries import QUERIES

    out = QUERIES["session_paths"][0](spark, "/root/testdata/sf0.001") \
        .collect()
    assert 0 < len(out) <= 20
    # descending counts with path tiebreak; shares sum to <= 1e6
    counts = [r["n_sessions"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r["share_ppm"] <= 1_000_000 for r in out)
    assert all(1 <= len(r["path"].split(">")) <= 3 for r in out)


def test_conversion_attribution_credit_conserves(spark):
    from anomaly_detection_spark.queries import QUERIES

    out = QUERIES["conversion_attribution"][0](
        spark, "/root/testdata/sf0.001").collect()
    rows = {r["channel"]: r.asDict() for r in out}
    assert "(direct)" in rows
    total_conversions = sum(
        r["conversions"] for c, r in rows.items() if c == "(direct)")
    # every attributed purchase's 1e6 credit is conserved up to the
    # integer-div remainder per conversion (< n per purchase)
    attributed = {c: r for c, r in rows.items() if c != "(direct)"}
    credit = sum(r["credit_micro"] for r in attributed.values())
    touches = sum(r["touches"] for r in attributed.values())
    # distinct purchases credited (upper bound: per-channel sum overcounts)
    max_conv = max(r["conversions"] for r in attributed.values())
    assert credit <= 1_000_000 * touches
    assert credit > 900_000 * max_conv  # bulk of credit lands
    assert "purchase" not in attributed  # purchases never self-credit
