"""functional_dependency / freshness rules + incremental LSH candidates.

Each rule is exercised through the REAL DatasetRule build on planted frames
with hand-computed truth (SURVEY.md §5: the oracle is a tiny, obviously-
correct reimplementation), and the incremental LSH path is checked against
the batch LSH it must agree with, including both hot-bucket cap branches
(counted and stored ``bucket_sz``).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import dedup
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleContext


# ------------------------------------------------------- functional_dependency

@pytest.fixture(scope="module")
def fd_frame(spark):
    # media_ref -> kind: m1 consistent, m2 conflicted across two partitions,
    # NULL determinant ignored, NULL dependent counts as one value (m3)
    rows = [
        ("p0", "d0", "m1", "image"),
        ("p0", "d1", "m1", "image"),
        ("p0", "d2", "m2", "image"),
        ("p1", "d3", "m2", "audio"),
        ("p1", "d4", None, "video"),
        ("p1", "d5", "m3", "video"),
        ("p0", "d6", "m3", None),
    ]
    return spark.createDataFrame(rows, "partition string, doc_id string, "
                                       "media_ref string, kind string")


def test_fd_violations_exact(fd_frame):
    rule = builtin.functional_dependency("media_ref", "kind")
    got = sorted(
        (r["partition"], r["rule_id"], r["doc_id"], r["detail"])
        for r in rule.build(fd_frame, RuleContext()).collect()
    )
    # m2: 2 kinds across p0+p1; m3: video + NULL = 2 values across p0+p1
    assert got == [
        ("p0", "fd:media_ref->kind", "m2",
         "kind takes 2 distinct values for one media_ref"),
        ("p0", "fd:media_ref->kind", "m3",
         "kind takes 2 distinct values for one media_ref"),
        ("p1", "fd:media_ref->kind", "m2",
         "kind takes 2 distinct values for one media_ref"),
        ("p1", "fd:media_ref->kind", "m3",
         "kind takes 2 distinct values for one media_ref"),
    ]


def test_fd_holds_empty(fd_frame):
    rule = builtin.functional_dependency("doc_id", "media_ref")
    assert rule.build(fd_frame, RuleContext()).count() == 0


def test_fd_plan_two_hashaggs_no_join(fd_frame):
    """The FD topology must be agg → agg: no count_distinct expand, no
    join-back re-scan of the input."""
    plan = builtin.functional_dependency("media_ref", "kind") \
        .build(fd_frame, RuleContext())._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Join" not in plan
    assert "Expand" not in plan


# ------------------------------------------------------------------ freshness

def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def fresh_frame(spark):
    rows = [
        ("p0", _ts(10, 12)),   # global max
        ("p0", _ts(1)),
        ("p1", _ts(10, 11)),   # 1h stale
        ("p2", _ts(9, 12)),    # 24h stale
    ]
    return spark.createDataFrame(rows, "partition string, ts timestamp")


def test_freshness_flags_only_stale(fresh_frame):
    rule = builtin.freshness("ts", max_lag_seconds=2 * 3600)
    got = {(r["partition"], r["detail"])
           for r in rule.build(fresh_frame, RuleContext()).collect()}
    assert got == {("p2", f"stale by {24 * 3600 * 1_000_000}us")}
    # doc_id is NULL on table-level violations
    row = rule.build(fresh_frame, RuleContext()).collect()[0]
    assert row["doc_id"] is None and row["rule_id"] == "freshness:ts"


def test_freshness_window_is_post_agg(fresh_frame):
    """The unpartitioned window must consume the per-partition AGG result,
    never corpus rows: exactly one Aggregate below the Window."""
    plan = builtin.freshness("ts", 60).build(fresh_frame, RuleContext()) \
        ._jdf.queryExecution().optimizedPlan().toString()
    w = plan.index("Window")
    assert "Aggregate" in plan[w:]


# ------------------------------------------------------- incremental LSH

@pytest.fixture(scope="module")
def lsh_corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    rows = [(i, f"{base} variant {i} " + "unique filler words " * (i % 3 + 1))
            for i in range(40)]
    rows.append((100, base))  # the doc the commit will duplicate
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_matches_batch_lsh(spark, lsh_corpus):
    """Pairs found incrementally == batch LSH pairs restricted to
    (new, corpus) — the defining agreement property."""
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight")
    appended = spark.createDataFrame(
        [(1000, base), (1001, "completely unrelated short text here")],
        "doc_id long, text string")
    bkts = dedup.band_buckets(lsh_corpus, k=4, bands=2)
    inc = {(r["new_id"], r["corpus_id"]) for r in
           dedup.incremental_lsh_candidates(bkts, appended, k=4, bands=2)
           .collect()}
    batch = dedup.lsh_candidate_pairs(
        lsh_corpus.unionByName(appended), k=4, bands=2).collect()
    want = {(max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
            for r in batch
            if (r["id_a"] >= 1000) != (r["id_b"] >= 1000)}
    assert inc == {(n, c) for (n, c) in want} and (1000, 100) in inc


def test_incremental_cap_drops_hot_bucket_both_paths(spark):
    """A degenerate bucket (identical text everywhere) is dropped by the
    cap on the counted path AND on the stored-bucket_sz path; a distinct
    pair survives on both."""
    hot = "boilerplate boilerplate boilerplate boilerplate boilerplate five"
    rare = "a genuinely distinctive sentence about salted aggregation plans"
    corpus = spark.createDataFrame(
        [(i, hot) for i in range(30)] + [(900, rare)],
        "doc_id long, text string")
    appended = spark.createDataFrame(
        [(2000, hot), (2001, rare)], "doc_id long, text string")
    bkts = dedup.band_buckets(corpus, k=4, bands=2)

    counted = dedup.incremental_lsh_candidates(
        bkts, appended, k=4, bands=2, max_bucket=10)
    got = {(r["new_id"], r["corpus_id"]) for r in counted.collect()}
    assert got == {(2001, 900)}

    stored = bkts.join(
        bkts.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_sz")),
        "bucket")
    via_sz = dedup.incremental_lsh_candidates(
        stored, appended, k=4, bands=2, max_bucket=10)
    assert {(r["new_id"], r["corpus_id"]) for r in via_sz.collect()} \
        == {(2001, 900)}
    # uncapped, the hot pairs flood back in
    flood = dedup.incremental_lsh_candidates(
        bkts, appended, k=4, bands=2, max_bucket=None).count()
    assert flood > 20


def test_incremental_corpus_side_never_rehashed(spark, lsh_corpus):
    """The corpus enters as a band table; the plan must contain exactly one
    md5-signature pipeline (the commit's) — corpus text is never touched."""
    appended = spark.createDataFrame([(1000, "xyz abc def ghi jkl")],
                                     "doc_id long, text string")
    bkts = dedup.band_buckets(lsh_corpus, k=4, bands=2).localCheckpoint()
    plan = dedup.incremental_lsh_candidates(bkts, appended, k=4, bands=2) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan  # the commit side is hashed...
    # ...but the checkpointed corpus band table contributes no scan of text
    assert plan.count("LogicalRDD") >= 1 and "lsh_corpus" not in plan


# ------------------------------------------------------- orphaned assets

def test_orphaned_assets_exact(spark, docs, catalog):
    """Catalog ∖ referenced == rule output; the datagen catalog includes
    assets no span references (planted by construction)."""
    rule = builtin.orphaned_assets()
    got = {r["doc_id"] for r in
           rule.build(docs, RuleContext(media_catalog=catalog)).collect()}
    referenced = {
        r["m"] for r in docs.select(
            F.explode("spans.media_ref").alias("m")).distinct().collect()
        if r["m"] is not None
    }
    want = {r["media_ref"] for r in catalog.collect()} - referenced
    assert got == want and got  # non-empty: the fixture plants orphans


# ------------------------------------------------------- config vocabulary

def test_new_rules_from_config(spark, fd_frame):
    from anomaly_detection_spark.rules.config import suite_from_config

    suite = suite_from_config(
        '[{"rule": "functional_dependency", '
        '"determinant": "media_ref", "dependent": "kind"},'
        ' {"rule": "freshness", "col": "ts", "max_lag_seconds": 60}]'
    )
    assert suite.rule_ids == ["fd:media_ref->kind", "freshness:ts"]
    got = suite.dataset_rules[0].build(fd_frame, RuleContext())
    assert got.filter(F.col("doc_id") == "m2").count() == 2  # p0 + p1
