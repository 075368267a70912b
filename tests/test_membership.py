"""Bloom-filter membership (functions/membership.py) and the scalable
(non-broadcast) referential rule built on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.functions import membership
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleContext

M, K = 65536, 3


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).selectExpr("concat('m', id) AS ref")
    bits = membership.bloom_bitset(keys, "ref", M, K)
    probes = keys.unionByName(
        spark.range(0, 500).selectExpr("concat('absent', id) AS ref")
    )
    ann = {r["ref"]: r["maybe_present"]
           for r in membership.bloom_maybe_contains(probes, "ref", bits, M, K).collect()}
    # every true member MUST pass (the property the dangling short-circuit
    # relies on)
    assert all(ann[f"m{i}"] for i in range(500))
    # at these parameters (n=500, m=64Ki, k=3) the false-positive rate is
    # ~1e-5: the absent probes overwhelmingly fail
    misses = sum(not ann[f"absent{i}"] for i in range(500))
    assert misses >= 495


def test_bloom_bitset_deterministic(spark):
    keys = spark.range(0, 200).selectExpr("concat('x', id) AS ref")
    a = {(r["word_idx"], r["word"])
         for r in membership.bloom_bitset(keys, "ref", M, K).collect()}
    b = {(r["word_idx"], r["word"])
         for r in membership.bloom_bitset(keys, "ref", M, K).collect()}
    assert a == b and len(a) > 0


def test_referential_scalable_matches_broadcast(spark, docs, catalog):
    """The Bloom-prescreened shuffle-join variant must flag EXACTLY the
    same (partition, doc_id) violations as the broadcast anti-join rule —
    only the physical plan differs."""
    ctx = RuleContext(media_catalog=catalog)
    broadcast_rule = builtin.referential().build(docs, ctx)
    scalable_rule = builtin.referential_scalable().build(docs, ctx)
    got_b = {(r["partition"], r["doc_id"]) for r in broadcast_rule.collect()}
    got_s = {(r["partition"], r["doc_id"]) for r in scalable_rule.collect()}
    assert got_s == got_b and len(got_b) > 0


def test_referential_scalable_plan_has_no_catalog_broadcast_antijoin(spark, docs, catalog):
    """The exact anti-join must be a shuffle merge join (the whole point:
    the catalog never broadcasts); the only broadcasts are the tiny Bloom
    bitset words."""
    from tests.test_plans import plan_of

    ctx = RuleContext(media_catalog=catalog)
    plan = plan_of(builtin.referential_scalable().build(docs, ctx))
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
