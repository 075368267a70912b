"""Resumability: completed (partition, rule_id) pairs are never re-evaluated;
a partially-committed run completes exactly the remaining work (SURVEY.md §5
test plan item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.engine import ValidationRun
from anomaly_detection_spark.manifest import RuleProgressManifest
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleSet


@pytest.fixture()
def manifest(spark, tmp_path):
    return RuleProgressManifest(spark, str(tmp_path / "manifest"))


def _rules():
    return RuleSet(row_rules=[builtin.not_null("doc_id"), builtin.non_empty_array("spans")])


def test_full_run_then_noop(spark, docs, manifest):
    r1 = ValidationRun(spark, docs, _rules(), manifest=manifest, snapshot_id="s1").run()
    n1 = r1.verdicts.count()
    assert n1 == 8 * 2  # 8 partitions x 2 rules
    r2 = ValidationRun(spark, docs, _rules(), manifest=manifest, snapshot_id="s1").run()
    assert r2.verdicts.count() == 0
    # a new snapshot is fresh work
    r3 = ValidationRun(spark, docs, _rules(), manifest=manifest, snapshot_id="s2").run()
    assert r3.verdicts.count() == n1


def test_partial_commit_resume(spark, docs, manifest):
    """Simulate a crash after only 3 partitions' worth of work committed:
    pre-commit a fabricated manifest slice, then resume and check the run
    evaluates exactly the complement."""
    full = ValidationRun(spark, docs, _rules(), snapshot_id="s1").run(resume=False)
    done = full.metrics.filter(F.col("partition").isin("p0", "p1", "p2"))
    manifest.commit(done)

    resumed = ValidationRun(spark, docs, _rules(), manifest=manifest, snapshot_id="s1").run()
    got_pairs = {
        (r["partition"], r["rule_id"]) for r in resumed.verdicts.collect()
    }
    expected_pairs = {
        (f"p{i}", rid)
        for i in range(3, 8)
        for rid in ("not_null:doc_id", "non_empty:spans")
    }
    assert got_pairs == expected_pairs
    # resumed verdicts agree with the full run on the resumed slice
    full_map = {
        (r["partition"], r["rule_id"]): (r["pass"], r["violation_count"])
        for r in full.verdicts.collect()
    }
    for r in resumed.verdicts.collect():
        assert full_map[(r["partition"], r["rule_id"])] == (r["pass"], r["violation_count"])
