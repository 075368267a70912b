"""Per-rule violation budgets (data-quality SLOs): the verdict is PASS
while violation_count/rows_scanned ≤ max_violation_ppm. Planted counts with
exact boundary checks — the budget gates the VERDICT only; violation rows
are still emitted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.engine import ValidationRun
from anomaly_detection_spark.rules.core import RowRule, RuleSet


@pytest.fixture(scope="module")
def budget_docs(spark):
    # 1000 docs per partition; exactly 10 per partition have flag=1
    rows = [("p%d" % (i % 2), str(i), 1 if (i // 2) < 10 else 0)
            for i in range(2000)]
    return spark.createDataFrame(
        rows, "partition string, doc_id string, flag int").cache()


def _verdicts(spark, docs, ppm):
    rules = RuleSet(row_rules=[
        RowRule("flagged", F.col("flag") == 1, F.lit(""),
                max_violation_ppm=ppm)])
    res = ValidationRun(spark, docs, rules).run(persist=False)
    return {r["partition"]: r for r in res.verdicts.collect()}, res


def test_budget_boundary_exact(spark, budget_docs):
    # 10/1000 = exactly 10_000 ppm: budget == rate passes (≤), one less fails
    v, res = _verdicts(spark, budget_docs, 10_000)
    assert all(r["pass"] for r in v.values())
    assert all(r["violation_count"] == 10 for r in v.values())
    # evidence is never gated: the 20 violation rows still land
    assert res.violations.count() == 20

    v, _ = _verdicts(spark, budget_docs, 9_999)
    assert not any(r["pass"] for r in v.values())


def test_budget_zero_is_strict(spark, budget_docs):
    v, _ = _verdicts(spark, budget_docs, 0)
    assert not any(r["pass"] for r in v.values())
    clean = budget_docs.filter("flag = 0")
    v, _ = _verdicts(spark, clean, 0)
    assert all(r["pass"] for r in v.values())


def test_budget_on_dataset_rule(spark):
    # duplicate doc ids: 2 violating ROWS out of 100 scanned = 20_000 ppm
    from anomaly_detection_spark.rules import builtin
    from dataclasses import replace

    rows = [("p", str(i)) for i in range(98)] + [("p", "0"), ("p", "1")]
    docs = spark.createDataFrame(rows, "partition string, doc_id string")
    for ppm, expect in ((40_000, True), (10_000, False)):
        rule = replace(builtin.unique("doc_id"), max_violation_ppm=ppm)
        res = ValidationRun(
            spark, docs, RuleSet(dataset_rules=[rule])).run(persist=False)
        got = res.verdicts.collect()[0]
        assert got["pass"] is expect, (ppm, got)


def test_budget_config_vocabulary(spark):
    from anomaly_detection_spark.rules.config import suite_from_config

    suite = suite_from_config(
        '[{"rule": "not_null", "col": "doc_id", "max_violation_ppm": 500000},'
        ' {"rule": "unique", "col": "doc_id"}]')
    assert suite.row_rules[0].max_violation_ppm == 500_000
    assert suite.dataset_rules[0].max_violation_ppm == 0
    docs = spark.createDataFrame(
        [("p", "a"), ("p", None), ("p", "b"), ("p", "c")],
        "partition string, doc_id string")
    res = ValidationRun(spark, docs, suite).run(persist=False)
    v = {r["rule_id"]: r for r in res.verdicts.collect()}
    # 1 NULL of 4 rows = 250_000 ppm ≤ 500_000 → inside budget
    assert v["not_null:doc_id"]["pass"]

    with pytest.raises(ValueError):
        suite_from_config(
            '[{"rule": "not_null", "col": "x", "max_violation_ppm": -1}]')


def test_matches_regex_rule_and_config(spark):
    """Format rule: non-NULL non-matching values violate; NULLs never do
    (not_null owns missingness); config vocabulary + budget compose."""
    from anomaly_detection_spark.rules import builtin
    from anomaly_detection_spark.rules.config import suite_from_config

    docs = spark.createDataFrame(
        [("p", "1", "ab"), ("p", "2", "a1"), ("p", "3", None),
         ("p", "4", "xyz")],
        "partition string, doc_id string, code string")
    rule = builtin.matches_regex("code", "^[a-z]{2}$")
    rules = RuleSet(row_rules=[rule])
    res = ValidationRun(spark, docs, rules).run(persist=False)
    bad = {r["doc_id"] for r in res.violations.collect()}
    assert bad == {"2", "4"}           # NULL row "3" is NOT a violation
    assert not res.verdicts.collect()[0]["pass"]

    suite = suite_from_config(
        '[{"rule": "matches_regex", "col": "code",'
        ' "pattern": "^[a-z]{2}$", "max_violation_ppm": 500000}]')
    res2 = ValidationRun(spark, docs, suite).run(persist=False)
    # 2 violations of 4 rows = 500_000 ppm, inside budget
    assert res2.verdicts.collect()[0]["pass"]
