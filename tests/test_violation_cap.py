"""cap_violations — deterministic exemplar sampling of the violations sink.

Verdict counts must stay exact (they derive from the full frame); the capped
frame must hold at most K rows per (partition, rule_id), selected as the
smallest (doc_id, detail) — recomputed independently in pandas — and the
two-phase plan must rank within a salted window first so a hot pair never
lands in a single window task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.engine import ValidationRun, cap_violations
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleSet

K = 1  # fixture defect density is ~2 per pair, so K=1 makes the cap bite


@pytest.fixture(scope="module")
def result(spark, docs, catalog):
    rules = RuleSet(
        row_rules=builtin.default_document_rules(),
        dataset_rules=[builtin.unique("doc_id"), builtin.referential()],
    )
    return ValidationRun(spark, docs, rules, media_catalog=catalog).run(
        resume=False)


@pytest.fixture(scope="module")
def capped(result):
    return cap_violations(result.violations, K).cache()


def _key(row):
    # asc_nulls_first on both order columns
    return (row["doc_id"] is not None, row["doc_id"] or "",
            row["detail"] is not None, row["detail"] or "")


def test_at_most_k_per_pair(capped):
    over = (
        capped.groupBy("partition", "rule_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > K)
    )
    assert over.count() == 0


def test_counts_exact_and_selection_smallest(result, capped):
    full = result.violations.toPandas()
    got = capped.toPandas()
    for (part, rid), grp in full.groupby(["partition", "rule_id"]):
        rows = sorted(grp.to_dict("records"), key=_key)
        want = {(r["doc_id"], r["detail"]) for r in rows[:K]}
        sel = got[(got["partition"] == part) & (got["rule_id"] == rid)]
        have = {(r["doc_id"], r["detail"]) for r in sel.to_dict("records")}
        # ties (byte-identical rows) make the cut ambiguous only among
        # identical rows, so set equality is the right comparison
        assert have == want, (part, rid)
    # and nothing invented: every capped row exists in the full frame
    full_set = {(r["partition"], r["rule_id"], r["doc_id"], r["detail"])
                for r in full.to_dict("records")}
    for r in got.to_dict("records"):
        assert (r["partition"], r["rule_id"], r["doc_id"], r["detail"]) \
            in full_set


def test_verdicts_unaffected(result, capped):
    """Exact violation_count per pair == full-frame count, even where the
    capped frame holds fewer rows (the point of the feature)."""
    full_counts = {
        (r["partition"], r["rule_id"]): r["n"]
        for r in result.violations.groupBy("partition", "rule_id")
        .agg(F.count("*").alias("n")).collect()
    }
    for r in result.verdicts.filter("violation_count > 0").collect():
        assert full_counts[(r["partition"], r["rule_id"])] \
            == r["violation_count"]
    # sanity: the fixture corpus actually exercises the cap
    assert any(n > K for n in full_counts.values())


def test_hot_pair_capped_deterministically(spark):
    """A single (partition, rule) pair with many violations — the skew case
    the salted phase exists for — still returns exactly the K smallest."""
    n = 5000
    v = spark.range(n).select(
        F.lit("p0").alias("partition"),
        F.lit("hot_rule").alias("rule_id"),
        F.format_string("d%08d", F.col("id")).alias("doc_id"),
        F.lit("x").alias("detail"),
    )
    got = [r["doc_id"] for r in
           cap_violations(v, 3).orderBy("doc_id").collect()]
    assert got == ["d00000000", "d00000001", "d00000002"]


def test_cli_caps_sink_but_not_verdicts(spark, docs, catalog, tmp_path):
    """--max-violations-per-pair bounds the violations PARQUET SINK while the
    verdicts sink keeps exact counts; combining it with --quarantine is
    refused (routing needs the full violating-id set)."""
    import duckdb
    import run_validation

    docs.write.parquet(str(tmp_path / "docs"))
    catalog.write.parquet(str(tmp_path / "catalog"))
    out = str(tmp_path / "out")
    rc = run_validation.main([
        "--input", str(tmp_path / "docs"),
        "--catalog", str(tmp_path / "catalog"),
        "--output", out, "--max-violations-per-pair", "1",
    ])
    assert rc == 0
    over = duckdb.sql(
        f"SELECT partition, rule_id, COUNT(*) n FROM '{out}/violations/*.parquet' "
        "GROUP BY 1, 2 HAVING COUNT(*) > 1"
    ).fetchall()
    assert over == []
    # verdicts still carry counts the capped sink can't reach
    assert duckdb.sql(
        f"SELECT max(violation_count) FROM '{out}/verdicts/*.parquet'"
    ).fetchone()[0] > 1

    with pytest.raises(SystemExit):
        run_validation.parse_args([
            "--input", "x", "--catalog", "y", "--output", "z",
            "--max-violations-per-pair", "1", "--quarantine", "q",
        ])
    with pytest.raises(SystemExit):
        run_validation.parse_args([
            "--input", "x", "--catalog", "y", "--output", "z",
            "--max-violations-per-pair", "0",
        ])


def test_plan_ranks_salted_first(result):
    """Two Window nodes; the first (inner) one partitions by the salt too,
    so no single task ever sees a whole hot pair."""
    plan = cap_violations(result.violations, K)._jdf.queryExecution() \
        .executedPlan().toString()
    # AQE's AdaptiveSparkPlan prints the plan twice (Current + Initial) —
    # keep one copy or every node double-counts
    plan = plan.split("== Initial Plan ==")[0]
    # "Window [row_number()..." are the rank nodes; WindowGroupLimit lines
    # (Spark's partial top-k pushdown around them — a bonus) also mention
    # row_number and must not be counted
    windows = [ln for ln in plan.splitlines()
               if "Window [row_number()" in ln]
    assert len(windows) == 2
    inner = windows[-1]  # physical plans print outermost first
    assert "_s" in inner, inner
    assert "_s" not in windows[0]
