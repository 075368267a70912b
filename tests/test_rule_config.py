"""The profile → suggest → persist → enforce loop, end to end: rules
suggested from a clean snapshot serialize to plain JSON, reload into a
RuleSet, and catch exactly the defects planted in a later snapshot."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from anomaly_detection_spark.engine import ValidationRun
from anomaly_detection_spark.profiler import suggest_rules
from anomaly_detection_spark.rules.config import (
    suggestions_to_config,
    suite_from_config,
)
from anomaly_detection_spark.rules.core import RuleSet


def _clean_pdf() -> pd.DataFrame:
    return pd.DataFrame({
        "partition": ["p0"] * 5 + ["p1"] * 5,
        "doc_id": [f"d{i}" for i in range(10)],
        "uid": list(range(1, 11)),                       # unique integral
        # one null per partition: the globally-learned completeness floor
        # (800000 ppm) then equals every partition's clean completeness —
        # min_completeness enforces PER PARTITION (the verdict grid's
        # granularity), so a floor learned globally must hold per partition
        "cat": ["a", "b", "a", "b", None] * 2,           # isin {a,b}
        "score": [10, 12, 14, 16, 18, 11, 13, 15, 17, 19],
    })


def _corrupt_pdf() -> pd.DataFrame:
    pdf = _clean_pdf()
    pdf.loc[2, "uid"] = None          # not_null:uid (p0, d2)
    pdf.loc[3, "uid"] = 1             # duplicate of d0's uid (p0, d3+d0)
    pdf.loc[6, "cat"] = "z"           # accepted_values:cat (p1, d6)
    # two MORE cat nulls in p1 -> completeness 400000 < learned 800000
    pdf.loc[7, "cat"] = None
    pdf.loc[8, "cat"] = None
    pdf.loc[5, "score"] = 99          # in_range:score (p1, d5)
    return pdf


@pytest.fixture(scope="module")
def config_json(spark):
    clean = spark.createDataFrame(_clean_pdf())
    sugg = suggest_rules(clean, ["uid", "cat", "score"], isin_max=4).collect()
    return json.dumps(suggestions_to_config(sugg))


def test_suggestions_serialize_to_expected_config(config_json):
    cfg = {(e["rule"], e["col"]): e for e in json.loads(config_json)}
    assert ("not_null", "uid") in cfg
    assert ("unique", "uid") in cfg
    assert cfg[("in_range", "uid")]["min"] == 1
    assert cfg[("in_range", "uid")]["max"] == 10
    assert cfg[("min_completeness", "cat")]["min_ppm"] == 800_000
    assert cfg[("accepted_values", "cat")]["values"] == ["a", "b"]
    assert cfg[("accepted_values", "cat")]["allow_null"] is True
    assert cfg[("in_range", "score")] == {
        "rule": "in_range", "col": "score", "min": 10, "max": 19,
    }


def test_learned_suite_catches_planted_defects(spark, config_json):
    suite = suite_from_config(config_json)
    assert isinstance(suite, RuleSet)
    corrupt = spark.createDataFrame(_corrupt_pdf())
    res = ValidationRun(spark, corrupt, suite).run(resume=False)
    got = {
        (r["partition"], r["rule_id"], r["doc_id"])
        for r in res.violations.collect()
    }
    assert got == {
        ("p0", "not_null:uid", "d2"),
        ("p0", "unique:uid", "d0"),
        ("p0", "unique:uid", "d3"),
        ("p1", "accepted_values:cat", "d6"),
        ("p1", "min_completeness:cat", None),
        ("p1", "in_range:score", "d5"),
    }
    # clean snapshot passes its own learned suite
    clean = spark.createDataFrame(_clean_pdf())
    res2 = ValidationRun(spark, clean, suite).run(resume=False)
    assert res2.violations.count() == 0


def test_unknown_rule_fails_fast():
    with pytest.raises(ValueError, match="unknown rule"):
        suite_from_config([{"rule": "definitely_not_a_rule", "col": "x"}])


def test_rules_config_flag_extends_cluster_entrypoint(spark, docs, catalog,
                                                      tmp_path):
    """--rules-config loads a serialized learned suite into the deployed
    run: the learned rule evaluates alongside the default suite and lands
    in the verdict grid with real pass/fail results."""
    import json as _json

    import run_validation

    docs.write.parquet(str(tmp_path / "docs"))
    catalog.write.parquet(str(tmp_path / "catalog"))
    cfg_path = tmp_path / "learned.json"
    # the planted defects include NULL doc_ids, so a 100%-completeness
    # floor learned from a clean snapshot must fail here
    cfg_path.write_text(_json.dumps(
        [{"rule": "min_completeness", "col": "doc_id", "min_ppm": 1_000_000}]
    ))
    rc = run_validation.main([
        "--input", str(tmp_path / "docs"),
        "--catalog", str(tmp_path / "catalog"),
        "--output", str(tmp_path / "out"),
        "--rules-config", str(cfg_path),
        "--quarantine", str(tmp_path / "routed"),
    ])
    assert rc == 0
    verd = spark.read.parquet(str(tmp_path / "out" / "verdicts"))
    learned = verd.filter("rule_id = 'min_completeness:doc_id'")
    assert learned.count() > 0
    assert learned.filter("NOT pass").count() > 0

    # --quarantine routes the corpus by verdict: every input doc lands in
    # exactly one side; the quarantined side is the distinct non-null
    # violating ids PLUS every NULL-doc_id doc (untrackable docs must not
    # ship to training as 'clean'), and no clean doc is quarantined
    routed = spark.read.parquet(str(tmp_path / "routed"))
    viols = spark.read.parquet(str(tmp_path / "out" / "violations"))
    bad = {
        r["doc_id"] for r in
        viols.filter("doc_id IS NOT NULL").select("doc_id").distinct().collect()
    }
    n_null_ids = docs.filter("doc_id IS NULL").count()
    assert n_null_ids > 0  # the fixture plants them (not_null defect class)
    assert routed.count() == docs.count()
    got_q = {r["doc_id"] for r in
             routed.filter("route = 'quarantined'").select("doc_id").collect()}
    assert got_q == bad | {None} and len(bad) > 0
    assert routed.filter("route = 'quarantined' AND doc_id IS NULL").count() \
        == n_null_ids


def test_checked_in_interleaved_suite_loads_and_enforces(spark):
    """The repo's example config (configs/interleaved_suite.json) — the
    full interleaved rule pack a multimodal corpus deploys via
    run_validation --rules-config — compiles and catches datagen's planted
    defects through the real engine pass."""
    import pathlib

    from anomaly_detection_spark import datagen

    cfg_path = pathlib.Path(__file__).parent.parent / "configs" / \
        "interleaved_suite.json"
    suite = suite_from_config(cfg_path.read_text())
    rule_ids = {r.rule_id for r in suite.row_rules} | {
        r.rule_id for r in suite.dataset_rules
    }
    assert {"media_caption_adjacent", "media_run_cap:2", "no_pii",
            "span_sequence_valid"} <= rule_ids
    docs = datagen.generate_documents(spark, n_docs=500, n_partitions=4)
    res = ValidationRun(spark, docs, suite).run(resume=False)
    fired = {r["rule_id"] for r in res.violations.collect()}
    # datagen plants span-sequence and referential-shape defects; the
    # interleaved alignment rules fire on its caption-less media spans
    assert "media_caption_adjacent" in fired
    assert "text_encoding_clean" in fired  # datagen's MOJIBAKE plant
    assert res.verdicts.count() > 0


def test_format_suggestion_roundtrip(spark):
    """A string column fully covered by one pattern (and too wide for
    isin) suggests matches_regex with the MOST SPECIFIC pattern, which
    round-trips through suggestions_to_config into an enforcing suite;
    an isin-eligible column must NOT also get a format suggestion."""
    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.profiler import suggest_rules
    from anomaly_detection_spark.rules.config import (
        suite_from_config, suggestions_to_config)
    import json

    rows = [("p", str(i), "c%03d" % i, "ab") for i in range(20)]
    docs = spark.createDataFrame(
        rows, "partition string, doc_id string, code string, tag string")
    sugg = suggest_rules(docs, ["code", "tag"], isin_max=8).collect()
    by = {(r["column"], r["rule"]): r["param"] for r in sugg}
    assert by[("code", "matches_regex")] == "^[A-Za-z0-9]+$"  # alnum wins
    assert ("tag", "matches_regex") not in by   # isin pins tag instead
    assert ("tag", "isin") in by

    cfg = suggestions_to_config(sugg)
    suite = suite_from_config(json.dumps(cfg))
    ok = ValidationRun(spark, docs, suite).run(persist=False)
    assert all(r["pass"] for r in ok.verdicts.collect())

    # enforcement: a drifted snapshot with a malformed code now fails
    bad = docs.union(spark.createDataFrame(
        [("p", "x", "c-!!", "ab")], docs.schema))
    res = ValidationRun(spark, bad, suite).run(persist=False)
    v = {r["rule_id"]: r["pass"] for r in res.verdicts.collect()}
    assert v["format:code"] is False
