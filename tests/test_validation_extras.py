"""Round-3 additions: encoding-hygiene rule, interval overlaps, calendar
gaps, semantic prune — planted-fixture exactness + scale-shape guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.engine import ValidationRun
from anomaly_detection_spark.functions.similarity import semantic_prune
from anomaly_detection_spark.functions.text import encoding_anomaly_count
from anomaly_detection_spark.functions.timeseries import (
    calendar_gaps,
    interval_overlap_stats,
)
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.config import suite_from_config
from anomaly_detection_spark.rules.core import RuleSet

SPAN_SCHEMA = (
    "partition string, doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


@pytest.fixture(scope="module")
def enc_docs(spark):
    rows = [
        ("p0", "clean", [_span("text", "plain ascii with\ttabs\nand newlines", None, 0)]),
        ("p0", "ctrl", [_span("text", "bell\x07char", None, 0)]),
        ("p1", "fffd", [_span("text", "bad decode � residue", None, 0),
                        _span("text", "��", None, 1)]),
        ("p1", "nulltext", [_span("image", None, "m1", 0)]),
    ]
    return rows


def test_encoding_anomaly_count_edges(spark):
    df = spark.createDataFrame(
        [("a\x07b\x00c",), ("tab\tok\r\n",), (None,), ("�",)], "t string"
    )
    got = [r[0] for r in df.select(encoding_anomaly_count("t")).collect()]
    assert got == [2, 0, 0, 1]


def test_text_encoding_clean_engine_exact(spark, enc_docs):
    docs = spark.createDataFrame(enc_docs, SPAN_SCHEMA)
    rules = RuleSet(row_rules=[builtin.text_encoding_clean()])
    res = ValidationRun(spark, docs, rules).run(resume=False, persist=False)
    got = {
        (r["partition"], r["doc_id"], r["detail"])
        for r in res.violations.collect()
    }
    assert got == {
        ("p0", "ctrl", "encoding anomaly chars: 1"),
        ("p1", "fffd", "encoding anomaly chars: 3"),
    }
    verd = {(r["partition"], r["rule_id"]): r["pass"]
            for r in res.verdicts.collect()}
    assert verd[("p0", "text_encoding_clean")] is False
    assert verd[("p1", "text_encoding_clean")] is False


def test_text_encoding_clean_config_vocabulary(spark, enc_docs):
    suite = suite_from_config('[{"rule": "text_encoding_clean"}]')
    docs = spark.createDataFrame(enc_docs, SPAN_SCHEMA)
    res = ValidationRun(spark, docs, suite).run(resume=False, persist=False)
    assert res.violations.count() == 2


def test_interval_overlap_stats_planted(spark):
    rows = [
        # user A: (0,10) then (5,8) overlaps by end-next_start=5; (20,25) clear
        ("A", 1, 0, 10), ("A", 2, 5, 8), ("A", 3, 20, 25),
        # user B: start tie broken by order_col — id 1 sorts first, its end 3
        # collides with id 2's start 0
        ("B", 2, 0, 5), ("B", 1, 0, 3),
        # user C: back-to-back but not overlapping (next start == end)
        ("C", 1, 0, 5), ("C", 2, 5, 9),
    ]
    df = spark.createDataFrame(rows, "u string, i long, s long, e long")
    got = {
        r["key"]: (r["n_intervals"], r["n_overlaps"],
                   r["total_overlap"], r["max_overlap"])
        for r in interval_overlap_stats(df, "u", "s", "e", "i").collect()
    }
    assert got == {"A": (3, 1, 5, 5), "B": (2, 1, 3, 3)}


def test_calendar_gaps_planted(spark):
    rows = [
        ("A", "2024-01-01"), ("A", "2024-01-02"), ("A", "2024-01-05"),
        ("A", "2024-01-05"),           # duplicate day must not double-count
        ("B", "2024-03-10"),           # single day — no gap possible
        ("C", "2024-02-01"), ("C", "2024-02-02"),  # contiguous
    ]
    df = spark.createDataFrame(rows, "u string, d string")
    out = {
        r["key"]: (r["n_days_expected"], r["n_days_present"], r["n_missing"],
                   str(r["first_missing"]))
        for r in calendar_gaps(df, "u", "d").collect()
    }
    assert out == {"A": (5, 3, 2, "2024-01-03")}


@pytest.fixture(scope="module")
def prune_vecs(spark):
    rows = [
        # bucket 0: 1 and 2 near-identical (cos≈1), 3 orthogonal,
        # 4 a scaled copy of 1 — both 2 and 4 prune back to 1
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [2.0, 0.0, 0.0], 0),
        # bucket 9: five identical vectors — used for the max_bucket guard
        *[(10 + i, [0.5, 0.5, 0.0], 9) for i in range(5)],
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_semantic_prune_planted(spark, prune_vecs):
    out = {
        r["vec_id"]: (r["bucket"], r["canonical_id"], r["best_cos6"])
        for r in semantic_prune(prune_vecs, threshold=0.95).collect()
    }
    # bucket 0: 2 and 4 pruned to canonical 1; 3 survives (orthogonal);
    # bucket 9: all-but-first pruned to 10
    assert set(out) == {2, 4, 11, 12, 13, 14}
    assert out[2][1] == 1 and out[4] == (0, 1, 1.0)
    assert all(out[v][1] == 10 for v in (11, 12, 13, 14))


def test_semantic_prune_bucket_cap(spark, prune_vecs):
    out = semantic_prune(prune_vecs, threshold=0.95, max_bucket=4)
    got = {r["vec_id"] for r in out.collect()}
    # bucket 9 (5 members) exceeds the cap and is excluded wholesale;
    # bucket 0 still prunes
    assert got == {2, 4}


def test_semantic_prune_no_cartesian(spark, prune_vecs):
    plan = semantic_prune(prune_vecs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _overlap_ref(rows):
    """Independent Python model of interval_overlap_stats."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, i, s, e in rows:
        by_key[k].append((s, i, e))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        ovs = [
            max(0, e - nxt_s) if nxt_s < e else 0
            for (s, i, e), (nxt_s, _, _) in zip(ivs, ivs[1:])
        ]
        n_over = sum(1 for o in ovs if o > 0)
        if n_over:
            out[k] = (len(ivs), n_over, sum(ovs), max(ovs))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 10_000),        # order id (deduped below)
              st.integers(0, 40),             # start
              st.integers(0, 25)),            # duration
    min_size=1, max_size=50))
def test_interval_overlap_property(spark, raw):
    seen, rows = set(), []
    for k, i, s, d in raw:
        if (k, i) in seen:      # order ids unique per key
            continue
        seen.add((k, i))
        rows.append((str(k), i, s, s + d))
    df = spark.createDataFrame(rows, "u string, i long, s long, e long")
    got = {
        r["key"]: (r["n_intervals"], r["n_overlaps"],
                   r["total_overlap"], r["max_overlap"])
        for r in interval_overlap_stats(df, "u", "s", "e", "i").collect()
    }
    assert got == _overlap_ref([(u, i, s, e) for u, i, s, e in rows])


def _gap_ref(rows):
    """Independent Python model of calendar_gaps."""
    import datetime
    from collections import defaultdict

    by_key = defaultdict(set)
    for k, d in rows:
        by_key[k].add(datetime.date.fromisoformat(d))
    out = {}
    for k, days in by_key.items():
        lo, hi = min(days), max(days)
        expected = [lo + datetime.timedelta(days=i)
                    for i in range((hi - lo).days + 1)]
        missing = [d for d in expected if d not in days]
        if missing:
            out[k] = (len(expected), len(days), len(missing), str(missing[0]))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 60)),   # key, day offset
    min_size=1, max_size=50))
def test_calendar_gaps_property(spark, raw):
    import datetime

    base = datetime.date(2024, 1, 1)
    rows = [(str(k), str(base + datetime.timedelta(days=o))) for k, o in raw]
    df = spark.createDataFrame(rows, "u string, d string")
    got = {
        r["key"]: (r["n_days_expected"], r["n_days_present"],
                   r["n_missing"], str(r["first_missing"]))
        for r in calendar_gaps(df, "u", "d").collect()
    }
    assert got == _gap_ref(rows)


def test_snapshot_diff_planted(spark):
    from anomaly_detection_spark.snapshots import snapshot_diff

    prev = spark.createDataFrame(
        [("a", "h1", "s0"), ("b", "h2", "s0"), ("c", "h3", "s1")],
        "doc_id string, fp string, source string")
    cur = spark.createDataFrame(
        [("a", "h1", "s0"),            # unchanged
         ("b", "h2x", "s0"),           # changed
         ("d", "h4", "s1")],           # added; c removed
        "doc_id string, fp string, source string")
    got = {
        r["doc_id"]: (r["diff_class"], r["source"])
        for r in snapshot_diff(prev, cur, carry=["source"]).collect()
    }
    assert got == {
        "a": ("unchanged", "s0"), "b": ("changed", "s0"),
        "c": ("removed", "s1"), "d": ("added", "s1"),
    }
