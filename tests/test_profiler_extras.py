"""Heavy-hitters profile and JSON key discovery (profiler additions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.profiler import frequent_values, json_key_profile


def test_frequent_values_topk_and_ties(spark):
    rows = (
        [("a", 10)] * 5 + [("b", 10)] * 3 + [("c", 10)] * 3
        + [("d", 20)] * 1 + [(None, None)] * 2
    )
    df = spark.createDataFrame(rows, "s string, x int")
    out = {(r["column"], r["rank"]): (r["value"], r["cnt"])
           for r in frequent_values(df, ["s", "x"], k=2).collect()}
    assert out[("s", 1)] == ("a", 5)
    assert out[("s", 2)] == ("b", 3)       # tie b/c broken by value ASC
    assert out[("x", 1)] == ("10", 11)     # rendered as string
    assert out[("x", 2)] == ("20", 1)
    assert ("s", 3) not in out             # k respected, NULLs excluded


def test_frequent_values_salted_phase_agrees(spark):
    # 1 salt bucket vs 16 must give identical output (two-phase top-k is
    # an optimization, never a semantics change)
    df = spark.createDataFrame(
        [(str(i % 37),) for i in range(500)], "v string")
    a = sorted(map(tuple, frequent_values(df, ["v"], k=7,
                                          salt_buckets=1).collect()))
    b = sorted(map(tuple, frequent_values(df, ["v"], k=7,
                                          salt_buckets=16).collect()))
    assert a == b and len(a) == 7


JSON_ROWS = [
    ('{"a": 1, "b": "x"}',),
    ('{"a": 22, "b": null, "c": true}',),
    ('{"a": -3, "nested": {"z": 1}}',),
    ('{}',),                # valid empty object: no keys, NOT invalid
    ('not json at all',),   # -> __invalid__
    (None,),                # NULL input: ignored entirely
]


def test_json_key_profile_types_and_invalid(spark):
    df = spark.createDataFrame(JSON_ROWS, "props string")
    out = {r["key"]: r for r in json_key_profile(df, "props").collect()}
    assert set(out) == {"a", "b", "c", "nested", "__invalid__"}
    a = out["a"]
    assert (a["n"], a["n_int"], a["vmin"], a["vmax"]) == (3, 3, -3, 22)
    b = out["b"]
    assert (b["n"], b["n_int"], b["n_null"], b["n_other"]) == (2, 0, 1, 1)
    assert out["c"]["n_bool"] == 1
    assert out["nested"]["n_other"] == 1   # flat view: nested = other
    inv = out["__invalid__"]
    assert inv["n"] == 1 and inv["n_null"] == 0


def test_json_key_profile_partitioned(spark):
    df = spark.createDataFrame(
        [("p0", '{"k": 5}'), ("p0", '{"k": 7}'), ("p1", '{"k": 1}')],
        "part string, props string")
    out = {(r["partition"], r["key"]): r for r in json_key_profile(
        df, "props", partition_col="part").collect()}
    assert out[("p0", "k")]["n"] == 2 and out[("p0", "k")]["vmax"] == 7
    assert out[("p1", "k")]["vmin"] == 1


def test_seasonal_residuals_planted_anomaly(spark):
    """Hour-of-day baseline: a spike scores high z against ITS hour's
    cross-day baseline; constant slots (zero variance) and thin
    baselines (n_days < min_periods) are dropped."""
    import datetime as dt

    from anomaly_detection_spark.functions.timeseries import (
        seasonal_residuals)

    rows = []
    base = dt.datetime(2024, 3, 1, 0, 0)
    for d in range(5):
        day = base + dt.timedelta(days=d)
        n = 30 if d == 4 else 10          # hour 0: spike on the last day
        rows += [("k", day + dt.timedelta(minutes=i % 60)) for i in range(n)]
        rows += [("k", day.replace(hour=1) + dt.timedelta(minutes=i))
                 for i in range(7)]       # hour 1: constant -> zero var
    rows += [("thin", base.replace(hour=2)), ("thin", base + dt.timedelta(days=1, hours=2))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = seasonal_residuals(df, min_periods=3).collect()
    got = {(r["key"], str(r["day"]), r["hour"]): r for r in out}
    assert all(k[0] == "k" and k[2] == 0 for k in got), got.keys()
    # exact reference: x=[10,10,10,10,30], spike z = (5*30-70)/sqrt(5*1300-4900)
    import math
    z = (5 * 30 - 70) / math.sqrt(5 * 1300 - 70 * 70)
    spike = got[("k", "2024-03-05", 0)]
    assert spike["z_micro"] == math.floor(z * 1e6 + 0.5)
    assert spike["cnt"] == 30 and spike["n_days"] == 5
    lows = [r["z_micro"] for k, r in got.items() if k[1] != "2024-03-05"]
    assert all(v < 0 for v in lows)       # the four 10-count days sit below mean


def test_containment_catches_quote_inclusion(spark):
    """A short excerpt inside a long doc: containment = 1.0 while
    resemblance Jaccard is tiny (the pair ngram_jaccard_pairs' threshold
    would drop); docs sharing ONLY a stop-shingle (df > max_df) never
    pair."""
    from anomaly_detection_spark.functions.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs)

    long_toks = [f"w{i}" for i in range(100)]
    excerpt = long_toks[40:60]
    boiler = "all rights reserved"
    rows = [("L", " ".join(long_toks)),
            ("S", " ".join(excerpt)),
            ("U", " ".join(f"u{i}" for i in range(50)))]
    # 30 filler docs sharing only the boilerplate phrase
    rows += [(f"f{i}", f"x{i} y{i} {boiler} z{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    got = {(r["id_a"], r["id_b"]): r for r in ngram_containment_pairs(
        df, threshold=0.8, max_df=10, min_shared=2).collect()}
    assert set(got) == {("L", "S")}
    pair = got[("L", "S")]
    assert pair["containment"] == 1.0          # excerpt fully contained
    assert pair["n_a"] == 98 and pair["n_b"] == 18

    # the same pair is invisible to resemblance Jaccard at any useful
    # threshold: J = 18/98
    jac = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert ("L", "S") not in {(r["id_a"], r["id_b"]) for r in jac}
    assert ("S", "L") not in {(r["id_a"], r["id_b"]) for r in jac}
