"""Profiler correctness vs pandas, and salted-aggregation equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.profiler import profile_columns, span_kind_counts


@pytest.fixture(scope="module")
def stats(docs):
    return {
        (r["partition"], r["column"], r["metric"]): (r["value"], r["value_str"])
        for r in profile_columns(docs, exact_distinct=True).collect()
    }


def test_rows_and_null_counts(stats, docs_pd):
    g = docs_pd.groupby("partition")
    for part, grp in g:
        assert stats[(part, "_table_", "rows")][0] == len(grp)
        assert stats[(part, "doc_id", "null_count")][0] == grp.doc_id.isna().sum()
        assert stats[(part, "doc_id", "null_rate")][0] == pytest.approx(
            grp.doc_id.isna().mean()
        )


def test_distinct_and_minmax(stats, docs_pd):
    for part, grp in docs_pd.groupby("partition"):
        assert stats[(part, "doc_id", "approx_distinct")][0] == grp.doc_id.dropna().nunique()
        assert stats[(part, "doc_id", "min")][1] == grp.doc_id.dropna().min()
        assert stats[(part, "doc_id", "max")][1] == grp.doc_id.dropna().max()


def test_array_lengths(stats, docs_pd):
    for part, grp in docs_pd.groupby("partition"):
        lens = grp.spans.apply(len)
        assert stats[(part, "spans", "avg_length")][0] == pytest.approx(lens.mean())
        assert stats[(part, "spans", "max_length")][0] == lens.max()


def test_salted_kind_counts_equal_unsalted(docs):
    plain = {
        (r["partition"], r["kind"]): r["span_count"]
        for r in span_kind_counts(docs).collect()
    }
    salted = {
        (r["partition"], r["kind"]): r["span_count"]
        for r in span_kind_counts(docs, salt_buckets=16).collect()
    }
    assert plain == salted and len(plain) > 0


def test_text_kind_is_skewed(docs):
    """The fixture really does plant the skew the salting path exists for."""
    counts = span_kind_counts(docs).groupBy("kind").agg(F.sum("span_count").alias("n"))
    rows = {r["kind"]: r["n"] for r in counts.collect()}
    total = sum(rows.values())
    assert rows["text"] / total > 0.40


def test_mergeable_profile_merge_equals_recompute(spark):
    """The incremental-profiling soundness property: profiling snapshot
    commits separately and merging must be BIT-IDENTICAL to profiling the
    union directly — including NULL columns, an all-null partition slice,
    and cents-quantized doubles (scale=100)."""
    from anomaly_detection_spark.profiler import (
        merge_profiles,
        mergeable_profile,
    )

    rows = [
        ("p0", 1.25, 10), ("p0", 2.50, None), ("p0", None, 30),
        ("p1", -7.75, 40), ("p1", 0.0, 50),
        ("p2", None, None), ("p2", None, None),   # all-null slice
    ]
    df = spark.createDataFrame(rows, "partition string, x double, y int")
    a = df.filter("y IS NULL OR y <= 30")
    b = df.filter("y IS NOT NULL AND y > 30")

    def key(frame):
        return {
            (r["partition"], r["column"]):
            (r["n"], r["n_null"], r["sum_s"], r["sum_sq_s"],
             r["min_v"], r["max_v"])
            for r in frame.collect()
        }

    merged = key(merge_profiles(
        mergeable_profile(a, ["x", "y"]), mergeable_profile(b, ["x", "y"])
    ))
    direct = key(mergeable_profile(df, ["x", "y"]))
    assert merged == direct
    # spot-check the exact integer sums (cents)
    assert merged[("p0", "x")] == (2, 1, 375, 78125, 125, 250)
    assert merged[("p2", "x")] == (0, 2, 0, 0, None, None)
