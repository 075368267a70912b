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
