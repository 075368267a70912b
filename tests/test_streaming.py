"""Structured Streaming surface: fused row rules on a stream, stream–static
referential join, and cross-batch stateful uniqueness — each compared to the
batch engine on the same data."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleContext, RuleSet
from anomaly_detection_spark.streaming import (
    read_document_stream,
    streaming_duplicate_doc_ids,
    streaming_referential_violations,
    streaming_row_violations,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, docs):
    """Two landing-zone batches written as parquet files: docs split by a
    deterministic predicate so duplicate doc_ids land across BOTH batches."""
    base = tempfile.mkdtemp(prefix="stream_docs_")
    src, ckpt = f"{base}/in", f"{base}/ckpt"
    with_batch = docs.withColumn(
        "_b", F.pmod(F.xxhash64(F.coalesce("doc_id", F.lit("<null>"))), F.lit(2))
    )
    with_batch.filter("_b = 0").drop("_b").coalesce(1).write.parquet(f"{src}/b0")
    with_batch.filter("_b = 1").drop("_b").coalesce(1).write.parquet(f"{src}/b1")
    yield src, ckpt
    shutil.rmtree(base, ignore_errors=True)


def _run_to_memory(stream_df, spark, name, ckpt, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{ckpt}/{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_row_rules_match_batch(spark, docs, stream_dirs):
    src, ckpt = stream_dirs
    rules = RuleSet(
        row_rules=builtin.default_document_rules() + [builtin.span_sequence_valid_row()]
    )
    stream = read_document_stream(spark, f"{src}/*", max_files_per_trigger=1)
    got_df = _run_to_memory(
        streaming_row_violations(stream, rules), spark, "row_viols", ckpt
    )
    got = {(r["partition"], r["rule_id"], r["doc_id"]) for r in got_df.collect()}

    from anomaly_detection_spark.engine import ValidationRun

    batch = ValidationRun(spark, docs, rules).run(resume=False)
    want = {
        (r["partition"], r["rule_id"], r["doc_id"])
        for r in batch.violations.collect()
    }
    assert got == want and len(want) > 0


def test_streaming_referential_matches_batch(spark, docs, catalog, stream_dirs):
    src, ckpt = stream_dirs
    stream = read_document_stream(spark, f"{src}/*")
    got_df = _run_to_memory(
        streaming_referential_violations(stream, catalog), spark, "ref_viols", ckpt
    )
    got = {(r["partition"], r["doc_id"]) for r in got_df.collect()}
    want = {
        (r["partition"], r["doc_id"])
        for r in builtin.referential()
        .build(docs, RuleContext(media_catalog=catalog))
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_stateful_uniqueness_matches_batch(spark, docs, stream_dirs):
    src, ckpt = stream_dirs
    # one file per trigger ⇒ at least two micro-batches ⇒ duplicates that
    # straddle batches exercise the cross-batch state path
    stream = read_document_stream(spark, f"{src}/*", max_files_per_trigger=1)
    got_df = _run_to_memory(
        streaming_duplicate_doc_ids(stream), spark, "dup_viols", ckpt,
        output_mode="update",
    )
    got = {(r["partition"], r["doc_id"]) for r in got_df.collect()}
    want = {
        (r["partition"], r["doc_id"])
        for r in builtin.unique("doc_id").build(docs, RuleContext()).collect()
    }
    assert got == want and len(want) > 0
