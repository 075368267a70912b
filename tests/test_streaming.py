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
        row_rules=builtin.default_document_rules()
        + [builtin.span_sequence_valid_row(), builtin.no_pii(),
           builtin.media_caption_adjacent(), builtin.media_run_cap(max_run=2),
           builtin.text_encoding_clean()]
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
    # datagen's MOJIBAKE plant must fire through the streaming pass too
    assert any(r[1] == "text_encoding_clean" for r in got)


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


def test_streaming_windowed_counts_watermark_semantics(spark):
    """Watermark + tumbling window on a file stream: with two time-ordered
    micro-batches, append mode must emit exactly the windows whose end the
    first batch's watermark (max event time − 1h) passed — matching the
    batch aggregation on those windows — and withhold everything later."""
    import datetime

    from anomaly_detection_spark.streaming import streaming_windowed_counts

    base = tempfile.mkdtemp(prefix="stream_events_")
    try:
        # watermarks require TIMESTAMP (testdata ships TIMESTAMP_NTZ);
        # session TZ is UTC so the cast is value-preserving
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        split = "2024-01-15"
        events.filter(F.col("ts") < split).coalesce(1).write.parquet(f"{base}/in/b0")
        events.filter(F.col("ts") >= split).coalesce(1).write.parquet(f"{base}/in/b1")

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{base}/in/*")
        )
        got_df = _run_to_memory(
            streaming_windowed_counts(stream), spark, "win_counts", f"{base}/ckpt"
        )
        got = {
            (r["window_start"], r["event_type"], r["n"]) for r in got_df.collect()
        }

        # expected: batch daily counts for every window the FINAL watermark
        # (max event time − 1h) closed — availableNow runs a trailing
        # no-data micro-batch that flushes state up to that watermark, so
        # only the still-open last window(s) are withheld
        wm = events.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
        want = {
            (r["window_start"], r["event_type"], r["n"])
            for r in events.groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            ).agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "event_type", "n")
            .filter(F.col("window_end") <= wm).collect()
        }
        assert got == want and len(want) > 0


    finally:
        shutil.rmtree(base, ignore_errors=True)


class _StubState:
    """Duck-typed GroupState for unit-testing the tracker's state hygiene."""

    def __init__(self):
        self.value = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self.value is not None

    @property
    def get(self):
        return self.value

    def update(self, v):
        self.value = v

    def remove(self):
        self.value, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_duplicate_tracker_state_stays_bounded():
    """A hot duplicate key must not grow state linearly: the stored partition
    list is capped while counts and emissions stay exact."""
    import pandas as pd

    from anomaly_detection_spark.streaming import make_duplicate_tracker

    track = make_duplicate_tracker(max_tracked_partitions=4, state_ttl_ms=60_000)
    state = _StubState()
    emitted = 0
    for batch in range(50):
        out = list(track(("dup",), iter([pd.DataFrame({
            "partition": [f"p{batch}", f"p{batch}"]
        })]), state))
        emitted += sum(len(o) for o in out)
    n_seen, parts_str = state.value
    assert n_seen == 100
    assert len(parts_str.split("|")) <= 4  # bounded, not 100 entries
    assert state.timeout_ms == 60_000  # TTL registered on every update
    assert emitted == 100  # every duplicate occurrence emitted exactly once

    # timed-out invocation clears the state
    state.hasTimedOut = True
    assert list(track(("dup",), iter([]), state)) == []
    assert state.removed and not state.exists


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


def test_streaming_session_window_matches_batch(spark):
    """Native session_window on a stream (W1's streaming twin): append mode
    emits exactly the sessions the final watermark closed, and they must
    equal BOTH the batch session_window aggregation and the engine's
    lag+cumsum sessionization (starts + event counts) on the same events."""
    import datetime
    import tempfile, shutil
    from pyspark.sql.window import Window
    from anomaly_detection_spark.streaming import streaming_sessionized_counts

    base = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        # watermarks require TIMESTAMP (testdata ships TIMESTAMP_NTZ)
        events = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                    "event_id")
        )
        split = "2024-01-15"
        events.filter(F.col("ts") < split).coalesce(1).write.parquet(f"{base}/in/b0")
        events.filter(F.col("ts") >= split).coalesce(1).write.parquet(f"{base}/in/b1")
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{base}/in/*")
        )
        got_df = _run_to_memory(
            streaming_sessionized_counts(stream), spark, "sess", f"{base}/ckpt"
        )
        got = {(r["user_id"], r["session_start"], r["session_end"],
                r["n_events"]) for r in got_df.collect()}

        wm = events.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
        batch = (
            events.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                           "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events")
            .filter(F.col("session_end") <= wm)
        )
        want = {(r["user_id"], r["session_start"], r["session_end"],
                 r["n_events"]) for r in batch.collect()}
        assert got == want and len(want) > 0

        # cross-check starts + sizes against the engine's lag+cumsum form
        w = Window.partitionBy("user_id").orderBy("ts")
        lagged = events.withColumn(
            "new_s",
            (F.coalesce(
                F.col("ts").cast("long") - F.lag("ts").over(w).cast("long"),
                F.lit(10**9)) > 1800).cast("int"),
        ).withColumn("sid", F.sum("new_s").over(w))
        cumsum = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in lagged.groupBy("user_id", "sid")
            .agg(F.min("ts").alias("session_start"),
                 F.count("*").alias("n_events"))
            .collect()
        }
        emitted = {(u, s, n) for u, s, e, n in got}
        assert emitted <= cumsum and len(emitted) > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_psi_drift_matches_batch(spark):
    """The chained-window streaming PSI must equal drift.psi run per closed
    window in batch (window start = the batch 'partition'), including the
    baseline-only-bin penalty terms."""
    import datetime

    from anomaly_detection_spark import drift
    from anomaly_detection_spark.streaming import streaming_psi_drift

    base_dir = tempfile.mkdtemp(prefix="stream_psi_")
    try:
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        split = "2024-01-15"
        baseline = events.filter(F.col("ts") < split)
        current = events.filter(F.col("ts") >= split)
        # a bin the current stream never emits, to exercise the
        # baseline-only penalty path
        base_hist = baseline.groupBy(F.col("event_type").alias("bin")) \
            .agg(F.count("*").alias("count")) \
            .unionByName(spark.createDataFrame(
                [("ghost_type", 500)], "bin string, count long"))

        current.coalesce(1).write.parquet(f"{base_dir}/in/b0")
        stream = (
            spark.readStream.schema(current.schema)
            .parquet(f"{base_dir}/in/*")
        )
        got_df = _run_to_memory(
            streaming_psi_drift(stream, base_hist), spark, "psi_drift",
            f"{base_dir}/ckpt",
        )
        got = {r["window_start"]: r["psi"] for r in got_df.collect()}
        assert len(got) > 0

        # batch expectation on exactly the windows the final watermark
        # closed (availableNow flushes to max event time − 1h)
        wm = current.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
        cur_hist = drift.categorical_histogram(
            current.withColumn(
                "w", F.window("ts", "1 day")
            ).filter(F.col("w.end") <= wm).withColumn(
                "partition", F.col("w.start").cast("string")
            ),
            F.col("event_type"),
        )
        b_named = base_hist.withColumn("partition", F.lit("x"))
        want = {}
        for part in [r["partition"] for r in cur_hist.select("partition").distinct().collect()]:
            one = cur_hist.filter(F.col("partition") == part)
            psi_val = drift.psi(
                one, b_named.withColumn("partition", F.lit(part))
            ).first()["psi"]
            want[part] = psi_val
        got_by_str = {str(k): v for k, v in got.items()}
        assert set(got_by_str) == set(want)
        for k in want:
            assert abs(got_by_str[k] - want[k]) < 1e-9, k
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


def test_streaming_ks_drift_matches_batch(spark):
    """The chained-window streaming KS must equal drift.ks_statistic run per
    closed window in batch, evaluating at both current and baseline-only
    bins (the full-outer-join semantics of the batch version)."""
    import datetime

    from anomaly_detection_spark import drift
    from anomaly_detection_spark.streaming import streaming_ks_drift

    base_dir = tempfile.mkdtemp(prefix="stream_ks_")
    try:
        events = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        split = "2024-01-15"
        binned = (F.floor(F.col("value") / 20) * 20).cast("double")
        baseline = events.filter(F.col("ts") < split)
        current = events.filter(F.col("ts") >= split)
        # a baseline-only bin far outside the current range exercises the
        # baseline-step evaluation path
        base_hist = baseline.groupBy(binned.alias("bin")) \
            .agg(F.count("*").alias("count")) \
            .unionByName(spark.createDataFrame(
                [(10000.0, 200)], "bin double, count long"))

        current.coalesce(1).write.parquet(f"{base_dir}/in/b0")
        stream = (
            spark.readStream.schema(current.schema)
            .parquet(f"{base_dir}/in/*")
        )
        got_df = _run_to_memory(
            streaming_ks_drift(stream, base_hist, value=binned),
            spark, "ks_drift", f"{base_dir}/ckpt",
        )
        got = {str(r["window_start"]): r["ks"] for r in got_df.collect()}
        assert len(got) > 0

        wm = current.agg(F.max("ts")).first()[0] - datetime.timedelta(hours=1)
        cur_hist = drift.numeric_histogram(
            current.withColumn("w", F.window("ts", "1 day"))
            .filter(F.col("w.end") <= wm)
            .withColumn("partition", F.col("w.start").cast("string")),
            binned,
        )
        want = {}
        for part in [r["partition"] for r in cur_hist.select("partition").distinct().collect()]:
            one = cur_hist.filter(F.col("partition") == part)
            want[part] = drift.ks_statistic(
                one, base_hist.withColumn("partition", F.lit(part))
            ).first()["ks"]
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k
        # the ghost baseline bin forces CDF_cur=1 vs CDF_base<1 at x=10000:
        # KS must be at least that gap
        assert all(v >= 200 / (baseline.count() + 200) - 1e-9 for v in got.values())
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


def test_streaming_checksum_matches_batch(spark, docs, stream_dirs):
    """table_checksum is streaming-legal unchanged: the running grouped
    sum (complete mode, one state row per partition) over the landed
    batches equals the batch checksum of the same rows bit-for-bit."""
    from anomaly_detection_spark.functions.reconcile import table_checksum

    src, ckpt = stream_dirs
    cols = [F.col("doc_id"), F.to_json(F.col("spans"))]
    stream = read_document_stream(spark, f"{src}/*")
    got_df = _run_to_memory(
        table_checksum(stream, cols), spark, "stream_cksum", ckpt,
        output_mode="complete",
    )
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(map(tuple, table_checksum(docs, cols).collect()))
    assert got == want and len(want) > 0


def test_streaming_cdc_apply_matches_batch(spark):
    """Latest-wins CDC fold as a stream (cdc.cdc_apply's stateful twin):
    base seeded as seq-0 inserts, changelog split across two micro-batches
    so per-key update/delete sequences straddle the batch boundary — the
    per-key latest emission (op != 'D') must equal the batch merge, and a
    key whose winning change is a delete must be tombstoned out."""
    import shutil
    import tempfile
    from pyspark.sql.window import Window
    from anomaly_detection_spark.functions.cdc import cdc_apply
    from anomaly_detection_spark.streaming import streaming_cdc_apply

    base = spark.range(20).selectExpr(
        "id AS k", "id * 100 AS cents", "'O' AS status")
    # updates on every 3rd key, deletes on every 5th, an insert of a new
    # key, and an out-of-order LOWER seq that must lose
    changes = spark.createDataFrame(
        [(int(k), "U", int(k * 10 + 1), int(k * 100 + 7), "P")
         for k in range(0, 20, 3)]
        + [(int(k), "D", int(k * 10 + 2), None, None)
           for k in range(0, 20, 5)]
        + [(99, "I", 500, 4242, "N"),
           (3, "U", 5, 1, "stale")],       # seq 5 < seq 31 -> must lose
        "k long, op string, seq long, cents long, status string")
    seeded = base.selectExpr(
        "k", "'I' AS op", "CAST(0 AS LONG) AS seq", "cents", "status"
    ).unionByName(changes)

    tmp = tempfile.mkdtemp(prefix="stream_cdc_")
    try:
        seeded.filter("seq % 2 = 0").coalesce(1).write.parquet(f"{tmp}/in/b0")
        seeded.filter("seq % 2 = 1").coalesce(1).write.parquet(f"{tmp}/in/b1")
        stream = (
            spark.readStream.schema(seeded.schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{tmp}/in/*")
        )
        got_df = _run_to_memory(
            streaming_cdc_apply(stream), spark, "cdc_state", f"{tmp}/ckpt",
            output_mode="update",
        )
        w = Window.partitionBy("k").orderBy(F.desc("seq"))
        latest = got_df.withColumn("_rn", F.row_number().over(w)) \
            .filter("_rn = 1")
        got = {(r["k"], r["cents"], r["status"])
               for r in latest.filter("op <> 'D'").collect()}
        want = {(r["k"], r["cents"], r["status"])
                for r in cdc_apply(base, changes, "k",
                                   ["cents", "status"]).collect()}
        assert got == want and len(want) > 0
        deleted = {r["k"] for r in latest.filter("op = 'D'").collect()}
        assert deleted == {0, 5, 10, 15} - {k for k, _, _ in got}
        assert (3, 1, "stale") not in got   # out-of-order lower seq lost
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
