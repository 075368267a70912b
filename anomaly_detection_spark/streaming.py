"""Structured Streaming surface of the validation engine.

The engine's primary execution model is incremental batch over table
snapshots (SURVEY.md §2.8: each snapshot is a closed window, resumability
comes from the (partition, rule_id) manifest). This module covers the cases
where documents *arrive* as a stream (files landing, Kafka, etc.):

* ``streaming_row_violations`` — ALL row rules (including bound-column Arrow
  UDF rules) are stateless projections, so the exact same fused select the
  batch engine compiles runs unchanged on a ``readStream`` DataFrame —
  one micro-batch scan, whole-stage codegen, no state.
* ``streaming_referential_violations`` — the dangling-``media_ref`` check is
  a stream–static broadcast left-anti join (supported by Structured
  Streaming for static dimension sides), so referential integrity holds
  globally without any state store.
* ``streaming_duplicate_doc_ids`` — doc_id uniqueness is the one rule that
  is genuinely stateful across micro-batches; implemented with
  ``applyInPandasWithState`` keyed by doc_id: state = rows seen so far; a
  violation row is emitted for every arrival after the first (and
  retroactively for the first row the moment a second appears, so the
  violation SET matches the batch engine's on the union of all batches).

Scale note: the state store shards by doc_id across executors (same key
distribution as the batch hash-agg); RocksDB state backend + watermark-based
TTL are the knobs at 10^12-doc scale, both plain Spark configs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from anomaly_detection_spark.rules.core import RuleContext, RuleSet

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "partition string"
)

_DUP_OUT_SCHEMA = StructType([
    StructField("partition", StringType()),
    StructField("rule_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("detail", StringType()),
])
_DUP_STATE_SCHEMA = StructType([
    StructField("n_seen", LongType()),
    StructField("partitions", StringType()),  # '|'-joined, first-seen order
])


def read_document_stream(spark, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of document parquet files (the landing-zone shape)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time windows WITH a late-data watermark (SURVEY §2.8:
    the streaming form of W2): counts per (window, key), where a window is
    finalized — and its state evicted — once the watermark (max event time −
    ``watermark``) passes its end. Late rows inside the allowance are
    aggregated correctly; rows later than the allowance are dropped, which
    is what bounds the state store at 10^12-event scale."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "n",
        )
    )


def streaming_sessionized_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions on a stream via native ``session_window`` —
    the streaming twin of W1 (batch sessionization is lag+cumsum,
    ``queries.q_sessionize_events``). Sessions merge while events arrive
    within ``gap`` of each other; the watermark finalizes (and evicts) a
    session once max event time − allowance passes its close, which is what
    bounds the state store. Emits (session_start, session_end, key,
    n_events); ``session_end`` is last event + gap, per session-window
    semantics."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                 F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col, "n_events",
        )
    )


def streaming_row_violations(docs_stream: DataFrame, rules: RuleSet,
                             ctx: RuleContext | None = None) -> DataFrame:
    """The batch engine's fused row-rule pass applied to a streaming frame —
    identical plan shape (stateless project + filter + explode), so verdict
    semantics are the batch semantics per micro-batch."""
    from anomaly_detection_spark.engine import ValidationRun

    ctx = ctx or RuleContext()
    run = ValidationRun.__new__(ValidationRun)  # reuse the fused compiler only
    run.spark = docs_stream.sparkSession
    run.rules = rules
    run.ctx = ctx
    return run.fused_row_violations(docs_stream)


def streaming_referential_violations(docs_stream: DataFrame, media_catalog: DataFrame,
                                     ctx: RuleContext | None = None,
                                     rule_id: str = "referential:media_ref") -> DataFrame:
    """Stream–static broadcast anti-join: dangling refs per arriving doc."""
    ctx = ctx or RuleContext()
    p, d = ctx.partition_col, ctx.doc_id_col
    refs = (
        docs_stream.select(
            F.col(p).alias("partition"), F.col(d).alias("doc_id"),
            F.explode("spans").alias("s"),
        )
        .select("partition", "doc_id", F.col("s.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
    )
    dangling = refs.join(
        F.broadcast(media_catalog.select("media_ref").distinct()),
        "media_ref", "left_anti",
    )
    return dangling.select(
        "partition", F.lit(rule_id).alias("rule_id"), "doc_id",
        F.concat(F.lit("dangling media_ref: "), F.col("media_ref")).alias("detail"),
    )


def make_duplicate_tracker(rule_id: str = "unique:doc_id",
                           max_tracked_partitions: int = 32,
                           state_ttl_ms: int | None = None):
    """Build the ``applyInPandasWithState`` function for cross-batch doc_id
    uniqueness. Exposed separately so the state-hygiene contract is unit-
    testable without a running stream.

    State per doc_id is BOUNDED: (rows seen: long, partitions: '|'-joined
    string capped at ``max_tracked_partitions`` entries). The stored
    partition list is only ever read back for the retroactive first-row
    emission (which needs at most one entry), so capping it changes no
    emitted violation — it only stops a hot duplicate key from growing state
    linearly forever. With ``state_ttl_ms`` set, idle keys expire via
    processing-time timeout (the RocksDB-backend analogue of TTL compaction);
    an expiry forgets that a doc_id was seen, so a duplicate arriving later
    than the TTL is missed — the documented trade-off for bounded state at
    10^12 keys."""

    def track(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        doc_id = key[0]
        n_new = 0
        new_parts: list[str] = []
        for pdf in pdfs:
            n_new += len(pdf)
            new_parts.extend(pdf["partition"].tolist())
        if state.exists:
            n_seen, parts_str = state.get
            parts = parts_str.split("|") if parts_str else []
        else:
            n_seen, parts = 0, []
        total = n_seen + n_new
        out_parts: list[str] = []
        if total > 1:
            if n_seen <= 1:
                # first time we cross the threshold: retroactive emission
                out_parts = parts + new_parts
            else:
                out_parts = new_parts
        kept = (parts + new_parts)[:max_tracked_partitions]
        state.update((total, "|".join(kept)))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if out_parts:
            yield pd.DataFrame({
                "partition": out_parts,
                "rule_id": rule_id,
                "doc_id": doc_id,
                "detail": f"duplicate doc_id x{total}",
            })

    return track


def streaming_duplicate_doc_ids(docs_stream: DataFrame,
                                ctx: RuleContext | None = None,
                                rule_id: str = "unique:doc_id",
                                max_tracked_partitions: int = 32,
                                state_ttl_ms: int | None = None) -> DataFrame:
    """Cross-micro-batch doc_id uniqueness via ``applyInPandasWithState``.

    Emission contract: when the running count first exceeds 1, violations are
    emitted for ALL occurrences seen so far (including the retroactive first
    row); later arrivals emit one violation each — so after any prefix of
    batches the emitted (partition, rule_id, doc_id) set equals the batch
    engine's violation set on the data seen so far. State is bounded (see
    ``make_duplicate_tracker``)."""
    ctx = ctx or RuleContext()
    p, d = ctx.partition_col, ctx.doc_id_col
    track = make_duplicate_tracker(
        rule_id, max_tracked_partitions=max_tracked_partitions,
        state_ttl_ms=state_ttl_ms,
    )
    keyed = docs_stream.filter(F.col(d).isNotNull()).select(
        F.col(d).alias("doc_id"), F.col(p).alias("partition")
    )
    return keyed.groupBy("doc_id").applyInPandasWithState(
        track,
        outputStructType=_DUP_OUT_SCHEMA,
        stateStructType=_DUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None else GroupStateTimeout.NoTimeout
        ),
    )


_CDC_OUT_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("seq", LongType()),
    StructField("op", StringType()),
    StructField("cents", LongType()),
    StructField("status", StringType()),
])
_CDC_STATE_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("op", StringType()),
    StructField("cents", LongType()),
    StructField("status", StringType()),
])


def make_cdc_tracker():
    """Build the ``applyInPandasWithState`` function for streaming CDC
    apply — the incremental twin of ``cdc.cdc_apply``'s latest-wins fold:
    state per key is exactly ONE row (winning seq, op, payload) — bounded
    by construction, however many changes a hot key receives — and a new
    resolved row is emitted whenever a batch's best change for the key
    beats the stored sequence (out-of-order arrivals that lose simply
    don't emit, the same global contract the batch window enforces).
    Deletes emit a tombstone (op='D', NULL payload) so downstream sinks
    can retract; the current snapshot after any prefix of batches is the
    per-key latest emission with op != 'D'."""

    def track(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        k = key[0]
        best = None
        for pdf in pdfs:
            for seq, op, cents, status in zip(
                    pdf["seq"], pdf["op"], pdf["cents"], pdf["status"]):
                row = (
                    int(seq), str(op),
                    None if pd.isna(cents) else int(cents),
                    None if (status is None or (isinstance(status, float)
                                                and pd.isna(status)))
                    else str(status),
                )
                if best is None or row[0] > best[0]:
                    best = row
        cur_seq = state.get[0] if state.exists else None
        if best is not None and (cur_seq is None or best[0] > cur_seq):
            state.update(best)
            yield pd.DataFrame({
                "k": pd.array([k], dtype="int64"),
                "seq": pd.array([best[0]], dtype="int64"),
                "op": pd.array([best[1]], dtype="string"),
                "cents": pd.array([best[2]], dtype="Int64"),
                "status": pd.array([best[3]], dtype="string"),
            })

    return track


def streaming_cdc_apply(changes_stream: DataFrame) -> DataFrame:
    """Streaming CDC apply (the ``cdc.cdc_apply`` twin): a changelog
    stream ``(k long, op string, seq long, cents long, status string)``
    folds to per-key latest-wins state via ``applyInPandasWithState``.
    Seed the base snapshot as seq-0 'I' rows (the ``scd2_build``
    convention) and the resolved stream state equals the batch merge on
    the data seen so far — pinned by the parity test. State is one row
    per live key; shards by key across executors like the batch join."""
    return changes_stream.groupBy("k").applyInPandasWithState(
        make_cdc_tracker(),
        outputStructType=_CDC_OUT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_psi_drift(
    stream: DataFrame,
    baseline_hist: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-window PSI of a categorical distribution against a STATIC
    baseline histogram — the streaming twin of ``drift.psi`` (each closed
    event-time window plays the role of a batch partition), with
    bit-identical semantics: full-outer bins, per-side normalization,
    ``greatest(·, eps)`` smoothing, ``(p−q)·ln(p/q)`` terms.

    Physical shape: TWO chained watermarked window aggregations (counts
    per (window, bin), then one row per window carrying its bounded
    category list) — the Spark 3.4+ multiple-stateful-operator form. The
    baseline histogram is categorical, therefore bounded; it is collected
    ONCE driver-side and baked into the plan as literals, so there is no
    join at all downstream of the stateful aggs (a stream–static join
    after an aggregation would add a stage; literals fuse into the same
    project). Baseline-only bins contribute their (eps − q)·ln(eps/q)
    penalty via per-bin ``exists`` guards — exact batch parity, pinned by
    ``tests/test_streaming.py``."""
    base = {r["bin"]: r["count"] for r in baseline_hist.collect()}
    btot = float(sum(base.values()))
    counts = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"),
                 F.col(key_col).alias("bin"))
        .agg(F.count("*").alias("n"))
    )
    perwin = (
        counts
        .groupBy(F.window(F.window_time("w"), window_duration).alias("w2"))
        .agg(F.collect_list(F.struct("bin", "n")).alias("cats"))
    )
    # bind tot as a real column BEFORE any lambda references it: lambdas
    # get no common-subexpression elimination, so an inline tot would
    # re-sum the list once per category
    bound = perwin.select(
        "w2", "cats",
        F.aggregate("cats", F.lit(0).cast("long"),
                    lambda a, x: a + x["n"]).cast("double").alias("tot"),
    )

    def q_of(bin_col):
        expr = F.lit(0.0)
        for k, cnt in sorted(base.items()):
            expr = F.when(bin_col == F.lit(k), F.lit(cnt / btot)).otherwise(expr)
        return expr

    def term(p, q):
        ps = F.greatest(p, F.lit(eps))
        qs = F.greatest(q, F.lit(eps))
        return (ps - qs) * F.log(ps / qs)

    obs = F.aggregate(
        "cats", F.lit(0.0),
        lambda acc, x: acc + term(x["n"] / F.col("tot"), q_of(x["bin"])),
    )

    def has_bin(k):
        return F.exists("cats", lambda c: c["bin"] == F.lit(k))

    missing = F.lit(0.0)
    for k, cnt in sorted(base.items()):
        missing = missing + F.when(has_bin(k), F.lit(0.0)) \
            .otherwise(term(F.lit(0.0), F.lit(cnt / btot)))
    return bound.select(
        F.col("w2.start").alias("window_start"),
        F.col("w2.end").alias("window_end"),
        (obs + missing).alias("psi"),
    )


def streaming_ks_drift(
    stream: DataFrame,
    baseline_hist: DataFrame,
    value=None,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window two-sample KS statistic of a binned numeric expression vs a
    STATIC baseline histogram — the streaming twin of ``drift.ks_statistic``
    (each closed event-time window plays the role of a batch partition).

    ``baseline_hist`` must be a BOUNDED pre-bucketed histogram
    ``(bin double, count long)`` (for continuous values bucket with
    ``floor(value/width)*width``, exactly as the batch ``numeric_histogram``
    docstring prescribes); it is collected once driver-side and the baseline
    CDF is baked into the plan as a chained-``when`` step function, so —
    like ``streaming_psi_drift`` — nothing joins downstream of the stateful
    aggs. KS evaluates |CDF_cur − CDF_base| at every bin of EITHER side
    (a step-function difference attains its max at a step), giving exact
    batch parity, pinned by ``tests/test_streaming.py``.

    Physical shape: the same Spark 3.4+ chained-stateful-window form as the
    PSI twin — counts per (window, bin), then one row per window carrying
    its bounded bin list."""
    value = value if value is not None else F.col("value")
    base_rows = sorted(
        (float(r["bin"]), int(r["count"])) for r in baseline_hist.collect()
    )
    btot = float(sum(c for _, c in base_rows))
    steps: list[tuple[float, float]] = []
    cum = 0.0
    for b, c in base_rows:
        cum += c / btot
        steps.append((b, cum))

    def q_cdf(x):
        # chained whens, largest step first: CDF_base(x) = cum of last bin <= x
        expr = F.lit(0.0)
        for b, cq in steps:
            expr = F.when(x >= F.lit(b), F.lit(cq)).otherwise(expr)
        return expr

    counts = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"),
                 value.cast("double").alias("bin"))
        .agg(F.count("*").alias("n"))
    )
    perwin = (
        counts
        .groupBy(F.window(F.window_time("w"), window_duration).alias("w2"))
        .agg(F.collect_list(F.struct("bin", "n")).alias("bins"))
    )
    bound = perwin.select(
        "w2", "bins",
        F.aggregate("bins", F.lit(0).cast("long"),
                    lambda a, x: a + x["n"]).cast("double").alias("tot"),
    )

    def cdf_cur(x):
        hits = F.aggregate(
            "bins", F.lit(0).cast("long"),
            lambda a, c: a + F.when(c["bin"] <= x, c["n"]).otherwise(F.lit(0).cast("long")),
        )
        return hits / F.col("tot")

    cur_pts = F.array_max(
        F.transform("bins", lambda c: F.abs(cdf_cur(c["bin"]) - q_cdf(c["bin"])))
    )
    base_pts = F.lit(0.0)
    for b, cq in steps:
        base_pts = F.greatest(base_pts, F.abs(cdf_cur(F.lit(b)) - F.lit(cq)))
    ks = F.greatest(F.coalesce(cur_pts, F.lit(0.0)), base_pts)
    return bound.select(
        F.col("w2.start").alias("window_start"),
        F.col("w2.end").alias("window_end"),
        ks.alias("ks"),
    )
