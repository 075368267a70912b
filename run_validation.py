#!/usr/bin/env python
"""spark-submit entry point for the validation engine.

Cluster deployment (north-rule shape):

    zip -r engine.zip anomaly_detection_spark
    spark-submit --master <cluster> --py-files engine.zip run_validation.py \
        --input  <path-or-iceberg-table of documents> \
        --catalog <path of media_catalog> \
        --output /path/to/run_output \
        --manifest /path/to/manifest \
        --snapshot-id s42 [--resume]

Reads the snapshot, runs the full fused rule suite (+ uniqueness +
referential + Arrow span-sequence check), writes three parquet outputs
(verdicts/, violations/, metrics/) and commits the (partition, rule_id)
progress manifest last — so an interrupted run re-evaluates, never skips.
The same script runs unchanged at any parallelism; local smoke:

    spark-submit --master 'local[4]' --py-files engine.zip run_validation.py ...
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="documents parquet path (or iceberg table with --format iceberg)")
    ap.add_argument("--catalog", required=True, help="media_catalog parquet path")
    ap.add_argument("--output", required=True, help="output dir (verdicts/violations/metrics)")
    ap.add_argument("--manifest", default=None, help="progress-manifest dir (enables resume)")
    ap.add_argument("--baseline", default=None,
                    help="previous-snapshot documents path; enables PSI/KS/quantile drift rules")
    ap.add_argument("--snapshot-id", default="s0")
    ap.add_argument("--resume", action="store_true",
                    help="skip (partition, rule_id) pairs already committed for this snapshot")
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "iceberg", "snaplog"],
                    help="input format: plain parquet path, Iceberg table "
                         "(needs the runtime jar on the cluster classpath), "
                         "or the engine's parquet-backed snapshot log "
                         "(identical snapshot semantics, jar-free)")
    ap.add_argument("--iceberg-snapshot-id", default=None,
                    help="pin the snapshot to validate (time travel); "
                         "default = current table state (iceberg/snaplog)")
    ap.add_argument("--incremental-from", default=None,
                    help="incremental read: validate only rows APPENDED "
                         "after this snapshot id (up to --iceberg-snapshot-id if "
                         "given) — the per-snapshot revalidation shape; composes "
                         "with the manifest, which already skips committed "
                         "(partition, rule) pairs (iceberg/snaplog)")
    ap.add_argument("--baseline-snapshot-id", default=None,
                    help="pin the --baseline read to a snapshot (iceberg/"
                         "snaplog); the natural drift baseline is an earlier "
                         "snapshot of the same table")
    ap.add_argument("--expect-schema", default=None,
                    help="JSON file of {column: simple_type_string} (or a list "
                         "of [name, type] pairs); enables the schema_match "
                         "contract rule (missing/extra/type-drifted columns)")
    ap.add_argument("--max-row-delta", type=float, default=0.5,
                    help="relative per-partition row-count tolerance vs "
                         "--baseline; enables row_count_drift when --baseline "
                         "is given")
    ap.add_argument("--report-json", default=None,
                    help="also write a driver-side JSON summary report "
                         "(per-rule totals; ≈ the reference's summary report)")
    ap.add_argument("--diff-prev", default=None,
                    help="previous run's verdicts parquet dir; writes the "
                         "snapshot-over-snapshot verdict diff (new_failure / "
                         "resolved / still_failing) to {output}/verdict_diff")
    ap.add_argument("--rules-config", default=None,
                    help="JSON rule-suite config (rules.config vocabulary, "
                         "e.g. serialized suggest_rules output) ADDED to the "
                         "default document suite")
    ap.add_argument("--export-csv", default=None,
                    help="also export the violation rows as headered CSV "
                         "(≈ the reference's export_all_anomalies_csv)")
    ap.add_argument("--emit-histograms", action="store_true",
                    help="persist the current snapshot's span-kind "
                         "histogram to {output}/span_kind_hist — the "
                         "metadata-sized drift baseline a later run "
                         "consumes via --baseline-hist (histograms merge "
                         "exactly across commits)")
    ap.add_argument("--baseline-hist", default=None,
                    help="parquet dir of a STORED (partition, bin, count) "
                         "span-kind histogram (from --emit-histograms); "
                         "enables PSI drift against it WITHOUT rescanning "
                         "the baseline snapshot")
    ap.add_argument("--max-violations-per-pair", type=int, default=None,
                    help="cap the violations SINK at K deterministic "
                         "exemplar rows per (partition, rule_id) — smallest "
                         "(doc_id, detail), skew-safe two-phase top-k. "
                         "Verdict/metric counts stay exact. Incompatible "
                         "with --quarantine, which must route on the FULL "
                         "violating-id set")
    ap.add_argument("--quarantine", default=None,
                    help="also write the INPUT docs routed by verdict: one "
                         "parquet dir partitioned by route=(clean|"
                         "quarantined) — clean docs ship to training, "
                         "violating docs go to remediation. Single scan of "
                         "the corpus, one join against the distinct "
                         "violating-id set (AQE broadcasts it when small)")
    ap.add_argument("--preflight", type=int, default=None, metavar="PCT",
                    help="triage pass before the full scan: evaluate the "
                         "suite's ROW rules on a deterministic PCT%% "
                         "md5-bucket sample of doc_id (stable membership, "
                         "pure pushed-down filter) and write estimated "
                         "per-(partition, rule) violation ppm to "
                         "{output}/preflight. Dataset rules (uniqueness, "
                         "referential) are excluded — their statistics "
                         "don't survive sampling")
    ap.add_argument("--preflight-only", action="store_true",
                    help="stop after the preflight estimate (the "
                         "is-this-snapshot-obviously-broken run); requires "
                         "--preflight")
    ap.add_argument("--cooccurrence-report", action="store_true",
                    help="also write {output}/rule_cooccurrence: per rule "
                         "pair the distinct-doc overlap and integer-ppm "
                         "Jaccard over the FULL violations sink — finds "
                         "redundant rules (Jaccard ≈ 1e6) and shared root "
                         "causes. With --max-violations-per-pair the sink "
                         "holds exemplars only, so overlaps are "
                         "exemplar-based")
    ap.add_argument("--slice-dims", default=None, metavar="C1,C2,...",
                    help="also write {output}/violation_slices: per failing "
                         "rule × (dimension, value) slice of the corpus, "
                         "the violation rate vs the rule's overall rate as "
                         "an exact integer lift — WHERE is each rule "
                         "failing? One unpivot scan over the named "
                         "columns, violating ids joined once")
    ap.add_argument("--fingerprint-cols", default=None, metavar="C1,C2,...",
                    help="also write {output}/column_fingerprints: a KMV "
                         "content sketch per named top-level column — two "
                         "snapshots' sketches match iff the value SETS "
                         "match, so renames are detectable where "
                         "schema_match only sees drop+add")
    ap.add_argument("--fingerprint-prev", default=None,
                    help="a previous run's column_fingerprints dir; writes "
                         "{output}/column_renames classifying each sketch "
                         "as stable/renamed/added/removed; requires "
                         "--fingerprint-cols")
    ap.add_argument("--emit-checksums", default=None, metavar="C1,C2,...",
                    help="also write {output}/checksums: per-partition "
                         "(n_rows, checksum) over the named columns — an "
                         "order/layout-independent md5-sum content "
                         "checksum (string/integer/boolean/date columns "
                         "only). The metadata-sized artifact a migration "
                         "or backfill compares via --checksum-prev")
    ap.add_argument("--checksum-prev", default=None,
                    help="a previous run's checksums dir; writes "
                         "{output}/checksum_reconcile classifying each "
                         "partition as match / count_mismatch / "
                         "content_mismatch / only_current / only_previous; "
                         "requires --emit-checksums with the SAME columns")
    args = ap.parse_args(argv)
    if args.max_violations_per_pair is not None and args.quarantine:
        ap.error("--max-violations-per-pair caps the violations sink, but "
                 "--quarantine routes documents from that sink and needs "
                 "the full violating-id set — drop one of the two")
    if args.max_violations_per_pair is not None \
            and args.max_violations_per_pair < 1:
        ap.error("--max-violations-per-pair must be >= 1")
    if args.preflight is not None and not (1 <= args.preflight <= 99):
        ap.error("--preflight must be a percentage in 1..99")
    if args.preflight_only and args.preflight is None:
        ap.error("--preflight-only requires --preflight")
    if args.fingerprint_prev and not args.fingerprint_cols:
        ap.error("--fingerprint-prev requires --fingerprint-cols")
    if args.checksum_prev and not args.emit_checksums:
        ap.error("--checksum-prev requires --emit-checksums")
    return args


def append_missing_pairs(spark, df, path: str,
                         keys: tuple[str, ...] = ("partition", "rule_id")) -> None:
    """Append ``df`` to the parquet sink at ``path``, skipping rows whose
    (partition, rule_id) the sink ALREADY holds — the idempotent half of the
    data-first/manifest-last resume contract. A crash between sink writes
    and the manifest commit leaves pairs pending; the retry recomputes them,
    and without this filter would append their rows a second time (some
    sinks, not others, depending on where the crash landed). Exactly-once
    per pair holds as long as each parquet job commit is atomic; a torn job
    commit (partial pair) needs a transactional (Iceberg/Delta) sink, where
    the whole run is one atomic commit instead."""
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(path).select(*keys).distinct()
    except AnalysisException:
        # first increment: sink doesn't exist yet. ONLY this narrow case may
        # skip the dedup — a transient read error (listing failure, corrupt
        # footer) must propagate, or the retry would silently double-append.
        existing = None
    if existing is not None:
        df = df.join(existing, list(keys), "left_anti")
    df.write.mode("append").parquet(path)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.manifest import RuleProgressManifest
    from anomaly_detection_spark.rules import builtin
    from anomaly_detection_spark.rules.core import RuleSet
    from anomaly_detection_spark.session import get_spark

    from anomaly_detection_spark.snapshots import read_table

    # only stop a session this run created: an embedding caller (tests, a
    # notebook driving several snapshots) keeps its own session alive
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"validate:{args.snapshot_id}")
    docs = read_table(
        spark, args.input, fmt=args.format,
        snapshot_id=args.iceberg_snapshot_id,
        incremental_from=args.incremental_from,
    )
    catalog = spark.read.parquet(args.catalog)

    rules = RuleSet(
        # span check fused into the single row-rule scan; the dataset-rule
        # form (span_sequence_valid) stays available for topology tests
        row_rules=builtin.default_document_rules()
        + [builtin.no_pii(), builtin.span_sequence_valid_row()],
        dataset_rules=[
            builtin.unique("doc_id"),
            builtin.referential(),
        ],
    )
    if args.rules_config:
        from anomaly_detection_spark.rules.config import suite_from_config

        with open(args.rules_config) as fh:
            learned = suite_from_config(fh.read())
        for r in learned.row_rules + learned.dataset_rules:
            rules.add(r)
    if args.baseline:
        base_docs = read_table(
            spark, args.baseline, fmt=args.format,
            snapshot_id=args.baseline_snapshot_id,
        )
        rules.add(builtin.psi_drift(base_docs)).add(builtin.ks_drift(base_docs))
        rules.add(builtin.quantile_drift(base_docs))
        rules.add(builtin.row_count_drift(base_docs, max_rel_delta=args.max_row_delta))
    elif args.baseline_hist:
        # drift without touching baseline DATA: the stored histogram is the
        # whole baseline state the PSI check needs
        rules.add(builtin.psi_drift_from_hist(
            spark.read.parquet(args.baseline_hist)))
    if args.expect_schema:
        import json as _json

        with open(args.expect_schema) as fh:
            contract = _json.load(fh)
        items = (
            list(contract.items()) if isinstance(contract, dict)
            else [tuple(x) for x in contract]
        )
        rules.add(builtin.schema_match(items))
    manifest = RuleProgressManifest(spark, args.manifest) if args.manifest else None
    run = ValidationRun(
        spark, docs, rules, media_catalog=catalog,
        snapshot_id=args.snapshot_id, manifest=manifest,
    )

    if args.preflight is not None:
        # triage BEFORE paying for the full scan: row rules fused into one
        # agg pass over a deterministic md5-bucket sample of the corpus
        from pyspark.sql import functions as F

        from anomaly_detection_spark.engine import sampled_violation_rates

        pre = sampled_violation_rates(
            docs, rules.row_rules, run.ctx, sample_pct=args.preflight)
        pre.write.mode("overwrite").parquet(f"{args.output}/preflight")
        worst = (
            spark.read.parquet(f"{args.output}/preflight")
            .orderBy(F.desc("est_ppm"), "partition", "rule_id")
            .limit(1).collect()
        )
        if worst:
            w = worst[0]
            print(f"PREFLIGHT pct={args.preflight} "
                  f"worst={w['partition']}/{w['rule_id']} "
                  f"est_ppm={w['est_ppm']} sample_n={w['sample_n']}")
        else:
            print(f"PREFLIGHT pct={args.preflight} empty-sample")
        if args.preflight_only:
            if owns_session:
                spark.stop()
            return 0

    result = run.run(resume=args.resume, commit_manifest=False)

    def write_verdict_diff(prev) -> None:
        """Diff the FULL current verdict sink (not just this run's pending
        increment — a resumed increment would falsely mark every
        already-committed failing pair 'resolved') against --diff-prev.
        ``prev`` must be materialized BEFORE the sink writes: --diff-prev
        may name this run's own verdicts dir."""
        from anomaly_detection_spark.history import verdict_diff

        cur = spark.read.parquet(f"{args.output}/verdicts")
        verdict_diff(cur, prev).write.mode("overwrite").parquet(
            f"{args.output}/verdict_diff")

    def write_histograms() -> None:
        """Persist the scanned rows' span-kind histogram under
        ``{output}/span_kind_hist/snapshot=<id>`` — metadata-sized
        (partition, bin, count) rows a later run reads via
        --baseline-hist. Incremental scans add their commit as a NEW
        subdir; the reader merges subdirs exactly (histogram counts are
        additive), so the stored baseline is always the whole-snapshot
        distribution, never just the last increment. Writing per-snapshot
        subdirs (not a read-merge-overwrite of one file) keeps the sink
        IDEMPOTENT under the crash-retry resume contract: re-running
        snapshot S overwrites only subdir S, never double-folds it."""
        from anomaly_detection_spark import drift as _drift

        base = f"{args.output}/span_kind_hist"
        hist = _drift.span_kind_histogram(docs, "partition")
        hist.write.mode("overwrite").parquet(
            f"{base}/snapshot={args.snapshot_id}")
        if not args.incremental_from:
            # full scan = the complete snapshot state: drop other commits'
            # subdirs so they can't double-count rows the full scan saw.
            # (Local-fs cleanup; an object-store/Iceberg deployment does
            # this as a metadata delete in the same transaction.)
            import os as _os
            import shutil as _shutil

            for sub in _os.listdir(base):
                if sub.startswith("snapshot=") and \
                        sub != f"snapshot={args.snapshot_id}":
                    _shutil.rmtree(_os.path.join(base, sub),
                                   ignore_errors=True)

    def write_quarantine() -> None:
        """Route the INPUT corpus by verdict from the FULL violations sink
        (a resumed increment must quarantine on the complete picture):
        distinct non-null violating doc_ids in one left join (AQE
        broadcast-converts when small), plus docs with NULL doc_id — they
        can never be matched to a violation row, and an untrackable doc
        must not ship to training via route=clean."""
        from pyspark.sql import functions as F

        bad_ids = (
            spark.read.parquet(f"{args.output}/violations")
            .select("doc_id").filter(F.col("doc_id").isNotNull())
            .distinct().withColumn("_q", F.lit(True))
        )
        # route is a STRING partition column (clean|quarantined): partition
        # directory values round-trip as strings, so a boolean would come
        # back re-typed on read
        docs.join(bad_ids, "doc_id", "left").withColumn(
            "route",
            F.when(F.col("_q") | F.col("doc_id").isNull(),
                   F.lit("quarantined")).otherwise(F.lit("clean")),
        ).drop("_q").write.mode("overwrite").partitionBy(
            "route").parquet(args.quarantine)

    def write_cooccurrence() -> None:
        """Rule co-occurrence meta-analytics over the FULL violations sink
        (not just this run's increment — a resumed run must measure overlap
        on the complete picture): per rule pair, distinct-doc overlap and
        exact integer-ppm Jaccard. Self-join fan-out is bounded by the
        suite size, never by the corpus."""
        from anomaly_detection_spark.engine import rule_cooccurrence

        v = spark.read.parquet(f"{args.output}/violations")
        rule_cooccurrence(v).write.mode("overwrite").parquet(
            f"{args.output}/rule_cooccurrence")

    def write_slices() -> None:
        """Slice-lift localization over the FULL violations sink (resume-
        safe: the complete picture, not this run's increment) against the
        input corpus, over the user-named dimension columns."""
        from anomaly_detection_spark.engine import violation_slices

        dims = [c.strip() for c in args.slice_dims.split(",") if c.strip()]
        v = spark.read.parquet(f"{args.output}/violations")
        violation_slices(docs, v, dims, ctx=run.ctx).write.mode(
            "overwrite").parquet(f"{args.output}/violation_slices")

    def write_fingerprints() -> None:
        """KMV content sketches of the named columns (one stack-unpivot
        scan of the input), plus — when --fingerprint-prev names an earlier
        run's sketches — the rename classification: equal sketches with
        different names are RENAMES, which schema_match can only report as
        a drop + an add."""
        from pyspark.sql import functions as F

        from anomaly_detection_spark.profiler import content_fingerprint

        cols = [c.strip() for c in args.fingerprint_cols.split(",")
                if c.strip()]
        content_fingerprint(docs, cols).write.mode("overwrite").parquet(
            f"{args.output}/column_fingerprints")
        if args.fingerprint_prev:
            prev = spark.read.parquet(args.fingerprint_prev)
            cur = spark.read.parquet(f"{args.output}/column_fingerprints")
            joined = (
                prev.select(F.col("column").alias("prev_col"), "sketch")
                .join(cur.select(F.col("column").alias("cur_col"), "sketch"),
                      "sketch", "full_outer")
            )
            status = (
                F.when(F.col("prev_col").isNull(), F.lit("added"))
                .when(F.col("cur_col").isNull(), F.lit("removed"))
                .when(F.col("prev_col") == F.col("cur_col"), F.lit("stable"))
                .otherwise(F.lit("renamed"))
            )
            joined.select("prev_col", "cur_col", "sketch",
                          status.alias("status")).write.mode(
                "overwrite").parquet(f"{args.output}/column_renames")

    def write_checksums() -> None:
        """Order/layout-independent per-partition content checksum of the
        scanned rows over the user-named columns (one scan, map-side
        combined, #partitions result rows) — plus, when --checksum-prev
        names an earlier run's checksums, the reconciliation verdict: a
        broadcast-sized join of two metadata tables, never of data."""
        from anomaly_detection_spark.functions.reconcile import (
            reconcile, table_checksum)

        cols = [c.strip() for c in args.emit_checksums.split(",")
                if c.strip()]
        cur = table_checksum(docs, cols, partition_col=run.ctx.partition_col)
        cur.write.mode("overwrite").parquet(f"{args.output}/checksums")
        if args.checksum_prev:
            prev = spark.read.parquet(args.checksum_prev)
            reconcile(
                spark.read.parquet(f"{args.output}/checksums"), prev
            ).write.mode("overwrite").parquet(
                f"{args.output}/checksum_reconcile")

    if result.nothing_pending:
        # every planned pair is already committed: leave the existing sink
        # outputs untouched (overwriting them with the empty frames would
        # clobber the previous run's real results) — but still refresh the
        # requested derived outputs (diff, histograms, quarantine), or a
        # stale/absent one from an earlier run would linger: they derive
        # from the input + the already-complete sinks, not from this run's
        # (empty) increment
        if args.diff_prev:
            write_verdict_diff(spark.read.parquet(args.diff_prev).localCheckpoint())
        if args.emit_histograms:
            # idempotent: re-running snapshot S only rewrites subdir S
            write_histograms()
        if args.quarantine:
            write_quarantine()
        if args.cooccurrence_report:
            write_cooccurrence()
        if args.slice_dims:
            write_slices()
        if args.fingerprint_cols:
            write_fingerprints()
        if args.emit_checksums:
            write_checksums()
        print(f"VALIDATION_DONE snapshot={args.snapshot_id} failing_pairs=0 "
              "(resume: nothing pending, outputs unchanged)")
        if owns_session:
            spark.stop()
        return 0

    # Write order is the resume contract: data first, manifest last — a crash
    # between the sink writes and the commit re-evaluates, never skips.
    # Mode: a resumed run with prior commits only computes NEW pairs, so it
    # appends to the previous outputs; a fresh (or fully re-evaluated) run
    # overwrites. Appends are IDEMPOTENT per (partition, rule_id): a crash
    # after some sink writes but before the manifest commit leaves those
    # pairs pending, and the retry must not append their rows a second time
    # — each sink drops pairs it already holds (see append_missing_pairs).
    # With Iceberg/Delta sinks all of this becomes one atomic commit.
    prev_verdicts = None
    if args.diff_prev:
        # materialize BEFORE the sink writes: --diff-prev may name this
        # run's own verdicts dir, which mode=overwrite is about to replace
        prev_verdicts = spark.read.parquet(args.diff_prev).localCheckpoint()

    # Sink policy, not engine semantics: verdict/metric counts were already
    # derived from the FULL (persisted) violations frame inside run(), so
    # capping here bounds what lands on disk without touching correctness.
    sink_violations = result.violations
    if args.max_violations_per_pair is not None:
        from anomaly_detection_spark.engine import cap_violations

        sink_violations = cap_violations(
            result.violations, args.max_violations_per_pair)

    mode = "overwrite"
    if args.resume and manifest is not None:
        if manifest.completed_pairs(args.snapshot_id).limit(1).count() > 0:
            mode = "append"
    if mode == "append":
        append_missing_pairs(spark, sink_violations, f"{args.output}/violations")
        append_missing_pairs(spark, result.verdicts, f"{args.output}/verdicts")
        append_missing_pairs(spark, result.metrics, f"{args.output}/metrics")
    else:
        sink_violations.write.mode(mode).parquet(f"{args.output}/violations")
        result.verdicts.write.mode(mode).parquet(f"{args.output}/verdicts")
        result.metrics.write.mode(mode).parquet(f"{args.output}/metrics")
    if prev_verdicts is not None:
        write_verdict_diff(prev_verdicts)
    if args.export_csv:
        # S5: CSV export is a projection of the (pair-deduped) parquet sink,
        # not a second independent append — so a crash-retried increment
        # can never double-write rows into the CSV either
        spark.read.parquet(f"{args.output}/violations").write.mode(
            "overwrite").option("header", True).csv(args.export_csv)
    if args.emit_histograms:
        write_histograms()
    if args.quarantine:
        write_quarantine()
    if args.cooccurrence_report:
        write_cooccurrence()
    if args.slice_dims:
        write_slices()
    if args.fingerprint_cols:
        write_fingerprints()
    if args.emit_checksums:
        write_checksums()
    if manifest is not None:
        manifest.commit(result.metrics)

    n_fail = result.verdicts.filter("NOT pass").count()
    if args.report_json:
        # S4: small driver-side JSON summary over the (already tiny) verdict
        # grid — per-rule rollup, not per-row data (safe to collect)
        import json

        from pyspark.sql import functions as F

        per_rule = [
            r.asDict()
            for r in result.verdicts.groupBy("rule_id").agg(
                F.count("*").alias("partitions"),
                F.sum((~F.col("pass")).cast("long")).alias("failing_partitions"),
                F.sum("violation_count").alias("violations"),
            ).orderBy("rule_id").collect()
        ]
        # per-partition narrative rollup (≈ report_generator.py:358-482
        # generate_user_report/generate_department_report recast per
        # partition): top-3 failing rules by violations, totals, verdict
        # line — still the metadata-sized verdict grid, never row data
        top_fail = F.slice(
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("pass"),
                        F.struct(
                            (-F.col("violation_count")).alias("_neg"),
                            F.col("rule_id"),
                            F.col("violation_count").alias("violations"),
                        ),
                    )
                )
            ),
            1, 3,
        )
        per_part = [
            {
                "partition": r["partition"],
                "rules_failing": r["rules_failing"],
                "violations": r["violations"],
                "top_failing_rules": [
                    {"rule_id": t["rule_id"], "violations": t["violations"]}
                    for t in (r["top"] or [])
                ],
            }
            for r in result.verdicts.groupBy("partition").agg(
                F.sum((~F.col("pass")).cast("long")).alias("rules_failing"),
                F.sum("violation_count").alias("violations"),
                top_fail.alias("top"),
            ).orderBy("partition").collect()
        ]
        report = {"snapshot_id": args.snapshot_id, "failing_pairs": n_fail,
                  "rules": per_rule, "partitions": per_part}
        if manifest is not None:
            # trend direction over the manifest's snapshot history (needs
            # ≥3 committed snapshots per pair; empty until then)
            from anomaly_detection_spark.history import violation_trends

            report["trends"] = [
                r.asDict()
                for r in violation_trends(manifest.read())
                .orderBy("partition", "rule_id").collect()
            ]
        if args.diff_prev:
            diff = spark.read.parquet(f"{args.output}/verdict_diff")
            report["verdict_diff"] = {
                r["status"]: r["n"]
                for r in diff.groupBy("status").agg(
                    F.count("*").alias("n")).collect()
            }
        with open(args.report_json, "w") as fh:
            json.dump(report, fh, indent=2)
    print(f"VALIDATION_DONE snapshot={args.snapshot_id} failing_pairs={n_fail}")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
