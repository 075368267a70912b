"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ..., "docs_per_sec": ...}``.

``--scaling`` mode: the north_rule two-cluster-size evidence — run the
identical validation job at two parallelism levels (local[8] vs local[32])
on the same input in separate subprocesses (fresh JVMs), report docs/sec at
both plus efficiency = (throughput_4N / throughput_N) / 4, and write
BENCH/BASELINE.md.

``--worker N`` (internal): run just the validation job on local[N] and print
its JSON (used by --scaling).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline subset of the registry: one per operator family
HEADLINE = [
    "profile_lineitem",
    "pricing_summary",
    "top_building_orders",
    "nation_revenue",
    "sessionize_events",
    "change_points",
    "event_type_entropy",
    "psi_event_type_drift",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash_fingerprints",
    "doc_fingerprint",
    "embedding_ivf_topk",
    "media_metadata_stats",
]

# documents synthesized for the validation-suite throughput measurement
N_VALIDATION_DOCS = 2_000_000
# --scaling uses a larger corpus so compute dominates per-task overhead —
# at 2M docs the whole job is ~10s and scheduling noise swamps the signal
N_SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", 16_000_000))


def _force(df) -> int:
    """Materialize fully executor-side (noop sink), return row count cheaply."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _get_spark(cores: str):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from anomaly_detection_spark.session import get_spark

    spark = get_spark(
        app_name="bench", master=f"local[{cores}]",
        shuffle_partitions=max(8, int(cores)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_validation_suite(spark, n_docs: int = N_VALIDATION_DOCS) -> dict:
    """The engine's full rule-suite pass over a synthetic interleaved-document
    table — the north-star metric is validated docs/sec for this job.

    The input is materialized to parquet once (untimed, reused across runs &
    parallelism levels) so the timed region is what production does: read a
    table snapshot, validate, emit verdicts+violations. Timing the expression
    -based generator instead would re-generate the corpus once per rule
    topology and measure datagen, not validation."""
    from anomaly_detection_spark.datagen import generate_documents, generate_media_catalog
    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.profiler import span_kind_counts
    from anomaly_detection_spark.rules import builtin
    from anomaly_detection_spark.rules.core import RuleSet

    path = f"/tmp/spark_graft_valdocs_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # 256 slices ⇒ 256 parquet files ⇒ scan stages can use every core at
        # any tested parallelism (a corpus written with <cores files caps
        # stage parallelism at the file count and fakes anti-scaling)
        generate_documents(
            spark, n_docs=n_docs, n_partitions=32, n_media=2000, n_slices=256
        ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    catalog = generate_media_catalog(spark, n_media=2000)
    rules = RuleSet(
        # span_sequence_valid rides the fused scan as a bound-column row rule
        row_rules=builtin.default_document_rules() + [builtin.span_sequence_valid_row()],
        dataset_rules=[
            builtin.unique("doc_id"),
            builtin.referential(),
        ],
    )

    def one_pass() -> None:
        result = ValidationRun(spark, docs, rules, media_catalog=catalog).run(
            resume=False
        )
        _force(result.violations)
        _force(result.verdicts)
        _force(span_kind_counts(docs, salt_buckets=16))
        # drop the cache so the timed pass re-executes the full topology
        # (Spark's CacheManager matches by logical plan — a leftover cache
        # would silently turn the next pass into a cache read)
        result.violations.unpersist()

    # warmup: JIT + Python-UDF worker pool spin-up, excluded like any
    # steady-state throughput benchmark; production jobs amortize this once
    # per executor lifetime, not once per snapshot.
    one_pass()
    t0 = time.time()
    one_pass()
    wall = time.time() - t0
    return {"docs": n_docs, "sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def main() -> None:
    if "--worker" in sys.argv:
        cores = sys.argv[sys.argv.index("--worker") + 1]
        spark = _get_spark(cores)
        stats = run_validation_suite(spark, n_docs=N_SCALING_DOCS)
        print(json.dumps({"cores": int(cores), **stats}))
        spark.stop()
        return

    if "--scaling" in sys.argv:
        results = []
        for cores in ("8", "32"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", cores],
                capture_output=True, text=True, timeout=1800,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            results.append(json.loads(line))
        t_n, t_4n = results[0]["docs_per_sec"], results[1]["docs_per_sec"]
        eff = round((t_4n / t_n) / 4, 3)
        report = {
            "n_cores": results[0]["cores"], "n4_cores": results[1]["cores"],
            "docs_per_sec_n": t_n, "docs_per_sec_4n": t_4n,
            "scaling_efficiency": eff, "docs": results[0]["docs"],
        }
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH/BASELINE — two-parallelism scaling evidence\n\n"
                "Same validation job (full rule suite + salted span-kind agg over a\n"
                f"{results[0]['docs']:,}-doc synthetic interleaved-documents table,\n"
                "seed-free deterministic generation), identical input, two\n"
                "parallelism levels in fresh JVMs — the sandbox stand-in for the\n"
                "north_rule's N vs 4N executors criterion.\n\n"
                "| parallelism | wall (s) | validated docs/sec |\n|---|---|---|\n"
                f"| local[{report['n_cores']}] (N) | {results[0]['sec']} | {t_n:,} |\n"
                f"| local[{report['n4_cores']}] (4N) | {results[1]['sec']} | {t_4n:,} |\n\n"
                f"**Scaling efficiency = (docs/sec_4N ÷ docs/sec_N) ÷ 4 = {eff}**\n"
                f"(north_rule target ≥ 0.8{'; MET' if eff >= 0.8 else '; NOT met — see notes'})\n"
            )
        print(json.dumps(report))
        return

    from anomaly_detection_spark.queries import QUERIES

    spark = _get_spark(CPUS)
    per_query: dict[str, float] = {}
    t_total0 = time.time()
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        per_query[name] = round(time.time() - t0, 3)
    vstats = run_validation_suite(spark)
    per_query["validation_suite"] = vstats["sec"]
    total = round(time.time() - t_total0, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "validated docs/sec (full rule-suite pass) + headline query wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": vstats["docs_per_sec"],
        "validation_docs": vstats["docs"],
        "cores": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
