"""Rule-progress manifest: an append-only commit log of completed
(partition, rule_id, snapshot_id) work with per-partition lineage + metrics.

≈ the reference's JSON risk-history checkpoint
(``/root/reference/anomaly_detection/.../risk_history_tracker.py:35-101``)
re-expressed as a table commit log: each ``commit`` appends one parquet
fileset (Iceberg/Delta would make this a real atomic snapshot commit; the
parquet fallback appends a uniquely-named subdirectory, which is atomic
enough for single-writer runs and keeps the sandbox dependency-free).

Resume semantics: ``pending(planned)`` anti-joins the planned
(partition × rule) grid against completed pairs for the same snapshot —
already-committed pairs are never re-evaluated (north_rule resumability).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition string, rule_id string, snapshot_id string, status string, "
    "rows_scanned long, violation_count long, duration_ms long, "
    "committed_at timestamp"
)


class RuleProgressManifest:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(
                os.path.join(self.path, "*", "*.parquet")
            )
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def commit(self, metrics: DataFrame) -> None:
        """Append one commit's metrics. Each commit lands in its own
        subdirectory so a failed write never half-overwrites history."""
        commit_dir = os.path.join(self.path, f"commit-{uuid.uuid4().hex[:12]}")
        metrics.write.mode("overwrite").parquet(commit_dir)

    def completed_pairs(self, snapshot_id: str) -> DataFrame:
        return (
            self.read()
            .filter(F.col("snapshot_id") == snapshot_id)
            .select("partition", "rule_id")
            .distinct()
        )

    def pending(self, planned: DataFrame, snapshot_id: str) -> DataFrame:
        """planned(partition, rule_id) minus completed — the work queue."""
        return planned.join(
            self.completed_pairs(snapshot_id), ["partition", "rule_id"], "left_anti"
        )
