"""Table-maintenance planning: small-file compaction (the Iceberg
``rewrite_data_files`` / binPack strategy, Delta OPTIMIZE analogue),
expressed as pure DataFrame ops over a file-manifest frame.

A 100 TB table accretes millions of small files from streaming commits;
the compaction PLANNER is itself a query over file metadata (path, size,
partition) — a frame that is ~10^6 rows when the data is 10^13, so the
planning pass is driver-cheap by construction and the expensive part
(the rewrite) is delegated to whoever executes the plan.

Planning semantics (deterministic, SQL-replayable):
* files at or above ``small_threshold`` are left alone (rewriting a
  full-size file is pure write amplification);
* small files are packed PER PARTITION — compaction never merges across
  partition boundaries (that would break partition pruning);
* within a partition, small files are laid out in ``file_col`` order and
  grouped by the fixed-boundary rule ``group = floor(cum_before /
  target_size)`` (cum_before = running size sum excluding the current
  file) — the same two-phase-prefix-sum shape as
  ``curation.pack_sequences`` but windowed per partition, so no global
  recombination step is needed and each group's payload is ≤ target +
  one file.

Reference analogue: the reference persists risk history as an
append-only store (``risk_history_tracker.py:35-101``) with no
maintenance story; this module is the lakehouse-side counterpart the
snapshot log (``snapshots.py``) needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(files: DataFrame, part_col: str = "part",
                    file_col: str = "file_id", size_col: str = "size_bytes",
                    target_size: int = 128 * 1024 * 1024,
                    small_threshold: int | None = None) -> DataFrame:
    """File-level compaction plan: one row per input file with
    ``(part, file_id, size_bytes, action, compaction_group)`` where
    action ∈ {'keep', 'compact'} and compaction_group numbers the
    rewrite tasks within each partition (NULL for kept files).

    ``small_threshold`` defaults to ``target_size`` (Iceberg's
    MIN_FILE_SIZE default is 0.75×target; pass it explicitly to match).
    """
    thr = target_size if small_threshold is None else small_threshold
    small = F.col(size_col) < F.lit(int(thr))
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.when(small, F.col(size_col)).otherwise(F.lit(0))).over(w),
        F.lit(0),
    )
    return files.select(
        F.col(part_col),
        F.col(file_col),
        F.col(size_col),
        F.when(small, F.lit("compact")).otherwise(F.lit("keep"))
        .alias("action"),
        F.when(small, F.floor(cum_before / F.lit(int(target_size))))
        .cast("long").alias("compaction_group"),
    )


def compaction_summary(files: DataFrame, part_col: str = "part",
                       file_col: str = "file_id",
                       size_col: str = "size_bytes",
                       target_size: int = 128 * 1024 * 1024,
                       small_threshold: int | None = None) -> DataFrame:
    """Per-partition compaction economics: files in vs files out and the
    bytes the rewrite touches. Columns: (part, n_files, n_small,
    n_groups, small_bytes, files_out, reduction_ppm) where
    files_out = kept + groups and reduction_ppm =
    floor((n_files - files_out) · 1e6 / n_files) — the fraction of the
    partition's file count the compaction eliminates."""
    plan = plan_compaction(files, part_col, file_col, size_col,
                           target_size, small_threshold)
    is_small = F.col("action") == "compact"
    agg = plan.groupBy(part_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(is_small.cast("long")).alias("n_small"),
        F.count_distinct(F.when(is_small, F.col("compaction_group")))
        .cast("long").alias("n_groups"),
        F.sum(F.when(is_small, F.col(size_col)).otherwise(F.lit(0)))
        .cast("long").alias("small_bytes"),
    )
    files_out = (F.col("n_files") - F.col("n_small")) + F.col("n_groups")
    return agg.select(
        part_col, "n_files", "n_small", "n_groups", "small_bytes",
        files_out.cast("long").alias("files_out"),
        F.floor((F.col("n_files") - files_out) * F.lit(1_000_000)
                / F.col("n_files")).cast("long").alias("reduction_ppm"),
    )
