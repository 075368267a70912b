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


def ranked_file_ids(df: DataFrame, order_col, id_col: str,
                    rows_per_file: int, bin_col,
                    out_col: str = "file_id") -> DataFrame:
    """Assign each row the file it would land in under a sorted write:
    global rank in ``(order_col, id_col)`` order, ``rows_per_file`` rows
    per file — what ``repartitionByRange(...).sortWithinPartitions(...)``
    produces, made DETERMINISTIC (range partitioning samples its
    boundaries, so real file splits vary run to run; fixed-size splits of
    the total order never do).

    Never a global ``row_number`` window (single-task funnel — the
    ``curation.shuffle_rank`` discipline): the caller supplies ``bin_col``,
    a coarse bucketing that is monotone non-decreasing in ``order_col``
    (e.g. ``value div 4096``); per-bin counts give exclusive bin offsets
    via a window over the bin count only, broadcast back, and the
    within-bin rank runs per bin. Ties break by ``id_col``, so the order
    is total and engine-independent.
    """
    o = F.col(order_col) if isinstance(order_col, str) else order_col
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    t = df.select("*", o.alias("_o"), b.alias("_b"))
    per_bin = t.groupBy("_b").agg(F.count(F.lit(1)).alias("_bc"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bin.select(
        "_b", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff"))
    wl = Window.partitionBy("_b").orderBy(F.asc("_o"), F.asc(id_col))
    rank = F.col("_boff") + F.row_number().over(wl) - 1
    return (
        t.join(F.broadcast(offsets), "_b")
        .withColumn("_rank", rank)
        .withColumn(out_col, F.expr(f"_rank div {int(rows_per_file)}"))
        .drop("_o", "_b", "_boff", "_rank")
    )


def zone_stats(df: DataFrame, file_col: str = "file_id",
               stat_cols: list[str] | None = None) -> DataFrame:
    """Per-file zone map: row count plus min/max per tracked column — the
    parquet row-group / Iceberg manifest statistics a scan planner prunes
    with. One map-side-combined aggregate; output is file-count-sized
    (metadata, not data)."""
    stat_cols = stat_cols or []
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)


def skip_report(zones: DataFrame, predicates: list[tuple[str, str, int, int]],
                stat_cols: list[str]) -> DataFrame:
    """Evaluate range predicates against a zone-map frame: how many files
    (and rows of I/O) must a scan touch, and what fraction is PRUNED by
    min/max stats alone? ``predicates`` is ``(pred_id, col, lo, hi)`` with
    inclusive integer bounds; a file is scanned iff its envelope
    intersects ``[lo, hi]``. This quantifies what a layout choice is
    worth BEFORE rewriting 100 TB — the planner-side what-if behind
    ``zorder_layout`` vs a single-column sort.

    The zones frame is metadata-sized, so the predicate sweep is a tiny
    explode + aggregate; returns one row per predicate:
    ``(pred_id, n_files, files_scanned, rows_scanned, skip_ppm)``.
    """
    pl = F.array(*[
        F.struct(F.lit(p).alias("pid"), F.lit(c).alias("col"),
                 F.lit(int(lo)).alias("lo"), F.lit(int(hi)).alias("hi"))
        for (p, c, lo, hi) in predicates
    ])
    ex = zones.select("*", F.explode_outer(pl).alias("_p"))
    mn, mx = F.lit(None), F.lit(None)
    for c in stat_cols:
        mn = F.when(F.col("_p.col") == c, F.col(f"min_{c}")).otherwise(mn)
        mx = F.when(F.col("_p.col") == c, F.col(f"max_{c}")).otherwise(mx)
    # NULL envelope (all-NULL stat column, or predicate on an untracked
    # column) ⇒ the planner CANNOT prune — must-scan, never counted as
    # skipped (a NULL hit would silently vanish from the sums below)
    hit = F.coalesce((mx >= F.col("_p.lo")) & (mn <= F.col("_p.hi")),
                     F.lit(True))
    out = ex.groupBy(F.col("_p.pid").alias("pred_id")).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(hit.cast("long")).alias("files_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long").alias("rows_scanned"),
    )
    skipped = F.col("n_files") - F.col("files_scanned")
    return out.select(
        "pred_id", "n_files", "files_scanned", "rows_scanned",
        F.floor(F.lit(1_000_000.0) * skipped / F.col("n_files") + F.lit(0.5))
        .cast("long").alias("skip_ppm"),
    )
