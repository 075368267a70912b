"""Snapshot reconciliation by order-independent content checksum.

The migration/backfill audit primitive: after copying, compacting, or
re-partitioning a 100 TB corpus, prove the content survived without
sorting or joining the two copies row-by-row. Each row contributes a
60-bit md5-derived integer; a partition's checksum is the SUM of those
contributions mod 10^18 — addition commutes, so the checksum is
independent of row order, file layout, and partitioning, and two copies
compare by their (tiny) per-partition checksum tables alone. A full
row-level diff is only ever run on the partitions the checksum already
convicted.

Everything is exact integer arithmetic on md5 output (bit-identical
across engines — no floats, no ``rand()``), accumulated as
``decimal(38,0)`` so 10^12-row partitions cannot overflow, with map-side
partial aggregation: one shuffle of #partitions rows per table.

Reference analogue: ``risk_history_tracker.py:35-101`` keeps per-snapshot
score tables to diff runs; this generalizes the idea to content equality
of arbitrarily large snapshots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: checksums accumulate mod this (fits BIGINT; DuckDB: ``% 10^18``)
CHECKSUM_MOD = 10**18

#: field separator / NULL marker / value-prefix marker for the
#: canonical row rendering
_SEP = "\x1f"
_NULL = "\x01"
_VAL = "\x02"


def row_signature(cols: list[Column | str]) -> Column:
    """60-bit non-negative integer signature of a row's canonical form.

    Canonical form: each column cast to string (so only string/integer/
    boolean/date columns belong here — double rendering differs between
    engines), NULL rendered as a bare marker byte and every real value
    prefixed with a different marker byte — so NULL is distinguishable
    both from values in other positions AND from a string that happens
    to equal the NULL marker — joined with an unlikely separator,
    md5-hashed; the first 15 hex digits convert to a long.
    Engine-portable: DuckDB
    ``CAST(('0x'||substr(md5(s),1,15)) AS BIGINT)`` is bit-identical.
    """
    rendered = []
    for c in cols:
        col = (F.col(c) if isinstance(c, str) else c).cast("string")
        rendered.append(
            F.when(col.isNull(), F.lit(_NULL))
            .otherwise(F.concat(F.lit(_VAL), col))
        )
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *rendered)), 1, 15), 16, 10
    ).cast("long")


def table_checksum(
    df: DataFrame,
    cols: list[Column | str],
    partition_col: str = "partition",
) -> DataFrame:
    """Per-partition ``(partition, n_rows, checksum)`` — the metadata-sized
    artifact a migration persists on each side and compares.

    checksum = SUM(row_signature) mod 10^18, summed as decimal(38,0)
    (order-independent; DuckDB HUGEINT matches exactly). One hash agg
    with map-side combine; the corpus is read once and never shuffled —
    only #partitions result rows move.

    Streaming-legal as-is: on a ``readStream`` frame this is a plain
    grouped aggregation (complete output mode) whose state is one row
    per partition — the running checksum of everything that has landed,
    equal at every trigger to the batch checksum of the rows so far
    (parity pinned in ``tests/test_streaming.py``).
    """
    sig = row_signature(cols)
    return df.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(sig.cast("decimal(38,0)")) % F.lit(CHECKSUM_MOD))
        .cast("long")
        .alias("checksum"),
    )


def reconcile(cur: DataFrame, prev: DataFrame) -> DataFrame:
    """Compare two ``table_checksum`` outputs: one row per partition with
    ``status`` ∈ {match, count_mismatch, content_mismatch, only_current,
    only_previous}. Count disagreement wins over checksum disagreement
    (dropped rows always perturb the checksum too — report the more
    actionable cause). Both inputs are #partitions-sized: the join is a
    broadcast over metadata, never over data.
    """
    c = cur.select(
        "partition",
        F.col("n_rows").alias("n_cur"),
        F.col("checksum").alias("_ck_cur"),
    )
    p = prev.select(
        "partition",
        F.col("n_rows").alias("n_prev"),
        F.col("checksum").alias("_ck_prev"),
    )
    j = c.join(p, "partition", "full_outer")
    status = (
        F.when(F.col("n_prev").isNull(), F.lit("only_current"))
        .when(F.col("n_cur").isNull(), F.lit("only_previous"))
        .when(F.col("n_cur") != F.col("n_prev"), F.lit("count_mismatch"))
        .when(F.col("_ck_cur") != F.col("_ck_prev"), F.lit("content_mismatch"))
        .otherwise(F.lit("match"))
    )
    return j.select("partition", status.alias("status"), "n_cur", "n_prev")


def merge_checksums(*tables: DataFrame) -> DataFrame:
    """Fold per-commit ``table_checksum`` outputs into the whole-snapshot
    checksum WITHOUT rescanning any data: row counts add, and the
    checksum is a sum mod 10^18, so the merge is a union + one tiny
    groupBy — bit-identical to recomputing over the unioned rows
    (pinned by test). The incremental contract: checksum each appended
    commit as it lands, merge the metadata tables, reconcile snapshots
    that were never scanned whole."""
    import functools

    unioned = functools.reduce(lambda a, b: a.unionByName(b), tables)
    # re-reduce via the same decimal accumulator: two commits' checksums
    # sum to < 2e18, still far inside decimal(38)
    return unioned.groupBy("partition").agg(
        F.sum("n_rows").alias("n_rows"),
        (F.sum(F.col("checksum").cast("decimal(38,0)")) % F.lit(CHECKSUM_MOD))
        .cast("long")
        .alias("checksum"),
    )
