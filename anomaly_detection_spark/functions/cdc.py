"""Change-data-capture apply: the row-level MERGE INTO (Delta/Iceberg
upsert) semantics as pure DataFrame ops — fold a changelog of
insert/update/delete operations into a base snapshot to produce the next
snapshot state.

The snapshot log (``snapshots.py``) gives the engine commit-level
time-travel; this module gives it ROW-level evolution: the shape every
warehouse ingests from an OLTP source (Debezium-style streams) and what
``MERGE INTO`` executes. Semantics follow the standard latest-wins
contract: for each key, the change with the highest sequence number
decides — ``D`` removes the row, ``I``/``U`` upsert the carried payload
(an ``I`` on an existing key behaves as an upsert; a ``U`` on an absent
key inserts — the idempotent form that tolerates replayed or compacted
changelogs).

Scale shape: the changelog is commit-sized, the base is the 100 TB side.
Latest-change-per-key is ONE window over the changelog only; the apply
is ONE equi-join keyed by the primary key — full outer so inserts
surface — and the base is never shuffled twice. With a broadcast-able
changelog Spark plans the join map-side and the base never shuffles at
all.

Reference analogue: risk_history_tracker.py:35-101 appends score rows
keyed by (user, date) and prunes by retention — an ad-hoc upsert this
module makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cdc_apply(base: DataFrame, changes: DataFrame, key_col: str,
              payload_cols: list[str], op_col: str = "op",
              seq_col: str = "seq") -> DataFrame:
    """Apply a changelog to a base snapshot; returns the next state with
    columns ``(key_col, *payload_cols)``.

    ``changes`` carries ``(key, op ∈ {'I','U','D'}, seq, *payload)``;
    ``seq`` must be unique per key (a commit LSN — ties would make the
    winner engine-dependent, so none are allowed rather than broken
    arbitrarily).
    """
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            key_col, F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_ch_{c}") for c in payload_cols],
        )
    )
    joined = base.join(latest, key_col, "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") != "D")
    picked = [
        F.when(F.col("_op").isin("I", "U"), F.col(f"_ch_{c}"))
        .otherwise(F.col(c)).alias(c)
        for c in payload_cols
    ]
    return joined.filter(keep).select(key_col, *picked)


def cdc_stats(base: DataFrame, changes: DataFrame, key_col: str,
              op_col: str = "op", seq_col: str = "seq") -> DataFrame:
    """Merge-audit summary: one row of
    ``(n_base, n_changes, n_inserted, n_updated, n_deleted, n_final)``
    where insert/update/delete count the EFFECTIVE latest-wins ops
    (an op on a key only counts against what the base actually holds).
    All inputs aggregate map-side; the only join keys the commit-sized
    latest-change frame against base keys."""
    w = Window.partitionBy(key_col).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, F.col(op_col).alias("_op"))
    )
    bk = base.select(key_col).withColumn("_in_base", F.lit(1))
    j = latest.join(bk, key_col, "left")
    eff = j.agg(
        F.sum(F.when((F.col("_op") != "D") & F.col("_in_base").isNull(), 1)
              .otherwise(0)).cast("long").alias("n_inserted"),
        F.sum(F.when((F.col("_op") != "D") & F.col("_in_base").isNotNull(), 1)
              .otherwise(0)).cast("long").alias("n_updated"),
        F.sum(F.when((F.col("_op") == "D") & F.col("_in_base").isNotNull(), 1)
              .otherwise(0)).cast("long").alias("n_deleted"),
    )
    nb = base.agg(F.count(F.lit(1)).alias("n_base"))
    nc = changes.agg(F.count(F.lit(1)).alias("n_changes"))
    return nb.crossJoin(nc).crossJoin(eff).select(
        "n_base", "n_changes", "n_inserted", "n_updated", "n_deleted",
        (F.col("n_base") + F.col("n_inserted") - F.col("n_deleted"))
        .alias("n_final"),
    )


def scd2_build(changes: DataFrame, key_col: str, payload_cols: list[str],
               op_col: str = "op", seq_col: str = "seq") -> DataFrame:
    """Slowly-changing-dimension Type 2: turn a changelog into
    effective-dated version rows ``(key, *payload, valid_from, valid_to,
    is_current)`` — every ``I``/``U`` opens a version at its sequence
    number, closed by the key's NEXT change (exclusive) whatever its kind;
    a ``D`` closes the prior version without opening one, so a key whose
    last change is a delete has no current row.

    ONE window per key over the commit-sized changelog (lead of the next
    seq), a filter, nothing else — the dimension build is
    changelog-sized, never fact-table-sized. Fold an existing snapshot in
    as seq-0 ``I`` rows to seed initial versions. ``seq`` must be unique
    per key (same contract as ``cdc_apply``).
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(seq_col))
    nxt = F.lead(seq_col).over(w)
    return (
        changes.withColumn("_valid_to", nxt)
        .filter(F.col(op_col) != "D")
        .select(
            key_col, *payload_cols,
            F.col(seq_col).cast("long").alias("valid_from"),
            F.col("_valid_to").cast("long").alias("valid_to"),
            F.col("_valid_to").isNull().cast("int").alias("is_current"),
        )
    )
