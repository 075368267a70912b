"""Schema-evolution compatibility: classify a proposed schema change
column by column against the Iceberg evolution rules (spec §Schema
Evolution, the public contract Delta shares): adds are safe only if
optional, drops and renames are breaking for readers, type changes are
safe only along the widening promotions int→long and float→double, and
requiredness may loosen but never tighten.

This is the write-side half of the engine's S1 ``schema_match`` contract
rule: S1 rejects data that deviates from the declared schema; this
module adjudicates whether the DECLARATION itself may change without
breaking the 10^12-row table's readers — the check a catalog runs before
accepting a DDL commit, metadata-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: widening promotions that preserve every stored value (Iceberg spec)
SAFE_WIDENINGS = [("int", "bigint"), ("float", "double")]


def schema_compat(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level compat report between two schema frames
    ``(name, dtype, required)`` (required as 0/1 int). Returns one row
    per column present in either schema:
    ``(name, old_type, new_type, change, compat)`` with
    change ∈ {unchanged, widened, retyped, added, dropped,
    requiredness_loosened, requiredness_tightened} and compat ∈
    {'ok', 'breaking'}. A full-outer join of two metadata frames — cost
    is column-count-sized whatever the table holds.
    """
    o = old.select(
        "name", F.col("dtype").alias("old_type"),
        F.col("required").cast("int").alias("old_req"))
    n = new.select(
        "name", F.col("dtype").alias("new_type"),
        F.col("required").cast("int").alias("new_req"))
    j = o.join(n, "name", "full_outer")
    widened = F.lit(False)
    for frm, to in SAFE_WIDENINGS:
        widened = widened | ((F.col("old_type") == frm)
                             & (F.col("new_type") == to))
    change = (
        F.when(F.col("old_type").isNull(), F.lit("added"))
        .when(F.col("new_type").isNull(), F.lit("dropped"))
        .when(F.col("old_type") != F.col("new_type"),
              F.when(widened, F.lit("widened")).otherwise(F.lit("retyped")))
        .when((F.col("old_req") == 1) & (F.col("new_req") == 0),
              F.lit("requiredness_loosened"))
        .when((F.col("old_req") == 0) & (F.col("new_req") == 1),
              F.lit("requiredness_tightened"))
        .otherwise(F.lit("unchanged"))
    )
    # requiredness tightening breaks readers regardless of which change
    # label won above — a column that both widens (int→bigint) AND goes
    # optional→required is labeled 'widened' but must still be breaking
    tightened = (F.col("old_req") == 0) & (F.col("new_req") == 1)
    compat = (
        F.when(change == "added",
               F.when(F.col("new_req") == 1, F.lit("breaking"))
               .otherwise(F.lit("ok")))
        .when(change.isin("dropped", "retyped", "requiredness_tightened"),
              F.lit("breaking"))
        .when(tightened, F.lit("breaking"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "name", "old_type", "new_type",
        change.alias("change"), compat.alias("compat"),
    )
