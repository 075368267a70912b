"""Corpus-curation operators for training-data pipelines: deterministic
splits, stratified sampling, and quality-ranked token-budget selection.

All selection decisions are pure functions of stable keys (md5 of the id,
never ``rand()``), so a 100 TB curation run is reproducible, resumable, and
oracle-checkable: re-running selects byte-identical subsets, and adding new
documents never reshuffles old ones between splits (the property hash splits
have and row-number splits don't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex digits of the id,
    mod buckets — engine-portable (md5 is bit-identical everywhere),
    unlike ``xxhash64``/``rand`` which are Spark-specific."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_column(id_col: Column | str, train_pct: int = 80,
                 val_pct: int = 10) -> Column:
    """'train' / 'val' / 'test' from the stable hash bucket — document
    membership never changes as the corpus grows."""
    b = hash_bucket(id_col, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, int],
                      id_col: str = "doc_id",
                      default_pct: int = 0) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its stable hash
    bucket falls under the stratum's percentage. ``rates`` maps stratum
    value → percent kept (0–100). No shuffle at all — a pure filter, so it
    composes with any downstream plan and pushes into the scan's batch
    filter at 100 TB."""
    b = hash_bucket(id_col, 100)
    pct = F.lit(default_pct)
    for value, rate in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(pct)
    return df.filter(b < pct)


def token_budget_selection(df: DataFrame, budget_tokens: int,
                           token_col: str = "n_tokens",
                           quality_col: str = "quality",
                           id_col: str = "doc_id") -> DataFrame:
    """Select the best documents until a cumulative token budget is filled:
    rank by (quality desc, id) and keep every document whose RUNNING token
    total (inclusive) stays within the budget — the data-mixing primitive of
    LLM corpus curation.

    Scale shape: a naive global running sum would funnel the corpus through
    ONE partition. Instead the only unpartitioned window runs over the
    DISTINCT quality values (bounded — quality is quantized, e.g. ≤1e6+1
    values at 6 dp): per-quality token totals → running offset of all
    strictly-better quality → join back → per-quality partitioned running
    sum over ids. offset + within-quality cumsum ≤ budget is EXACTLY the
    global (quality desc, id asc) inclusive prefix — same rows, no global
    data sort."""
    q, t = F.col(quality_col), F.col(token_col)
    per_q = df.groupBy(quality_col).agg(F.sum(t).alias("_qt"))
    wq = Window.orderBy(F.desc(quality_col)) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_q.select(
        quality_col, F.coalesce(F.sum("_qt").over(wq), F.lit(0)).alias("_off")
    )
    wp = Window.partitionBy(quality_col).orderBy(F.asc(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.join(offsets, quality_col)
        .withColumn("_cum", F.col("_off") + F.sum(t).over(wp))
        .filter(F.col("_cum") <= budget_tokens)
        .drop("_cum", "_off")
    )
