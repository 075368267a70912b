"""Missing-value repair — the distributed form of the reference's
imputation pass (``/root/reference/anomaly_detection/preprocessors/
data_normalizer.py:506-537``: numeric → median, categorical → mode,
else "unknown").

Both statistics are computed in tiny aggregation passes and joined back as
a broadcast (1-row stats frame), so the fill itself is a pure projection —
no window over all rows, no per-row Python. Median uses exact
``percentile`` (cross-engine reproducible); mode tie-breaks
deterministically (highest count, then smallest value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_modes(df: DataFrame, cols: list[str]) -> DataFrame:
    """1-row frame with the modal value of each column (nulls excluded;
    ties broken by the smallest value in STRING ordering — so a tie
    between 2 and 10 picks "10"; deterministic and engine-portable).

    ONE scan for every column, not one per column: rows explode to
    (col_name, value-as-string) pairs, a single (col, val) hash agg counts
    them, and a ``min_by`` over the struct key (−count, val) picks max
    count / min value per column — then a k-cell pivot rebuilds the wide
    1-row stats frame and casts each mode back to its column's type
    (Spark's string casts round-trip for the string/int/bool/double types a
    categorical fill meets). No single-partition window even when a column
    has millions of distinct values, and a 100 TB input is read once
    instead of k times. Tie-break order for non-string columns is the
    STRING ordering of the values (deterministic, engine-portable)."""
    dtypes = dict(df.dtypes)
    pairs = F.array(*[
        F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("val"))
        for c in cols
    ])
    counts = (
        df.select(F.explode(pairs).alias("_p"))
        .select("_p.col", "_p.val")
        .filter(F.col("val").isNotNull())
        .groupBy("col", "val").agg(F.count("*").alias("_cnt"))
    )
    modes = counts.groupBy("col").agg(
        F.expr("min_by(val, struct(-_cnt, val))").alias("_mode")
    )
    wide = modes.groupBy().pivot("col", cols).agg(F.first("_mode"))
    # wide[c], not F.col(c): a column name containing a dot or backtick
    # would misparse as a struct path under the string form
    return wide.select(*[
        wide[c].cast(dtypes[c]).alias(f"_mode_{c}") for c in cols
    ])


def fill_missing(
    df: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    fallback: str = "unknown",
) -> DataFrame:
    """Fill nulls: numeric columns with their exact median, categorical
    columns with their mode (falling back to ``fallback`` when a column is
    entirely null). Returns the frame with the same schema, values filled."""
    numeric_cols = numeric_cols or []
    categorical_cols = categorical_cols or []
    stats = None
    if numeric_cols:
        med_aggs = [
            F.expr(f"percentile({c}, 0.5)").alias(f"_med_{c}") for c in numeric_cols
        ]
        stats = df.agg(*med_aggs)
    if categorical_cols:
        modes = column_modes(df, categorical_cols)
        stats = modes if stats is None else stats.crossJoin(modes)
    if stats is None:
        return df

    filled = df.crossJoin(F.broadcast(stats))
    exprs = []
    for c in df.columns:
        if c in numeric_cols:
            dt = dict(df.dtypes)[c]
            exprs.append(
                F.coalesce(F.col(c), F.col(f"_med_{c}").cast(dt)).alias(c)
            )
        elif c in categorical_cols:
            exprs.append(
                F.coalesce(F.col(c), F.col(f"_mode_{c}"), F.lit(fallback)).alias(c)
            )
        else:
            exprs.append(F.col(c))
    return filled.select(*exprs)


def winsorized_stats(df: DataFrame, group_col: str, cents_col: str,
                     lo_pct: int = 1, hi_pct: int = 99) -> DataFrame:
    """Winsorization profile per group: the exact type-1 percentile clip
    bounds (smallest value whose cumulative count reaches ⌈q·n/100⌉),
    how many rows each side would clip, and the mean before vs after
    clipping — the robust-preprocessing decision report ("does tail
    clipping move the mean enough to matter") in exact integer cents.

    Scale shape: ONE corpus scan builds a (group, value)-histogram
    (map-side combined); bounds, clip counts and both means are computed
    on that bounded distinct-value frame — the same
    histogram-not-rows discipline as ``ml.robust_outlier_stats``. Means
    are integer DIV micro (never floor-of-double; Σv·c·1e6 passes 2^53).

    Returns (group, n, p_lo_cents, p_hi_cents, n_clipped_low,
    n_clipped_high, mean_micro, winsorized_mean_micro)."""
    from pyspark.sql import Window

    lo, hi = int(lo_pct), int(hi_pct)
    hist = df.groupBy(F.col(group_col).alias("_g"),
                      F.col(cents_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c"))
    wcum = (Window.partitionBy("_g").orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = Window.partitionBy("_g")
    h = hist.select(
        "_g", "_v", "_c",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wall).alias("_n"))
    bounds = (
        h.groupBy("_g").agg(
            F.max("_n").alias("n"),
            F.min(F.when(F.col("_cum") * 100 >= F.col("_n") * lo,
                         F.col("_v"))).alias("p_lo"),
            F.min(F.when(F.col("_cum") * 100 >= F.col("_n") * hi,
                         F.col("_v"))).alias("p_hi"),
        )
    )
    j = hist.join(F.broadcast(bounds), "_g")
    clipped = F.when(F.col("_v") < F.col("p_lo"), F.col("p_lo")) \
        .when(F.col("_v") > F.col("p_hi"), F.col("p_hi")) \
        .otherwise(F.col("_v"))
    agg = j.groupBy("_g").agg(
        F.max("n").alias("n"),
        F.max("p_lo").alias("p_lo_cents"),
        F.max("p_hi").alias("p_hi_cents"),
        F.sum(F.when(F.col("_v") < F.col("p_lo"), F.col("_c"))
              .otherwise(F.lit(0))).alias("n_clipped_low"),
        F.sum(F.when(F.col("_v") > F.col("p_hi"), F.col("_c"))
              .otherwise(F.lit(0))).alias("n_clipped_high"),
        F.sum(F.col("_v") * F.col("_c")).alias("_sum"),
        F.sum(clipped * F.col("_c")).alias("_wsum"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("p_lo_cents").cast("long").alias("p_lo_cents"),
        F.col("p_hi_cents").cast("long").alias("p_hi_cents"),
        F.col("n_clipped_low").cast("long").alias("n_clipped_low"),
        F.col("n_clipped_high").cast("long").alias("n_clipped_high"),
        F.expr("(_sum * 1000000) DIV n").alias("mean_micro"),
        F.expr("(_wsum * 1000000) DIV n").alias("winsorized_mean_micro"),
    )
