"""Re-identification-risk profiling for training-data release: k-anonymity
and l-diversity (Sweeney 2002; Machanavajjhala et al. 2007 — the public
formulations), distributed. The reference pipeline detects PII literals by
regex (``functions/pii.py`` is its analogue here); these operators measure
the complementary STRUCTURAL risk — can a row be re-identified by joining
its quasi-identifier combination against an external dataset, even with all
direct PII stripped?

Scale shape: one hash-aggregate on the quasi-identifier tuple (map-side
partial combine; cardinality = |QI classes|, orders of magnitude below row
count), then a second aggregate over the class table to a handful of bands.
No joins, no row data to the driver, no skew hazard beyond the QI agg that
any groupBy would have.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame, qi_cols: list[Column | str], k: int = 5
) -> DataFrame:
    """Band the quasi-identifier equivalence classes by size.

    A row whose QI combination is shared by fewer than ``k`` rows is
    re-identifiable by a linkage attack. Output, one row per band:
    ``unique`` (class size 1), ``small`` (2 ≤ size < k), ``anonymous``
    (size ≥ k) — with ``n_classes`` and ``n_rows`` per band."""
    sz = F.col("_sz")
    band = (
        F.when(sz == 1, "unique")
        .when(sz < k, "small")
        .otherwise("anonymous")
    )
    return (
        df.groupBy(*qi_cols)
        .agg(F.count("*").alias("_sz"))
        .groupBy(band.alias("k_band"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum(sz).alias("n_rows"),
        )
    )


def l_diversity_profile(
    df: DataFrame,
    qi_cols: list[Column | str],
    sensitive: Column | str,
    l: int = 2,
) -> DataFrame:
    """Band QI classes by how many DISTINCT sensitive values they hold.

    A k-anonymous class is still disclosive if every member shares the
    same sensitive value (homogeneity attack): knowing someone is in the
    class reveals their attribute. Output per band — ``homogeneous``
    (1 distinct value), ``low`` (< l), ``diverse`` (≥ l) — with
    ``n_classes`` and ``n_rows``."""
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    nd = F.col("_nd")
    band = (
        F.when(nd == 1, "homogeneous")
        .when(nd < l, "low")
        .otherwise("diverse")
    )
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count("*").alias("_sz"),
            F.countDistinct(s).alias("_nd"),
        )
        .groupBy(band.alias("l_band"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("_sz").alias("n_rows"),
        )
    )
