"""Risk aggregation, tiering, and forecasting — distributed closed-form
rebuilds of the reference's risk pipeline:

* per-entity risk score ``min(100, 30 + 10·n_anomalies + avg_severity/3)``
  (``/root/reference/anomaly_detection/utils/risk_calculator.py:47-50,132``);
* tiers high ≥ 70 / medium ≥ 40 / low (``config.py:19-21``,
  ``risk_calculator.py:166-167``);
* linear risk forecast: least-squares extrapolation of the per-entity daily
  score series, clamped to [0, 100]
  (``trend_detector.py:224-279`` ``predict_future_risk``).

Slope/intercept come from exact integer sums (k·Σxy − Σx·Σy etc. — the same
closed-form as the trend operator, SURVEY.md W8), never from float
accumulators, so results are order-independent and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_HIGH = 70.0
TIER_MEDIUM = 40.0


def tier_expr(score) -> F.Column:
    """risk tier CASE (config.py:19-21): high ≥70, medium ≥40, else low."""
    return (
        F.when(score >= TIER_HIGH, F.lit("high"))
        .when(score >= TIER_MEDIUM, F.lit("medium"))
        .otherwise(F.lit("low"))
    )


def entity_risk_scores(
    anomalies: DataFrame,
    entity_col: str = "user_id",
    severity_col: str = "severity",
    micros: bool = False,
) -> DataFrame:
    """Per-entity 0-100 risk score + tier from an anomaly/violation frame.

    ``severity_col`` is a 0-100 double; the average is computed from exact
    integer cents so the score is engine-order-independent. One groupBy —
    the reference's per-user dict loop (risk_calculator.py:125-155) becomes
    a single partial+final hash aggregation.

    ``micros=True`` emits ``risk_score_micros`` (floor(score·1e6 + 0.5) as
    long) instead of the 6-dp double: floor on identical IEEE doubles is
    tie-break-free across engines, unlike decimal ROUND (HALF_UP vs
    half-even) — use it for oracle-compared outputs."""
    agg = anomalies.groupBy(entity_col).agg(
        F.count("*").alias("n_anomalies"),
        F.sum(F.round(F.col(severity_col) * 100).cast("long")).alias("_sev_cents"),
    )
    avg_sev = F.col("_sev_cents") / (100.0 * F.col("n_anomalies"))
    score = F.least(
        F.lit(100.0),
        F.lit(30.0) + F.lit(10.0) * F.col("n_anomalies") + avg_sev / F.lit(3.0),
    )
    score_out = (
        F.floor(score * 1e6 + 0.5).cast("long").alias("risk_score_micros")
        if micros else F.round(score, 6).alias("risk_score")
    )
    return agg.select(
        F.col(entity_col),
        F.col("n_anomalies"),
        score_out,
        tier_expr(score).alias("risk_tier"),
    )


def linear_forecast(
    daily: DataFrame,
    entity_col: str,
    x_col: str,
    y_col: str,
    horizon: int = 7,
    clamp: tuple[float, float] | None = (0.0, 100.0),
    min_days: int = 2,
) -> DataFrame:
    """Per-entity least-squares forecast of integer series ``y`` at
    ``max(x) + horizon`` (≈ predict_future_risk's linear branch,
    trend_detector.py:236-254).

    ``x_col``/``y_col`` must be integers (day ordinals / integer scores) so
    every sum below is exact. Output: (entity, n_days, slope, forecast)."""
    sums = daily.groupBy(entity_col).agg(
        F.count("*").alias("n_days"),
        F.max(x_col).alias("_xmax"),
        F.sum(x_col).alias("_sx"),
        F.sum(y_col).alias("_sy"),
        F.sum(F.col(x_col) * F.col(y_col)).alias("_sxy"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("_sxx"),
    ).filter(F.col("n_days") >= min_days)
    k, sx, sy = F.col("n_days"), F.col("_sx"), F.col("_sy")
    denom = (k * F.col("_sxx") - sx * sx).cast("double")
    slope = (k * F.col("_sxy") - sx * sy) / denom
    intercept = (sy - slope * sx) / k
    pred = intercept + slope * (F.col("_xmax") + F.lit(horizon))
    if clamp is not None:
        lo, hi = clamp
        pred = F.least(F.lit(hi), F.greatest(F.lit(lo), pred))
    return sums.filter(denom != 0).select(
        F.col(entity_col),
        F.col("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(pred, 6).alias("forecast"),
    )


def branched_forecast(
    daily: DataFrame,
    entity_col: str,
    x_col: str,
    y_col: str,
    horizon: int = 3,
    period: int = 7,
    clamp: tuple[int, int] = (0, 100),
) -> DataFrame:
    """Full ``predict_future_risk`` branch logic (trend_detector.py:224-279):

    * **linear** when the per-entity trend is material — reference
      ``min_slope=0.1``, tested here as the exact integer cross-product
      ``10·|k·Σxy − Σx·Σy| ≥ k·Σxx − (Σx)²`` (⇔ \\|slope\\| ≥ 0.1 with zero
      float comparisons), forecast = least-squares value at ``max(x)+horizon``;
    * **seasonal** replay otherwise: the observed value one ``period``
      before the target day (``x = xmax + horizon − period``), the
      reference's seasonal-pattern fallback;
    * **last**-value carry when that day has no observation (reference
      returns the latest score).

    The p-value gate of the reference's linear branch (scipy t-test) is
    deliberately replaced by the slope-magnitude test alone — a t-CDF is not
    engine-portable, the magnitude test is (documented simplification).

    One shuffle: the per-entity ``max(x)`` window and the sum aggregation
    both hash-partition on ``entity_col``, so Catalyst reuses the exchange.
    Output: ``(entity, n_days, branch, forecast_micros)`` —
    ``floor(f·1e6 + 0.5)`` of the clamped forecast, exact cross-engine."""
    from pyspark.sql.window import Window

    x, y = F.col(x_col), F.col(y_col)
    w = Window.partitionBy(entity_col)
    with_max = daily.withColumn("_xmax", F.max(x_col).over(w))
    season_x = F.col("_xmax") + F.lit(horizon - period)
    sums = with_max.groupBy(entity_col).agg(
        F.count("*").alias("n_days"),
        F.max("_xmax").alias("_xmax"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.max(F.when(x == season_x, y)).alias("_season_y"),
        F.max_by(y_col, x_col).alias("_last_y"),
    )
    k, sx, sy = F.col("n_days"), F.col("_sx"), F.col("_sy")
    num = k * F.col("_sxy") - sx * sy
    den = k * F.col("_sxx") - sx * sx
    x_target = F.col("_xmax") + F.lit(horizon)
    lin = (sy * den - num * sx + num * k * x_target) / (k * den).cast("double")
    lo, hi = clamp
    branch = (
        # den > 0 is required, not just k >= 2: duplicate-x series have
        # den = num = 0 and would otherwise take the linear branch with a
        # 0/0 slope (NaN -> clamped to max risk — a fabricated forecast)
        F.when((k >= 2) & (den > 0) & (F.lit(10) * F.abs(num) >= den),
               F.lit("linear"))
        .when(F.col("_season_y").isNotNull(), F.lit("seasonal"))
        .otherwise(F.lit("last"))
    )
    fc = (
        F.when(branch == "linear", lin)
        .when(branch == "seasonal", F.col("_season_y").cast("double"))
        .otherwise(F.col("_last_y").cast("double"))
    )
    fc = F.least(F.lit(float(hi)), F.greatest(F.lit(float(lo)), fc))
    return sums.select(
        F.col(entity_col),
        F.col("n_days"),
        branch.alias("branch"),
        F.floor(fc * 1e6 + F.lit(0.5)).cast("long").alias("forecast_micros"),
    )
