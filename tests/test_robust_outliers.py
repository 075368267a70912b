"""robust_outlier_stats: lower-median/MAD arithmetic against a pure-Python
model, the fat-tail robustness property vs mean/std, and the MAD=0 guard."""

from __future__ import annotations

import pytest

from anomaly_detection_spark.functions import ml


def _lower_median(xs: list[int]) -> int:
    s = sorted(xs)
    # smallest value whose cumulative count reaches ceil(n/2)
    return s[(len(s) + 1) // 2 - 1]


def _model(xs: list[int], thr_milli: int = 3500):
    med = _lower_median(xs)
    mad = _lower_median([abs(x - med) for x in xs])
    n_out = 0 if mad == 0 else sum(
        1 for x in xs if 1349 * abs(x - med) > 2 * thr_milli * mad)
    return med, mad, n_out


def _run(spark, groups: dict[str, list[int]]):
    rows = [(g, v) for g, xs in groups.items() for v in xs]
    df = spark.createDataFrame(rows, ["g", "cents"])
    return {
        r["g"]: r.asDict()
        for r in ml.robust_outlier_stats(df, "g", "cents").collect()
    }


def test_matches_python_model(spark):
    groups = {
        "a": [10, 12, 11, 13, 9, 10, 12, 500],          # one wild point
        "b": [100, 102, 98, 101, 99, 103, 97, 100, 96],  # clean
        "c": [5, 5, 5, 5, 7],                            # MAD = 0
    }
    got = _run(spark, groups)
    for g, xs in groups.items():
        med, mad, n_out = _model(xs)
        assert got[g]["n"] == len(xs)
        assert got[g]["median_cents"] == med, g
        assert got[g]["mad_cents"] == mad, g
        assert got[g]["n_outliers"] == n_out, g
        assert got[g]["outlier_ppm"] == n_out * 1_000_000 // len(xs)


def test_fat_tail_does_not_mask(spark):
    """The property MAD exists for: one extreme point inflates std enough
    to hide itself from a 3.5-sigma screen, but cannot move the MAD."""
    # 12 spread points (median 100, MAD 8) + one 10^7 point: with n=13 the
    # single outlier caps the population z at sqrt(n-1) ≈ 3.46 < 3.5
    xs = [100, 104, 96, 108, 92, 112, 88, 116, 84, 120, 80, 100,
          10_000_000]
    got = _run(spark, {"g": xs})["g"]
    assert got["n_outliers"] >= 1      # the 10^7 point is flagged
    mean = sum(xs) / len(xs)
    std = (sum((x - mean) ** 2 for x in xs) / len(xs)) ** 0.5
    assert abs(10_000_000 - mean) / std < 3.5  # classic z-score misses it


def test_mad_zero_flags_nothing(spark):
    got = _run(spark, {"g": [5, 5, 5, 5, 1000]})["g"]
    assert got["mad_cents"] == 0
    assert got["n_outliers"] == 0 and got["outlier_ppm"] == 0


def test_winsorized_stats_model_parity(spark):
    """Exact type-1 percentile bounds, clip counts, and means against a
    pure-Python model on a fixture with a known heavy tail."""
    import math

    from anomaly_detection_spark.functions import clean

    xs = list(range(1, 101)) + [100000, -5000]  # 102 values, two tails
    df = spark.createDataFrame([("g", v) for v in xs], ["g", "cents"])
    got = clean.winsorized_stats(df, "g", "cents").collect()[0].asDict()

    s = sorted(xs)
    n = len(s)

    def type1(q_pct):
        return s[math.ceil(q_pct * n / 100) - 1]

    p_lo, p_hi = type1(1), type1(99)
    clipped = [min(max(v, p_lo), p_hi) for v in xs]
    assert got["n"] == n
    assert got["p_lo_cents"] == p_lo
    assert got["p_hi_cents"] == p_hi
    assert got["n_clipped_low"] == sum(1 for v in xs if v < p_lo)
    assert got["n_clipped_high"] == sum(1 for v in xs if v > p_hi)
    assert got["mean_micro"] == sum(xs) * 1_000_000 // n
    assert got["winsorized_mean_micro"] == sum(clipped) * 1_000_000 // n
    # the whole point: clipping pulls the tail-inflated mean way down
    assert got["winsorized_mean_micro"] < got["mean_micro"]


def test_winsorized_noop_on_clean_data(spark):
    from anomaly_detection_spark.functions import clean

    df = spark.createDataFrame(
        [("g", v) for v in range(1, 51)], ["g", "cents"])
    got = clean.winsorized_stats(df, "g", "cents").collect()[0].asDict()
    assert got["n_clipped_low"] == 0   # p1 of 50 values is the minimum
    assert got["p_lo_cents"] == 1 and got["p_hi_cents"] == 50
    assert got["winsorized_mean_micro"] == got["mean_micro"]
