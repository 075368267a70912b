"""EWMA control chart: hand-computed predictions on a constant series, the
exact 3σ Poisson flag boundary (constant 16/day ⇒ band is ±12: 28 passes,
29 flags), and first-day NULL-prediction behavior."""

from __future__ import annotations

from anomaly_detection_spark.functions.timeseries import (
    EWMA_WEIGHTS, ewma_control)

SUM_W = sum(EWMA_WEIGHTS)  # (4^8 - 3^8) / (4 - 3) = 58975


def _run(spark, counts, group="a"):
    rows = [(group, f"2026-01-{d + 1:02d}", c) for d, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "event_type string, day string, cnt long")
    out = ewma_control(df)
    return {r["day"]: r.asDict() for r in out.collect()}


def test_kernel_is_integer_lambda_quarter():
    assert EWMA_WEIGHTS[0] == 4 ** 7 and EWMA_WEIGHTS[-1] == 3 ** 7
    # ratio between consecutive weights is exactly 3/4
    assert all(4 * b == 3 * a for a, b in zip(EWMA_WEIGHTS, EWMA_WEIGHTS[1:]))
    assert SUM_W == 58975


def test_constant_series_predicts_itself(spark):
    got = _run(spark, [16] * 10)
    assert got["2026-01-01"]["pred_micro"] is None
    assert got["2026-01-01"]["flag"] == 0
    for day in ("2026-01-02", "2026-01-09", "2026-01-10"):
        assert got[day]["pred_micro"] == 16_000_000
        assert got[day]["flag"] == 0


def test_flag_boundary_is_exact(spark):
    # pred = 16 ⇒ flag iff (x - 16)^2 > 9·16 = 144 ⇒ |x - 16| > 12
    below = _run(spark, [16] * 9 + [28])
    assert below["2026-01-10"]["flag"] == 0
    above = _run(spark, [16] * 9 + [29])
    assert above["2026-01-10"]["flag"] == 1
    assert above["2026-01-10"]["pred_micro"] == 16_000_000


def test_spike_decays_geometrically(spark):
    # one spike, then back to baseline: next-day prediction moves by λ=1/4
    # of the residual — 16 + (100-16)·16384/58975 in exact micro units
    got = _run(spark, [16] * 8 + [100, 16])
    expected = (16 * (SUM_W - EWMA_WEIGHTS[0]) + 100 * EWMA_WEIGHTS[0])
    assert got["2026-01-10"]["pred_micro"] == expected * 1_000_000 // SUM_W


def test_groups_are_independent(spark):
    rows = [("a", f"2026-01-{d:02d}", 16) for d in range(1, 6)] + \
           [("b", "2026-01-01", 999)]
    df = spark.createDataFrame(rows, "event_type string, day string, cnt long")
    got = {(r["event_type"], r["day"]): r.asDict()
           for r in ewma_control(df).collect()}
    assert got[("b", "2026-01-01")]["pred_micro"] is None
    assert got[("a", "2026-01-02")]["pred_micro"] == 16_000_000


# ------------------------------------------------------------------ CUSUM

def _cusum(spark, counts, group="a"):
    from anomaly_detection_spark.functions.timeseries import cusum_control
    rows = [(group, f"2026-01-{d + 1:02d}", c) for d, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "event_type string, day string, cnt long")
    return {r["day"]: r.asDict() for r in cusum_control(df).collect()}


def test_cusum_matches_textbook_recursion(spark):
    # replay C+_t = max(0, C+_{t-1} + dev_t) in python (n-scaled) and
    # compare the closed window form against it exactly
    counts = [10, 12, 9, 15, 11, 30, 31, 29, 8, 10]
    n, tot = len(counts), sum(counts)
    cpos = cneg = 0
    want = []
    for x in counts:
        dev = n * x - tot
        cpos = max(0, cpos + dev)
        cneg = max(0, cneg - dev)
        want.append((cpos, cneg))
    got = _cusum(spark, counts)
    for d, (wp, wn) in enumerate(want):
        r = got[f"2026-01-{d + 1:02d}"]
        assert (r["cusum_pos"], r["cusum_neg"]) == (wp, wn)


def test_cusum_flags_persistent_shift_not_single_spike(spark):
    # a sustained +3 shift over the back half must alarm eventually
    shift = [10] * 10 + [13] * 10
    got = _cusum(spark, shift)
    assert got["2026-01-20"]["flag"] == 1
    assert got["2026-01-02"]["flag"] == 0
    # symmetric: a sustained downward shift alarms on the negative side
    down = [13] * 10 + [10] * 10
    gd = _cusum(spark, down)
    assert gd["2026-01-20"]["flag"] == 1
    assert gd["2026-01-20"]["cusum_neg"] > gd["2026-01-20"]["cusum_pos"]


def test_cusum_constant_series_never_alarms(spark):
    got = _cusum(spark, [7] * 12)
    assert all(r["flag"] == 0 and r["cusum_pos"] == 0 and r["cusum_neg"] == 0
               for r in got.values())
