"""ML-ensemble analogue, risk scoring/forecast, seasonality, and degree
centrality — unit tests on hand-built frames with planted truths (the
reference-parity strategy of SURVEY.md §5: tiny obviously-correct oracles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import graph, ml, risk, timeseries


# ------------------------------------------------------------------ ml

def test_outlier_ensemble_flags_planted_outlier(spark):
    """49 near-identical entities + 1 extreme one: only the plant is flagged,
    and its robust z-score is huge (median/MAD are immune to the outlier)."""
    rows = [(f"u{i}", 100 + (i % 3), 10, 2, 5000, 3) for i in range(49)]
    rows.append(("u_out", 5000, 400, 90, 900000, 5))
    feats = spark.createDataFrame(
        rows, "user_id string, n_events long, n_offhours long, n_errors long, "
              "value_cents long, n_types long"
    )
    scored = ml.outlier_scores(
        feats, ["n_events", "n_offhours", "n_errors", "value_cents", "n_types"]
    )
    flagged = {r["user_id"] for r in scored.filter("is_outlier").collect()}
    assert flagged == {"u_out"}
    out = scored.filter("user_id = 'u_out'").first()
    assert out["score_z"] > 100  # far beyond any inlier
    inlier_max = scored.filter("user_id <> 'u_out'").agg(
        F.max("ensemble_score")
    ).first()[0]
    assert inlier_max < 3.5


def test_outlier_scores_match_python_oracle(spark):
    """Closed-form check on a 5-point series where quartiles/MAD are
    hand-computable: x = [1, 2, 3, 4, 100] single feature."""
    feats = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 100)],
        "user_id string, x long",
    )
    got = {r["user_id"]: r for r in ml.outlier_scores(feats, ["x"]).collect()}
    # exact percentile: q1=2, med=3, q3=4, MAD=median(|x-3|)=[2,1,0,1,97]→1
    for uid, x in [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 100)]:
        z = (x - 3) / (1.4826 * 1.0)
        iqr = max(4 - 2, 1.0)
        lo, hi = 2 - 1.5 * iqr, 4 + 1.5 * iqr
        s_iqr = max(0.0, x - hi, lo - x) / iqr
        want = 0.6 * math.sqrt(z * z) + 0.4 * s_iqr
        assert got[uid]["ensemble_score"] == pytest.approx(want, abs=1e-6)


def test_local_outlier_flags_planted_local_cluster(spark):
    """The density case the global ensemble is blind to: a point whose
    coordinates are GLOBALLY unremarkable (inside the overall spread) but
    sit apart from its own dense neighborhood. LOF > threshold flags it;
    the dense-cluster members stay ~1.0; robust-z/IQR does NOT flag it —
    the gap reference lof_model.py:31-128 exists to close."""
    # bucket 1: tight cluster at x≈100 plus one point at 140 (locally far);
    # bucket 2: wide spread 0..400 so 140 is globally mid-range
    rows = [(f"c{i}", 1, 100 + i, 0) for i in range(6)]
    rows.append(("local_out", 1, 140, 0))
    rows += [(f"w{i}", 2, i * 80, 0) for i in range(6)]  # 0..400
    feats = spark.createDataFrame(
        rows, "user_id string, bucket long, x long, y long"
    )
    scored = {r["user_id"]: r for r in ml.local_outlier_scores(
        feats, ["x", "y"], bucket_col="bucket", k=3
    ).collect()}
    assert scored["local_out"]["is_local_outlier"]
    assert scored["local_out"]["lof_score"] > 1.5
    for i in range(6):  # dense members are inliers with LOF ≈ 1
        assert not scored[f"c{i}"]["is_local_outlier"]
        assert scored[f"c{i}"]["lof_score"] < 1.3
    # the global ensemble does NOT see it (x=140 is mid-range globally)
    global_scores = ml.outlier_scores(feats, ["x", "y"], threshold=3.5)
    assert global_scores.filter(
        "user_id = 'local_out' AND is_outlier"
    ).count() == 0


def test_local_outlier_singleton_and_oversize_buckets_neutral(spark):
    """No same-bucket neighbor (singleton, or bucket dropped by the size
    cap) ⇒ neutral 1.0 / n_neighbors=0 — rows never vanish."""
    rows = [("solo", 9, 5, 0)] + [(f"b{i}", 1, i, 0) for i in range(4)]
    feats = spark.createDataFrame(
        rows, "user_id string, bucket long, x long, y long"
    )
    got = {r["user_id"]: r for r in ml.local_outlier_scores(
        feats, ["x", "y"], bucket_col="bucket", k=2, max_bucket=3
    ).collect()}
    assert len(got) == 5  # every input id present
    assert got["solo"]["lof_score"] == 1.0 and got["solo"]["n_neighbors"] == 0
    # bucket 1 has 4 members > max_bucket=3 ⇒ dropped ⇒ neutral too
    assert all(got[f"b{i}"]["n_neighbors"] == 0 for i in range(4))


def test_local_outlier_multiprobe_flips_boundary_miss_to_hit(spark):
    """The cross-bucket blind spot (reference lof_model.py searches
    globally): a true outlier stranded alone in its grid cell scores a
    neutral 1.0 single-probe (miss); with nprobe=2 it probes the nearest
    other cell, gains real neighbors, and flags (hit)."""
    # bucket 1: tight cluster at x≈100; bucket 9: the planted outlier,
    # alone in its cell at x=150 — near-ish the cluster but locally sparse
    rows = [(f"c{i}", 1, 100 + i, 0) for i in range(6)]
    rows.append(("stranded", 9, 150, 0))
    feats = spark.createDataFrame(
        rows, "user_id string, bucket long, x long, y long"
    )
    single = {r["user_id"]: r for r in ml.local_outlier_scores(
        feats, ["x", "y"], bucket_col="bucket", k=3
    ).collect()}
    assert not single["stranded"]["is_local_outlier"]  # the miss
    assert single["stranded"]["n_neighbors"] == 0
    multi = {r["user_id"]: r for r in ml.local_outlier_scores(
        feats, ["x", "y"], bucket_col="bucket", k=3, nprobe=2
    ).collect()}
    assert multi["stranded"]["is_local_outlier"]  # the hit
    assert multi["stranded"]["n_neighbors"] == 3
    assert multi["stranded"]["lof_score"] > 1.5
    # cluster members keep scoring as inliers under multiprobe
    for i in range(6):
        assert not multi[f"c{i}"]["is_local_outlier"]


def test_local_outlier_multiprobe_home_bucket_always_probed(spark):
    """Probe set = home ∪ nearest (nprobe−1) OTHER cells — a point never
    loses its own bucket-mates, even when another centroid is closer
    (here c-cluster's centroid sits nearer to 'edge' than its own)."""
    rows = [(f"c{i}", 1, 100 + i, 0) for i in range(4)]
    rows += [("edge", 2, 104, 0), ("mate", 2, 130, 0)]
    feats = spark.createDataFrame(
        rows, "user_id string, bucket long, x long, y long"
    )
    multi = {r["user_id"]: r for r in ml.local_outlier_scores(
        feats, ["x", "y"], bucket_col="bucket", k=5, nprobe=2
    ).collect()}
    # edge sees its 4 probed c-neighbors AND its home mate: 5 candidates
    assert multi["edge"]["n_neighbors"] == 5


def test_local_outlier_duplicate_points_no_infinity(spark):
    """All-identical neighborhoods have zero reach distance; the epsilon
    guard must keep lrd finite and scores well-defined."""
    rows = [(f"d{i}", 1, 50, 50) for i in range(5)]
    feats = spark.createDataFrame(
        rows, "user_id string, bucket long, x long, y long"
    )
    out = ml.local_outlier_scores(feats, ["x", "y"], bucket_col="bucket", k=2)
    vals = [r["lof_score"] for r in out.collect()]
    assert all(v is not None and math.isfinite(v) for v in vals)
    assert all(v == 1.0 for v in vals)  # identical points: perfectly local


# ------------------------------------------------------------------ risk

def test_entity_risk_scores_formula_and_tiers(spark):
    anomalies = spark.createDataFrame(
        # u1: 1 anomaly sev 30 → 30+10+10 = 50 (medium)
        # u2: 4 anomalies sev avg 90 → 30+40+30 = 100 → capped (high)
        # u3: 1 anomaly sev 0 → 40 (medium, boundary)
        [("u1", 30.0)] + [("u2", 90.0)] * 4 + [("u3", 0.0)],
        "user_id string, severity double",
    )
    got = {r["user_id"]: r for r in risk.entity_risk_scores(anomalies).collect()}
    assert got["u1"]["risk_score"] == 50.0 and got["u1"]["risk_tier"] == "medium"
    assert got["u2"]["risk_score"] == 100.0 and got["u2"]["risk_tier"] == "high"
    assert got["u3"]["risk_score"] == 40.0 and got["u3"]["risk_tier"] == "medium"


def test_linear_forecast_exact_line(spark):
    """A perfectly linear series forecasts exactly on the line; a clamped
    series saturates at the bounds."""
    rows = [("u", x, 10 + 5 * x) for x in range(10)]  # slope 5, y(16)=90
    rows += [("v", x, 200 - 50 * x) for x in range(4)]  # plunges below 0
    daily = spark.createDataFrame(rows, "user_id string, x long, y long")
    got = {r["user_id"]: r for r in
           risk.linear_forecast(daily, "user_id", "x", "y", horizon=7).collect()}
    assert got["u"]["slope"] == pytest.approx(5.0)
    assert got["u"]["forecast"] == pytest.approx(90.0)  # 10 + 5*(9+7) = 90
    assert got["v"]["slope"] == pytest.approx(-50.0)
    assert got["v"]["forecast"] == 0.0  # clamped at the floor


# ------------------------------------------------------------ seasonality

def test_dominant_period_detects_planted_cycle(spark):
    """y = weekly square wave over 56 days ⇒ acf(7)=acf(14)=1 exactly;
    tie-break picks the smaller lag. A noise-free linear series has acf 1 at
    every lag too, so the wave uses distinct values per weekday."""
    rows = [("s", x, [5, 9, 2, 7, 3, 8, 1][x % 7]) for x in range(56)]
    daily = spark.createDataFrame(rows, "k string, x long, y long")
    got = timeseries.dominant_period(
        daily, "k", "x", "y", lags=[7, 14, 30], min_pairs=8
    ).collect()
    assert len(got) == 1
    assert got[0]["best_lag"] == 7
    assert got[0]["best_acf"] == pytest.approx(1.0)


def test_autocorr_missing_days_align_by_join(spark):
    """Gaps must pair by actual day arithmetic, not positional shift: with
    day 3 missing, lag-1 pairs are (1,0),(2,1),(5,4) only."""
    rows = [("s", 0, 1), ("s", 1, 2), ("s", 2, 4), ("s", 4, 8), ("s", 5, 16)]
    daily = spark.createDataFrame(rows, "k string, x long, y long")
    acf = timeseries.autocorr_at_lags(daily, "k", "x", "y", [1]).collect()
    assert acf[0]["n_pairs"] == 3


# ------------------------------------------------------------------ graph

def test_degree_centrality_small_graph(spark):
    """Star graph a-{b,c,d} plus edge b-c; N=4 ⇒ centrality(a)=3/3=1."""
    inter = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c")],
        "src string, dst string",
    )
    edges = graph.weighted_edges(inter, "src", "dst")
    got = {r["node"]: r for r in graph.degree_centrality(edges).collect()}
    assert got["a"]["n_neighbors"] == 3
    assert got["a"]["weighted_degree"] == 4  # a-b weight 2 + a-c + a-d
    assert got["a"]["centrality_micros"] == 1_000_000
    assert got["b"]["n_neighbors"] == 2
    assert got["d"]["centrality_micros"] == 333_333  # floor(1e6/3 + .5)


def test_branched_forecast_three_branches(spark):
    """Planted series hit each predict_future_risk branch exactly:

    * ``lin``: y = 2x on days 0..4 → slope 2 ≥ 0.1 → linear branch,
      forecast = 2·(4+3) = 14;
    * ``sea``: flat 50 over days 0..12 with mirrored spikes (80) at days 4
      and 8 — symmetric about the mean day, so the least-squares slope is
      exactly 0 and the seasonal branch replays the day-8 value (the
      ``xmax+3-7`` replay source for horizon 3, period 7);
    * ``last``: single observation (60) → last-value carry."""
    rows = (
        [("lin", x, 2 * x) for x in range(5)]
        + [("sea", x, 80 if x in (4, 8) else 50) for x in range(13)]
        + [("last", 5, 60)]
    )
    daily = spark.createDataFrame(rows, "u string, x long, y long")
    out = {
        r["u"]: r
        for r in risk.branched_forecast(
            daily, "u", "x", "y", horizon=3, period=7
        ).collect()
    }
    assert out["lin"]["branch"] == "linear"
    assert out["lin"]["forecast_micros"] == 14_000_000
    assert out["sea"]["branch"] == "seasonal"
    assert out["sea"]["forecast_micros"] == 80_000_000
    assert out["last"]["branch"] == "last"
    assert out["last"]["forecast_micros"] == 60_000_000


def test_branched_forecast_clamps_to_range(spark):
    """A steep rising line forecasts past 100 → clamped to the cap."""
    daily = spark.createDataFrame(
        [("u", x, 40 * x) for x in range(4)], "u string, x long, y long"
    )
    row = risk.branched_forecast(daily, "u", "x", "y").first()
    assert row["branch"] == "linear"
    assert row["forecast_micros"] == 100_000_000
