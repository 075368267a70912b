"""Profiling/drift-op invariants vs naive in-memory recomputation:
Wasserstein-1 over cents bins, frequent-values top-5, and the exact
integer-power-sum Pearson correlation."""

import math

import numpy as np
import pandas as pd

from anomaly_detection_spark.queries import (
    q_frequent_values,
    q_price_qty_correlation,
    q_wasserstein_value_drift,
)

SF = "/root/testdata/sf0.001"


def test_wasserstein_matches_naive(spark):
    row = q_wasserstein_value_drift(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    bins = np.round(ev["value"] * 100).astype("int64")
    cur = np.sort(bins[ev["ts"] >= pd.Timestamp("2024-01-15")].to_numpy())
    base = np.sort(bins[ev["ts"] < pd.Timestamp("2024-01-15")].to_numpy())
    grid = np.unique(np.concatenate([cur, base]))
    cc = np.searchsorted(cur, grid, side="right")
    cb = np.searchsorted(base, grid, side="right")
    gaps = np.diff(grid)
    scaled = int(np.sum(np.abs(cc[:-1] * len(base) - cb[:-1] * len(cur)) * gaps))
    assert row["w1_scaled"] == scaled
    assert row["nc"] == len(cur) and row["nb"] == len(base)
    w1 = scaled / (len(cur) * len(base))
    assert row["w1_cents_e4"] == math.floor(w1 * 1e4 + 0.5)
    # sanity: agrees with the mean-|sorted quantile diff| formulation when
    # sample sizes match is not guaranteed here, but W1 must be >= 0
    assert row["w1_cents_e4"] >= 0


def test_frequent_values_matches_pandas(spark):
    out = q_frequent_values(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source"])
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    for col_name, series in [
        ("documents.lang", docs["lang"]),
        ("documents.source", docs["source"]),
        ("events.event_type", ev["event_type"]),
    ]:
        s = series.dropna()
        vc = s.value_counts()
        # deterministic tie-break: count desc, value asc
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = out[out["col_name"] == col_name].sort_values("rank")
        assert list(got["value"]) == [v for v, _ in top]
        assert list(got["cnt"]) == [c for _, c in top]
        assert all(
            ppm == (c * 1_000_000) // len(s)
            for ppm, (_, c) in zip(got["ratio_ppm"], top)
        )


def test_pearson_matches_numpy(spark):
    out = {r["l_returnflag"]: r for r in q_price_qty_correlation(spark, SF).collect()}
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, grp in li.groupby("l_returnflag"):
        x = np.round(grp["l_quantity"] * 100).astype("int64")
        y = np.round(grp["l_extendedprice"] * 100).astype("int64")
        r = np.corrcoef(x, y)[0, 1]
        got = out[flag]
        assert got["n"] == len(grp)
        # numpy's two-pass formula differs from power sums by float noise only
        assert abs(got["corr_micro"] - math.floor(r * 1e6 + 0.5)) <= 2
