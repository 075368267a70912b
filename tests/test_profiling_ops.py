"""Profiling/drift-op invariants vs naive in-memory recomputation:
Wasserstein-1 over cents bins, frequent-values top-5, and the exact
integer-power-sum Pearson correlation."""

import math

import numpy as np
import pandas as pd

from anomaly_detection_spark.queries import (
    _BENFORD_PPM,
    q_benford_totalprice,
    q_cross_column_consistency,
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


def test_benford_matches_naive(spark):
    out = q_benford_totalprice(spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    vals = o["o_totalprice"][o["o_totalprice"] >= 1]
    digits = np.floor(vals).astype("int64").astype(str).str[0].astype(int)
    vc = digits.value_counts().sort_index()
    total = int(vc.sum())
    assert list(out["digit"]) == list(vc.index)
    assert list(out["cnt"]) == list(vc.values)
    for _, r in out.iterrows():
        assert r["obs_ppm"] == (r["cnt"] * 1_000_000) // total
        assert r["exp_ppm"] == _BENFORD_PPM[r["digit"] - 1]
        assert r["dev_ppm"] == r["obs_ppm"] - r["exp_ppm"]
    assert sum(_BENFORD_PPM) == 1_000_000


def test_cross_column_flags_planted_violations(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["abc", "defg", None, "hi", None],
            "n_chars": [3, 99, None, 2, 7],  # doc 2 wrong, doc 5 null-vs-set
            "source": ["s1", "s1", "s2", "s2", "s2"],
        }
    )
    pdf["n_chars"] = pdf["n_chars"].astype("Int64")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["source"]: (r["n"], r["n_violations"])
        for r in q_cross_column_consistency(spark, str(tmp_path)).collect()
    }
    # s1: doc2 mismatch; s2: doc3 null==null consistent, doc5 7 vs NULL violation
    assert out == {"s1": (2, 1), "s2": (3, 1)}


def test_key_skew_planted_heavy_hitter(spark):
    """A planted 80%-hot key must rank first with the exact integer ppm
    share; ties below it break by key ascending."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark.profiler import key_skew

    df = spark.range(1000).select(
        F.when(F.col("id") < 800, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 4).cast("string")))
        .alias("k")
    )
    rows = {r["key"]: r for r in key_skew(df, "k", top_k=5).collect()}
    assert rows["hot"]["rank"] == 1
    assert rows["hot"]["cnt"] == 800
    assert rows["hot"]["share_ppm"] == 800_000
    assert rows["hot"]["n_keys"] == 5
    # the four k* keys have 50 each: ranks 2..5 in key order
    assert [rows[f"k{i}"]["rank"] for i in range(4)] == [2, 3, 4, 5]


def test_suggest_rules_decisions(spark):
    """Each suggestion branch fires exactly when its evidence holds:
    not_null vs min_completeness_ppm, unique on distinct non-nulls,
    in_range only for integrals, isin only at low cardinality."""
    import pandas as pd

    from anomaly_detection_spark.profiler import suggest_rules

    pdf = pd.DataFrame({
        "uid": [1, 2, 3, 4],                       # unique integral
        "cat": ["a", "b", "a", None],              # 1 null, 2 distinct
        "big": ["x1", "x2", "x3", "x4"],           # unique string
    })
    df = spark.createDataFrame(pdf)
    got = {(r["column"], r["rule"]): r["param"]
           for r in suggest_rules(df, isin_max=2).collect()}
    assert got[("uid", "not_null")] == ""
    assert got[("uid", "unique")] == ""
    assert got[("uid", "in_range")] == "[1,4]"
    assert ("uid", "isin") not in got      # 4 distinct > isin_max=2
    assert got[("cat", "min_completeness_ppm")] == "750000"
    assert got[("cat", "isin")] == "a|b"
    assert ("cat", "unique") not in got    # 'a' repeats
    assert ("cat", "not_null") not in got
    assert got[("big", "unique")] == ""
    assert ("big", "in_range") not in got  # strings have no range rule
