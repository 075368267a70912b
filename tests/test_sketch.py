"""Count-min sketch contracts: merge==recompute (the mergeability that
lets per-partition sketches roll up without rescans), the one-sided error
guarantee (estimates never undercount), exactness in the collision-free
regime, and weighted counting."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from anomaly_detection_spark.functions.sketch import (
    cms_build, cms_estimate, cms_merge)

D, W = 4, 64


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def _cells(df):
    return {(r["row"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_merge_equals_recompute(spark):
    a = ["x", "y", "x", "z"] * 3
    b = ["y", "w"] * 5
    sa = cms_build(_df(spark, a), "k", depth=D, width=W)
    sb = cms_build(_df(spark, b), "k", depth=D, width=W)
    merged = _cells(cms_merge(sa, sb))
    whole = _cells(cms_build(_df(spark, a + b), "k", depth=D, width=W))
    assert merged == whole


def test_estimate_never_undercounts(spark):
    keys = [f"tok{i}" for i in range(200)] + ["hot"] * 50
    df = _df(spark, keys)
    sk = cms_build(df, "k", depth=D, width=W)
    exact = Counter(keys)
    probes = _df(spark, sorted(exact))
    got = {r["k"]: r["cms_est"]
           for r in cms_estimate(sk, probes, "k", depth=D, width=W).collect()}
    assert all(got[k] >= c for k, c in exact.items())
    assert got["hot"] >= 50


def test_exact_when_no_collisions(spark):
    # 3 keys in a 4x64 sketch: P(any row collides in all 4 rows) is nil for
    # these fixed strings — verify the estimate is exact, not just an upper
    # bound. (Deterministic: md5 buckets of these literals never fully
    # collide at width 64; if they did the assert would fail loudly.)
    keys = ["alpha"] * 7 + ["beta"] * 2 + ["gamma"]
    sk = cms_build(_df(spark, keys), "k", depth=D, width=W)
    got = {r["k"]: r["cms_est"]
           for r in cms_estimate(sk, _df(spark, ["alpha", "beta", "gamma"]),
                                 "k", depth=D, width=W).collect()}
    assert got == {"alpha": 7, "beta": 2, "gamma": 1}


def test_unseen_key_estimates_reflect_only_collisions(spark):
    sk = cms_build(_df(spark, ["only"]), "k", depth=D, width=W)
    got = cms_estimate(sk, _df(spark, ["never-seen"]), "k",
                       depth=D, width=W).collect()[0]
    assert got["cms_est"] in (0, 1)  # 1 only if all D rows collide


def test_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 2), ("b", 3)],
                               "k string, w int")
    sk = cms_build(df, "k", depth=D, width=W, weight_col="w")
    got = {r["k"]: r["cms_est"]
           for r in cms_estimate(sk, _df(spark, ["a", "b"]), "k",
                                 depth=D, width=W).collect()}
    assert got["a"] >= 7 and got["b"] >= 3


def test_sketch_state_is_bounded(spark):
    df = spark.range(5000).select(F.concat(F.lit("k"), "id").alias("k"))
    sk = cms_build(df, "k", depth=D, width=W)
    assert sk.count() <= D * W


def test_cms_build_works_as_streaming_aggregate(spark, tmp_path):
    """The sketch fold is a plain keyed aggregate, so the SAME cms_build
    runs unchanged as a Structured Streaming query (complete mode): the
    final sketch after two file-batches equals the batch sketch over the
    union — the incremental-ingest shape (fold each commit, never rescan)."""
    a = [("x",)] * 3 + [("y",)] * 2
    b = [("x",)] * 1 + [("z",)] * 4
    spark.createDataFrame(a, "k string").coalesce(1) \
        .write.parquet(str(tmp_path / "in" / "b0"))
    spark.createDataFrame(b, "k string").coalesce(1) \
        .write.parquet(str(tmp_path / "in" / "b1"))

    stream = spark.readStream.schema("k string") \
        .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "in" / "*"))
    q = (
        cms_build(stream, "k", depth=D, width=W)
        .writeStream.format("memory").queryName("cms_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _cells(spark.sql("SELECT * FROM cms_stream"))
    want = _cells(cms_build(_df(spark, [r[0] for r in a + b]), "k",
                            depth=D, width=W))
    assert got == want


def test_inner_product_estimates_join_size(spark):
    from anomaly_detection_spark.functions.sketch import cms_inner_product

    a_keys = ["k1"] * 3 + ["k2"] * 2 + ["a_only"] * 4
    b_keys = ["k1"] * 5 + ["k2"] * 1 + ["b_only"] * 7
    exact = 3 * 5 + 2 * 1  # = 17
    ska = cms_build(_df(spark, a_keys), "k", depth=D, width=W)
    skb = cms_build(_df(spark, b_keys), "k", depth=D, width=W)
    est = cms_inner_product(ska, skb).collect()[0]["est_rows"]
    assert est >= exact                   # one-sided error
    assert est <= exact + len(a_keys) * len(b_keys) // W + 9


def test_inner_product_disjoint_keys_near_zero(spark):
    from anomaly_detection_spark.functions.sketch import cms_inner_product

    ska = cms_build(_df(spark, ["x", "y"]), "k", depth=D, width=W)
    skb = cms_build(_df(spark, ["p", "q"]), "k", depth=D, width=W)
    est = cms_inner_product(ska, skb).collect()[0]["est_rows"]
    assert 0 <= est <= 1  # only a full-depth collision could make it 1


# ------------------------------------------------------------------- KMV

def test_kmv_exact_below_k(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_estimate

    df = _df(spark, [f"v{i}" for i in range(40)] * 3)  # 40 distinct
    got = kmv_estimate(kmv_build(df, "k", k=64), k=64).collect()[0]
    assert got["n_hashes"] == 40 and got["est"] == 40


def test_kmv_estimates_within_tolerance_above_k(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_estimate

    n = 2000
    df = _df(spark, [f"key{i}" for i in range(n)])
    got = kmv_estimate(kmv_build(df, "k", k=128), k=128).collect()[0]
    assert got["n_hashes"] == 128
    # KMV relative error ~ 1/sqrt(k) ≈ 9%; allow 3 sigma
    assert abs(got["est"] - n) < 0.27 * n


def test_kmv_merge_equals_recompute(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_merge

    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)] + a[:100]
    sa = kmv_build(_df(spark, a), "k", k=64)
    sb = kmv_build(_df(spark, b), "k", k=64)
    merged = [(r["pos"], r["hash"]) for r in kmv_merge(sa, sb, k=64).collect()]
    whole = [(r["pos"], r["hash"])
             for r in kmv_build(_df(spark, a + b), "k", k=64).collect()]
    assert sorted(merged) == sorted(whole)


def test_kmv_ignores_nulls(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build

    df = spark.createDataFrame([("x",), (None,), ("y",)], "k string")
    assert kmv_build(df, "k", k=16).count() == 2


def test_kmv_overlap_exact_when_sets_fit(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_overlap

    a = [f"x{i}" for i in range(30)]
    b = [f"x{i}" for i in range(20, 50)]  # overlap = 10, union = 50
    ov = kmv_overlap(kmv_build(_df(spark, a), "k", k=64),
                     kmv_build(_df(spark, b), "k", k=64), k=64) \
        .collect()[0]
    assert ov["union_est"] == 50 and ov["inter_est"] == 10
    assert ov["jaccard_ppm"] == 200_000


def test_kmv_overlap_estimates_above_k(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_overlap

    a = [f"k{i}" for i in range(1000)]
    b = [f"k{i}" for i in range(500, 1500)]  # union 1500, inter 500, J=1/3
    ov = kmv_overlap(kmv_build(_df(spark, a), "k", k=128),
                     kmv_build(_df(spark, b), "k", k=128), k=128) \
        .collect()[0]
    assert abs(ov["union_est"] - 1500) < 450
    assert abs(ov["jaccard_ppm"] - 333_333) < 150_000
    assert 0 < ov["inter_est"] < 1100


def test_kmv_overlap_disjoint(spark):
    from anomaly_detection_spark.functions.sketch import kmv_build, kmv_overlap

    ov = kmv_overlap(kmv_build(_df(spark, ["a", "b"]), "k", k=16),
                     kmv_build(_df(spark, ["c", "d"]), "k", k=16), k=16) \
        .collect()[0]
    assert ov["inter_est"] == 0 and ov["jaccard_ppm"] == 0
    assert ov["union_est"] == 4


def test_kmv_grouped_rollup_is_lossless(spark):
    from anomaly_detection_spark.functions.sketch import (
        kmv_build_grouped, kmv_estimate_grouped)

    rows = [(f"d{i % 4}", f"u{(i * 7) % 300}") for i in range(600)]
    df = spark.createDataFrame(rows, "day string, uid string")
    daily = kmv_build_grouped(df, "day", "uid", k=16)
    # merge all 4 days to one coarse group; compare against direct build
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    merged = (
        daily.select(F.lit("all").alias("g"), "hash").distinct()
        .withColumn("pos", F.row_number().over(
            Window.partitionBy("g").orderBy("hash")))
        .filter("pos <= 16"))
    direct = kmv_build_grouped(
        df.select(F.lit("all").alias("g"), "uid"), "g", "uid", k=16)
    em = kmv_estimate_grouped(merged, "g", k=16).collect()[0]["est"]
    ed = kmv_estimate_grouped(direct, "g", k=16).collect()[0]["est"]
    assert em == ed
