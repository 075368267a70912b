"""Curation-operator invariants: hash-split stability under corpus growth,
and the scale-shaped token-budget selection matching the naive global
prefix-sum semantics exactly (including ties)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anomaly_detection_spark.functions import curation


def test_split_membership_stable_under_growth(spark):
    full = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    subset = full.filter("doc_id < 400")
    s_full = {r["doc_id"]: r["s"] for r in
              full.select("doc_id", curation.split_column("doc_id").alias("s"))
              .collect()}
    s_sub = {r["doc_id"]: r["s"] for r in
             subset.select("doc_id", curation.split_column("doc_id").alias("s"))
             .collect()}
    # growing the corpus never moves an existing doc between splits
    assert all(s_full[k] == v for k, v in s_sub.items())
    # ratios roughly 80/10/10
    n = len(s_full)
    assert 0.7 < sum(v == "train" for v in s_full.values()) / n < 0.9


def test_stratified_sample_is_pure_filter(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    out1 = curation.stratified_sample(df, "lang", {"en": 50, "zh": 10})
    out2 = curation.stratified_sample(df, "lang", {"en": 50, "zh": 10})
    a = sorted(r["doc_id"] for r in out1.collect())
    assert a == sorted(r["doc_id"] for r in out2.collect())  # reproducible
    en = df.filter("lang = 'en'").count()
    kept_en = out1.filter("lang = 'en'").count()
    assert 0.3 * en < kept_en < 0.7 * en
    # no shuffle: plan has no Exchange
    plan = out1._sc._jvm.PythonSQLUtils.explainString(
        out1._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan.split("\n\n")[0]


def test_token_budget_matches_naive_global_prefix(spark):
    # deliberate quality ties so the id tie-break matters
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        (F.col("id") % 5).alias("q"),
    )
    got = sorted(r["doc_id"] for r in
                 curation.token_budget_selection(df, 250, "n_tokens", "q",
                                                 "doc_id").collect())
    w = Window.orderBy(F.desc("q"), F.asc("doc_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = sorted(
        r["doc_id"] for r in
        df.withColumn("_c", F.sum("n_tokens").over(w))
        .filter(F.col("_c") <= 250).collect()
    )
    assert got == naive and len(naive) > 10


def test_token_budget_quantizes_continuous_quality(spark):
    """A raw continuous quality column (every value distinct) must not
    degrade the offsets window to a corpus-sized single task: the function
    quantizes internally, so the unpartitioned window's input is bounded
    by the distinct ROUNDED values, not the row count — and the selected
    set still equals the naive global prefix under the quantized order."""
    n = 20_000
    # ~20k distinct raw doubles that collapse to ≤ 101 values at 6 dp
    df = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.lit(3).alias("n_tokens"),
        ((F.col("id") % 101) * 1e-6 + F.col("id") * 1e-13).alias("q"),
    )
    assert df.select("q").distinct().count() == n  # genuinely continuous
    out = curation.token_budget_selection(df, 3 * 500, "n_tokens", "q",
                                          "doc_id")
    w = Window.orderBy(F.desc(F.round("q", 6)), F.asc("doc_id")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = sorted(
        r["doc_id"] for r in
        df.withColumn("_c", F.sum("n_tokens").over(w))
        .filter(F.col("_c") <= 3 * 500).collect()
    )
    assert sorted(r["doc_id"] for r in out.collect()) == naive
    assert len(naive) == 500
    # original quality values survive (not the rounded key)
    q_out = {r["doc_id"]: r["q"] for r in out.collect()}
    q_in = {r["doc_id"]: r["q"] for r in df.collect()}
    assert all(q_out[k] == q_in[k] for k in q_out)
    # the only unpartitioned window runs over the per-quality aggregate:
    # its input is one row per DISTINCT rounded value (≤ 101 here), which
    # is what keeps the single-task window metadata-sized at 10^12 docs
    kdist = df.select(F.round("q", 6).alias("k")).distinct().count()
    assert kdist <= 101


def test_shuffle_rank_is_permutation_and_deterministic(spark):
    df = spark.range(0, 337).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shuffle_pos"]
         for r in curation.shuffle_rank(df, "doc_id").collect()}
    assert sorted(a.values()) == list(range(337))   # a true permutation
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in curation.shuffle_rank(df, "doc_id").collect()}
    assert a == b                                   # same order every run
    # hash order, not id order: the identity permutation would mean md5
    # sorted ids numerically, which is astronomically unlikely
    assert any(a[i] != i for i in a)


def test_domain_mixture_upweights_low_resource_domains(spark):
    rows = [("big", 10_000) for _ in range(10)] + [("small", 100)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    tot = 100_000 + 100
    # budget = corpus size, so epochs read directly as over/under-sampling
    out = {r["source"]: r for r in
           curation.domain_mixture(df, "source", "n_tokens", tot).collect()}
    raw_small_share = 100 / tot
    got_small_share = out["small"]["weight_ppm"] / 1e6
    assert got_small_share > raw_small_share * 5   # α=0.5 boosts the tail
    # weights normalize (ppm rounding leaves at most #domains µ of slack)
    assert abs(sum(r["weight_ppm"] for r in out.values()) - 1_000_000) <= 2
    # epochs: small domain replayed far more than once, big less
    assert out["small"]["epochs_micro"] > 1_000_000
    assert out["big"]["epochs_micro"] < 1_000_000


def test_group_cap_sample_caps_and_is_deterministic(spark):
    from anomaly_detection_spark.functions.curation import group_cap_sample

    rows = ([("big", str(i)) for i in range(200)]
            + [("small", str(1000 + i)) for i in range(3)])
    df = spark.createDataFrame(rows, "source string, doc_id string")
    out = group_cap_sample(df, "source", 5, id_col="doc_id")
    got = sorted((r["source"], r["doc_id"]) for r in out.collect())
    # big capped at 5, small (under cap) fully retained
    assert sum(1 for s, _ in got if s == "big") == 5
    assert sum(1 for s, _ in got if s == "small") == 3

    # pure function of content: reshuffled input, different salt count,
    # same selection
    again = group_cap_sample(
        df.orderBy(F.desc("doc_id")).repartition(7), "source", 5,
        salt_buckets=1)
    assert sorted((r["source"], r["doc_id"])
                  for r in again.collect()) == got

    # selection follows md5 order of ids (reference model)
    import hashlib
    expect = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), str(i))
        for i in range(200))[:5]
    assert {d for _, d in expect} == {d for s, d in got if s == "big"}


def test_temperature_mixture_flattens_toward_tail(spark):
    from anomaly_detection_spark.functions import curation

    rows = ([("big", i) for i in range(900)]
            + [("mid", i) for i in range(90)]
            + [("tiny", i) for i in range(10)])
    df = spark.createDataFrame(rows, ["source", "x"])
    got = {(r["alpha_pct"], r["domain"]): r.asDict()
           for r in curation.temperature_mixture(df, "source").collect()}

    # alpha=100 is the exact natural share
    assert got[(100, "big")]["share_ppm"] == 900 * 1_000_000 // 1000
    assert got[(100, "tiny")]["boost_ppm"] == 1_000_000

    # falling alpha moves share from head to tail, monotonically
    for d, direction in (("big", -1), ("tiny", 1)):
        s100 = got[(100, d)]["share_ppm"]
        s50 = got[(50, d)]["share_ppm"]
        s25 = got[(25, d)]["share_ppm"]
        assert (s50 - s100) * direction > 0
        assert (s25 - s50) * direction > 0
    assert got[(25, "tiny")]["boost_ppm"] > 1_000_000
    assert got[(25, "big")]["boost_ppm"] < 1_000_000

    # weights are the exact quantized sqrt chain
    import math
    assert got[(50, "big")]["weight"] == math.floor(
        math.sqrt(900.0) * 1e6 + 0.5)
    assert got[(25, "tiny")]["weight"] == math.floor(
        math.sqrt(math.sqrt(10.0)) * 1e6 + 0.5)

    # shares within an alpha are a partition of (almost) 1e6
    for a in (100, 50, 25):
        tot = sum(got[(a, d)]["share_ppm"] for d in ("big", "mid", "tiny"))
        assert 1_000_000 - 3 <= tot <= 1_000_000


def test_temperature_mixture_rejects_unsafe_alpha(spark):
    import pytest as _pytest
    from anomaly_detection_spark.functions import curation

    df = spark.createDataFrame([("a", 1)], ["source", "x"])
    with _pytest.raises(ValueError):
        curation.temperature_mixture(df, "source", alphas=(70,))
