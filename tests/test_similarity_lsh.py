"""Hyperplane-LSH bucketing + multi-probe ANN: determinism and the recall
property multi-probe exists for (Hamming-1 neighbours become reachable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def buckets(emb):
    return {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }


def test_bucket_assignment_deterministic(emb, buckets):
    again = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("b"),
        ).collect()
    }
    assert again == buckets
    assert all(len(b) == 8 and set(b) <= {"0", "1"} for b in buckets.values())


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_multiprobe_covers_hamming1_neighbours(emb, buckets):
    """Single-bucket LSH only pairs identical buckets; multi-probe must also
    pair every (query, candidate) whose buckets differ in exactly one bit —
    and nothing beyond Hamming distance 1."""
    big_k = 10_000  # no top-k truncation: observe the full candidate sets
    with_b = emb.select(
        "vec_id", "embedding",
        similarity.lsh_sign_bucket(F.col("embedding"), 8, 64).alias("label"),
    )
    single = _pairs(similarity.ivf_topk(with_b, k=big_k, bucket_col="label"))
    multi = _pairs(similarity.lsh_multiprobe_topk(emb, k=big_k))

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert single <= multi  # own-bucket candidates always survive
    gained = multi - single
    assert gained, "fixture should contain Hamming-1 bucket pairs"
    assert all(ham(buckets[q], buckets[n]) == 1 for q, n in gained)
    missed = {
        (q, n)
        for q in buckets for n in buckets
        if q != n and ham(buckets[q], buckets[n]) == 1
    }
    assert missed == gained  # every Hamming-1 pair is probed, none skipped


def test_ivf_multiprobe_recovers_cross_cell_neighbour(spark):
    """The nprobe=2 recall property: a query whose true nearest neighbour
    sits in a DIFFERENT (but second-closest) cell finds it; single-probe
    ivf_topk on the same data cannot."""
    dim = 64

    def vec(base, eps=0.0):
        return [float(base)] * (dim // 2) + [float(base + eps)] * (dim // 2)

    rows = [
        # cell 0: the query + one mediocre same-cell neighbour
        (1, vec(1.0), 0),
        (2, vec(0.6), 0),
        # cell 1: the query's true nearest neighbour (near-identical copy)
        (3, vec(1.0, eps=0.001), 1),
        (4, vec(1.05), 1),
        # cell 2: far away — must NOT be probed
        (5, vec(-1.0), 2),
        (6, vec(-1.02), 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_multiprobe_topk(df, k=3, nprobe=2).collect()
    }
    assert (1, 3) in multi            # cross-cell true neighbour found
    assert (1, 5) not in multi        # far cell not probed
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(df, k=3).collect()
    }
    assert (1, 3) not in single       # single-probe provably misses it


def test_int8_ivf_recall_parity_with_float_path(emb):
    """int8 × IVF (the 100 TB storage configuration) must track the float
    (milli-quantized) IVF path in TRUE recall against brute-force ground
    truth — the honest compression-cost metric (pair-by-pair agreement
    between the two paths is the wrong pin: near cell boundaries the two
    representations legitimately probe different second-nearest cells,
    so agreement can drop while both paths' real recall improves).
    4× compression may cost at most 3 points of recall@3."""
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, k=3).collect()
    }
    flt = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_multiprobe_topk(emb, k=3, nprobe=2).collect()
    }
    i8 = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.int8_ivf_topk(emb, k=3, nprobe=2).collect()
    }
    assert {q for q, _ in i8} == {q for q, _ in flt}  # same query coverage
    r_flt = len(truth & flt) / len(truth)
    r_i8 = len(truth & i8) / len(truth)
    assert r_i8 >= r_flt - 0.03, \
        f"int8 recall {r_i8:.3f} vs float recall {r_flt:.3f}"
    assert r_flt > 0.2  # the label cells carry real signal at nprobe=2


def test_int8_ivf_excludes_zero_vectors(spark):
    """int8 quantization is undefined for the zero vector; the composed
    path must drop it from both sides rather than divide by zero."""
    rows = [
        (1, [1.0] * 64, 0), (2, [0.9] * 64, 0), (3, [1.1] * 64, 0),
        (9, [0.0] * 64, 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = similarity.int8_ivf_topk(df, k=3, nprobe=1).collect()
    ids = {r["query_id"] for r in got} | {r["neighbor_id"] for r in got}
    assert 9 not in ids
    assert {r["query_id"] for r in got} == {1, 2, 3}


def test_ivf_max_bucket_cap_drops_skewed_cell(spark):
    """The oversize-cell prefilter (the LSH discipline applied to the ANN
    family): with a planted skewed cell above max_bucket, the IVF index
    must drop that cell's CANDIDATES (bounding the per-cell join fan-out)
    while every query — including the dropped cell's members — still
    probes its nearest kept cells and answers."""
    d = 8
    rows = [(i, [1.0] * (d - 1) + [1.0 + i / 50.0], 0) for i in range(6)]
    rows += [(10 + i, [0.9] * (d - 1) + [1.0 + i / 50.0], 1)
             for i in range(3)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")

    got = similarity.int8_ivf_topk(
        df, k=2, nprobe=1, dim=d, max_bucket=4).collect()
    assert {r["neighbor_id"] for r in got} <= {10, 11, 12}, \
        "a dropped cell must contribute no candidates"
    assert {r["query_id"] for r in got} == {0, 1, 2, 3, 4, 5, 10, 11, 12}, \
        "dropped-cell members must still query the kept index"

    unc = similarity.int8_ivf_topk(
        df, k=2, nprobe=1, dim=d, max_bucket=None).collect()
    assert {r["neighbor_id"] for r in unc
            if r["query_id"] == 0} <= {1, 2, 3, 4, 5}  # opt-out restores

    # single-probe ivf_topk: dropped-cell members emit no rows (their only
    # probe target is gone — the LSH-bucket drop semantics)
    single = similarity.ivf_topk(df, k=2, max_bucket=4).collect()
    assert {r["query_id"] for r in single} == {10, 11, 12}

    st = similarity.ivf_cell_stats(df, max_bucket=4).collect()[0]
    assert st["n_cells"] == 2 and st["n_cells_dropped"] == 1
    assert st["max_cell_size"] == 6
    assert st["candidates_dropped"] == 30  # 6·5 ordered pairs


def test_ivf_kmeans_codebook_beats_skewed_labels(spark):
    """The learned-codebook fix for the skewed-cell hazard: when the
    data-given label column lumps everything into ONE oversized cell
    (dropped by the cap → zero recall), kmeans-derived cells split the
    data into balanced cells and recover the true neighbors."""
    d = 64
    rows = [(i, [1.0] * (d // 2) + [1.0 + i / 50.0] * (d // 2), 0)
            for i in range(6)]
    rows += [(10 + i, [-1.0] * (d // 2) + [-1.0 - i / 50.0] * (d // 2), 0)
             for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")

    label_cells = similarity.int8_ivf_topk(
        df, k=2, nprobe=1, dim=d, max_bucket=8).collect()
    assert label_cells == [], "the single 12-member label cell is dropped"

    learned = similarity.ivf_kmeans_topk(
        df, k=2, n_clusters=2, n_iters=2, nprobe=1, dim=d, max_bucket=8)
    got = {(r["query_id"], r["neighbor_id"]) for r in learned.collect()}
    assert got, "kmeans cells must be searchable under the same cap"
    # neighbors stay within each natural cluster (no cross-sign pairs)
    for q, n in got:
        assert (q < 10) == (n < 10)
    # every vector queries and finds in-cluster neighbors
    assert {q for q, _ in got} == {r[0] for r in rows}


def test_contrastive_pairs_margin_and_sides(spark, emb):
    """Every mined anchor's positive is same-label and its negative
    different-label (checked against the raw labels); the margin is
    exactly pos − neg; an anchor alone in its bucket never appears."""
    labels = {r["vec_id"]: r["label"]
              for r in emb.select("vec_id", "label").collect()}
    rows = similarity.contrastive_pairs(emb, n_planes=4).collect()
    assert rows, "mining produced no pairs at all"
    seen_both = 0
    for r in rows:
        if r["pos_id"] is not None:
            assert labels[r["pos_id"]] == labels[r["query_id"]]
        if r["neg_id"] is not None:
            assert labels[r["neg_id"]] != labels[r["query_id"]]
        if r["pos_id"] is not None and r["neg_id"] is not None:
            assert r["margin_micro"] == (
                r["pos_cos_micro"] - r["neg_cos_micro"])
            seen_both += 1
        else:
            assert r["margin_micro"] is None
    assert seen_both > 0


def test_contrastive_pairs_planted_hard_negative(spark):
    """A planted near-identical cross-label point must surface as the
    hard negative with a higher cosine than the true positive."""
    d = 8
    base = [1.0] * d
    rows = [
        (0, [float(x) for x in base], 0),                      # anchor
        (1, [float(x) for x in [1.0] * (d - 1) + [0.8]], 0),   # positive
        (2, [float(x) for x in [1.0] * (d - 1) + [0.99]], 1),  # hard neg
        (3, [-1.0] * d, 1),                                    # far away
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["query_id"]: r.asDict()
           for r in similarity.contrastive_pairs(
               df, n_planes=2, dim=d).collect()}
    anchor = got[0]
    assert anchor["pos_id"] == 1
    assert anchor["neg_id"] == 2
    assert anchor["neg_cos_micro"] > anchor["pos_cos_micro"]
    assert anchor["margin_micro"] < 0


def test_knn_label_noise_planted_mislabel(spark):
    """Six near-identical vectors, five labeled 0 and one labeled 1: the
    odd one out is flagged noisy (all its neighbours disagree), every
    correctly-labeled point is not (≤1 of its 5 neighbours disagrees),
    and a lone far-away point with no bucket-mates never appears."""
    d = 8
    rows = [(i, [1.0] * (d - 1) + [1.0 + i / 100.0], 0) for i in range(5)]
    rows.append((5, [1.0] * (d - 1) + [1.05], 1))      # planted mislabel
    rows.append((6, [-1.0] * d, 0))                    # alone in its bucket
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r["vec_id"]: r.asDict()
           for r in similarity.knn_label_noise(
               df, k=5, n_planes=2, dim=d).collect()}
    assert 6 not in got
    assert got[5]["noisy"] == 1 and got[5]["disagree_ppm"] == 1_000_000
    for i in range(5):
        assert got[i]["noisy"] == 0, f"clean point {i} flagged"
        assert got[i]["n_disagree"] <= 1
