"""Lloyd's k-means (functions/clustering.py) vs an independent
pure-Python reference on seeded random vectors, plus planted
well-separated blobs and the empty-cluster carryover path."""

from __future__ import annotations

import math
import random

from anomaly_detection_spark.functions.clustering import (
    SHIFT, kmeans, kmeans_summary)

DIM = 8


def _mk_vectors(seed: int, n: int, blobs=None):
    """Seeded random float vectors; ``blobs`` = list of (center, count)
    for planted clusters, else uniform noise."""
    rng = random.Random(seed)
    rows = []
    if blobs:
        # interleave blobs so the deterministic smallest-id init picks
        # one seed per blob (row i belongs to blob i % len(blobs))
        i = 0
        per = [list(range(count)) for _, count in blobs]
        b = 0
        while any(per):
            if per[b]:
                per[b].pop()
                center = blobs[b][0]
                rows.append((i, [c + rng.uniform(-0.05, 0.05)
                                 for c in center]))
                i += 1
            b = (b + 1) % len(blobs)
    else:
        for i in range(n):
            rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)]))
    return rows


def _py_quantize(vec):
    mx = max(abs(float(v)) for v in vec)
    mx = mx if mx > 0 else 1.0
    return [int(math.floor(float(v) * 127.0 / mx + 0.5)) + SHIFT
            for v in vec]


def _py_kmeans(rows, k, n_iters):
    pts = [(i, _py_quantize(v)) for i, v in rows]
    dim = len(pts[0][1])
    cents = [list(q) for _, q in sorted(pts)[:k]]

    def assign(q):
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(q, c)), j)
            for j, c in enumerate(cents)
        )
        return best[1], best[0]

    for _ in range(n_iters):
        stats = {}
        for _, q in pts:
            j, _d = assign(q)
            n, s = stats.get(j, (0, [0] * dim))
            stats[j] = (n + 1, [a + b for a, b in zip(s, q)])
        nxt = []
        for j, c in enumerate(cents):
            if j in stats:
                n, s = stats[j]
                nxt.append([(2 * s[i] + n) // (2 * n) for i in range(dim)])
            else:
                nxt.append(c)
        cents = nxt
    out = {i: assign(q) for i, q in pts}
    return out, cents


def _spark_kmeans(spark, rows, k, n_iters):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    assigned, cents = kmeans(df, k=k, n_iters=n_iters)
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in assigned.collect()}
    return got, cents


def test_kmeans_random_model_parity(spark):
    rows = _mk_vectors(11, 60)
    got, gcents = _spark_kmeans(spark, rows, k=3, n_iters=3)
    ref, rcents = _py_kmeans(rows, k=3, n_iters=3)
    assert gcents == rcents
    assert got == ref


def test_kmeans_recovers_planted_blobs(spark):
    blobs = [([1.0] * DIM, 20), ([-1.0] * DIM, 20),
             ([1.0] * (DIM // 2) + [-1.0] * (DIM // 2), 20)]
    rows = _mk_vectors(7, 0, blobs=blobs)
    got, _ = _spark_kmeans(spark, rows, k=3, n_iters=3)
    # every planted blob (row i -> blob i % 3) lands in exactly one
    # cluster, and the three blobs get three distinct clusters
    for b in range(3):
        labels = {got[i][0] for i in range(b, 60, 3)}
        assert len(labels) == 1
    assert len({got[b][0] for b in range(3)}) == 3


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two identical points, k=2: the duplicate seeds both centroids,
    # assignment ties to cluster 0, cluster 1 goes empty and must keep
    # its (identical) centroid without dividing by zero.
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    got, cents = _spark_kmeans(spark, rows, k=2, n_iters=2)
    ref, rcents = _py_kmeans(rows, k=2, n_iters=2)
    assert got == ref
    assert cents == rcents


def test_kmeans_summary_is_exact_rollup(spark):
    rows = _mk_vectors(23, 40)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    ref, rcents = _py_kmeans(rows, k=4, n_iters=3)
    summ = {r["cluster"]: (r["n_points"], r["wss"], r["centroid_l1"])
            for r in kmeans_summary(df, k=4, n_iters=3).collect()}
    want = {}
    for i, (j, d) in ref.items():
        n, w = want.get(j, (0, 0))
        want[j] = (n + 1, w + d)
    want = {j: (n, w, sum(abs(c) for c in rcents[j]))
            for j, (n, w) in want.items()}
    assert summ == want


def test_class_separation_model_parity(spark):
    from anomaly_detection_spark.functions.clustering import class_separation

    # direction-distinct blobs (per-vector max-normalization collapses
    # scalar multiples, so [0.5]*d would alias [1.0]*d)
    rows = _mk_vectors(31, 0, blobs=[([1.0] * DIM, 12),
                                     ([-1.0] * DIM, 12),
                                     ([1.0, -1.0] * (DIM // 2), 12)])
    labeled = [(i, v, i % 3) for i, v in rows]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in labeled],
        "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r.asDict()
           for r in class_separation(df).collect()}

    # pure-Python model
    q = {i: _py_quantize(v) for i, v, _ in labeled}
    by_lbl = {}
    for i, _, l in labeled:
        by_lbl.setdefault(l, []).append(q[i])
    cents = {}
    for l, vs in by_lbl.items():
        n = len(vs)
        cents[l] = [(2 * sum(v[i] for v in vs) + n) // (2 * n)
                    for i in range(DIM)]
    for l, vs in by_lbl.items():
        n = len(vs)
        sq = sum(sum((a - b) ** 2 for a, b in zip(v, cents[l])) for v in vs)
        mi = min(sum((a - b) ** 2 for a, b in zip(cents[l], cents[o]))
                 for o in cents if o != l)
        assert got[l]["n"] == n
        assert got[l]["intra_sqsum"] == sq
        assert got[l]["intra_mean_micro"] == sq * 1_000_000 // n
        assert got[l]["min_inter_sqdist"] == mi
        assert got[l]["fisher_ppm"] == (mi * n * 1_000_000) // sq
    # well-separated planted blobs: separation dwarfs spread
    assert all(r["fisher_ppm"] > 1_000_000 for r in got.values())


def _py_kcenter(rows, k):
    pts = sorted((i, _py_quantize(v)) for i, v in rows)
    sel = [pts[0]]
    ids = {pts[0][0]}
    for _ in range(k - 1):
        best = None
        for i, q in pts:
            d = min(sum((a - b) ** 2 for a, b in zip(q, s))
                    for _, s in sel)
            # max distance, ties -> smallest id
            key = (-d, i)
            if best is None or key < best[0]:
                best = (key, i, q, d)
        if best[3] == 0:
            break
        sel.append((best[1], best[2]))
        ids.add(best[1])
    cells = {}
    for i, q in pts:
        dj = min((sum((a - b) ** 2 for a, b in zip(q, s)), j)
                 for j, (_, s) in enumerate(sel))
        cid = sel[dj[1]][0]
        n, mx, sm = cells.get(cid, (0, 0, 0))
        cells[cid] = (n + 1, max(mx, dj[0]), sm + dj[0])
    return cells


def test_kcenter_model_parity(spark):
    from anomaly_detection_spark.functions.clustering import kcenter_coreset

    rows = _mk_vectors(17, 50)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    got = {r["center_id"]: (r["n_points"], r["radius_sq"], r["sum_sqdist"])
           for r in kcenter_coreset(df, k=4).collect()}
    assert got == _py_kcenter(rows, 4)


def test_kcenter_duplicates_stop_early(spark):
    from anomaly_detection_spark.functions.clustering import kcenter_coreset

    # 2 distinct locations, many duplicates, k=4: after 2 picks every
    # remaining point is at distance 0 -> selection stops at 2 centers
    rows = [(i, [1.0, 0.0]) for i in range(5)] + \
           [(i + 5, [0.0, 1.0]) for i in range(5)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    got = kcenter_coreset(df, k=4).collect()
    assert len(got) == 2
    assert {r["center_id"] for r in got} == {0, 5}
    assert all(r["radius_sq"] == 0 for r in got)
