"""Distributed Lloyd's k-means over embedding vectors — the coarse
semantic-clustering primitive behind SemDeDup-style pruning, topic
bucketing, and IVF codebook training at corpus scale.

Deterministic and integer-exact end to end so a SQL oracle can replay
it bit-for-bit:

* vectors are int8-quantized (``similarity.int8_quantize``) then
  SHIFTED +127 into [0, 254] — k-means geometry is translation-
  invariant, and non-negative coordinates make every later sum
  non-negative, so Python ``//``, DuckDB ``//`` and plain floor all
  agree on the centroid division;
* initial centroids are the ``k`` points with the smallest id
  (TakeOrdered, no RNG);
* assignment breaks distance ties on the smallest centroid index via
  a struct ``array_min`` (total order, no float comparisons);
* centroid updates are round-half-up integer division
  ``(2·Σx + n) // (2·n)`` computed DRIVER-side on exact Python ints —
  the per-iteration collect is k rows of (count, 64 sums), nothing
  row-sized;
* an empty cluster keeps its previous centroid.

Scale shape: each iteration is ONE corpus-wide hash-aggregate
(map-side combined, k·dim long columns) over a scan whose assignment
expression holds the k·dim centroid LITERALS — no join, no shuffle of
the vectors themselves, no per-row Python. n_iters·(scan + k-row
collect) total; at 10^12 vectors each iteration moves k·(dim+1) longs
to the driver. Reference analogue: the reference clusters feature
vectors with sklearn (``ml_models/dbscan_model.py``); Lloyd's k-means
is its partition-style counterpart re-expressed as Spark aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.similarity import int8_quantize

SHIFT = 127  # int8 [-127,127] -> [0,254]; translation-invariant


def shifted_quantize(vec_col: Column) -> Column:
    """Non-negative exact-integer coordinates for k-means."""
    return F.transform(int8_quantize(vec_col), lambda q: q + F.lit(SHIFT))


def _sq_dist(qv: Column, centroid: list[int]) -> Column:
    """Exact integer squared L2 distance to one literal centroid."""
    lit = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(qv, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_clusters(pts: DataFrame, centroids: list[list[int]],
                    vec_col: str = "qv") -> DataFrame:
    """Adds ``cluster`` (argmin of exact distances, ties → smallest
    index) and ``dist`` columns; centroids ride as literals so the
    pass is a pure narrow map — no join, no shuffle."""
    best = F.array_min(F.array(*[
        F.struct(
            _sq_dist(F.col(vec_col), c).alias("d"),
            F.lit(j).cast("int").alias("c"),
        )
        for j, c in enumerate(centroids)
    ]))
    return pts.withColumn("_best", best).select(
        "*",
    ).withColumn("cluster", F.col("_best.c")).withColumn(
        "dist", F.col("_best.d")
    ).drop("_best")


def kmeans(emb: DataFrame, k: int = 4, n_iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           ) -> tuple[DataFrame, list[list[int]]]:
    """Runs ``n_iters`` Lloyd rounds; returns ``(per-point assignment
    DataFrame (id, cluster, dist) under the FINAL centroids, the final
    centroid list)``. See module docstring for the determinism and
    scale contract."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    pts = emb.select(
        F.col(id_col), shifted_quantize(F.col(vec_col)).alias("qv"))

    init = pts.orderBy(id_col).limit(k).collect()
    centroids = [list(r["qv"]) for r in init]
    if not centroids:
        return pts.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("cluster"),
            F.lit(None).cast("long").alias("dist"),
        ), []

    sums = [F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
            for i in range(dim)]
    for _ in range(n_iters):
        rows = (
            assign_clusters(pts, centroids)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        stats = {r["cluster"]: r for r in rows}
        nxt = []
        for j, old in enumerate(centroids):
            r = stats.get(j)
            if r is None:
                nxt.append(old)  # empty cluster keeps its centroid
            else:
                n = int(r["n"])
                nxt.append([(2 * int(r[f"s{i}"]) + n) // (2 * n)
                            for i in range(dim)])
        centroids = nxt

    out = assign_clusters(pts, centroids).select(id_col, "cluster", "dist")
    return out, centroids


def kmeans_summary(emb: DataFrame, k: int = 4, n_iters: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   ) -> DataFrame:
    """Per-cluster quality rollup under the final centroids:
    ``(cluster, n_points, wss, centroid_l1)`` — all exact integers
    (wss = Σ squared distances; centroid_l1 = Σ|coords| fingerprints
    the centroid itself so the oracle checks the geometry, not just
    the partition sizes)."""
    assigned, centroids = kmeans(emb, k=k, n_iters=n_iters,
                                 id_col=id_col, vec_col=vec_col)
    l1 = {j: sum(abs(int(v)) for v in c) for j, c in enumerate(centroids)}
    l1_col = F.create_map(*[
        x for j in l1 for x in (F.lit(j), F.lit(l1[j]).cast("long"))])
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.sum("dist").cast("long").alias("wss"),
        )
        .withColumn("centroid_l1", l1_col[F.col("cluster")])
        .select("cluster", "n_points", "wss", "centroid_l1")
    )


def class_separation(emb: DataFrame, k_labels: int | None = None,
                     label_col: str = "label", id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Per-class embedding-quality diagnostics for classifier training
    data: how tight each label's cluster is (mean squared distance to
    its own centroid) vs how far the nearest OTHER centroid sits — the
    Fisher-style ratio that predicts whether a linear head can separate
    the classes. Exact integers end to end (shifted-int8 coordinates,
    round-half-up centroid division, ratio as ``floor(min_inter · n ·
    1e6 / Σ intra_sqdist)``) so a SQL oracle replays it bit-for-bit.

    Scale shape: pass 1 is ONE corpus-wide hash-agg (|labels|·dim long
    sums); its |labels|-row result lands on the driver, where exact
    Python-int centroids are computed and re-embedded as LITERALS in
    pass 2's distance expression — so the second corpus scan is a pure
    narrow map + hash-agg, no join, no vector shuffle. Inter-centroid
    distances are |labels|² driver-side integer ops on metadata-sized
    data. Returns (label, n, intra_sqsum, intra_mean_micro,
    min_inter_sqdist, fisher_ppm) sorted by label."""
    pts = emb.select(F.col(label_col).alias("_lbl"),
                     shifted_quantize(F.col(vec_col)).alias("qv"))
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    sums = [F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
            for i in range(dim)]
    stats = pts.groupBy("_lbl").agg(
        F.count(F.lit(1)).alias("n"), *sums).collect()
    cents: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for r in stats:
        n = int(r["n"])
        counts[r["_lbl"]] = n
        cents[r["_lbl"]] = [(2 * int(r[f"s{i}"]) + n) // (2 * n)
                            for i in range(dim)]
    labels = sorted(cents)
    min_inter = {
        a: min(
            sum((x - y) * (x - y) for x, y in zip(cents[a], cents[b]))
            for b in labels if b != a
        ) if len(labels) > 1 else None
        for a in labels
    }
    dist_cases = None
    for lbl in labels:
        d = _sq_dist(F.col("qv"), cents[lbl])
        dist_cases = (F.when(F.col("_lbl") == F.lit(lbl), d)
                      if dist_cases is None else
                      dist_cases.when(F.col("_lbl") == F.lit(lbl), d))
    intra = pts.select("_lbl", dist_cases.alias("_d")).groupBy("_lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_d").cast("long").alias("intra_sqsum"))
    mi_col = F.create_map(*[
        x for lbl in labels
        for x in (F.lit(lbl), F.lit(min_inter[lbl]).cast("long"))])
    # integer DIV, never float floor: intra_sqsum·1e6 can pass 2^53
    return intra.select(
        F.col("_lbl").alias(label_col), "n", "intra_sqsum",
        F.expr("(intra_sqsum * 1000000) DIV n").alias("intra_mean_micro"),
        mi_col[F.col("_lbl")].alias("min_inter_sqdist"),
    ).withColumn(
        "fisher_ppm",
        F.when(
            F.col("intra_sqsum") > 0,
            F.expr("(min_inter_sqdist * n * 1000000) DIV intra_sqsum"),
        ).cast("long"),
    )


def kcenter_coreset(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Greedy k-center coreset (farthest-point traversal — the 2-approx
    of the k-center cover and the classic coreset/"herding" selector for
    training-data curation): start from the smallest id, then k−1 times
    pick the point farthest from the selected set (exact integer squared
    distance on shifted-int8 coordinates, ties → smallest id). Returns
    the per-center cell rollup under the final selection:
    (center_id, n_points, radius_sq, sum_sqdist) — radius_sq is the
    k-center objective (max cell radius²).

    Scale shape: each greedy round is ONE corpus scan — the selected
    vectors ride the min-distance expression as LITERALS and a single
    ``max_by`` aggregate returns the 1-row winner; no join, no shuffle
    of the vectors, k·(scan + 1-row collect) total. Assignment ties
    break on selection index (the oracle replays the same total order).
    If the max min-distance hits 0 (every remaining point duplicates a
    center) selection stops early — the set is already fully covered.

    Practical ceiling on k: the k sequential 1-row collects are latency-
    bound — total wall ≈ k × (one corpus-scan job), and the min-distance
    expression itself grows O(k·dim), so coreset sizes in the DOZENS are
    the intended regime (the classic coreset use). At k ≳ 10³ the
    driver round-trips dominate (hours of job overhead, not a data
    hazard); switch to k-means++-style oversampling (one scan drawing
    many candidates per round) if you need thousand-point coresets."""
    pts = emb.select(F.col(id_col),
                     shifted_quantize(F.col(vec_col)).alias("qv"))
    first = pts.orderBy(id_col).limit(1).collect()
    if not first:
        return pts.select(
            F.col(id_col).alias("center_id"),
            F.lit(None).cast("long").alias("n_points"),
            F.lit(None).cast("long").alias("radius_sq"),
            F.lit(None).cast("long").alias("sum_sqdist"))
    sel_ids = [first[0][id_col]]
    sel_vecs = [list(first[0]["qv"])]
    for _ in range(int(k) - 1):
        mind = F.least(*[_sq_dist(F.col("qv"), c) for c in sel_vecs]) \
            if len(sel_vecs) > 1 else _sq_dist(F.col("qv"), sel_vecs[0])
        row = pts.select(
            F.max_by(
                F.struct(F.col(id_col).alias("i"), F.col("qv").alias("v"),
                         mind.alias("d")),
                F.struct(mind.alias("d"),
                         (-F.col(id_col)).alias("ni"))).alias("m")
        ).first()["m"]
        if row is None or int(row["d"]) == 0:
            break
        sel_ids.append(row["i"])
        sel_vecs.append(list(row["v"]))
    assigned = assign_clusters(pts, sel_vecs)
    center_map = F.create_map(*[
        x for j, i in enumerate(sel_ids) for x in (F.lit(j), F.lit(i))])
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
             F.max("dist").cast("long").alias("radius_sq"),
             F.sum("dist").cast("long").alias("sum_sqdist"))
        .select(center_map[F.col("cluster")].alias("center_id"),
                "n_points", "radius_sq", "sum_sqdist")
    )
