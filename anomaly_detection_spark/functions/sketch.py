"""Count-min sketch: bounded-memory approximate frequency counting over
unbounded key spaces (Cormode & Muthukrishnan 2005), the mergeable-sketch
companion to the exact ``heavy_hitters`` profile and the Bloom-filter
membership path (``functions/membership.py``).

Why it earns its place at 100 TB: the exact heavy-hitter aggregate keys a
shuffle by the value itself, so its state is proportional to the DISTINCT
key count — fine for enum-ish columns, unbounded for open vocabularies
(tokens, URLs, user agents). The sketch is a fixed ``depth × width``
counter table: every occurrence folds into it via map-side combine inside
the scan tasks, the shuffled state is ≤ ``depth·width`` rows per task
REGARDLESS of cardinality, and two sketches merge by counter addition —
so per-partition / per-day sketches roll up to corpus totals without ever
rescanning (the same merge==recompute contract as ``profiler`` histograms,
property-tested in ``tests/test_sketch.py``).

Estimates are biased UP only (collisions add, never subtract):
``exact ≤ est ≤ exact + εN`` with ε = e/width at the standard depth. All
hashes are first-8-hex-digits-of-md5 — bit-identical in every engine, so
the DuckDB oracle replays the sketch exactly (no Spark-private xxhash).

Reference analogue: frequency profiling behind ``user_profile_builder.py``'s
``Counter`` columns (47-57,121-127), which hold exact per-user maps the
sketch replaces when the key space outgrows memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(c: Column, row: int, width: int) -> Column:
    """Row-``row``'s bucket for key ``c``: first 8 md5 hex digits of
    ``"row:key"`` mod width — engine-portable and independent per row."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), c)), 1, 8), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 512, weight_col: str | None = None) -> DataFrame:
    """Fold a key stream into a count-min sketch ``(row, bucket, cnt)``.

    ONE pass, ONE map-side-combined aggregate: each occurrence expands to
    its ``depth`` (row, bucket) cells in-row (a single explode of a
    ``depth``-element struct array, one md5 per cell), then a
    hash-aggregate whose key space is at most ``depth·width`` collapses
    everything inside the scan tasks. The hottest token in a 100 TB
    corpus adds map-side partial counts like any other — there is no
    skewed reducer because the shuffle key is the CELL, not the value.
    """
    c = F.col(key_col).cast("string")
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"), _bucket(c, r, width).alias("b"))
        for r in range(depth)
    ])
    # explode_outer: plain explode's inferred non-empty pre-filter would
    # inline the whole hash-array expression into a filter condition and
    # re-evaluate every md5 there (see repetition.repetition_stats); the
    # literal array is never empty, so outer ≡ inner.
    ex = df.select(F.explode_outer(cells).alias("_p"), w.alias("_w"))
    return ex.groupBy(
        F.col("_p.r").alias("row"), F.col("_p.b").alias("bucket")
    ).agg(F.sum("_w").cast("long").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): counters add.
    ``merge(build(A), build(B)) == build(A ∪ B)`` exactly — the property
    that turns per-partition/per-snapshot sketches into corpus totals
    without a rescan."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the sketch's rows of
    the key's counter. The sketch is ≤ depth·width rows — broadcast — so
    estimation is a map-side join however many keys are probed; a missing
    cell reads as 0 (key never seen)."""
    c = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode_outer(F.array(*[
            F.struct(F.lit(r).alias("row"), _bucket(c, r, width).alias("bucket"))
            for r in range(depth)
        ])).alias("_p"),
    ).select(key_col, "_p.row", "_p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_inner_product(a: DataFrame, b: DataFrame,
                      depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches built
    with identical (depth, width): |A ⋈ B| = Σ_k f_A(k)·f_B(k) is
    estimated by the sketch inner product ``min_r Σ_b a_r[b]·b_r[b]``
    (Cormode & Muthukrishnan 2005 §4.2) — an upper bound that never
    undercounts, computed WITHOUT touching either table again.

    This is what a planner needs at 100 TB: choosing broadcast vs
    shuffle vs skew-salting for a join requires its output size, and the
    sketches are ≤ depth·width rows each — collected from per-partition
    folds, merged with ``cms_merge``, inner-multiplied here in
    milliseconds. Both frames are metadata-sized, so the equi-join on
    (row, bucket) and the two-level aggregate are trivial; returns one
    row ``(est_rows)``.
    """
    ar = a.select("row", "bucket", F.col("cnt").alias("_ca"))
    br = b.select("row", "bucket", F.col("cnt").alias("_cb"))
    per_row = (
        ar.join(br, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip"))
    )
    # a sketch row with NO colliding cells has inner product 0 and drops
    # out of the equi-join entirely — it must still drive the min to 0
    # (fully-disjoint key sets would otherwise return NULL / the min of
    # the rows that happen to collide)
    return per_row.agg(
        F.when(F.count(F.lit(1)) < depth, F.lit(0))
        .otherwise(F.min("_ip")).cast("long").alias("est_rows"))


def kmv_build(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    the Theta-sketch family): keep the ``k`` smallest md5 hashes of the
    DISTINCT keys. Where the CMS estimates frequencies and the Bloom
    filter membership, KMV estimates CARDINALITY in bounded space — and
    unlike HyperLogLog implementations (engine-private register layouts)
    the k-min set over md5 is bit-identical in every engine, so the
    DuckDB oracle replays it exactly.

    Shape: per-key hash (first 15 md5 hex digits → 60-bit integer, no
    collisions in practice), ONE distinct-agg on the hash, then the
    standard two-phase top-k: partial ``TakeOrderedAndProject`` inside
    each task ships ≤ k rows per partition — never a global sort of the
    key space. Returns ``(pos, hash)`` with pos 1..k ascending.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # NULL keys are excluded (a NULL hash would sort engine-dependently)
    hashes = df.select(h.alias("hash")).filter(F.col("hash").isNotNull()) \
        .distinct()
    # orderBy + limit plans as TakeOrderedAndProject (partial per task);
    # the pos window then runs over ≤ k rows — metadata-sized by then
    kmin = hashes.orderBy("hash").limit(k)
    w = Window.orderBy("hash")
    return kmin.select(F.row_number().over(w).alias("pos"), "hash")


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two KMV sketches: union the hash sets, keep the k smallest
    (re-ranked). ``merge(build(A), build(B)) == build(A ∪ B)`` exactly —
    per-partition/per-snapshot sketches roll up without rescans."""
    u = a.select("hash").unionByName(b.select("hash")).distinct()
    kmin = u.orderBy("hash").limit(k)
    w = Window.orderBy("hash")
    return kmin.select(F.row_number().over(w).alias("pos"), "hash")


#: The 60-bit hash keyspace KMV fractions are measured against.
KMV_SPACE = 16 ** 15


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: if the sketch holds
    fewer than k hashes the count is EXACT (every distinct key is
    present); otherwise ``(k − 1) · SPACE div kth_min_hash`` — the
    standard unbiased KMV estimator, floored in integer arithmetic so
    both engines agree bit-for-bit. Returns one row ``(n_hashes, est)``."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("hash").alias("_kth"),
    )
    return agg.select(
        "n_hashes",
        F.when(F.col("n_hashes") < k, F.col("n_hashes"))
        .otherwise(F.expr(f"cast(({k - 1} * cast({KMV_SPACE} as decimal(38,0)))"
                          f" div _kth as bigint)"))
        .cast("long").alias("est"),
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Set-overlap estimation from two KMV sketches (the Theta-sketch
    intersection, Dasgupta et al. 2016): take the k smallest hashes of
    the UNION of the two sketches — a uniform sample of the union — and
    count how many of those are present in BOTH sketches. That fraction
    estimates the Jaccard similarity; multiplied by the union cardinality
    estimate it yields the intersection size — all WITHOUT joining the
    underlying tables (the point at 100 TB: cross-table key overlap,
    split-leakage screens, vocabulary sharing between sources, from
    kilobyte sketches).

    The theta cut: a sketch only KNOWS membership below its own kth-min
    hash, so the union sample is restricted to hashes ≤ θ =
    min(θ_a, θ_b) over the sketches that are full (a sketch with fewer
    than k hashes holds its entire set and imposes no cut). Within the
    cut, "in both" is decidable exactly; the Theta estimator
    ``count·SPACE div θ`` scales counts back up. When neither sketch is
    full everything is exact.

    All frames here are ≤ 2k rows; joins are sketch-sized. Returns one
    row ``(n_union_sample, inter_in_sample, union_est, inter_est,
    jaccard_ppm)``.
    """
    ah = a.select("hash")
    bh = b.select("hash")
    theta = (
        a.agg(F.count(F.lit(1)).alias("_n"), F.max("hash").alias("_m"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("_nb"),
                         F.max("hash").alias("_mb")))
        .select(
            F.least(
                F.when(F.col("_n") >= k, F.col("_m"))
                .otherwise(F.lit(KMV_SPACE)),
                F.when(F.col("_nb") >= k, F.col("_mb"))
                .otherwise(F.lit(KMV_SPACE)),
            ).alias("_theta"))
    )
    u = ah.unionByName(bh).distinct().crossJoin(F.broadcast(theta)) \
        .filter(F.col("hash") <= F.col("_theta"))
    both = u.join(ah, "hash", "left_semi").join(bh, "hash", "left_semi")
    ucnt = u.agg(F.count(F.lit(1)).alias("n_union_sample"),
                 F.max("_theta").alias("_th"))
    icnt = both.agg(F.count(F.lit(1)).alias("inter_in_sample"))
    def scale(name: str):  # Theta estimator; exact when no cut applied
        return F.when(
            F.col("_th") >= F.lit(KMV_SPACE), F.col(name)
        ).otherwise(F.expr(
            f"cast(({name} * cast({KMV_SPACE} as decimal(38,0)))"
            f" div _th as bigint)"))

    est = ucnt.crossJoin(icnt)
    return est.select(
        "n_union_sample", "inter_in_sample",
        scale("n_union_sample").cast("long").alias("union_est"),
        scale("inter_in_sample").cast("long").alias("inter_est"),
        F.floor(F.lit(1_000_000.0) * F.col("inter_in_sample")
                / F.greatest(F.col("n_union_sample"), F.lit(1)) + F.lit(0.5))
        .cast("long").alias("jaccard_ppm"),
    )


def kmv_build_grouped(df: DataFrame, group_col: str, key_col: str,
                      k: int = 256) -> DataFrame:
    """Per-group KMV sketches in one pass: the k smallest distinct key
    hashes per group — ``(group, pos, hash)``. The distinct-agg and the
    per-group top-k window both key by the group column, so the whole
    build is two group-keyed exchanges regardless of key cardinality.

    The rollup property that matters operationally: the k-min set of a
    COARSER group (month) equals the k-min of the union of its finer
    groups' (days') k-min sets — every one of the month's k smallest
    hashes is necessarily among its day's k smallest — so per-day
    sketches roll up to month/quarter/corpus estimates EXACTLY, no
    rescan, no approximation added by the merge (demonstrated end-to-end
    by the `kmv_rollup_daily` registry entry).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashes = df.select(F.col(group_col), h.alias("hash")) \
        .filter(F.col("hash").isNotNull()).distinct()
    w = Window.partitionBy(group_col).orderBy("hash")
    return hashes.withColumn("pos", F.row_number().over(w)) \
        .filter(F.col("pos") <= k) \
        .select(group_col, "pos", "hash")


def kmv_estimate_grouped(sketch: DataFrame, group_col: str,
                         k: int = 256) -> DataFrame:
    """Per-group distinct estimate from ``kmv_build_grouped`` output —
    the same exact-below-k / (k−1)·SPACE div kth contract as
    ``kmv_estimate``, one row per group."""
    agg = sketch.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("hash").alias("_kth"),
    )
    return agg.select(
        group_col, "n_hashes",
        F.when(F.col("n_hashes") < k, F.col("n_hashes"))
        .otherwise(F.expr(
            f"cast(({k - 1} * cast({KMV_SPACE} as decimal(38,0)))"
            f" div _kth as bigint)"))
        .cast("long").alias("est"),
    )
