"""Integer power iteration: a planted dominant axis is recovered exactly
(scale-2^14 component on the heavy axis, zeros off-plane), projections
separate the planted clusters, and the arithmetic is integer end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomaly_detection_spark.functions.similarity import (
    spectral_projections, spectral_top_direction)

DIM = 4


def _qframe(spark, rows):
    return spark.createDataFrame(
        [(i, list(map(int, v))) for i, v in enumerate(rows)],
        "vec_id long, qv array<long>")


def test_dominant_axis_recovered(spark):
    rows = [[127, 0, 0, 0]] * 3 + [[0, 63, 0, 0]]
    v = spectral_top_direction(_qframe(spark, rows), dim=DIM, iters=3) \
        .collect()[0]["v"]
    assert v[0] == 16384          # normalized to full scale on the heavy axis
    assert 0 <= v[1] < 200        # minor axis decays geometrically
    assert v[2] == 0 and v[3] == 0


def test_direction_values_are_exact_integers_first_iteration(spark):
    # one iteration, hand-computed: d = [127·3? no — per-row] …
    # rows r1..r3 = [127,0,0,0], r4 = [0,63,0,0]; v0 = 1s ⇒ d = [127]*3+[63]
    # s = (3·127·127, 63·63, 0, 0) = (48387, 3969, 0, 0); mx = 48387
    # v1 = (16384, (3969·16384) div 48387, 0, 0) = (16384, 1343, 0, 0)
    rows = [[127, 0, 0, 0]] * 3 + [[0, 63, 0, 0]]
    v = spectral_top_direction(_qframe(spark, rows), dim=DIM, iters=1) \
        .collect()[0]["v"]
    assert v == [16384, 3969 * 16384 // 48387, 0, 0]


def test_projections_separate_planted_clusters(spark):
    rows = [[100, 10, 0, 0]] * 4 + [[-100, 10, 0, 0]] * 4
    qf = _qframe(spark, rows)
    direction = spectral_top_direction(qf, dim=DIM, iters=3)
    got = spectral_projections(qf, direction).collect()
    pos = [r["proj"] for r in got if r["vec_id"] < 4]
    neg = [r["proj"] for r in got if r["vec_id"] >= 4]
    assert all(p > 0 for p in pos) and all(n < 0 for n in neg)
    assert min(pos) > 100 * 10000  # dominated by the ±100 axis


def test_negative_components_truncate_like_duckdb(spark):
    # anti-correlated dims produce a NEGATIVE direction component (the
    # Gram matrix is PSD, so the leading component from an all-ones start
    # is always ≥ 0, but cross terms are signed): hand-check one
    # iteration — d = 27 per row; s = (3·27·127, −3·27·100, 0, 0) =
    # (10287, −8100, 0, 0); v = (16384, −(8100·16384) div 10287, 0, 0).
    # The div on the ABS value truncates identically in Spark and DuckDB.
    rows = [[127, -100, 0, 0]] * 3
    v = spectral_top_direction(_qframe(spark, rows), dim=DIM, iters=1) \
        .collect()[0]["v"]
    assert v == [16384, -(8100 * 16384 // 10287), 0, 0]
    assert v[1] == -12900


def test_zero_matrix_is_stable(spark):
    rows = [[0, 0, 0, 0]] * 3
    v = spectral_top_direction(_qframe(spark, rows), dim=DIM, iters=3) \
        .collect()[0]["v"]
    assert v == [0, 0, 0, 0]


def test_multi_component_integer_orthogonality(spark):
    """Deflated power iteration: component 0 must equal the single-
    direction path exactly, and every direction pair must be orthogonal
    up to the 2^14 integer rounding (|cos| below 1e-3 — the integer
    orthogonality contract, measured not assumed)."""
    from anomaly_detection_spark.functions.similarity import (
        int8_quantize, spectral_top_directions)
    import itertools

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qz = emb.select(int8_quantize(F.col("embedding")).alias("qv"))
    dirs = {r["component"]: list(r["v"])
            for r in spectral_top_directions(
                qz, n_components=3, iters=2).collect()}
    assert set(dirs) == {0, 1, 2}
    top1 = list(spectral_top_direction(qz, iters=2).collect()[0]["v"])
    assert dirs[0] == top1          # deflation leaves component 0 untouched
    for a, b in itertools.combinations(dirs, 2):
        va, vb = dirs[a], dirs[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va) ** 0.5
        nb = sum(x * x for x in vb) ** 0.5
        assert na > 0 and nb > 0
        assert abs(dot / (na * nb)) < 1e-3, f"components {a},{b} not orthogonal"
    # every direction is normalized to max-component 2^14 exactly
    for v in dirs.values():
        assert max(abs(x) for x in v) == 16384


def test_multi_component_rank_deficient_deflates_to_zero(spark):
    """A rank-1 matrix has one singular direction; deflation must send
    later components to the zero vector rather than fabricate structure."""
    from anomaly_detection_spark.functions.similarity import (
        spectral_top_directions)

    emb = spark.range(50).select(
        F.array(*[F.lit(127).cast("long")] * 8).alias("qv"))
    dirs = {r["component"]: list(r["v"])
            for r in spectral_top_directions(
                emb, n_components=2, dim=8, iters=2).collect()}
    assert dirs[0] == [16384] * 8
    assert all(abs(x) <= 1 for x in dirs[1])  # rounding residue at most 1
