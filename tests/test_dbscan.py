"""Planted-fixture tests for the DBSCAN-style density clustering
(reference dbscan_model.py:36-125) — the oracle gate runs it on the
embeddings table where the geometry is opaque; here every role and cluster
assignment is hand-checkable."""

from pyspark.sql import functions as F

from anomaly_detection_spark.functions import ml


def pts_df(spark, rows):
    """rows: (id, bucket, [vec components])"""
    data = [(int(i), int(b), [int(x) for x in v]) for i, b, v in rows]
    return spark.createDataFrame(data, "vec_id long, bucket long, qv array<long>")


# 1-D fixture, eps = 2 (eps_sq = 4), min_pts = 3:
#   cluster A: 0,1,2,3 at x = 0,1,2,3 (all core, chain within eps)
#   border:    4 at x = 5 (only core 3 within eps -> border of A)
#   noise:     20 at x = 50
#   cluster B: 10,11,12 at x = 100,101,102 (all core)
FIXTURE = [
    (0, 1, [0]), (1, 1, [1]), (2, 1, [2]), (3, 1, [3]),
    (4, 1, [5]),
    (20, 1, [50]),
    (10, 1, [100]), (11, 1, [101]), (12, 1, [102]),
]


def run(spark, rows, **kw):
    out = ml.dbscan_labels(
        pts_df(spark, rows), eps_sq=kw.pop("eps_sq", 4),
        min_pts=kw.pop("min_pts", 3), **kw,
    )
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_roles_and_clusters_planted(spark):
    got = run(spark, FIXTURE)
    assert {i: got[i]["role"] for i in sorted(got)} == {
        0: "core", 1: "core", 2: "core", 3: "core", 4: "border",
        10: "core", 11: "core", 12: "core", 20: "noise",
    }
    assert {i: got[i]["cluster"] for i in sorted(got)} == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
        10: 10, 11: 10, 12: 10, 20: None,
    }
    # n_eps excludes self: endpoint 0 sees {1,2}; border 4 sees {3}
    assert got[0]["n_eps"] == 2 and got[4]["n_eps"] == 1
    assert got[20]["n_eps"] == 0


def test_bucket_seam_blocks_pairs(spark):
    # same geometry, but point 4 moved to its own bucket: loses its only
    # ε-neighbor (the documented blocked-pair trade) and becomes noise
    moved = [(i, 2 if i == 4 else b, v) for i, b, v in FIXTURE]
    got = run(spark, moved)
    assert got[4]["role"] == "noise" and got[4]["cluster"] is None
    # cluster A itself is unaffected
    assert got[3]["role"] == "core" and got[3]["cluster"] == 0


def test_isolated_core_is_own_cluster(spark):
    # three coincident points: each sees 2 neighbors at d=0 -> all core,
    # one cluster labeled by the min id
    rows = [(7, 1, [9]), (8, 1, [9]), (9, 1, [9])]
    got = run(spark, rows)
    assert all(got[i]["role"] == "core" for i in (7, 8, 9))
    assert all(got[i]["cluster"] == 7 for i in (7, 8, 9))


def test_min_pts_includes_self(spark):
    # pair at distance 1: n_eps = 1 each; min_pts=2 makes both core
    rows = [(1, 1, [0]), (2, 1, [1])]
    got = run(spark, rows, min_pts=2)
    assert got[1]["role"] == "core" and got[2]["cluster"] == 1
    # min_pts=3: nobody is core, nobody has a core neighbor -> all noise
    got = run(spark, rows, min_pts=3)
    assert {got[1]["role"], got[2]["role"]} == {"noise"}


def test_oversize_bucket_dropped(spark):
    # bucket 1 capped out -> every member reports noise with n_eps 0
    got = run(spark, FIXTURE, max_bucket=3)
    assert all(got[i]["role"] == "noise" and got[i]["n_eps"] == 0
               for i, b, _ in FIXTURE)


def test_multidim_distance_exact(spark):
    # 2-D: (0,0) and (3,4) are at exactly d=5; eps_sq=25 includes the
    # boundary (d² ≤ eps²), eps_sq=24 excludes it
    rows = [(1, 1, [0, 0]), (2, 1, [3, 4])]
    inc = run(spark, rows, eps_sq=25, min_pts=2)
    assert inc[1]["role"] == "core" and inc[1]["cluster"] == 1
    exc = run(spark, rows, eps_sq=24, min_pts=2)
    assert exc[1]["role"] == "noise"
