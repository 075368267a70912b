"""Compaction planner semantics on planted manifests: the keep/compact
threshold, per-partition isolation, the fixed-boundary grouping rule, and
the summary's file-count economics."""

from __future__ import annotations

import pytest

from anomaly_detection_spark.functions import maintenance


@pytest.fixture(scope="module")
def manifest(spark):
    # part p1: four 10-byte smalls + one 100-byte big (threshold 50)
    # part p2: three 30-byte smalls (own partition — must not co-group)
    rows = [
        ("p1", 1, 10), ("p1", 2, 10), ("p1", 3, 100),
        ("p1", 4, 10), ("p1", 5, 10),
        ("p2", 1, 30), ("p2", 2, 30), ("p2", 3, 30),
    ]
    return spark.createDataFrame(rows, ["part", "file_id", "size_bytes"])


def test_plan_labels_and_groups(spark, manifest):
    plan = {
        (r["part"], r["file_id"]): (r["action"], r["compaction_group"])
        for r in maintenance.plan_compaction(
            manifest, target_size=25, small_threshold=50
        ).collect()
    }
    # big file kept, group untouched by its bytes
    assert plan[("p1", 3)] == ("keep", None)
    # smalls pack by cum_before // 25: cum_before 0,10,20,30
    assert plan[("p1", 1)] == ("compact", 0)
    assert plan[("p1", 2)] == ("compact", 0)
    assert plan[("p1", 4)] == ("compact", 0)   # cum_before 20 -> group 0
    assert plan[("p1", 5)] == ("compact", 1)   # cum_before 30 -> group 1
    # p2 groups restart at 0 — partitions never merge
    assert plan[("p2", 1)] == ("compact", 0)
    assert plan[("p2", 2)] == ("compact", 1)   # cum_before 30
    assert plan[("p2", 3)] == ("compact", 2)   # cum_before 60

def test_summary_economics(spark, manifest):
    got = {
        r["part"]: r.asDict()
        for r in maintenance.compaction_summary(
            manifest, target_size=25, small_threshold=50
        ).collect()
    }
    p1 = got["p1"]
    assert (p1["n_files"], p1["n_small"], p1["n_groups"]) == (5, 4, 2)
    assert p1["small_bytes"] == 40
    assert p1["files_out"] == 3            # 1 kept + 2 groups
    assert p1["reduction_ppm"] == (5 - 3) * 1_000_000 // 5
    p2 = got["p2"]
    assert (p2["n_files"], p2["n_small"], p2["n_groups"]) == (3, 3, 3)
    assert p2["files_out"] == 3            # every 30-byte file > target alone
    assert p2["reduction_ppm"] == 0


def test_all_big_partition_is_untouched(spark):
    df = spark.createDataFrame(
        [("p", 1, 500), ("p", 2, 600)], ["part", "file_id", "size_bytes"])
    got = maintenance.compaction_summary(
        df, target_size=100, small_threshold=100).collect()[0]
    assert (got["n_small"], got["n_groups"], got["files_out"]) == (0, 0, 2)
    assert got["reduction_ppm"] == 0


# ----------------------------------------------------- zone-map skip audit

def test_ranked_file_ids_matches_total_order(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(40)], "id long, v long")
    out = maintenance.ranked_file_ids(
        df, "v", "id", rows_per_file=10, bin_col=F.expr("v div 25"))
    rows = sorted((r["v"], r["id"], r["file_id"]) for r in out.collect())
    # file_id must equal global (v, id)-rank // 10
    for rank, (v, i, fid) in enumerate(rows):
        assert fid == rank // 10, (rank, v, i, fid)


def test_zone_stats_and_skip_report_planted(spark):
    from pyspark.sql import functions as F

    # two files: values 0..9 and 100..109
    df = spark.createDataFrame(
        [(i, i if i < 10 else i + 90) for i in range(20)], "id long, v long")
    files = df.withColumn("file_id", F.expr("id div 10"))
    zones = maintenance.zone_stats(files, "file_id", ["v"])
    z = {r["file_id"]: r.asDict() for r in zones.collect()}
    assert z[0] == {"file_id": 0, "n_rows": 10, "min_v": 0, "max_v": 9}
    assert z[1]["min_v"] == 100 and z[1]["max_v"] == 109

    rep = maintenance.skip_report(
        zones,
        [("hit_one", "v", 5, 8), ("hit_both", "v", 9, 100),
         ("hit_none", "v", 50, 60)],
        ["v"])
    got = {r["pred_id"]: r.asDict() for r in rep.collect()}
    assert got["hit_one"]["files_scanned"] == 1
    assert got["hit_one"]["rows_scanned"] == 10
    assert got["hit_one"]["skip_ppm"] == 500_000
    assert got["hit_both"]["files_scanned"] == 2
    assert got["hit_none"]["files_scanned"] == 0
    assert got["hit_none"]["skip_ppm"] == 1_000_000


def test_skip_report_inclusive_boundaries(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, 10), (1, 20)], "id long, v long")
    zones = maintenance.zone_stats(
        df.withColumn("file_id", F.lit(0)), "file_id", ["v"])
    rep = maintenance.skip_report(
        zones, [("lo_edge", "v", 20, 30), ("hi_edge", "v", 0, 10),
                ("outside", "v", 21, 30)], ["v"])
    got = {r["pred_id"]: r["files_scanned"] for r in rep.collect()}
    assert got == {"lo_edge": 1, "hi_edge": 1, "outside": 0}
