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
