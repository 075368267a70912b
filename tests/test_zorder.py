"""Z-order layout (curation.morton_code / zorder_layout): bit-exactness vs a
serial recompute, and the property that actually matters at 100 TB — each
range-partitioned output file gets a TIGHT min/max envelope in BOTH
dimensions, so scans filtering on either column can prune most files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import curation


def _interleave(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


@pytest.fixture(scope="module")
def grid(spark):
    # a deterministic scatter over the full 256x256 grid
    return spark.range(4096).select(
        F.col("id"),
        (F.abs(F.xxhash64("id", F.lit("a"))) % 256).alias("a"),
        (F.abs(F.xxhash64("id", F.lit("b"))) % 256).alias("b"),
    ).cache()


def test_morton_matches_serial(grid):
    rows = grid.select(
        "a", "b", curation.morton_code("a", "b", bits=8).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _interleave(r["a"], r["b"], 8)
        assert 0 <= r["z"] < 1 << 16


def test_morton_masks_high_bits(spark):
    df = spark.createDataFrame([(300, 5)], ["a", "b"])  # 300 > 2^8-1
    got = df.select(curation.morton_code("a", "b", bits=8).alias("z")).collect()
    assert got[0]["z"] == _interleave(300 & 255, 5, 8)


def test_morton_bits_validation(grid):
    with pytest.raises(ValueError):
        curation.morton_code("a", "b", bits=0)
    with pytest.raises(ValueError):
        curation.morton_code("a", "b", bits=32)


def _mean_envelope_widths(df) -> tuple[float, float]:
    """Per-partition min/max envelope width of each dimension, averaged, as
    a fraction of the 256-value range — the file-stats interval a scan with
    a predicate on THAT dimension prunes against."""
    parts = (
        df.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .agg(F.min("a").alias("a0"), F.max("a").alias("a1"),
             F.min("b").alias("b0"), F.max("b").alias("b1"))
        .collect()
    )
    wa = sum((r["a1"] - r["a0"] + 1) / 256 for r in parts) / len(parts)
    wb = sum((r["b1"] - r["b0"] + 1) / 256 for r in parts) / len(parts)
    return wa, wb


def test_zorder_layout_bounds_both_dimension_envelopes(grid):
    za, zb = _mean_envelope_widths(
        curation.zorder_layout(grid, "a", "b", bits=8, n_files=16))
    sa, sb = _mean_envelope_widths(
        grid.repartitionByRange(16, "a").sortWithinPartitions("a"))
    # single-column range layout: thin 'a' slices (good) but each file spans
    # the FULL 'b' range — a predicate on b prunes nothing. Z-order pays a
    # wider 'a' envelope to bound BOTH dimensions.
    assert sb > 0.9
    assert za < 0.6 and zb < 0.6           # both dims bounded
    assert max(za, zb) < max(sa, sb) / 1.5  # worst-dim envelope much tighter
