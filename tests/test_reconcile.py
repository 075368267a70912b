"""Snapshot checksum reconciliation + one-pass correlation matrix.

Checksums must be invariant to row order / partitioning and convict
exactly the planted corruptions; correlations must match an exact
integer-power-sum reference model bit-for-bit.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.reconcile import (
    reconcile, row_signature, table_checksum)
from anomaly_detection_spark.profiler import correlation_matrix


@pytest.fixture(scope="module")
def snap(spark):
    rows = [("p%d" % (i % 3), str(i), "text-%d" % i, i * 7 % 101)
            for i in range(300)]
    return spark.createDataFrame(
        rows, "partition string, doc_id string, text string, n int").cache()


COLS = ["doc_id", "text", "n"]


def test_checksum_order_and_layout_invariant(spark, snap):
    a = table_checksum(snap, COLS).collect()
    b = table_checksum(
        snap.orderBy(F.desc("text")).repartition(13), COLS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["n_rows"] == 100 for r in a)
    assert len({r["checksum"] for r in a}) == 3  # partitions differ


def test_null_vs_sentinel_and_column_position(spark):
    # NULL is distinguishable from the sentinel string, and swapping
    # values across columns changes the signature (position matters)
    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("\x01", "x"), (None, "x")],
        "x string, y string")
    sigs = [r[0] for r in df.select(row_signature(["x", "y"])).collect()]
    assert len(set(sigs)) == 4
    assert all(s >= 0 for s in sigs)


def test_reconcile_all_statuses(spark, snap):
    cur = table_checksum(snap, COLS)
    prev_docs = (
        # p0: drop one row; p1: mutate one text; p2: unchanged
        snap.filter(~((F.col("partition") == "p0") & (F.col("doc_id") == "0")))
        .withColumn("text", F.when(
            (F.col("partition") == "p1") & (F.col("doc_id") == "1"),
            F.lit("tampered")).otherwise(F.col("text")))
    )
    prev = table_checksum(prev_docs, COLS).union(
        spark.createDataFrame([("p9", 5, 12345)],
                              "partition string, n_rows long, checksum long"))
    out = {r["partition"]: r["status"]
           for r in reconcile(cur, prev).collect()}
    assert out == {"p0": "count_mismatch", "p1": "content_mismatch",
                   "p2": "match", "p9": "only_previous"}

    only_cur = reconcile(cur, prev.filter("partition = 'p2'"))
    got = {r["partition"]: r["status"] for r in only_cur.collect()}
    assert got["p0"] == "only_current" and got["p2"] == "match"


def _ref_corr_micro(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    r = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy)))
    return math.floor(r * 1e6 + 0.5)


def test_correlation_matrix_exact(spark):
    xs = list(range(1, 201))
    ys = [3 * x + (x * x * 7 % 13) for x in xs]   # strongly correlated
    zs = [(x * 37 % 97) for x in xs]              # scrambled
    df = spark.createDataFrame(
        list(zip(xs, ys, zs)), "x long, y long, z long")
    out = {(r["col_x"], r["col_y"]): r for r in correlation_matrix(
        df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    for (a, b), r in out.items():
        vals = {"x": xs, "y": ys, "z": zs}
        assert r["n"] == 200
        assert r["corr_micro"] == _ref_corr_micro(vals[a], vals[b]), (a, b)
    assert out[("x", "y")]["corr_micro"] > 990_000
    assert abs(out[("x", "z")]["corr_micro"]) < 300_000


def test_correlation_matrix_extremes_and_partitions(spark):
    xs = list(range(50))
    df = spark.createDataFrame(
        [("g1", x, 5 * x + 2, -3 * x) for x in xs]
        + [("g2", x, -x, x * x) for x in xs],
        "partition string, x long, y long, z long")
    out = {(r["partition"], r["col_x"], r["col_y"]): r["corr_micro"]
           for r in correlation_matrix(
               df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")},
               partition_col="partition").collect()}
    assert out[("g1", "x", "y")] == 1_000_000   # exact linear
    assert out[("g1", "x", "z")] == -1_000_000
    assert out[("g2", "x", "y")] == -1_000_000
    assert 0 < out[("g2", "x", "z")] < 1_000_000  # convex, not linear


def test_cli_emit_checksums_and_reconcile(spark, docs, catalog, tmp_path):
    """Front-door reconciliation: run 1 emits the per-partition checksum
    table; run 2 over a corpus with one partition's doc tampered and one
    partition's doc dropped reconciles against it and convicts exactly
    those partitions."""
    import run_validation

    docs.write.parquet(str(tmp_path / "docs"))
    catalog.write.parquet(str(tmp_path / "catalog"))
    common = ["--catalog", str(tmp_path / "catalog"),
              "--emit-checksums", "doc_id,partition"]

    out1 = str(tmp_path / "out1")
    rc = run_validation.main(
        ["--input", str(tmp_path / "docs"), "--output", out1] + common)
    assert rc == 0
    cs = spark.read.parquet(f"{out1}/checksums")
    assert set(cs.columns) == {"partition", "n_rows", "checksum"}
    assert cs.count() == 8

    victims = [r["doc_id"] for r in docs.filter(
        "partition IN ('p1','p2') AND doc_id IS NOT NULL")
        .groupBy("partition").agg(F.min("doc_id").alias("doc_id")).collect()]
    assert len(victims) == 2
    (docs.filter(~F.col("doc_id").eqNullSafe(victims[0]))
        .withColumn("doc_id", F.when(F.col("doc_id") == victims[1],
                                     F.lit("tampered-id"))
                    .otherwise(F.col("doc_id")))
        .write.parquet(str(tmp_path / "docs2")))
    out2 = str(tmp_path / "out2")
    rc = run_validation.main(
        ["--input", str(tmp_path / "docs2"), "--output", out2,
         "--checksum-prev", f"{out1}/checksums"] + common)
    assert rc == 0
    rec = {r["partition"]: r["status"] for r in spark.read.parquet(
        f"{out2}/checksum_reconcile").collect()}
    assert len(rec) == 8 and sorted(rec) == [f"p{i}" for i in range(8)]
    # one doc dropped -> count; one doc_id rewritten -> content
    dropped = docs.filter(F.col("doc_id") == victims[0]) \
        .select("partition").first()["partition"]
    tampered = docs.filter(F.col("doc_id") == victims[1]) \
        .select("partition").first()["partition"]
    assert rec[dropped] == "count_mismatch"
    assert rec[tampered] == "content_mismatch"
    assert all(v == "match" for p, v in rec.items()
               if p not in (dropped, tampered))

    with pytest.raises(SystemExit):
        run_validation.parse_args(
            ["--input", "x", "--catalog", "y", "--output", "z",
             "--checksum-prev", "w"])


def test_merge_checksums_equals_recompute(spark, snap):
    """Per-commit checksums fold to the whole-snapshot checksum exactly
    (additive mod): merge(commit tables) == checksum(unioned rows),
    bit for bit."""
    from anomaly_detection_spark.functions.reconcile import merge_checksums

    c1 = snap.filter("doc_id < '1'")          # string-order split
    c2 = snap.filter("doc_id >= '1' AND doc_id < '2'")
    c3 = snap.filter("doc_id >= '2'")
    assert c1.count() + c2.count() + c3.count() == snap.count()
    merged = merge_checksums(
        table_checksum(c1, COLS), table_checksum(c2, COLS),
        table_checksum(c3, COLS))
    whole = table_checksum(snap, COLS)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))
    # single-table passthrough keeps the schema and values
    assert sorted(map(tuple, merge_checksums(whole).collect())) \
        == sorted(map(tuple, whole.collect()))


def test_merge_correlation_sums_equals_recompute(spark):
    """Per-commit correlation power sums fold to the whole-corpus panel
    exactly: merge(commits) closes to the same corr_micro bits as one
    pass over the union — the incremental correlation contract."""
    from anomaly_detection_spark.profiler import (
        correlation_from_sums, correlation_matrix, correlation_sums,
        merge_correlation_sums)

    xs = list(range(1, 301))
    rows = [(x, 3 * x + (x * x % 17), (x * 31) % 101) for x in xs]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    cols = {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
    c1, c2 = df.filter("x % 2 = 0"), df.filter("x % 2 = 1")
    merged = merge_correlation_sums(
        correlation_sums(c1, cols), correlation_sums(c2, cols))
    got = sorted(map(tuple, correlation_from_sums(
        merged, list(cols)).collect()))
    want = sorted(map(tuple, correlation_matrix(df, cols).collect()))
    assert got == want and len(want) == 3

    # partitioned form merges per key
    dfp = df.withColumn("p", (F.col("x") % 3).cast("string"))
    m2 = merge_correlation_sums(
        correlation_sums(dfp.filter("x <= 150"), cols, "p"),
        correlation_sums(dfp.filter("x > 150"), cols, "p"))
    got2 = sorted(map(tuple, correlation_from_sums(
        m2, list(cols), "p").collect()))
    want2 = sorted(map(tuple, correlation_matrix(dfp, cols, "p").collect()))
    assert got2 == want2 and len(want2) == 9
