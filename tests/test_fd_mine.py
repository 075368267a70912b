"""fd_mine: the g3 violation measure on a planted fixture where the exact
minimum-rows-to-delete is known, NULL-as-value semantics, and both verdict
branches."""

from __future__ import annotations

from anomaly_detection_spark import profiler


def test_g3_measure_and_verdicts(spark):
    # a -> b: a=1 maps to {x,x,y} (delete 1), a=2 maps to {z} (clean)
    # b -> a: x->{1,1}, y->{1}, z->{2} — holds exactly
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "z")]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["determinant"], r["dependent"]): r.asDict()
        for r in profiler.fd_mine(df, ["a", "b"], budget_ppm=0).collect()
    }
    ab = got[("a", "b")]
    assert ab["violating_rows"] == 1
    assert ab["violation_ppm"] == 1_000_000 // 4
    assert ab["n_determinants"] == 2
    assert not ab["holds"]
    ba = got[("b", "a")]
    assert ba["violating_rows"] == 0 and ba["holds"]
    assert ba["n_determinants"] == 3


def test_null_is_a_value(spark):
    # NULL determinant groups together; NULL dependent is a value too:
    # a -> b violates once (NULL a maps to both x and NULL)
    rows = [(None, "x"), (None, None), (3, "y")]
    df = spark.createDataFrame(rows, "a int, b string")
    got = {
        (r["determinant"], r["dependent"]): r.asDict()
        for r in profiler.fd_mine(df, ["a", "b"], budget_ppm=500_000).collect()
    }
    ab = got[("a", "b")]
    assert ab["violating_rows"] == 1
    assert ab["violation_ppm"] == 1_000_000 // 3
    assert ab["holds"]  # within the 50% budget


def test_budget_boundary_inclusive(spark):
    rows = [(1, "x"), (1, "y")]  # ppm exactly 500000
    df = spark.createDataFrame(rows, ["a", "b"])
    got = profiler.fd_mine(df, ["a", "b"], budget_ppm=500_000).collect()
    ab = [r for r in got if r["determinant"] == "a"][0]
    assert ab["violation_ppm"] == 500_000 and ab["holds"]
