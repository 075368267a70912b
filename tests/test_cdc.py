"""CDC apply semantics on planted changelogs: latest-wins per key,
upsert-on-absent-key, delete-after-update resolution, and the effective
merge-audit counts."""

from __future__ import annotations

from anomaly_detection_spark.functions.cdc import cdc_apply, cdc_stats


def _frames(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "k long, v long, s string")
    # k=1: U then D (D wins); k=2: U; k=4: I (new); k=5: U on absent key
    changes = spark.createDataFrame(
        [(1, "U", 11, 99, "x"), (1, "D", 12, None, None),
         (2, "U", 21, 25, "b2"),
         (4, "I", 41, 40, "d"),
         (5, "U", 51, 50, "e")],
        "k long, op string, seq long, v long, s string")
    return base, changes


def test_cdc_apply_latest_wins_and_upserts(spark):
    base, changes = _frames(spark)
    got = {r["k"]: (r["v"], r["s"])
           for r in cdc_apply(base, changes, "k", ["v", "s"]).collect()}
    assert 1 not in got                    # delete won over earlier update
    assert got[2] == (25, "b2")            # update applied
    assert got[3] == (30, "c")             # untouched base row
    assert got[4] == (40, "d")             # insert
    assert got[5] == (50, "e")             # U on absent key inserts
    assert len(got) == 4


def test_cdc_stats_effective_counts(spark):
    base, changes = _frames(spark)
    got = cdc_stats(base, changes, "k").collect()[0].asDict()
    assert got == {"n_base": 3, "n_changes": 5, "n_inserted": 2,
                   "n_updated": 1, "n_deleted": 1, "n_final": 4}


def test_cdc_apply_idempotent_on_replay(spark):
    # applying the same changelog twice yields the same state (latest-wins
    # with the same LSNs is a no-op on the second pass for U/I; a D for an
    # already-absent key stays absent)
    base, changes = _frames(spark)
    once = cdc_apply(base, changes, "k", ["v", "s"])
    twice = cdc_apply(once, changes, "k", ["v", "s"])
    a = sorted((r["k"], r["v"], r["s"]) for r in once.collect())
    b = sorted((r["k"], r["v"], r["s"]) for r in twice.collect())
    assert a == b


def test_cdc_delete_absent_key_is_noop(spark):
    base = spark.createDataFrame([(1, 10)], "k long, v long")
    changes = spark.createDataFrame([(9, "D", 1, None)],
                                    "k long, op string, seq long, v long")
    got = cdc_apply(base, changes, "k", ["v"]).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, 10)]


def test_scd2_versions_planted(spark):
    from anomaly_detection_spark.functions.cdc import scd2_build

    changes = spark.createDataFrame(
        [(1, "I", 10, 100), (1, "U", 20, 150), (1, "D", 30, None),
         (2, "I", 11, 200),
         (3, "U", 12, 300), (3, "U", 22, 310)],
        "k long, op string, seq long, v long")
    got = sorted(
        (r["k"], r["valid_from"], r["valid_to"], r["is_current"], r["v"])
        for r in scd2_build(changes, "k", ["v"]).collect())
    assert got == [
        (1, 10, 20, 0, 100),   # closed by the update
        (1, 20, 30, 0, 150),   # closed by the delete -> no current row
        (2, 11, None, 1, 200),
        (3, 12, 22, 0, 300),
        (3, 22, None, 1, 310),
    ]
