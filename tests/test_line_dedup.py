"""Planted fixture for corpus-global line dedup (C4's keep-first-occurrence
span dedup): duplicate lines across documents, a repeat INSIDE one document,
and a boilerplate line shared by three documents — keeper/removal counts and
removed-token volume checked by hand.

Reference analogue: the corpus-hygiene step before any per-user profiling
(`data_normalizer.py` dedups exact event rows); here the unit is the line.
"""

from __future__ import annotations

from anomaly_detection_spark.functions.repetition import line_dedup_stats


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, line_no int, line string")
    out = line_dedup_stats(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_keep_first_occurrence_semantics(spark):
    boiler = "subscribe to our newsletter"            # 4 tokens, 3 docs
    rows = [
        (1, 1, "alpha beta gamma"),                   # unique -> kept
        (1, 2, boiler),                               # first occ -> kept
        (2, 1, boiler),                               # later doc -> removed
        (2, 2, "delta epsilon"),                      # unique -> kept
        (3, 1, boiler),                               # removed
        (3, 2, "zeta eta"),                           # first occ -> kept
        (3, 3, "zeta eta"),                           # SAME-doc repeat -> removed
    ]
    got = _run(spark, rows)
    assert got[1] == {"doc_id": 1, "n_lines": 2, "n_tokens": 7,
                      "kept_lines": 2, "removed_lines": 0,
                      "kept_ppm": 1_000_000, "removed_tokens": 0}
    assert got[2]["kept_lines"] == 1 and got[2]["removed_lines"] == 1
    assert got[2]["removed_tokens"] == 4                # lost the boiler line
    assert got[3]["n_lines"] == 3 and got[3]["kept_lines"] == 1
    assert got[3]["removed_tokens"] == 4 + 2            # boiler + repeat


def test_doc_losing_every_line_still_reports(spark):
    rows = [(1, 1, "x y"), (2, 1, "x y")]
    got = _run(spark, rows)
    assert got[2] == {"doc_id": 2, "n_lines": 1, "n_tokens": 2,
                      "kept_lines": 0, "removed_lines": 1,
                      "kept_ppm": 0, "removed_tokens": 2}


def test_within_doc_first_line_wins_by_line_no(spark):
    # Same doc, duplicate line: keeper is the LOWER line_no occurrence.
    rows = [(7, 5, "a b c"), (7, 2, "a b c")]
    got = _run(spark, rows)
    assert got[7]["kept_lines"] == 1 and got[7]["removed_lines"] == 1


# ------------------------------------------------ exact-substring (ExactSubstr)

def test_exact_substring_removal_semantics(spark):
    """Lee et al. 2022 window-removal semantics by hand: cross-document
    duplicate windows removed (globally first occurrence kept), same-doc
    repeats removed, overlapping removed windows merged to exact token
    coverage, short docs report zeros."""
    from anomaly_detection_spark.functions.repetition import (
        exact_substring_spans)

    rows = [
        (1, "a b c d e"),          # all 3 windows unique (first occs)
        (2, "x y a b c d q"),      # windows @3 ("a b c") and @4 ("b c d")
                                   #   duplicate doc 1 -> merged span [3,6]
        (3, "m n o p m n o p"),    # same-doc repeats @5 @6 -> tokens 5-8
        (4, "z z"),                # shorter than n -> zeros
        (5, "a b c d e"),          # full copy of doc 1 -> fully removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in exact_substring_spans(df, n=3).collect()}
    assert got[1] == {"doc_id": 1, "n_tokens": 5, "n_windows": 3,
                      "removed_windows": 0, "removed_tokens": 0,
                      "removed_ppm": 0}
    assert got[2]["n_windows"] == 5 and got[2]["removed_windows"] == 2
    assert got[2]["removed_tokens"] == 4        # [3,5] u [4,6] merged
    assert got[2]["removed_ppm"] == 571429
    assert got[3]["removed_windows"] == 2 and got[3]["removed_tokens"] == 4
    assert got[4] == {"doc_id": 4, "n_tokens": 2, "n_windows": 0,
                      "removed_windows": 0, "removed_tokens": 0,
                      "removed_ppm": 0}
    assert got[5]["removed_windows"] == 3
    assert got[5]["removed_tokens"] == 5        # the whole doc goes
    assert got[5]["removed_ppm"] == 1_000_000


def test_exact_substring_clean_applies_report(spark):
    """The apply step must be consistent with the report: kept_tokens =
    n_tokens - removed_tokens, and the cleaned strings drop exactly the
    merged spans (full copies clean to empty)."""
    from anomaly_detection_spark.functions.repetition import (
        exact_substring_clean, exact_substring_spans)

    rows = [
        (1, "a b c d e"),
        (2, "x y a b c d q"),
        (3, "m n o p m n o p"),
        (4, "z z"),
        (5, "a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["doc_id"]: r.asDict()
           for r in exact_substring_spans(df, n=3).collect()}
    cln = {r["doc_id"]: r.asDict()
           for r in exact_substring_clean(df, n=3).collect()}
    for k in rep:
        assert cln[k]["kept_tokens"] == \
            rep[k]["n_tokens"] - rep[k]["removed_tokens"]
    assert cln[1]["cleaned_text"] == "a b c d e"
    assert cln[2]["cleaned_text"] == "x y q"
    assert cln[3]["cleaned_text"] == "m n o p"
    assert cln[5]["cleaned_text"] == ""          # full copy vanishes
