"""length_batching: exact padding arithmetic against a pure-Python model,
the sorted-beats-arrival property, and multi-bucket rank recombination."""

from __future__ import annotations

import pytest

from anomaly_detection_spark.functions import curation


def _model(lens_in_order: list[int], b: int):
    batches = [lens_in_order[i:i + b] for i in range(0, len(lens_in_order), b)]
    real = sum(lens_in_order)
    slots = sum(len(x) * max(x) for x in batches)
    return {
        "n_batches": len(batches),
        "real_tokens": real,
        "padded_slots": slots - real,
        "efficiency_ppm": real * 1_000_000 // slots,
    }


@pytest.fixture(scope="module")
def fixture(spark):
    # lengths chosen so arrival order is maximally mixed; bucket_width=2
    # forces the two-phase offset recombination across many tiny buckets
    lens = [100, 1, 50, 2, 99, 3, 48, 4, 97, 5, 46, 6]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lens)], ["doc_id", "n_tokens"])
    got = {
        r["strategy"]: r.asDict()
        for r in curation.length_batching(
            df, batch_size=4, bucket_width=2).collect()
    }
    return lens, got


def test_arrival_matches_model(fixture):
    lens, got = fixture
    want = _model(lens, 4)
    for k, v in want.items():
        assert got["arrival"][k] == v, k


def test_sorted_matches_model(fixture):
    lens, got = fixture
    want = _model(sorted(lens), 4)
    for k, v in want.items():
        assert got["length_sorted"][k] == v, k


def test_sorting_never_hurts(fixture):
    lens, got = fixture
    assert (got["length_sorted"]["padded_slots"]
            <= got["arrival"]["padded_slots"])
    assert (got["length_sorted"]["efficiency_ppm"]
            >= got["arrival"]["efficiency_ppm"])
    # real token mass is layout-invariant
    assert got["length_sorted"]["real_tokens"] == got["arrival"]["real_tokens"]


def test_duplicate_lengths_total_order(spark):
    # every doc the same length: both strategies identical, zero padding
    df = spark.createDataFrame(
        [(i, 7) for i in range(10)], ["doc_id", "n_tokens"])
    got = {
        r["strategy"]: r.asDict()
        for r in curation.length_batching(
            df, batch_size=3, bucket_width=4).collect()
    }
    for s in ("arrival", "length_sorted"):
        assert got[s]["n_batches"] == 4
        assert got[s]["padded_slots"] == 0
        assert got[s]["efficiency_ppm"] == 1_000_000
