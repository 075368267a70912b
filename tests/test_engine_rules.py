"""End-to-end rule-engine correctness against a pandas oracle.

The oracle recomputes every rule's expected violation set from the collected
synthetic table (seed-free deterministic generation), then asserts the
engine's violation rows and per-partition pass/fail matrix match EXACTLY —
the north_star parity requirement.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.engine import ValidationRun
from anomaly_detection_spark.rules import builtin
from anomaly_detection_spark.rules.core import RuleContext, RuleSet


def _oracle_row_violations(docs_pd: pd.DataFrame) -> set[tuple]:
    """(partition, rule_id, doc_id) triples the fused row pass must emit."""
    out = set()
    for _, row in docs_pd.iterrows():
        part, did, spans = row["partition"], row["doc_id"], row["spans"]
        spans = list(spans) if spans is not None else []
        if did is None:
            out.add((part, "not_null:doc_id", None))
        if len(spans) == 0:
            out.add((part, "non_empty:spans", did))
        if any(s["kind"] == "text" and s["text"] is None for s in spans):
            out.add((part, "text_present_on_text_spans", did))
        if any(s["kind"] != "text" and s["media_ref"] is None for s in spans):
            out.add((part, "media_ref_present_on_media_spans", did))
        if any(s["kind"] not in ("text", "image", "audio", "table") for s in spans):
            out.add((part, "span_kinds_accepted", did))
        offs = [s["offset"] for s in spans]
        nn = sorted(o for o in offs if o is not None)
        if (
            any(o is None for o in offs)
            or any(o < 0 for o in nn)
            or any(a == b for a, b in zip(nn, nn[1:]))
        ):
            out.add((part, "offsets_valid_native", did))
    return out


@pytest.fixture(scope="module")
def result(spark, docs, catalog):
    rules = RuleSet(
        row_rules=builtin.default_document_rules(),
        dataset_rules=[
            builtin.unique("doc_id"),
            builtin.referential(),
            builtin.span_sequence_valid(),
        ],
    )
    run = ValidationRun(spark, docs, rules, media_catalog=catalog)
    return run.run(resume=False)


def test_row_violations_exact(result, docs_pd):
    got = {
        (r["partition"], r["rule_id"], r["doc_id"])
        for r in result.violations.collect()
        if r["rule_id"]
        in {
            "not_null:doc_id", "non_empty:spans", "text_present_on_text_spans",
            "media_ref_present_on_media_spans", "span_kinds_accepted",
            "offsets_valid_native",
        }
    }
    assert got == _oracle_row_violations(docs_pd)


def test_uniqueness_exact(result, docs_pd):
    counts = docs_pd[docs_pd.doc_id.notna()].doc_id.value_counts()
    dups = set(counts[counts > 1].index)
    expected = {
        (r["partition"], r["doc_id"])
        for _, r in docs_pd.iterrows()
        if r["doc_id"] in dups
    }
    got = {
        (r["partition"], r["doc_id"])
        for r in result.violations.filter("rule_id = 'unique:doc_id'").collect()
    }
    assert got == expected and len(expected) > 0


def test_referential_exact(result, docs_pd, catalog):
    valid = {r["media_ref"] for r in catalog.collect()}
    expected = set()
    for _, row in docs_pd.iterrows():
        spans = list(row["spans"]) if row["spans"] is not None else []
        if any(
            s["media_ref"] is not None and s["media_ref"] not in valid for s in spans
        ):
            expected.add((row["partition"], row["doc_id"]))
    got = {
        (r["partition"], r["doc_id"])
        for r in result.violations.filter("rule_id = 'referential:media_ref'").collect()
    }
    assert got == expected and len(expected) > 0


def test_span_sequence_arrow_udf_matches_native(result):
    """input_hint invariant: the Arrow-UDF offset-sort check and the pure
    Column-expression check flag the same (partition, doc_id) sets."""
    arrow = {
        (r["partition"], r["doc_id"])
        for r in result.violations.filter("rule_id = 'span_sequence_valid'").collect()
    }
    native = {
        (r["partition"], r["doc_id"])
        for r in result.violations.filter("rule_id = 'offsets_valid_native'").collect()
    }
    # native also fires on empty-span docs? No: empty lists pass both. They
    # must agree exactly.
    assert arrow == native and len(arrow) > 0


def test_passfail_matrix(result, docs_pd):
    verd = {(r["partition"], r["rule_id"]): r for r in result.verdicts.collect()}
    # every (partition, rule) pair present
    parts = set(docs_pd["partition"])
    assert {k[0] for k in verd} == parts
    viol = result.violations.groupBy("partition", "rule_id").count().collect()
    counts = {(r["partition"], r["rule_id"]): r["count"] for r in viol}
    for key, row in verd.items():
        expected = counts.get(key, 0)
        assert row["violation_count"] == expected
        assert row["pass"] == (expected == 0)
    # rows_scanned matches partition sizes
    sizes = docs_pd.groupby("partition").size().to_dict()
    for (part, _), row in verd.items():
        assert row["rows_scanned"] == sizes[part]


def test_span_sequence_row_rule_equivalent_to_dataset_rule(spark, docs, catalog, result):
    """The fused (bound-column) form of the Arrow span check must emit the
    exact violation rows of the standalone dataset-rule form."""
    rules = RuleSet(row_rules=[builtin.span_sequence_valid_row()])
    fused = ValidationRun(spark, docs, rules, media_catalog=catalog).run(resume=False)
    a = {
        (r["partition"], r["doc_id"], r["detail"])
        for r in fused.violations.collect()
    }
    b = {
        (r["partition"], r["doc_id"], r["detail"])
        for r in result.violations.filter("rule_id = 'span_sequence_valid'").collect()
    }
    assert a == b and len(a) > 0


def test_span_prescreen_equivalent_to_udf(docs):
    """The JVM prescreen predicate must flag exactly the rows the Arrow UDF
    flags — this is what makes the prescreened production path sound."""
    from anomaly_detection_spark.functions.spans import offsets_invalid_reason

    mismatch = (
        docs.select(
            builtin.span_sequence_prescreen().alias("pre"),
            offsets_invalid_reason(
                F.transform("spans", lambda s: s["offset"])
            ).isNotNull().alias("udf"),
        )
        .filter(F.col("pre") != F.col("udf"))
        .count()
    )
    assert mismatch == 0


def test_span_sequence_prescreened_rule_equivalent(spark, docs, catalog):
    """prescreen=True and prescreen=False emit identical violation rows
    (partition, doc_id, detail)."""
    ctx = RuleContext(media_catalog=catalog)
    fast = builtin.span_sequence_valid(prescreen=True).build(docs, ctx)
    full = builtin.span_sequence_valid(prescreen=False).build(docs, ctx)
    a = {(r["partition"], r["doc_id"], r["detail"]) for r in fast.collect()}
    b = {(r["partition"], r["doc_id"], r["detail"]) for r in full.collect()}
    assert a == b and len(a) > 0


def test_unique_range_strategy_equivalent(spark, docs, catalog):
    from anomaly_detection_spark.rules.core import RuleContext

    ctx = RuleContext(media_catalog=catalog, range_partitions=8)
    hashagg = builtin.unique("doc_id", strategy="hashagg").build(docs, ctx)
    ranged = builtin.unique("doc_id", strategy="range").build(docs, ctx)
    a = {(r["partition"], r["doc_id"]) for r in hashagg.collect()}
    b = {(r["partition"], r["doc_id"]) for r in ranged.collect()}
    assert a == b and len(a) > 0


def test_media_caption_adjacent_rule(spark):
    """Caption-adjacency through the REAL fused engine pass: media-first,
    null-caption, and media-after-media docs violate; text-only and
    properly captioned docs pass — offsets arrive scrambled to prove the
    in-row sort, not storage order, decides adjacency."""
    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.rules.core import RuleSet

    def span(kind, text, off):
        return {"kind": kind, "text": text, "media_ref": None, "offset": off}

    rows = [
        # stored media-first but offset-ordered text->image: PASSES
        ("p0", "ok1", [span("image", None, 1), span("text", "cap", 0)]),
        ("p0", "ok2", [span("text", "a", 0)]),                    # text only
        ("p0", "bad_first", [span("image", None, 0), span("text", "c", 1)]),
        ("p0", "bad_nullcap", [span("text", None, 0), span("image", None, 1)]),
        ("p0", "bad_mm", [span("text", "c", 0), span("image", None, 1),
                          span("image", None, 2)]),
        # empty / NULL spans must not crash (sequence(1,0) is DESCENDING in
        # Spark → element_at on [] throws under ANSI without the guard) and
        # must PASS: no media span, nothing to caption.
        ("p0", "ok_empty", []),
        ("p0", "ok_null", None),
    ]
    docs = spark.createDataFrame(
        rows,
        "partition string, doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    suite = RuleSet(row_rules=[builtin.media_caption_adjacent()])
    res = ValidationRun(spark, docs, suite).run(resume=False)
    got = {(r["doc_id"], r["rule_id"]) for r in res.violations.collect()}
    assert got == {
        ("bad_first", "media_caption_adjacent"),
        ("bad_nullcap", "media_caption_adjacent"),
        ("bad_mm", "media_caption_adjacent"),
    }


def test_media_run_cap_rule(spark):
    """Image-wall rule through the fused engine pass: >max_run consecutive
    media spans IN OFFSET ORDER violate; a text span offset-interleaved
    into a stored run breaks it (storage order scrambled to prove the
    sort); empty/NULL spans pass without crashing."""
    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.rules.core import RuleSet

    def span(kind, off):
        return {"kind": kind, "text": "t" if kind == "text" else None,
                "media_ref": "m" if kind != "text" else None, "offset": off}

    rows = [
        ("p0", "ok_pair", [span("image", 1), span("image", 2), span("text", 0)]),
        # stored as img,img,img but a text span sits at offset 2: PASSES
        ("p0", "ok_broken", [span("image", 1), span("image", 3),
                             span("image", 4), span("text", 2), span("text", 0)]),
        ("p0", "bad_run3", [span("text", 0), span("image", 1),
                            span("image", 2), span("audio", 3)]),
        ("p0", "bad_run_at_start", [span("image", 0), span("image", 1),
                                    span("image", 2), span("text", 3)]),
        ("p0", "ok_empty", []),
        ("p0", "ok_null", None),
    ]
    docs = spark.createDataFrame(
        rows,
        "partition string, doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    suite = RuleSet(row_rules=[builtin.media_run_cap(max_run=2)])
    res = ValidationRun(spark, docs, suite).run(resume=False)
    got = {(r["doc_id"], r["rule_id"]) for r in res.violations.collect()}
    assert got == {
        ("bad_run3", "media_run_cap:2"),
        ("bad_run_at_start", "media_run_cap:2"),
    }
